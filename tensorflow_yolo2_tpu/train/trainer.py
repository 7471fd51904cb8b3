"""Generic SPMD Trainer.

The TPU-native replacement for every reference training loop
(pascal_train_darknet.py:93-114, imagenet_train_darknet.py:106-135,
slim train_image_classifier.py + model_deploy.py): one jitted train step
— loss → grad → optax update, with BatchNorm statistics threaded through
— compiled once over a ('data', 'model') Mesh.

Parallelism notes (SURVEY §2.3):

- the reference's clone-per-GPU replication and ``tf.add_n`` gradient
  summation become GSPMD: the batch is sharded over the 'data' axis and
  XLA inserts the gradient all-reduce over ICI;
- BatchNorm under jit/GSPMD computes moments over the *logical* (global)
  batch — cross-replica stat sync falls out of the compilation model
  instead of being a per-clone approximation;
- SyncReplicasOptimizer disappears: SPMD steps are synchronous by
  construction;
- the 'model' axis shards large weights (parallel.shard_params) for
  tensor parallelism.

The step donates the input state, so parameters are updated in place in
HBM (no params-sized extra allocation).
"""

from __future__ import annotations

import functools
import inspect
from typing import Any, Callable, Mapping, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tensorflow_yolo2_tpu.config import OptimizerConfig, YoloConfig
from tensorflow_yolo2_tpu.losses.yolo import yolo_loss
from tensorflow_yolo2_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    shard_params,
)
from tensorflow_yolo2_tpu.train.optimizers import make_ema, make_optimizer


def device_normalize(images: jnp.ndarray) -> jnp.ndarray:
    """uint8 batches → float32 in [-1, 1] on device; float passes through.

    The uint8-transfer training path: the host ships raw uint8 pixels (4x
    fewer host↔device bytes than float32 — the transfer is the wall on
    narrow links like PCIe-attached hosts or the axon tunnel) and the chip
    applies (x/255)*2-1 as its first op, which XLA fuses into the input
    pipeline of the first convolution. Same convention as
    data.augment.normalize and the ops.quant serving path; the dtype
    branch resolves at trace time, so float batches compile to a no-op.
    """
    if images.dtype == jnp.uint8:
        return (images.astype(jnp.float32) / 255.0) * 2.0 - 1.0
    return images


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any = None
    rng: jax.Array = None


# -- task losses ---------------------------------------------------------------


def yolo_task(yolo_cfg: YoloConfig, histograms: bool = False) -> Callable:
    """Detection task: YOLO grid loss + per-term metrics.

    ``histograms=True`` additionally emits array-valued ``hist/*``
    metrics (IoU and predicted-confidence distributions — the loss-side
    TB histograms of reference net_utils.py:361-370); the train loop
    routes those to the metric writer's histogram channel."""

    def task(outputs: jnp.ndarray, labels: jnp.ndarray):
        total, aux = yolo_loss(outputs, labels, yolo_cfg)
        metrics = {
            "loss": total,
            "class_loss": aux.class_loss,
            "object_loss": aux.object_loss,
            "noobject_loss": aux.noobject_loss,
            "coord_loss": aux.coord_loss,
            "mean_iou": jnp.sum(aux.ious * aux.object_mask) /
            jnp.maximum(jnp.sum(aux.object_mask), 1.0),
        }
        if histograms:
            C = yolo_cfg.num_class
            metrics["hist/iou"] = aux.ious
            metrics["hist/confidence"] = outputs[..., C:C + yolo_cfg.B]
        return total, metrics

    return task


def softmax_task(aux_weight: float = 0.4,
                 label_smoothing: float = 0.0) -> Callable:
    """Classification task: sparse softmax CE + accuracy (reference
    imagenet_train_darknet.py:50-61, flowers_train.py:25-35).

    Models built with ``aux_logits=True`` (inception v1/v3) return
    ``(logits, aux_logits)``; the aux head contributes an
    ``aux_weight``-scaled CE term (slim's 0.4-weighted aux loss in
    train_image_classifier's clone_fn).

    ``label_smoothing`` blends the one-hot target toward uniform —
    ``onehot·(1−ε) + ε/K`` — on both the main and aux CE terms, exactly
    slim's ``tf.losses.softmax_cross_entropy(label_smoothing=...)``
    (train_image_classifier.py:142,474-477)."""

    def ce(logits, labels):
        if label_smoothing:
            k = logits.shape[-1]
            onehot = jax.nn.one_hot(labels, k, dtype=logits.dtype)
            smoothed = onehot * (1.0 - label_smoothing) + label_smoothing / k
            return jnp.mean(optax.softmax_cross_entropy(logits, smoothed))
        return jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(logits, labels))

    def task(outputs, labels: jnp.ndarray):
        aux = None
        if isinstance(outputs, tuple):
            outputs, aux = outputs
        loss = ce(outputs, labels)
        metrics = {"loss": loss}
        if aux is not None:
            aux_loss = ce(aux, labels)
            loss = loss + aux_weight * aux_loss
            metrics = {"loss": loss, "aux_loss": aux_loss}
        metrics["accuracy"] = jnp.mean(
            (jnp.argmax(outputs, -1) == labels).astype(jnp.float32))
        return loss, metrics

    return task


# -- trainer -------------------------------------------------------------------


class Trainer:
    """Owns the jitted train/eval steps for (model, task, optimizer, mesh)."""

    def __init__(self, model: Any, task: Callable,
                 opt_cfg: OptimizerConfig = OptimizerConfig(),
                 mesh: Optional[Mesh] = None, donate: bool = True,
                 remat: bool = False,
                 tx_factory: Optional[Callable] = None,
                 activation_summaries: bool = False,
                 eval_with_ema: bool = True):
        """``tx_factory(params) -> GradientTransformation`` overrides the
        single-optimizer build from ``opt_cfg`` (used for per-scope
        optimizer groups, optimizers.make_grouped_optimizer).

        ``activation_summaries`` adds per-top-level-module activation
        histograms + sparsity scalars to the train-step metrics (slim's
        activation/sparsity summaries,
        train_image_classifier.py:489-503). ``eval_with_ema=False``
        evaluates the raw parameters even when EMA is tracked (slim can
        eval either; default matches the reference's
        moving_average_decay eval restore)."""
        self.model = model
        self.task = task
        # schedule-aware tasks (e.g. the YOLO9000 burn-in prior in
        # losses.yolo_v2) take the optimizer step as a kwarg; thread it
        # through from the train state when the signature asks for it
        try:
            self._task_takes_step = (
                "step" in inspect.signature(task).parameters)
        except (TypeError, ValueError):
            self._task_takes_step = False
        self.opt_cfg = opt_cfg
        self._tx_factory = tx_factory
        self.mesh = mesh if mesh is not None else make_mesh()
        self.tx: optax.GradientTransformation | None = None
        self._ema = (make_ema(opt_cfg.moving_average_decay)
                     if opt_cfg.moving_average_decay else None)
        self._donate = donate
        # rematerialize the forward in the backward pass — trades FLOPs for
        # HBM, the lever for big global batches at high resolution
        self._remat = remat
        self._act_summaries = activation_summaries
        self._eval_with_ema = eval_with_ema
        self._train_step = None
        self._eval_step = None

    # -- state ------------------------------------------------------------

    def create_state(self, rng: jax.Array, sample_batch: Any,
                     params_override: Any = None,
                     batch_stats_override: Any = None) -> TrainState:
        """Initialize (or adopt) variables and shard them onto the mesh."""
        init_rng, state_rng = jax.random.split(rng)
        # uint8-transfer feeds hand raw-byte samples here too
        sample_batch = device_normalize(jnp.asarray(sample_batch))
        variables = self.model.init(init_rng, sample_batch, train=False)
        params = params_override if params_override is not None \
            else variables["params"]
        batch_stats = batch_stats_override if batch_stats_override is not None \
            else variables.get("batch_stats", {})
        self.tx = (self._tx_factory(params) if self._tx_factory
                   else make_optimizer(self.opt_cfg, params))
        opt_state = self.tx.init(params)
        # EMA starts at the params but must hold *distinct* buffers: the
        # train step donates the state, and donating the same buffer via
        # two tree leaves is a runtime error.
        ema = (jax.tree_util.tree_map(jnp.copy, params)
               if self._ema else None)
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            ema_params=ema,
            rng=state_rng,
        )
        return self.shard_state(state)

    def shard_state(self, state: TrainState) -> TrainState:
        """Lay the state out on the mesh: TP policy for weight-shaped
        leaves (incl. optimizer slots), replication for the rest."""
        shardings = shard_params(state, self.mesh)
        return jax.device_put(state, shardings)

    def resume_optimizer(self, state: TrainState) -> TrainState:
        """Optimizer-swap on resume (reference net_utils.py:203-212):
        rebuild opt state fresh for the current params."""
        self.tx = (self._tx_factory(state.params) if self._tx_factory
                   else make_optimizer(self.opt_cfg, state.params))
        return state.replace(opt_state=self.tx.init(state.params))

    # -- steps -------------------------------------------------------------

    def _apply(self, params: Any, batch_stats: Any, images: jnp.ndarray,
               train: bool, rng: jax.Array | None):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        kwargs: dict[str, Any] = {"train": train}
        if train:
            rngs = {"dropout": rng} if rng is not None else None
            if batch_stats:
                outputs, mutated = self.model.apply(
                    variables, images, mutable=["batch_stats"], rngs=rngs,
                    **kwargs)
                return outputs, mutated["batch_stats"]
            # no mutable collections: apply returns outputs directly
            return self.model.apply(variables, images, rngs=rngs,
                                    **kwargs), batch_stats
        return self.model.apply(variables, images, **kwargs), batch_stats

    def _make_train_step(self):
        tx = self.tx
        assert tx is not None, "create_state first"

        apply = self._apply
        if self._remat:
            apply = jax.checkpoint(
                self._apply, static_argnums=(3,),
                policy=jax.checkpoint_policies.nothing_saveable)

        act_summaries = self._act_summaries
        model = self.model
        takes_step = self._task_takes_step

        def step(state: TrainState, images: jnp.ndarray,
                 labels: jnp.ndarray):
            images = device_normalize(images)
            step_rng, next_rng = jax.random.split(state.rng)
            task_kw = {"step": state.step} if takes_step else {}

            def loss_fn(params):
                if act_summaries:
                    # capture depth-1 module outputs for the activation
                    # histogram/sparsity summaries (slim
                    # train_image_classifier.py:489-503)
                    variables = {"params": params}
                    mutable = ["intermediates"]
                    if state.batch_stats:
                        variables["batch_stats"] = state.batch_stats
                        mutable.append("batch_stats")
                    outputs, mut = model.apply(
                        variables, images, train=True, mutable=mutable,
                        rngs={"dropout": step_rng},
                        capture_intermediates=lambda mdl, m:
                            m == "__call__" and len(mdl.path) == 1)
                    new_stats = mut.get("batch_stats", state.batch_stats)
                    loss, metrics = self.task(outputs, labels, **task_kw)
                    for name, sub in mut.get("intermediates", {}).items():
                        out = sub.get("__call__", (None,))[0]
                        if not hasattr(out, "ndim"):
                            continue
                        act = out.astype(jnp.float32)
                        metrics[f"sparsity/{name}"] = jnp.mean(act <= 0.0)
                        flat = act.ravel()
                        n = min(4096, flat.shape[0])  # bounded sample
                        stride = max(1, flat.shape[0] // n)
                        metrics[f"hist/act_{name}"] = flat[::stride][:n]
                    return loss, (new_stats, metrics)
                outputs, new_stats = apply(
                    params, state.batch_stats, images, True, step_rng)
                loss, metrics = self.task(outputs, labels, **task_kw)
                return loss, (new_stats, metrics)

            grads, (new_stats, metrics) = jax.grad(
                loss_fn, has_aux=True)(state.params)
            # gradient summary (slim's gradient histograms/norms,
            # train_image_classifier.py:489-503) — one fused reduction
            metrics["grad_norm"] = optax.global_norm(grads)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            if self._ema:
                ema = self._ema(state.ema_params, params)
                if isinstance(new_opt, optax.MultiStepsState):
                    # under gradient accumulation the EMA advances only on
                    # micro-steps where MultiSteps applied an update
                    # (mini_step wrapped to 0) — otherwise the decay would
                    # compound k times per real parameter update
                    applied = new_opt.mini_step == 0
                    ema = jax.tree_util.tree_map(
                        lambda e, n: jnp.where(applied, n, e),
                        state.ema_params, ema)
            else:
                ema = state.ema_params
            new_state = state.replace(
                step=state.step + 1, params=params, batch_stats=new_stats,
                opt_state=new_opt, ema_params=ema, rng=next_rng)
            return new_state, metrics

        donate = (0,) if self._donate else ()
        return jax.jit(step, donate_argnums=donate)

    def _make_eval_step(self):
        def step(state: TrainState, images: jnp.ndarray,
                 labels: jnp.ndarray):
            images = device_normalize(images)
            # raw-vs-EMA eval switch (slim evaluates either; reference
            # eval restores EMA when moving_average_decay is set)
            params = (state.ema_params
                      if self._ema and self._eval_with_ema
                      else state.params)
            outputs, _ = self._apply(params, state.batch_stats, images,
                                     False, None)
            _, metrics = self.task(outputs, labels)
            return metrics

        return jax.jit(step)

    def train_step(self, state: TrainState, images: Any,
                   labels: Any) -> tuple[TrainState, Mapping[str, Any]]:
        if self._train_step is None:
            self._train_step = self._make_train_step()
        return self._train_step(state, images, labels)

    def eval_step(self, state: TrainState, images: Any,
                  labels: Any) -> Mapping[str, Any]:
        if self._eval_step is None:
            self._eval_step = self._make_eval_step()
        return self._eval_step(state, images, labels)

    # -- data placement ------------------------------------------------------

    def put_batch(self, images: Any, labels: Any) -> tuple[Any, Any]:
        """Shard a host batch over the data axis.

        Multi-host: each process passes only its local shard of the
        global batch and the pieces are assembled into one global array
        (the per-host sharded-batch feed of SURVEY §2.3 — no host ever
        materializes the full global batch).
        """
        sh = batch_sharding(self.mesh)
        if jax.process_count() > 1:
            return (jax.make_array_from_process_local_data(sh, images),
                    jax.make_array_from_process_local_data(sh, labels))
        return jax.device_put(images, sh), jax.device_put(labels, sh)

    @functools.cached_property
    def batch_sharding(self) -> NamedSharding:
        return batch_sharding(self.mesh)

    @functools.cached_property
    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())
