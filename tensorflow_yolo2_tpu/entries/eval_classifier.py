"""Unified classifier evaluation — streaming accuracy + recall@5.

Capability of reference src/slim_dir/eval_image_classifier.py:150-187
(slim streaming metrics over the eval split of any model × dataset).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tensorflow_yolo2_tpu.config import Paths
from tensorflow_yolo2_tpu.entries import common
from tensorflow_yolo2_tpu.entries.datasets import get_dataset
from tensorflow_yolo2_tpu.models.registry import get_network
from tensorflow_yolo2_tpu.parallel.mesh import make_mesh_for_batch
from tensorflow_yolo2_tpu.train.checkpoint import CheckpointManager
from tensorflow_yolo2_tpu.train.trainer import Trainer, softmax_task


def main(argv: list[str] | None = None) -> int:
    p = common.base_parser(__doc__)
    p.add_argument("--model-name", default="darknet19")
    p.add_argument("--dataset-name", default="flowers")
    p.add_argument("--dataset-split-name", default="validation")
    p.add_argument("--max-batches", type=int, default=None)
    p.add_argument("--image-size", type=int, default=None,
                   help="input resolution for datasets that resize")
    p.add_argument("--preprocessing-name", default=None,
                   help="factory preprocessing instead of the dataset's "
                        "native convention (slim's preprocessing_name)")
    p.add_argument("--labels-offset", type=int, default=0,
                   help="subtract this offset from dataset labels and "
                        "shrink the logits layer to num_classes-offset "
                        "(slim's labels_offset flag, "
                        "eval_image_classifier.py:62,104,116)")
    p.add_argument("--use-ema", action="store_true",
                   help="evaluate the EMA weights from the snapshot "
                        "(reference eval_image_classifier's "
                        "moving_average_decay variable restore)")
    args = p.parse_args(argv)

    from tensorflow_yolo2_tpu.utils.jaxsetup import enable_compilation_cache
    enable_compilation_cache()

    batch_size = args.batch_size or 64
    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    size_kw = {"image_size": args.image_size} if args.image_size else {}
    imdb = get_dataset(args.dataset_name, args.dataset_split_name,
                       batch_size=batch_size, data_path=args.data_path,
                       preprocessing_name=args.preprocessing_name, **size_kw)
    if not 0 <= args.labels_offset < imdb.num_class:
        p.error(f"--labels-offset {args.labels_offset} out of range for "
                f"{imdb.num_class} classes")
    model = get_network(args.model_name,
                        num_classes=imdb.num_class - args.labels_offset,
                        dtype=dtype)
    # --use-ema: give the restore target an ema_params slot so the EMA
    # weights in the snapshot are restored (any decay value works — only
    # the tree structure matters here)
    from tensorflow_yolo2_tpu.config import OptimizerConfig
    opt_cfg = OptimizerConfig(
        moving_average_decay=0.999 if args.use_ema else None)
    trainer = Trainer(model, softmax_task(), opt_cfg,
                      mesh=make_mesh_for_batch(batch_size))
    # trainers snapshot under either the iter or the epoch namespace
    # (imagenet entries use train_epoch_N) — evaluate whichever exists
    mgr = CheckpointManager(args.model_name, imdb.name, paths=Paths())
    if mgr.latest_step() is None:
        epoch_mgr = CheckpointManager(args.model_name, imdb.name,
                                      save_by_epoch=True, paths=Paths())
        if epoch_mgr.latest_step() is not None:
            mgr = epoch_mgr
    get_batch = getattr(imdb, "get_val", imdb.get)
    if args.labels_offset:
        def get_batch(_get=get_batch, _off=args.labels_offset):
            images, labels = _get()
            if (labels < _off).any():
                # fail loudly: a shifted label < 0 would wrap to the last
                # class in argmax-accuracy/CE (silently diverging from
                # slim's one_hot(-1)=zeros zero-loss behavior)
                raise ValueError(
                    f"--labels-offset {_off}: batch contains labels below "
                    f"the offset (min {int(labels.min())}); this dataset "
                    "has no background slot to strip")
            return images, labels - _off
    sample, _ = get_batch()
    info: dict = {}
    if args.tf_checkpoint:
        # slim's eval_image_classifier evaluates a released TF checkpoint
        # directly (--checkpoint_path, eval_image_classifier.py:40-43) —
        # import it and score exactly those weights, no snapshot lookup
        from tensorflow_yolo2_tpu.compat.tf_import import (
            import_checkpoint_for,
        )
        from tensorflow_yolo2_tpu.train.checkpoint import merge_pytrees
        tf_params, tf_stats = import_checkpoint_for(args.model_name,
                                                    args.tf_checkpoint)
        state = trainer.create_state(jax.random.PRNGKey(0), sample[:1])
        params, n = merge_pytrees(state.params, tf_params)
        stats, m = merge_pytrees(state.batch_stats, tf_stats)
        state = trainer.shard_state(
            state.replace(params=params, batch_stats=stats))
        step = 0
        info["ema_restored"] = 0  # TF ckpts carry no EMA slot → raw params
        print(f"Imported {n} param + {m} batch-stat tensors from TF "
              f"checkpoint {args.tf_checkpoint}")
    else:
        state, step = common.bootstrap_state(
            trainer, mgr, jax.random.PRNGKey(0), sample[:1], info=info)
        if step == 0 and mgr.latest_step() is None:
            print("WARNING: no snapshot found under "
                  f"{mgr.dir} — evaluating freshly-initialized weights")
    use_ema = args.use_ema and state.ema_params is not None
    if use_ema and info.get("ema_restored") == 0:
        # no EMA tensors came from the restore (snapshot trained without
        # EMA, or a TF checkpoint import — TF ckpts carry no EMA slot):
        # the ema slot still holds its fresh-init value — evaluating it
        # would silently score random weights (reference evals the raw
        # variables in that case)
        print("WARNING: restore carried no EMA tensors — "
              "falling back to the raw parameters")
        use_ema = False
    eval_params = state.ema_params if use_ema else state.params

    @jax.jit
    def topk_correct(state_params, batch_stats, images, labels):
        variables = {"params": state_params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        logits = model.apply(variables, images, train=False)
        top1 = (jnp.argmax(logits, -1) == labels).sum()
        k = min(5, logits.shape[-1])
        topk = jax.lax.top_k(logits, k)[1]
        top5 = (topk == labels[:, None]).any(-1).sum()
        return top1, top5

    # one pass over the split actually being served: total_batch counts
    # the TRAIN list; when get_val serves a separate val list, size the
    # default pass from that list instead
    val_list = getattr(imdb, "val_list", None)
    split_batches = (max(1, len(val_list) // batch_size) if val_list
                     else imdb.total_batch)
    n_batches = args.max_batches or split_batches
    c1 = c5 = total = 0
    for _ in range(n_batches):
        images, labels = trainer.put_batch(*get_batch())
        t1, t5 = topk_correct(eval_params, state.batch_stats, images,
                              labels)
        c1 += int(t1)
        c5 += int(t5)
        total += batch_size
    print(f"eval at step {step}: accuracy {c1 / total:.4f}, "
          f"recall@5 {c5 / total:.4f} over {total} images")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
