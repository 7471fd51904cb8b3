"""Adversarial-robustness training (NIPS-2017 adversarial defense).

Capability of reference src/imagenet/imagenet_train_inception_resnet.py:
per-iteration clean + FGSM adversarial steps on a contrast-channel
classifier, with 4 metric streams (train/val × clean/adv, :200-234).
TPU-native: the reference needs a second TF graph + session + cleverhans
for the attack; here FGSM is ``grad`` w.r.t. the input fused into the
same XLA program (train.adversarial), and the 15-channel contrast
transform runs on-device (models.contrast).

The backbone defaults to resnet_v1_50 (fast to compile); pass
``--backbone inception_resnet_v2`` for the reference's classifier, and
``--tf-weights <slim ckpt>`` to warm-start it from released slim weights
(the reference's restore_inception_resnet_variables_from_weight,
net_utils.py:113-134 — name intersection, new scopes keep their init).

The reference generates its adversarial examples with a *separate*
pretrained Inception-v3 (the cleverhans graph at :26-69 — a transfer
attack, not a self-attack). ``--attack-model inception_v3
[--attack-snapshot <snapshot dir>]`` reproduces that: FGSM differentiates
the frozen generator's loss instead of the classifier's own. Without the
flag the attack is white-box against the classifier being trained (the
stronger, TPU-native default). Validation streams run every
``--eval-every`` iters, giving the reference's 4 metric streams
(train/val × clean/adv, :200-234).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tensorflow_yolo2_tpu.config import LRScheduleConfig, OptimizerConfig, Paths
from tensorflow_yolo2_tpu.data.ilsvrc import IlsvrcCls
from tensorflow_yolo2_tpu.entries import common
from tensorflow_yolo2_tpu.models.contrast import ContrastInputModel
from tensorflow_yolo2_tpu.models.registry import get_network
from tensorflow_yolo2_tpu.parallel.mesh import make_mesh_for_batch
from tensorflow_yolo2_tpu.train.adversarial import (
    adversarial_train_step_pair,
    make_jitted_attack,
)
from tensorflow_yolo2_tpu.train.checkpoint import CheckpointManager
from tensorflow_yolo2_tpu.train.metrics import MetricsWriter
from tensorflow_yolo2_tpu.train.trainer import Trainer, softmax_task


def main(argv: list[str] | None = None) -> int:
    p = common.base_parser(__doc__)
    p.add_argument("--backbone", default="resnet_v1_50")
    p.add_argument("--epsilon", type=float, default=8 / 255 * 2)
    p.add_argument("--noise-aug", action="store_true",
                   help="±ε sign-noise augmentation in the host loader")
    p.add_argument("--tf-weights", default=None,
                   help="slim inception_resnet_v2 TF checkpoint to "
                        "warm-start the backbone from (fresh runs only)")
    p.add_argument("--attack-model", default=None,
                   help="separate generator model for the FGSM attack "
                        "(reference: pretrained inception_v3); default "
                        "attacks the classifier being trained")
    p.add_argument("--attack-snapshot", default=None,
                   help="snapshot dir holding the generator's weights "
                        "(merged by name/shape intersection); fresh "
                        "init if absent")
    p.add_argument("--tf-attack-weights", default=None,
                   help="released TF checkpoint to load the attack "
                        "generator from (e.g. the reference's pretrained "
                        "inception_v3, "
                        "imagenet_train_inception_resnet.py:26-69)")
    p.add_argument("--image-size", type=int, default=None,
                   help="input resolution (default: the loader's)")
    p.add_argument("--grouped-opt", action="store_true",
                   help="the reference's grouped two-optimizer recipe "
                        "(imagenet_train_inception_resnet.py:147-159): "
                        "Adam(1e-5) on the backbone stem convs "
                        "(conv1a/conv2a ≙ Conv2d_1a/2a_3x3) + Adam(--lr) "
                        "on the input-transform conv; all else frozen")
    args = p.parse_args(argv)

    from tensorflow_yolo2_tpu.utils.jaxsetup import enable_compilation_cache
    enable_compilation_cache()

    batch_size = args.batch_size or 18      # reference batch (:96)
    iters = args.iters or 10_000
    lr = args.learning_rate or 1e-3
    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32

    size_kw = {"image_size": args.image_size} if args.image_size else {}
    imdb = IlsvrcCls("train", batch_size=batch_size, data_aug=True,
                     random_noise=args.noise_aug, data_path=args.data_path,
                     **size_kw)
    # val split is only listed/cached when evals are enabled (a train-only
    # tree with --eval-every 0 must keep working); a dataset tree without
    # a val split degrades to train-only with a warning — the default
    # --eval-every must not make previously-working trees fail at startup
    val_imdb = None
    if args.eval_every:
        try:
            val_imdb = IlsvrcCls("val", batch_size=batch_size,
                                 data_aug=False, data_path=args.data_path,
                                 **size_kw)
        except (FileNotFoundError, OSError) as e:
            print(f"WARNING: no usable val split ({e}) — "
                  "training without validation streams")
    try:
        backbone = get_network(args.backbone, num_classes=imdb.num_class,
                               dtype=dtype, global_pool=True)
    except TypeError:  # zoo nets (inception family) always global-pool
        backbone = get_network(args.backbone, num_classes=imdb.num_class,
                               dtype=dtype)
    model = ContrastInputModel(backbone=backbone, dtype=dtype)
    tx_factory = None
    if args.grouped_opt:
        from tensorflow_yolo2_tpu.train.optimizers import (
            make_grouped_optimizer,
        )
        stem_cfg = OptimizerConfig(
            name="adam", schedule=LRScheduleConfig(learning_rate=1e-5))
        trf_cfg = OptimizerConfig(
            name="adam", schedule=LRScheduleConfig(learning_rate=lr))
        tx_factory = lambda params: make_grouped_optimizer(  # noqa: E731
            [(("backbone/conv1a", "backbone/conv2a"), stem_cfg),
             (("input_transform",), trf_cfg)], params)
    trainer = Trainer(
        model, softmax_task(),
        OptimizerConfig(name="momentum", momentum=0.9,
                        schedule=LRScheduleConfig(learning_rate=lr)),
        mesh=make_mesh_for_batch(batch_size), tx_factory=tx_factory)
    paths = Paths()
    name = f"{args.backbone}_adv"
    mgr = CheckpointManager(name, imdb.name, save_by_epoch=False, paths=paths)
    # 4 metric streams: train/val × clean/adv (reference's 4 TB writers,
    # imagenet_train_inception_resnet.py:200-204)
    tb_train, tb_val = paths.tb_dirs(name, imdb.name)
    writer = MetricsWriter(tb_train)
    val_writer = MetricsWriter(tb_val)

    sample, _ = imdb.get()
    state, start = common.bootstrap_state(
        trainer, mgr, jax.random.PRNGKey(args.seed), sample[:1])

    if args.tf_weights and start == 0:
        # warm-start the wrapped backbone from slim weights by name/shape
        # intersection; the input-transform conv and any reshaped logits
        # keep their fresh init (reference exclusion semantics)
        from tensorflow_yolo2_tpu.compat.tf_import import (
            import_inception_resnet_v2_checkpoint,
        )
        from tensorflow_yolo2_tpu.train.checkpoint import merge_pytrees
        bk_params, bk_stats = import_inception_resnet_v2_checkpoint(
            args.tf_weights)
        params, n_p = merge_pytrees(state.params,
                                    {"backbone": bk_params})
        stats, n_s = merge_pytrees(state.batch_stats,
                                   {"backbone": bk_stats})
        state = state.replace(params=params, batch_stats=stats)
        print(f"Warm-started {n_p} param / {n_s} stat tensors "
              f"from {args.tf_weights}")

    if args.attack_model:
        # transfer attack: a separate frozen generator model crafts the
        # adversarial examples (the reference's pretrained inception_v3
        # cleverhans graph, :26-69)
        gen = get_network(args.attack_model, num_classes=imdb.num_class,
                          dtype=dtype)
        gvars = gen.init(jax.random.PRNGKey(args.seed + 1), sample[:1],
                         train=False)
        gen_params = gvars["params"]
        gen_stats = gvars.get("batch_stats", {})
        if args.tf_attack_weights:
            # the reference's transfer attack warm-starts the generator
            # from *released TF weights* (inception_v3.ckpt); merge by
            # name/shape intersection so a reshaped logits head keeps
            # its fresh init
            from tensorflow_yolo2_tpu.compat.tf_import import (
                import_checkpoint_for,
            )
            from tensorflow_yolo2_tpu.train.checkpoint import merge_pytrees
            tp, ts = import_checkpoint_for(args.attack_model,
                                           args.tf_attack_weights)
            gen_params, n_p = merge_pytrees(gen_params, tp)
            gen_stats, n_s = merge_pytrees(gen_stats, ts)
            print(f"Attack generator {args.attack_model}: imported "
                  f"{n_p} param / {n_s} stat tensors from "
                  f"{args.tf_attack_weights}")
        if args.attack_snapshot:
            import orbax.checkpoint as ocp

            from tensorflow_yolo2_tpu.train.checkpoint import merge_pytrees
            raw = ocp.StandardCheckpointer().restore(args.attack_snapshot)
            gen_params, n_p = merge_pytrees(
                gen_params, raw.get("params", raw))
            n_s = 0
            if gen_stats and isinstance(raw, dict) and \
                    raw.get("batch_stats"):
                gen_stats, n_s = merge_pytrees(gen_stats,
                                               raw["batch_stats"])
            print(f"Attack generator {args.attack_model}: restored "
                  f"{n_p} param / {n_s} stat tensors from "
                  f"{args.attack_snapshot}")
        gen_attack = make_jitted_attack(gen, args.epsilon)

        def attack_fn(params, batch_stats, images, labels,
                      _gp=gen_params, _gs=gen_stats):
            del params, batch_stats  # generator is frozen
            return gen_attack(_gp, _gs, images, labels)
    else:
        attack_fn = make_jitted_attack(model, args.epsilon)

    from tensorflow_yolo2_tpu.data.prefetch import PrefetchLoader

    save_every = args.save_every or max(iters // 4, 1)
    last_saved = start
    # host decode/augment runs in a worker pool so the clean+adv step
    # pair never stalls on imdb.get() (the reference's #1 perf bug)
    with PrefetchLoader(imdb.get, num_workers=args.num_workers,
                        thread_safe=True) as loader:
        for i in range(start + 1, start + iters + 1):
            images, labels = trainer.put_batch(*next(loader))
            state, clean_m, adv_m = adversarial_train_step_pair(
                trainer, state, images, labels, epsilon=args.epsilon,
                attack_fn=attack_fn)
            if i % args.log_every == 0:
                vals = {f"clean/{k}": float(np.asarray(v))
                        for k, v in clean_m.items()}
                vals.update({f"adv/{k}": float(np.asarray(v))
                             for k, v in adv_m.items()})
                writer.scalars(i, vals)
                print(f"iter {i}: " + ", ".join(
                    f"{k}: {v:.4f}" for k, v in vals.items()))
            if val_imdb is not None and i % args.eval_every == 0:
                vx, vy = trainer.put_batch(*val_imdb.get())
                vm = trainer.eval_step(state, vx, vy)
                v_adv = attack_fn(state.params, state.batch_stats, vx, vy)
                vam = trainer.eval_step(state, v_adv, vy)
                vvals = {f"clean/{k}": float(np.asarray(v))
                         for k, v in vm.items()}
                vvals.update({f"adv/{k}": float(np.asarray(v))
                              for k, v in vam.items()})
                val_writer.scalars(i, vvals)
                print(f"iter {i} [val]: " + ", ".join(
                    f"{k}: {v:.4f}" for k, v in vvals.items()))
            if i % save_every == 0:
                mgr.save(i, jax.device_get(state))
                last_saved = i
    if iters > 0 and last_saved != start + iters:
        mgr.save(start + iters, jax.device_get(state))
        print(f"Saved final snapshot at iter {start + iters}")
    writer.close()
    val_writer.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
