"""Unified flag-driven classifier trainer — the slim tier.

Capability of reference src/slim_dir/train_image_classifier.py (the ~35
tf.app.flags surface, :57-370): any registered model × any dataset ×
{adadelta,adagrad,adam,ftrl,momentum,sgd,rmsprop} × LR schedule
{fixed,exponential,polynomial(,cosine)} × EMA × fine-tune scopes ×
warm-start-with-excluded-scopes, over a data(+model)-parallel mesh. The
reference's DeploymentConfig / clones / PS plumbing (:400-544) is the
mesh + GSPMD step (SURVEY §2.3); its input pipeline (parallel readers +
batch threads + prefetch queue, :437-458) is the PrefetchLoader + device
double buffer.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from tensorflow_yolo2_tpu.config import (
    LRScheduleConfig,
    OptimizerConfig,
    Paths,
)
from tensorflow_yolo2_tpu.entries import common
from tensorflow_yolo2_tpu.entries.datasets import get_dataset
from tensorflow_yolo2_tpu.models.registry import get_network
from tensorflow_yolo2_tpu.parallel.mesh import (
    MeshConfig,
    make_mesh,
    make_mesh_for_batch,
)
from tensorflow_yolo2_tpu.train.checkpoint import CheckpointManager
from tensorflow_yolo2_tpu.train.metrics import MetricsWriter
from tensorflow_yolo2_tpu.train.trainer import Trainer, softmax_task


def add_slim_flags(p) -> None:
    p.add_argument("--model-name", default="darknet19")
    p.add_argument("--dataset-name", default="flowers")
    p.add_argument("--dataset-split-name", default="train")
    p.add_argument("--optimizer", default="rmsprop",
                   choices=["adadelta", "adagrad", "adam", "adamw", "ftrl",
                            "momentum", "sgd", "rmsprop", "lamb"])
    p.add_argument("--learning-rate-decay-type", default="exponential",
                   choices=["fixed", "exponential", "polynomial", "cosine"])
    p.add_argument("--learning-rate-decay-factor", type=float, default=0.94)
    p.add_argument("--decay-steps", type=int, default=10_000)
    p.add_argument("--end-learning-rate", type=float, default=1e-4)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--rmsprop-decay", type=float, default=0.9)
    p.add_argument("--opt-epsilon", type=float, default=1e-8)
    p.add_argument("--weight-decay", type=float, default=4e-5)
    p.add_argument("--moving-average-decay", type=float, default=None)
    p.add_argument("--trainable-scopes", default=None,
                   help="comma-separated scope prefixes to train")
    p.add_argument("--checkpoint-path", default=None,
                   help="warm-start snapshot dir")
    p.add_argument("--checkpoint-exclude-scopes", default=None)
    p.add_argument("--clip-gradient-norm", type=float, default=None)
    p.add_argument("--num-clones", type=int, default=None,
                   help="data-parallel width (defaults to all devices)")
    p.add_argument("--model-parallel", type=int, default=1)
    p.add_argument("--warmup-steps", type=int, default=0)
    p.add_argument("--save-interval-secs", type=float, default=0,
                   help="additionally snapshot on a wall-clock cadence "
                        "(slim save_interval_secs)")
    p.add_argument("--grad-accum-steps", type=int, default=1,
                   help="accumulate gradients over k micro-batches "
                        "(effective batch = k x batch-size)")
    p.add_argument("--image-size", type=int, default=None,
                   help="input resolution for datasets that resize "
                        "(slim's train_image_size flag)")
    p.add_argument("--preprocessing-name", default=None,
                   help="factory preprocessing to use instead of the "
                        "dataset's native convention (slim's "
                        "preprocessing_name flag: cifarnet/lenet/vgg/"
                        "inception/... — data.preprocessing)")
    p.add_argument("--label-smoothing", type=float, default=0.0,
                   help="blend one-hot targets toward uniform by this "
                        "amount in the CE loss (slim's label_smoothing "
                        "flag, train_image_classifier.py:142,474-477)")
    p.add_argument("--labels-offset", type=int, default=0,
                   help="subtract this offset from dataset labels and "
                        "shrink the logits layer to num_classes-offset "
                        "(slim's labels_offset flag for the vgg/resnet "
                        "no-background-class convention, "
                        "train_image_classifier.py:178,422,444)")
    p.add_argument("--aux-loss", action="store_true",
                   help="train with the model's auxiliary classifier "
                        "head(s) at 0.4 loss weight (inception v1/v3/v4; "
                        "slim's aux_logits + weighted aux loss)")
    p.add_argument("--activation-summaries", action="store_true",
                   help="per-module activation histograms + sparsity "
                        "scalars in the metrics stream (slim "
                        "train_image_classifier.py:489-503)")


def main(argv: list[str] | None = None) -> int:
    p = common.base_parser(__doc__)
    add_slim_flags(p)
    args = p.parse_args(argv)

    from tensorflow_yolo2_tpu.utils.jaxsetup import enable_compilation_cache
    enable_compilation_cache()

    batch_size = args.batch_size or 32
    iters = args.iters or 1000
    lr = args.learning_rate or 0.01
    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32

    size_kw = {"image_size": args.image_size} if args.image_size else {}
    imdb = get_dataset(args.dataset_name, args.dataset_split_name,
                       batch_size=batch_size, data_path=args.data_path,
                       seed=args.seed,
                       preprocessing_name=args.preprocessing_name, **size_kw)
    if not 0 <= args.labels_offset < imdb.num_class:
        p.error(f"--labels-offset {args.labels_offset} out of range for "
                f"{imdb.num_class} classes")
    net_kw = {"aux_logits": True} if args.aux_loss else {}
    try:
        model = get_network(args.model_name,
                            num_classes=imdb.num_class - args.labels_offset,
                            dtype=dtype, **net_kw)
    except TypeError:
        p.error(f"--aux-loss: {args.model_name} has no auxiliary "
                "classifier head (inception_v1/v3/v4 do)")

    opt_cfg = OptimizerConfig(
        name=args.optimizer, momentum=args.momentum,
        epsilon=args.opt_epsilon, rmsprop_decay=args.rmsprop_decay,
        weight_decay=args.weight_decay,
        grad_clip_norm=args.clip_gradient_norm,
        moving_average_decay=args.moving_average_decay,
        grad_accum_steps=args.grad_accum_steps,
        trainable_scopes=tuple(
            s.strip() for s in args.trainable_scopes.split(","))
        if args.trainable_scopes else (),
        schedule=LRScheduleConfig(
            kind=args.learning_rate_decay_type, learning_rate=lr,
            decay_factor=args.learning_rate_decay_factor,
            decay_steps=args.decay_steps,
            end_learning_rate=args.end_learning_rate,
            warmup_steps=args.warmup_steps))

    if args.num_clones is not None:
        mesh = make_mesh(MeshConfig(data=args.num_clones,
                                    model=args.model_parallel))
    else:
        mesh = make_mesh_for_batch(batch_size, model=args.model_parallel)
    trainer = Trainer(
        model, softmax_task(label_smoothing=args.label_smoothing),
        opt_cfg, mesh=mesh,
        activation_summaries=args.activation_summaries)
    paths = Paths()
    mgr = CheckpointManager(args.model_name, imdb.name, paths=paths)
    writer = MetricsWriter(
        paths.tb_dirs(args.model_name, imdb.name, val=False)[0])

    sample, _ = imdb.get()
    exclude = (tuple(s.strip()
                     for s in args.checkpoint_exclude_scopes.split(","))
               if args.checkpoint_exclude_scopes else ())
    # slim's _get_init_fn accepts released TF zoo checkpoints directly
    # (train_image_classifier.py:372-398); a TF ckpt is a file prefix
    # (path or path.index), a framework snapshot is an Orbax directory
    warm_dir, warm_tree = args.checkpoint_path, None
    if warm_dir and not os.path.isdir(warm_dir):
        from tensorflow_yolo2_tpu.compat.tf_import import (
            import_checkpoint_for,
        )
        warm_tree = import_checkpoint_for(args.model_name, warm_dir)
        print(f"Imported TF checkpoint {warm_dir}")
        warm_dir = None
    state, start = common.bootstrap_state(
        trainer, mgr, jax.random.PRNGKey(args.seed), sample[:1],
        warm_start_dir=warm_dir, warm_start_exclude=exclude,
        warm_start_tree=warm_tree)

    get_batch = imdb.get
    if args.labels_offset:
        def get_batch(_get=imdb.get, _off=args.labels_offset):
            images, labels = _get()
            if (labels < _off).any():
                # fail loudly: a shifted label < 0 would wrap to the last
                # class in the integer-label CE (silently diverging from
                # slim's one_hot(-1)=zeros zero-loss behavior)
                raise ValueError(
                    f"--labels-offset {_off}: batch contains labels below "
                    f"the offset (min {int(labels.min())}); this dataset "
                    "has no background slot to strip")
            return images, labels - _off

    state = common.run_train_loop(
        trainer, state, get_batch, mgr, writer, start_iter=start,
        num_iters=iters, log_every=args.log_every,
        save_every=args.save_every or max(iters // 4, 1),
        num_workers=args.num_workers,
        save_interval_secs=args.save_interval_secs,
        trace_dir=args.profile_dir)
    writer.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
