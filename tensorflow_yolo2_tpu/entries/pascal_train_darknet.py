"""Darknet19 YOLO detection training on Pascal VOC2007 (driver config #3).

Capability of reference src/pascal/pascal_train_darknet.py: Darknet19
core + detection head + YOLO grid loss, Adam (TF default 1e-3), batch 24,
80k added iterations, snapshot every 40k, resume-or-warm-start from the
ImageNet classifier run (net_utils.py:64-110). TPU-native: one jitted
step (fwd+bwd+update fused by XLA), data sharded over the mesh, host
prefetch, per-term loss metrics.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from tensorflow_yolo2_tpu.config import (
    LRScheduleConfig,
    OptimizerConfig,
    Paths,
    YoloConfig,
)
from tensorflow_yolo2_tpu.data.voc import PascalVOC
from tensorflow_yolo2_tpu.entries import common
from tensorflow_yolo2_tpu.models.darknet import Darknet19Detector
from tensorflow_yolo2_tpu.parallel.mesh import make_mesh_for_batch
from tensorflow_yolo2_tpu.train.checkpoint import CheckpointManager
from tensorflow_yolo2_tpu.train.metrics import MetricsWriter
from tensorflow_yolo2_tpu.train.trainer import Trainer, yolo_task


def run_spatial_training(args, yolo, model, imdb, mgr, writer, sched,
                         iters: int, save_every: int) -> int:
    """Spatially-sharded training loop (``--spatial N``): the detector
    runs H-sharded over an N-device mesh with per-layer halo exchange
    and live psum-synced BatchNorm
    (parallel.spatial.spatial_yolo_train_fn — SURVEY §5.7), wrapped in
    one jitted grad+Adam step. Snapshots carry the same
    params/batch_stats keys as the Trainer's, so detect/eval serve them
    unchanged (and a spatial run can resume params/stats from a normal
    run's snapshot, re-initializing the optimizer)."""
    import numpy as np
    import optax

    from jax.sharding import Mesh

    from tensorflow_yolo2_tpu.parallel.spatial import (
        spatial_yolo_train_fn,
        spatial_yolo_v2_train_fn,
    )
    from tensorflow_yolo2_tpu.train.checkpoint import (
        merge_pytrees,
        warm_start_params,
    )
    from tensorflow_yolo2_tpu.train.optimizers import make_schedule
    from tensorflow_yolo2_tpu.utils.timer import Timer

    n = args.spatial
    devices = jax.devices()
    if len(devices) < n:
        raise ValueError(
            f"--spatial {n} needs {n} local devices, have "
            f"{len(devices)} (on CPU: "
            "XLA_FLAGS=--xla_force_host_platform_device_count=N)")
    mesh = Mesh(np.asarray(devices[:n]), ("spatial",))
    if args.v2:
        # anchor loss: the ignore term's global GT pool rides one
        # all_gather of the label boxes (spatial_yolo_v2_train_fn);
        # --passthrough selects the reorg head (shard-local s2d)
        step_fn = spatial_yolo_v2_train_fn(
            mesh, yolo, axis="spatial", bn_momentum=args.bn_momentum,
            downsample=args.downsample,
            head="v2p" if args.passthrough else "v2")
    else:
        step_fn = spatial_yolo_train_fn(mesh, yolo, axis="spatial",
                                        bn_on_output=True,
                                        bn_momentum=args.bn_momentum,
                                        downsample=args.downsample)

    sample, _ = imdb.get()
    variables = model.init(jax.random.PRNGKey(args.seed),
                           jnp.asarray(sample[:1], jnp.float32),
                           train=False)
    params, stats = variables["params"], variables["batch_stats"]
    parts = []
    if args.grad_clip:
        parts.append(optax.clip_by_global_norm(args.grad_clip))
    parts.append(optax.adam(make_schedule(sched), eps=1e-8))
    tx = optax.chain(*parts) if len(parts) > 1 else parts[0]
    opt_state = tx.init(params)

    start = 0
    if mgr.latest_step() is not None:
        target = {"params": params, "batch_stats": stats,
                  "opt_state": opt_state}
        try:
            restored, start = mgr.restore(target)
            params = restored["params"]
            stats = restored["batch_stats"]
            opt_state = restored["opt_state"]
        except ValueError:
            # snapshot from the normal (GSPMD) trainer: intersect
            # params/stats, re-init the optimizer (the reference's
            # optimizer-swap path, net_utils.py:203-212)
            raw = mgr.restore_raw()
            params, _ = merge_pytrees(params, raw.get("params"))
            stats, _ = merge_pytrees(stats, raw.get("batch_stats", {}))
            start = mgr.latest_step()
            print("Snapshot optimizer state does not match the spatial "
                  "trainer — restored params/stats, optimizer "
                  "re-initialized")
        print(f"Restored snapshot at iter {start} from {mgr.dir}")
    else:
        imagenet_mgr = CheckpointManager("darknet19", "ilsvrc_2017_cls",
                                         save_by_epoch=True,
                                         paths=mgr.paths)
        warm = imagenet_mgr.latest_path()
        if warm:
            params, n_warm = warm_start_params(params, warm)
            print(f"Warm-started {n_warm} tensors from {warm}")

    # replicate the train state over the spatial mesh (images/labels are
    # H-sharded inside step_fn; params/stats/optimizer are global)
    from jax.sharding import NamedSharding, PartitionSpec as P
    rep = NamedSharding(mesh, P())
    params, stats, opt_state = jax.device_put((params, stats, opt_state),
                                              rep)

    @jax.jit
    def train_step(params, stats, opt_state, images, labels, step):
        if args.v2:
            fwd = lambda p: step_fn(p, stats, images, labels, step)
        else:
            fwd = lambda p: step_fn(p, stats, images, labels)
        (loss, new_stats), grads = jax.value_and_grad(
            fwd, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss

    timer = Timer()
    last_saved = start
    snap = lambda: jax.device_get({"params": params, "batch_stats": stats,
                                   "opt_state": opt_state})
    for i in range(start + 1, start + iters + 1):
        images, labels = imdb.get()
        images = jnp.asarray(images, jnp.float32)
        labels = jnp.asarray(labels, jnp.float32)
        timer.tic()
        # step drives the v2 burn-in prior schedule (optax count before
        # this update = i - 1 - the v1 path ignores it)
        params, stats, opt_state, loss = train_step(
            params, stats, opt_state, images, labels,
            jnp.asarray(i - 1, jnp.int32))
        timer.toc()
        if i % args.log_every == 0:
            lv = float(loss)
            writer.scalars(i, {"loss": lv})
            print(f"iter {i}: loss: {lv:.4f}, "
                  f"avg step {timer.average_time * 1000:.1f} ms")
        if save_every and i % save_every == 0:
            mgr.save(i, snap())
            last_saved = i
            print(f"Saved snapshot at iter {i} (iter {i})")
    final = start + iters
    if iters > 0 and last_saved != final:
        mgr.save(final, snap())
        print(f"Saved final snapshot at iter {final} (iter {final})")
    return 0


def main(argv: list[str] | None = None) -> int:
    p = common.base_parser(__doc__)
    p.add_argument("--image-set", default="trainval")
    p.add_argument("--flipped", action="store_true")
    p.add_argument("--v2", action="store_true",
                   help="anchor-based YOLOv2 head + loss (per-slot "
                        "classes, 5 classic VOC anchors) instead of the "
                        "reference's YOLOv1 grid head")
    p.add_argument("--passthrough", action="store_true",
                   help="with --v2: the full YOLOv2 architecture — the "
                        "reorg/passthrough head routing the H/16 512-ch "
                        "feature map into the detection head (YOLO9000 "
                        "fine-grained features)")
    p.add_argument("--anchors", default="classic",
                   choices=["classic", "kmeans"],
                   help="with --v2: anchor priors. 'classic' = the "
                        "YOLO9000 paper's published VOC clusters; "
                        "'kmeans' = dimension clusters computed on THIS "
                        "training set's boxes by IoU k-means "
                        "(data.anchors.iou_kmeans — the paper's actual "
                        "recipe). Priors persist to anchors.json in the "
                        "snapshot dir so detect/eval serve with them")
    p.add_argument("--num-anchors", type=int, default=5,
                   help="k for --anchors kmeans (B follows it)")
    p.add_argument("--multiscale", default=None,
                   help="comma-separated input sizes (multiples of 32) to "
                        "cycle every 10 batches during --v2 training "
                        "(YOLO9000 multiscale; TPU-friendly static-shape "
                        "bucketing — one compiled step per size)")
    p.add_argument("--downsample", default="pool",
                   choices=["pool", "stride"],
                   help="'stride' = pool-free variant: downsampling via "
                        "stride-2 convs instead of maxpools — removes the "
                        "SelectAndScatter pool gradients (~23%% of the "
                        "448² step). NOT reference parity; snapshots go "
                        "to separate <net>_sd dirs")
    p.add_argument("--uint8-transfer", action="store_true",
                   help="ship raw uint8 batches to the device and "
                        "normalize on-chip (4x fewer host↔device bytes; "
                        "same pixel values — the training twin of the "
                        "uint8 serving path)")
    p.add_argument("--bn-momentum", type=float, default=0.99,
                   help="BatchNorm moving-stat momentum (reference "
                        "tf.layers default 0.99; lower it for short "
                        "runs so eval-time folded stats keep up)")
    p.add_argument("--grad-clip", type=float, default=None,
                   metavar="NORM",
                   help="global-norm gradient clipping (darknet's own "
                        "recipes clip; the anchor loss can spike late "
                        "in training without it)")
    p.add_argument("--lr-decay", default="fixed",
                   choices=["fixed", "cosine", "exponential"],
                   help="LR schedule over --iters (cosine decays toward "
                        "the floor across the run; exponential uses "
                        "--lr-decay-factor per iters/4 steps). Under "
                        "snapshot-resume the schedule re-anchors at the "
                        "resumed step, so each staged invocation decays "
                        "over ITS OWN --iters delta. The reference's "
                        "Adam is fixed-LR — the default")
    p.add_argument("--lr-decay-factor", type=float, default=0.5)
    p.add_argument("--spatial", type=int, default=0, metavar="N",
                   help="train with the H dimension sharded over N "
                        "devices via per-layer halo exchange and live "
                        "psum-synced BatchNorm (parallel.spatial."
                        "spatial_yolo_train_fn) — resolutions whose "
                        "activations outgrow one chip. Trains the v1 "
                        "grid head, the plain --v2 anchor head (the "
                        "ignore term's global GT pool rides one "
                        "all_gather of the label boxes) or the full "
                        "--v2 --passthrough reorg head (shard-local "
                        "space-to-depth); composes with --downsample "
                        "stride. Needs N "
                        "local devices (CPU: XLA_FLAGS=--xla_force_"
                        "host_platform_device_count=N)")
    args = p.parse_args(argv)
    if args.spatial and args.spatial < 2:
        p.error("--spatial N needs N >= 2 (1 shard is the normal path)")
    if args.spatial and (args.multiscale or args.uint8_transfer):
        p.error("--spatial composes with --downsample/--grad-clip/"
                "--lr-decay but not --multiscale/--uint8-transfer")
    if args.multiscale and not args.v2:
        p.error("--multiscale requires --v2 (the anchor loss is "
                "grid-size polymorphic; the v1 grid loss is fixed S=7)")
    if args.passthrough and not args.v2:
        p.error("--passthrough is the YOLOv2 reorg head; it requires --v2")

    from tensorflow_yolo2_tpu.utils.jaxsetup import enable_compilation_cache
    enable_compilation_cache()

    batch_size = args.batch_size or 24      # reference :30
    iters = args.iters or 80_000            # reference :96
    lr = args.learning_rate or 1e-3         # TF AdamOptimizer default (:51)
    save_every = args.save_every or 40_000  # reference :111
    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32

    if args.anchors == "kmeans" and not args.v2:
        p.error("--anchors kmeans requires --v2 (the v1 head has no "
                "anchor priors — SURVEY caveat)")
    if args.v2:
        from tensorflow_yolo2_tpu.config import yolo_v2_config
        custom_anchors = None
        if args.anchors == "kmeans":
            # YOLO9000 dimension clusters: k-means with IoU distance on
            # this training set's box shapes (the paper's prior recipe)
            from tensorflow_yolo2_tpu.data.anchors import (
                collect_voc_wh_cells,
                iou_kmeans,
            )
            voc_path = args.data_path or os.path.join(
                Paths().pascal, "VOC2007")
            base = yolo_v2_config()
            wh = collect_voc_wh_cells(voc_path, args.image_set, base.S,
                                      base.image_size)
            custom_anchors, avg_iou = iou_kmeans(wh, args.num_anchors)
            print(f"dimension clusters (k={args.num_anchors}, "
                  f"{len(wh)} boxes, avg best-IoU {avg_iou:.3f}): " +
                  ", ".join(f"({w:.2f},{h:.2f})"
                            for w, h in custom_anchors))
        yolo = yolo_v2_config(anchors=custom_anchors)
        from tensorflow_yolo2_tpu.losses.yolo_v2 import yolo_v2_task
        task = yolo_v2_task(yolo)
        if args.passthrough:
            from tensorflow_yolo2_tpu.models.darknet import (
                Darknet19DetectorV2,
            )
            model = Darknet19DetectorV2(output_channels=yolo.cell_channels,
                                        dtype=dtype,
                                        bn_momentum=args.bn_momentum,
                                        downsample=args.downsample)
            net_name = "darknet19_v2p"
        else:
            # the anchor head wants a linear output (no BN+leaky quirk)
            model = Darknet19Detector(output_channels=yolo.cell_channels,
                                      bn_on_output=False, dtype=dtype,
                                      bn_momentum=args.bn_momentum,
                                      downsample=args.downsample)
            net_name = "darknet19_v2"
    else:
        yolo = YoloConfig()
        task = yolo_task(yolo, histograms=True)
        model = Darknet19Detector(output_channels=yolo.cell_channels,
                                  dtype=dtype,
                                  bn_momentum=args.bn_momentum,
                                  downsample=args.downsample)
        net_name = "darknet19"
    if args.downsample == "stride":
        net_name += "_sd"  # keep non-parity runs out of the parity dirs
    imdb = PascalVOC(args.image_set, batch_size=batch_size, yolo=yolo,
                     flipped=args.flipped, data_path=args.data_path,
                     uint8=args.uint8_transfer)
    get_batch = imdb.get
    if args.multiscale:
        # YOLO9000 multiscale: every 10 batches hop to a random size from
        # the list. Each size is a static-shape bucket — its own label
        # grid (S = size/32) and its own compiled train step; the anchor
        # task re-grids itself from the label shape (yolo_v2_task).
        sizes = sorted({int(s) for s in args.multiscale.split(",")})
        if any(s % 32 for s in sizes):
            p.error("--multiscale sizes must be multiples of 32")
        import random as _random
        import threading as _threading

        imdbs = {
            s: imdb if s == yolo.image_size else PascalVOC(
                args.image_set, batch_size=batch_size,
                yolo=yolo.at_scale(s // 32), flipped=args.flipped,
                data_path=args.data_path, uint8=args.uint8_transfer)
            for s in sizes}
        ms_rng = _random.Random(args.seed)
        ms_lock = _threading.Lock()
        ms_state = {"count": 0, "size": sizes[0]}

        def get_batch():
            with ms_lock:
                if ms_state["count"] % 10 == 0:
                    ms_state["size"] = ms_rng.choice(sizes)
                ms_state["count"] += 1
                cur = imdbs[ms_state["size"]]
            return cur.get()
    paths = Paths()
    mgr = CheckpointManager(net_name, imdb.name, save_by_epoch=False,
                            paths=paths)
    # A resumed run restores the optax step count cumulatively; anchor
    # the stage-local schedule at the resumed step so cosine/exponential
    # decay spans THIS invocation's --iters (not the cumulative curve) —
    # exactly what the help text promises under chunked/staged training.
    resume_step = mgr.latest_step() or 0
    sched = LRScheduleConfig(
        kind=args.lr_decay, learning_rate=lr,
        decay_steps=max(1, iters if args.lr_decay == "cosine"
                        else iters // 4),
        decay_factor=args.lr_decay_factor,
        offset_steps=resume_step if args.lr_decay != "fixed" else 0)
    if args.v2:
        # persist the priors next to the snapshots — detect/eval decode
        # with exactly the anchors the head was trained against
        # (data.anchors.v2_config_for_snapshot reads them back); refuses
        # if the dir already holds snapshots trained with different priors
        from tensorflow_yolo2_tpu.data.anchors import persist_anchors
        persist_anchors(mgr.dir, yolo.anchors, yolo.S,
                        has_snapshots=mgr.latest_path() is not None)
    writer = MetricsWriter(paths.tb_dirs(net_name, imdb.name, val=False)[0])

    if args.spatial:
        try:
            rc = run_spatial_training(args, yolo, model, imdb, mgr,
                                      writer, sched, iters, save_every)
        finally:
            writer.close()
        return rc

    trainer = Trainer(
        model, task,
        OptimizerConfig(name="adam", schedule=sched,
                        grad_clip_norm=args.grad_clip),
        mesh=make_mesh_for_batch(batch_size))
    # warm-start from the newest ImageNet classifier snapshot if present
    # (the reference's variable-intersection path, net_utils.py:81-101)
    imagenet_mgr = CheckpointManager("darknet19", "ilsvrc_2017_cls",
                                     save_by_epoch=True, paths=paths)
    warm = imagenet_mgr.latest_path()

    params_override = batch_stats_override = None
    if args.tf_checkpoint:
        from tensorflow_yolo2_tpu.compat.tf_import import (
            import_darknet19_checkpoint,
        )
        params_override, batch_stats_override = import_darknet19_checkpoint(
            args.tf_checkpoint, detection=True)

    sample, _ = imdb.get()
    state, start = common.bootstrap_state(
        trainer, mgr, jax.random.PRNGKey(args.seed), sample[:1],
        warm_start_dir=warm, params_override=params_override,
        batch_stats_override=batch_stats_override)

    state = common.run_train_loop(
        trainer, state, get_batch, mgr, writer,
        start_iter=start, num_iters=iters, log_every=args.log_every,
        save_every=save_every, num_workers=args.num_workers,
        trace_dir=args.profile_dir)
    writer.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
