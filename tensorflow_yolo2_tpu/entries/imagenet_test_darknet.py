"""Full ImageNet-val accuracy + throughput harness.

Capability of reference src/imagenet/imagenet_test_darknet.py:53-68: run
the whole validation split, report top-1 accuracy and per-batch timing —
this is the images/sec harness the perf baseline mirrors. Timing uses
``block_until_ready`` so it measures real device step time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tensorflow_yolo2_tpu.config import Paths
from tensorflow_yolo2_tpu.data.ilsvrc import IlsvrcCls
from tensorflow_yolo2_tpu.data.prefetch import PrefetchLoader, device_prefetch
from tensorflow_yolo2_tpu.entries import common
from tensorflow_yolo2_tpu.models.darknet import Darknet19Classifier
from tensorflow_yolo2_tpu.parallel.mesh import make_mesh_for_batch
from tensorflow_yolo2_tpu.train.checkpoint import CheckpointManager
from tensorflow_yolo2_tpu.train.trainer import Trainer, softmax_task
from tensorflow_yolo2_tpu.utils.timer import Timer


def main(argv: list[str] | None = None) -> int:
    p = common.base_parser(__doc__)
    p.add_argument("--max-batches", type=int, default=None)
    p.add_argument("--int8", action="store_true",
                   help="serve the post-training-quantized int8 chain "
                        "(ops.quant; BN folded, activations calibrated "
                        "on the first batch)")
    args = p.parse_args(argv)

    from tensorflow_yolo2_tpu.utils.jaxsetup import enable_compilation_cache
    enable_compilation_cache()

    batch_size = args.batch_size or 64
    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32

    imdb = IlsvrcCls("val", batch_size=batch_size, data_path=args.data_path)
    model = Darknet19Classifier(num_classes=imdb.num_class, dtype=dtype)
    trainer = Trainer(model, softmax_task(),
                      mesh=make_mesh_for_batch(batch_size))
    mgr = CheckpointManager("darknet19", imdb.name, save_by_epoch=True,
                            paths=Paths())
    sample, _ = imdb.get()
    state, _ = common.bootstrap_state(trainer, mgr,
                                      jax.random.PRNGKey(0), sample[:1])

    eval_step = trainer.eval_step
    if args.int8:
        from tensorflow_yolo2_tpu.models.fold import fold_params
        from tensorflow_yolo2_tpu.ops.quant import (
            calibrate,
            forward_int8_classifier,
            quantize_folded,
        )

        folded = fold_params(state.params, state.batch_stats)
        scales = calibrate(folded, jnp.asarray(sample, jnp.float32),
                           head="classifier")
        qlayers = jax.device_put(
            quantize_folded(folded, scales, head="classifier"))

        @jax.jit
        def _int8_step(qlayers, images, labels):
            logits = forward_int8_classifier(qlayers, images)
            acc = jnp.mean((jnp.argmax(logits, -1) == labels)
                           .astype(jnp.float32))
            return {"accuracy": acc}

        def eval_step(_state, images, labels):
            return _int8_step(qlayers, images, labels)

    n_batches = args.max_batches or imdb.total_batch
    timer = Timer()
    correct = total = 0
    with PrefetchLoader(imdb.get, num_workers=args.num_workers) as loader:
        stream = device_prefetch(iter(loader), size=2,
                                 sharding=trainer.batch_sharding)
        for i in range(n_batches):
            images, labels = next(stream)
            timer.tic()
            m = eval_step(state, images, labels)
            acc = float(np.asarray(m["accuracy"]))
            timer.toc()
            correct += acc * batch_size
            total += batch_size
            if i % 10 == 0:
                print(f"batch {i}/{n_batches}: acc {acc:.4f}, "
                      f"avg {timer.average_time:.4f}s/batch "
                      f"({batch_size / timer.average_time:.1f} img/s)")
    print(f"top-1 accuracy: {correct / max(total, 1):.4f} over {total} images")
    print(f"throughput: {batch_size / timer.average_time:.1f} images/sec")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
