"""End-to-end serving throughput: disk → native host IO → TPU (fused decode+NMS).

Measures the FULL detect pipeline, not just the device forward:
JPEG decode + fused native resize/normalize (utils.native) in a prefetch
thread pool, then the batched device forward + the fused Pallas
decode+NMS serving kernel — the same chain pascal_detect_darknet --nms
serves. The old host-NMS tail is gone: suppression happens on-chip and
the host fetch is the K kept slots.

The host IO leg runs twice: once through the standard decode (cv2 full
decode + native fused resize) and once through the fused native JPEG
path (TFY2_FAST_JPEG — DCT-domain scaled decode straight into the
resize+normalize pass), so the report shows what the fast path buys on
this image mix. Camera/ILSVRC-sized sources (≥2× the 448² target)
decode at 1/2..1/8 scale there.

Usage: python benchmarks/serving_pipeline.py [image_dir] [batch] [steps]
With no image_dir, synthesizes a directory of 1280×960 JPEGs first
(natural-image statistics: smooth base + texture, not raw noise).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp
import numpy as np

from tensorflow_yolo2_tpu.config import YoloConfig
from tensorflow_yolo2_tpu.data.augment import image_read
from tensorflow_yolo2_tpu.data.prefetch import PrefetchLoader, device_prefetch
from tensorflow_yolo2_tpu.models.darknet import Darknet19Detector
from tensorflow_yolo2_tpu.models.fold import fold_params
from tensorflow_yolo2_tpu.ops.pallas_decode import decode_nms_pallas
from tensorflow_yolo2_tpu.utils import native
from tensorflow_yolo2_tpu.utils.jaxsetup import enable_compilation_cache

SIZE = 448


def make_images(path: str, n: int = 64) -> str:
    import cv2
    os.makedirs(path, exist_ok=True)
    rng = np.random.RandomState(0)
    h, w = 960, 1280
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    for i in range(n):
        # smooth low-frequency base + mild texture ≈ natural-image
        # statistics (raw noise neither compresses nor decodes like a
        # photo and would overstate decode cost)
        base = np.stack([
            128 + 90 * np.sin(xx / w * (3 + c) + i) *
            np.cos(yy / h * (2 + c) - i)
            for c in range(3)], axis=-1)
        img = np.clip(base + rng.uniform(-12, 12, (h, w, 3)), 0,
                      255).astype(np.uint8)
        cv2.imwrite(os.path.join(path, f"img{i:03d}.jpg"), img,
                    [cv2.IMWRITE_JPEG_QUALITY, 90])
    return path


def main() -> int:
    enable_compilation_cache()
    image_dir = sys.argv[1] if len(sys.argv) > 1 else make_images(
        "/tmp/serving_bench_images")
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 30

    files = sorted(
        os.path.join(image_dir, f) for f in os.listdir(image_dir)
        if f.lower().endswith((".jpg", ".jpeg", ".png")))
    assert files, f"no images under {image_dir}"

    yolo = YoloConfig(S=SIZE // 32)
    model = Darknet19Detector(output_channels=yolo.cell_channels,
                              dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    folded = fold_params(variables["params"], variables["batch_stats"])
    fmodel = Darknet19Detector(output_channels=yolo.cell_channels,
                               fold_bn=True, dtype=jnp.bfloat16)

    @jax.jit
    def forward(params, images):
        grid = fmodel.apply({"params": params}, images, train=False)
        # production serving path: the fused decode+NMS kernel
        return decode_nms_pallas(grid, yolo, 0.3, 0.5, max_outputs=32)

    def run_pipeline(fast_jpeg: bool) -> tuple[float, int]:
        cursor = [0]

        def read_batch():
            out = np.empty((batch, SIZE, SIZE, 3), np.float32)
            for j in range(batch):
                out[j] = image_read(files[cursor[0] % len(files)], SIZE,
                                    fast_jpeg=fast_jpeg)
                cursor[0] += 1
            return out

        n_det = 0
        with PrefetchLoader(read_batch, num_workers=2,
                            prefetch_size=4) as loader:
            stream = device_prefetch(iter(loader), size=2)
            # warm (compile) outside the timed window
            dets = forward(folded, next(stream))
            np.asarray(dets.scores)
            t0 = time.perf_counter()
            pending = []
            for _ in range(steps):
                pending.append(forward(folded, next(stream)))
            for dets in pending:
                # a real consumer fetches all K kept slots — boxes and
                # classes too, inside the timed window
                boxes = np.asarray(dets.boxes)
                classes = np.asarray(dets.classes)
                scores = np.asarray(dets.scores)
                # NMS already ran inside the fused kernel; survivors are
                # the score>0 slots
                n_det += int((scores > 0).sum())
            dt = time.perf_counter() - t0
        return steps * batch / dt, n_det

    ips_std, n_det = run_pipeline(fast_jpeg=False)
    print(f"serving pipeline (native_io={native.available()}, std decode): "
          f"{ips_std:.0f} images/sec end-to-end "
          f"(batch {batch}, {steps} steps, {n_det} detections kept)")
    if native.jpeg_available():
        ips_fast, n_det = run_pipeline(fast_jpeg=True)
        print(f"serving pipeline (fused native JPEG, DCT-scaled decode): "
              f"{ips_fast:.0f} images/sec end-to-end "
              f"({ips_fast / ips_std:.2f}x the std decode)")
    else:
        print("native JPEG path unavailable (library built without "
              "libjpeg) — fast-decode leg skipped")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
