"""Single-image ResNet50+YOLO-head detection.

Capability of reference src/pascal/pascal_detect_resnet.py: the inference
twin of pascal_train_resnet — restore the newest resnet50/voc_2007
snapshot, forward one image, decode + draw. (Like the reference, dropout
is inactive at inference; unlike the reference — which simply omits the
dropout op — that is handled by ``deterministic`` mode.)
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

from tensorflow_yolo2_tpu.config import VOC_CLASSES, Paths, YoloConfig
from tensorflow_yolo2_tpu.data.augment import image_read
from tensorflow_yolo2_tpu.models.resnet import ResNet50Detector
from tensorflow_yolo2_tpu.ops.pallas_decode import (
    decode_grid_pallas,
    decode_nms_pallas,
)
from tensorflow_yolo2_tpu.train.checkpoint import CheckpointManager
from tensorflow_yolo2_tpu.utils.visualize import draw_detections

import jax.numpy as jnp


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("image", nargs="?", default="assets/demo.jpg")
    p.add_argument("--threshold", type=float, default=0.2)
    p.add_argument("--nms", action="store_true")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    from tensorflow_yolo2_tpu.utils.jaxsetup import enable_compilation_cache
    enable_compilation_cache()

    yolo = YoloConfig()
    paths = Paths()
    mgr = CheckpointManager("resnet50", "voc_2007", save_by_epoch=False,
                            paths=paths)
    raw = mgr.restore_raw()
    params, stats = raw["params"], raw.get("batch_stats", {})
    model = ResNet50Detector(output_channels=yolo.cell_channels, S=yolo.S,
                             dtype=jnp.bfloat16)
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats

    variables = jax.device_put(variables)  # jit args, not closure consts

    @jax.jit
    def _detect(variables, images):
        grid = model.apply(variables, images, train=False)
        if args.nms:
            # same fused Pallas serving kernel as pascal_detect_darknet
            return decode_nms_pallas(grid, yolo, args.threshold, 0.5,
                                     max_outputs=32)
        return decode_grid_pallas(grid, yolo, args.threshold)

    def detect(images):
        return _detect(variables, images)

    image = image_read(args.image, yolo.image_size)
    dets = detect(image[None])
    out = draw_detections(args.image, np.asarray(dets.boxes[0]),
                          np.asarray(dets.scores[0]),
                          np.asarray(dets.classes[0]), VOC_CLASSES,
                          out_path=args.out)
    print(f"Wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
