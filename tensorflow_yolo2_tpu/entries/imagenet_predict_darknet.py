"""Single-image ImageNet top-5 prediction.

Capability of reference src/imagenet/imagenet_predict_darknet.py:45-66:
one image → darknet19 classifier → softmax top-5 class names. Synset names
come from the class directory listing (or a provided synset file).
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from tensorflow_yolo2_tpu.config import Paths
from tensorflow_yolo2_tpu.data.augment import image_read
from tensorflow_yolo2_tpu.data.ilsvrc import IlsvrcCls
from tensorflow_yolo2_tpu.models.darknet import Darknet19Classifier
from tensorflow_yolo2_tpu.models.fold import fold_params
from tensorflow_yolo2_tpu.train.checkpoint import CheckpointManager


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("image")
    p.add_argument("--data-path", default=None)
    p.add_argument("--image-size", type=int, default=224)
    args = p.parse_args(argv)

    from tensorflow_yolo2_tpu.utils.jaxsetup import enable_compilation_cache
    enable_compilation_cache()

    imdb = IlsvrcCls("train", batch_size=1, data_path=args.data_path)
    mgr = CheckpointManager("darknet19", imdb.name, save_by_epoch=True,
                            paths=Paths())
    raw = mgr.restore_raw()
    params = fold_params(raw["params"], raw.get("batch_stats", {}))
    model = Darknet19Classifier(num_classes=imdb.num_class, fold_bn=True,
                                dtype=jnp.bfloat16)

    params = jax.device_put(params)  # jit args, not closure consts

    @jax.jit
    def _predict(params, images):
        return jax.nn.softmax(model.apply({"params": params}, images,
                                          train=False))

    def predict(images):
        return _predict(params, images)

    image = image_read(args.image, args.image_size)
    probs = np.asarray(predict(image[None])[0])
    top5 = np.argsort(-probs)[:5]
    for rank, idx in enumerate(top5, 1):
        print(f"{rank}. {imdb.classes[idx]}  p={probs[idx]:.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
