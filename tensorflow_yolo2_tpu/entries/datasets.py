"""Dataset factory — name → imdb registry.

Capability of reference src/slim_dir/datasets/dataset_factory.py:30-61
(``get_dataset``): trainers select datasets by name. Datasets here are
host-side loaders with the uniform imdb interface; ``synthetic`` provides
an in-memory fixture (this environment mounts no real data) so every
entry can run end-to-end.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from tensorflow_yolo2_tpu.data.memory import InMemoryImdb


class SyntheticClassification(InMemoryImdb):
    """In-memory random classification imdb (smoke/e2e fixture)."""

    def __init__(self, split: str = "train", batch_size: int = 32,
                 num_class: int = 10, image_size: int = 64, seed: int = 0,
                 size: int = 256, label_min: int = 0, **_: Any):
        self.name = f"synthetic_{num_class}"
        self.batch_size = batch_size
        self.image_size = image_size
        self.num_class = num_class
        self.classes = tuple(f"class_{i}" for i in range(num_class))
        rng = np.random.RandomState(seed + (0 if split == "train" else 1))
        self._images = rng.uniform(-1, 1, (size, image_size, image_size, 3)
                                   ).astype(np.float32)
        # label_min=1 reserves class 0 as an ImageNet-style background
        # slot (the layout --labels-offset strips)
        self._labels = rng.randint(label_min, num_class, size
                                   ).astype(np.int32)
        self._init_order(seed)


def _with_preprocess(imdb, preprocessing_name, split):
    """Attach a factory preprocessing fn to an in-memory uint8 imdb."""
    if preprocessing_name:
        from tensorflow_yolo2_tpu.data.preprocessing import get_preprocessing

        imdb.preprocess_fn = get_preprocessing(
            preprocessing_name, is_training=split == "train",
            image_size=imdb.image_size)
    return imdb


def get_dataset(name: str, split: str = "train", **kwargs: Any):
    """Build an imdb by name (reference dataset_factory.get_dataset).

    ``preprocessing_name`` selects a factory preprocessing
    (data.preprocessing.get_preprocessing — slim's --preprocessing_name,
    train_image_classifier.py:85-88,428-435) instead of each dataset's
    native convention; supported by the raw-image datasets (flowers,
    imagenet) and the uint8 in-memory datasets (mnist, cifar10, prepared).
    """
    name = name.lower()
    pp_name = kwargs.get("preprocessing_name")
    if name == "flowers":
        from tensorflow_yolo2_tpu.data.flowers import TFFlowers

        return TFFlowers(batch_size=kwargs.get("batch_size", 16),
                         image_size=kwargs.get("image_size", 224),
                         val_split=kwargs.get("val_split", 0.2),
                         data_path=kwargs.get("data_path"),
                         seed=kwargs.get("seed", 0),
                         preprocess_name=pp_name)
    if name in ("imagenet", "ilsvrc", "ilsvrc_2017_cls"):
        from tensorflow_yolo2_tpu.data.ilsvrc import IlsvrcCls

        if split in ("validation", "test"):  # slim's canonical split name
            split = "val"
        return IlsvrcCls(split, batch_size=kwargs.get("batch_size", 48),
                         data_path=kwargs.get("data_path"),
                         data_aug=split == "train",
                         preprocess_name=pp_name)
    if name in ("voc", "pascal", "voc_2007", "synthetic") and pp_name:
        # synthetic stores preprocessed float arrays and voc owns the
        # detection label convention — a silently ignored flag would be
        # worse than an error
        raise ValueError(f"preprocessing_name={pp_name!r} is not supported "
                         f"by dataset {name!r}")
    if name in ("voc", "pascal", "voc_2007"):
        from tensorflow_yolo2_tpu.data.voc import PascalVOC

        return PascalVOC(split if split != "train" else "trainval",
                         batch_size=kwargs.get("batch_size", 24),
                         data_path=kwargs.get("data_path"))
    if name == "mnist":
        from tensorflow_yolo2_tpu.data.mnist import MNIST

        return _with_preprocess(
            MNIST(split, batch_size=kwargs.get("batch_size", 32),
                  data_path=kwargs.get("data_path"),
                  seed=kwargs.get("seed", 0)), pp_name, split)
    if name in ("cifar10", "cifar-10"):
        from tensorflow_yolo2_tpu.data.cifar10 import Cifar10

        return _with_preprocess(
            Cifar10(split, batch_size=kwargs.get("batch_size", 32),
                    data_path=kwargs.get("data_path"),
                    seed=kwargs.get("seed", 0)), pp_name, split)
    if name == "prepared":
        from tensorflow_yolo2_tpu.data.prepared import PreparedDataset

        if not kwargs.get("data_path"):
            raise ValueError("prepared dataset needs data_path=<shard dir>")
        # prepared shards store uint8 images (the TFRecord analog), so
        # factory preprocessing applies exactly as in slim's pipeline
        return _with_preprocess(
            PreparedDataset(kwargs["data_path"],
                            batch_size=kwargs.get("batch_size", 32),
                            seed=kwargs.get("seed", 0)), pp_name, split)
    if name == "synthetic":
        return SyntheticClassification(split, **kwargs)
    if name == "synthetic-bg":
        # background-slot variant: labels start at 1, class 0 reserved —
        # the ImageNet-style layout --labels-offset strips (slim
        # train_image_classifier.py:422,444)
        return SyntheticClassification(split, label_min=1, **kwargs)
    raise ValueError(f"Name of dataset unknown {name!r}")
