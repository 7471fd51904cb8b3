"""Model registry — the nets_factory capability.

Capability of reference src/slim_dir/nets/nets_factory.py:35-109
(``networks_map`` / ``get_network_fn``): a name → constructor registry so
trainers/evals are model-agnostic. Entries return a fresh ``nn.Module``
given keyword overrides (num_classes, dtype, ...).

Each entry also records its default input size (the reference's
``default_image_size`` attribute on every slim net).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple

import flax.linen as nn


class NetworkSpec(NamedTuple):
    build: Callable[..., nn.Module]
    default_image_size: int


_REGISTRY: Dict[str, NetworkSpec] = {}


def register(name: str, default_image_size: int = 224):
    """Decorator: register ``fn(**kwargs) -> nn.Module`` under ``name``."""

    def deco(fn: Callable[..., nn.Module]):
        _REGISTRY[name] = NetworkSpec(fn, default_image_size)
        return fn

    return deco


def get_network(name: str, **kwargs: Any) -> nn.Module:
    """Build a registered network (reference get_network_fn,
    nets_factory.py:81-109)."""
    if name not in _REGISTRY:
        raise ValueError(
            f"Name of network unknown {name!r}; known: {sorted(_REGISTRY)}")
    return _REGISTRY[name].build(**kwargs)


def default_image_size(name: str) -> int:
    return _REGISTRY[name].default_image_size


def list_networks() -> list[str]:
    return sorted(_REGISTRY)


# --- built-in registrations -------------------------------------------------

def _register_builtins() -> None:
    from tensorflow_yolo2_tpu.models import darknet

    @register("darknet19", 224)
    def _darknet19(num_classes: int = 1000, **kw: Any) -> nn.Module:
        return darknet.Darknet19Classifier(num_classes=num_classes, **kw)

    @register("darknet19_detection", 224)
    def _darknet19_det(output_channels: int = 30, **kw: Any) -> nn.Module:
        return darknet.Darknet19Detector(output_channels=output_channels, **kw)

    @register("darknet19_detection_v2", 416)
    def _darknet19_det_v2(output_channels: int = 125, **kw: Any) -> nn.Module:
        # full YOLOv2 head: passthrough/reorg route + linear anchor output
        return darknet.Darknet19DetectorV2(
            output_channels=output_channels, **kw)

    try:
        from tensorflow_yolo2_tpu.models import resnet

        @register("resnet_v1_50", 224)
        def _resnet50(num_classes: int | None = None, **kw: Any) -> nn.Module:
            # classifier use needs the global pool (→ (b, C) logits); the
            # detector entry builds ResNet50V1 directly with pooling off
            kw.setdefault("global_pool", num_classes is not None)
            return resnet.ResNet50V1(num_classes=num_classes, **kw)

        @register("resnet_v1_50_detection", 224)
        def _resnet50_det(output_channels: int = 30, **kw: Any) -> nn.Module:
            return resnet.ResNet50Detector(output_channels=output_channels, **kw)
    except ImportError:
        pass

    try:
        from tensorflow_yolo2_tpu.models import yolo1

        @register("yolo1", 448)
        def _yolo1(**kw: Any) -> nn.Module:
            return yolo1.Yolo1Net(**kw)

        @register("yolo1_pretrain", 448)
        def _yolo1_pre(num_classes: int = 1000, **kw: Any) -> nn.Module:
            return yolo1.Yolo1PretrainNet(num_classes=num_classes, **kw)
    except ImportError:
        pass

    try:
        from tensorflow_yolo2_tpu.models import zoo

        for zoo_name, (builder, size) in zoo.ZOO.items():
            _REGISTRY[zoo_name] = NetworkSpec(builder, size)
    except ImportError:
        pass


_register_builtins()
