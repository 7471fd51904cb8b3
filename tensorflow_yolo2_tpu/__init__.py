"""tensorflow_yolo2_tpu — a TPU-native (JAX/XLA/Pallas/pjit) detection framework.

A ground-up rebuild of the capabilities of wenxichen/tensorflow_yolo2
(a TF1-era Darknet19/YOLO detection research stack) as an idiomatic
JAX framework:

- ``models``   — Flax backbones (Darknet19, ResNet50-v1, YOLOv1-448, zoo
                 registry; reference: src/yolo2_nets/, src/slim_dir/nets/).
- ``ops``      — detection math: IoU, grid decode, NMS, Pallas kernels
                 (reference: src/yolo2_nets/net_utils.py).
- ``losses``   — YOLO grid loss compiled to a single XLA fwd+bwd
                 (reference: net_utils.get_loss).
- ``data``     — host-side datasets (VOC2007, flowers, ILSVRC), augmentation,
                 prefetch pipeline (reference: src/img_dataset/).
- ``train``    — generic pjit Trainer, optimizer/schedule factories, Orbax
                 checkpoint manager with warm-start / scope-freeze
                 (reference: entry scripts + net_utils restore_* +
                 slim train_image_classifier.py flag surface).
- ``parallel`` — device-mesh construction and sharding policies
                 (reference: src/slim_dir/deployment/model_deploy.py).
- ``compat``   — TF1 checkpoint import for weight parity.
- ``entries``  — CLI entry points mirroring the reference scripts
                 (pascal_detect_darknet, pascal_train_darknet, ...).
"""

__version__ = "0.1.0"
