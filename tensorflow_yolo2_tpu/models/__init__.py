from tensorflow_yolo2_tpu.models.darknet import (  # noqa: F401
    Darknet19Backbone,
    Darknet19Classifier,
    Darknet19Detector,
    Darknet19DetectorV2,
    DetectionHead,
    DetectionHeadV2,
)
from tensorflow_yolo2_tpu.models.registry import get_network, register, list_networks  # noqa: F401
