from tensorflow_yolo2_tpu.utils.timer import Timer  # noqa: F401
