from tensorflow_yolo2_tpu.losses.yolo import yolo_loss, YoloLossAux  # noqa: F401
