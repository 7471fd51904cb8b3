from tensorflow_yolo2_tpu.compat.tf_import import (  # noqa: F401
    import_darknet19_checkpoint,
    import_resnet50_checkpoint,
    load_tf_checkpoint,
)
