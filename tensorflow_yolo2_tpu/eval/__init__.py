from tensorflow_yolo2_tpu.eval.voc_map import VocMapEvaluator, voc_ap  # noqa: F401
