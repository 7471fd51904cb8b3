from tensorflow_yolo2_tpu.data.voc import PascalVOC  # noqa: F401
from tensorflow_yolo2_tpu.data.flowers import TFFlowers  # noqa: F401
from tensorflow_yolo2_tpu.data.ilsvrc import IlsvrcCls  # noqa: F401
from tensorflow_yolo2_tpu.data.prefetch import PrefetchLoader, device_prefetch  # noqa: F401
