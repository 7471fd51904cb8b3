from tensorflow_yolo2_tpu.train.optimizers import make_optimizer, make_schedule  # noqa: F401
from tensorflow_yolo2_tpu.train.trainer import Trainer, TrainState  # noqa: F401
from tensorflow_yolo2_tpu.train.checkpoint import CheckpointManager  # noqa: F401
from tensorflow_yolo2_tpu.train.metrics import MetricsWriter  # noqa: F401
