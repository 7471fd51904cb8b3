from tensorflow_yolo2_tpu.ops.iou import box_iou, corners_iou  # noqa: F401
from tensorflow_yolo2_tpu.ops.boxes import (  # noqa: F401
    decode_grid,
    decode_grid_v2,
    decode_to_detections,
)
from tensorflow_yolo2_tpu.ops.nms import nms_fixed  # noqa: F401
