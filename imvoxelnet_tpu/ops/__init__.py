from . import backproject, boxes, iou, losses, nms  # noqa: F401
