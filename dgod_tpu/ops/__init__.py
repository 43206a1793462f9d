from . import anchors, boxes, losses, matchers, nms, pallas_nms, roi_align  # noqa: F401
