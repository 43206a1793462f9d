from . import anchors, boxes, losses, matchers, nms  # noqa: F401
