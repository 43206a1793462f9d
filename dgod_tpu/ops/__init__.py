from . import (  # noqa: F401
    anchors,
    boxes,
    losses,
    matchers,
    nms,
    pallas_nms,
    pallas_roi_align,
    roi_align,
)
