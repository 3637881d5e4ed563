from rtm3d_tpu.geometry.box_ops import (  # noqa: F401
    bbox_area,
    bbox_center,
    xywh2xyxy,
    xyxy2xywh,
)
from rtm3d_tpu.geometry.gaussian import (  # noqa: F401
    compute_gaussian_radius,
    dynamic_radius,
    dynamic_sigma,
)
from rtm3d_tpu.geometry.projection import (  # noqa: F401
    CORNER_SIGNS,
    corners_3d,
    proj2d_bbox3d,
    rotation_y,
)
