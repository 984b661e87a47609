from apex_studio_tpu.mask.segment import (  # noqa: F401
    mask_from_box,
    mask_from_points,
    mask_to_contours,
    track_mask,
)
