from gwdepth_tpu.losses.criterion import (  # noqa: F401
    line_set_criterion, silog_loss, seg_ce_loss, multiscale_depth_loss,
    build_match_cost,
)
from gwdepth_tpu.losses.plane import (  # noqa: F401
    plane_norm_loss, sobel_grad, point_in_triangle,
)
