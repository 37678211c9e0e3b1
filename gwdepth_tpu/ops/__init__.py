from gwdepth_tpu.ops.window import (  # noqa: F401
    window_partition,
    window_reverse,
    shifted_window_attn_mask,
)
from gwdepth_tpu.ops.grid_sample import grid_sample  # noqa: F401
from gwdepth_tpu.ops.interpolate import resize_nearest, resize_bilinear  # noqa: F401
from gwdepth_tpu.ops.posemb import sine_posemb_from_mask, sine_posemb_grid  # noqa: F401
from gwdepth_tpu.ops.lap import hungarian, hungarian_scipy  # noqa: F401
