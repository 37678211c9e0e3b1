"""Offline dataset-construction toolchain (host-side, numpy).

Re-derivations of the reference's `depth_interpolation/` scripts
(SURVEY.md §2.7): GT depth completion from labeled glass polygons + raw
sensor depth, and reflection-hint generation. These run once to build the
dataset; they are not on the training path.
"""

from gwdepth_tpu.tools.depth_completion import (  # noqa: F401
    Intrinsics, deproject, project, interpolate_side_points,
    complete_polygon_depth, complete_depth, compare_depth_preds)
from gwdepth_tpu.tools.reflection import (  # noqa: F401
    reflection_difference, sample_reflection_points)
