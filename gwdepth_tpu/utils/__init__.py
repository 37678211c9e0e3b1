from gwdepth_tpu.utils.logging import SmoothedValue, MetricLogger  # noqa: F401
from gwdepth_tpu.utils.checkpoint import CheckpointManager  # noqa: F401
