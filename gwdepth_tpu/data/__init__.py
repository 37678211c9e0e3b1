from gwdepth_tpu.data.batch import Batch  # noqa: F401
