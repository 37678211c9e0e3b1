"""gwdepth_tpu — a TPU-native JAX/XLA framework with the capabilities of GW-Depth.

Joint monocular depth estimation, glass-structure line detection and glass
segmentation (TPAMI 2023 "Monocular Depth Estimation for Glass Walls with
Context"), rebuilt from scratch for TPU:

- jit/pjit-compiled functional models (flax.linen) with static shapes,
- mask-based padded batching instead of the reference's NestedTensor
  (reference: src/util/misc.py:282-367),
- data-parallel + tensor-parallel sharding over a jax.sharding.Mesh,
- Pallas kernels for the hot window-attention path where XLA fusion
  falls short.

Reference layout is documented in SURVEY.md; file:line citations in
docstrings point into /root/reference (ViktorLiang/GW-Depth).
"""

__version__ = "0.1.0"

from gwdepth_tpu.config import GWDepthConfig  # noqa: F401
