"""Static-shape training batch — the NestedTensor replacement.

The reference collates variable-size images into a padded tensor + padding
mask and keeps targets as a list of dicts (reference: src/util/misc.py:273-313,
src/datasets/glassrgbd_norhint.py:299). For XLA every array here has a fixed
shape: images live on a fixed canvas with a validity mask, per-image line
targets are padded to `max_lines` slots with their own mask.
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class Batch:
    """One training/eval batch (all arrays device-ready).

    images:    (B, H, W, 3) float   normalized RGB on the padded canvas
    valid:     (B, H, W)    bool    True on real (non-padding) pixels
    depth:     (B, H, W)    float   GT depth in meters (0 where missing)
    seg:       (B, H, W)    int32   glass segmentation {0, 1}
    lines:     (B, T, D)    float   normalized line coords (+center), [0, 1]
    line_mask: (B, T)       bool    True for real GT lines
    """
    images: jnp.ndarray
    valid: jnp.ndarray
    depth: jnp.ndarray
    seg: jnp.ndarray
    lines: jnp.ndarray
    line_mask: jnp.ndarray

    @property
    def batch_size(self) -> int:
        return self.images.shape[0]


def dummy_batch(cfg, batch_size: int = 2, num_lines: int = 4,
                seed: int = 0) -> Batch:
    """Synthetic batch on the configured train canvas (tests/benches)."""
    import numpy as np
    H, W = cfg.train_hw
    rng = np.random.default_rng(seed)
    T = cfg.max_lines
    lines = np.zeros((batch_size, T, cfg.line_dim), np.float32)
    lines[:, :num_lines] = rng.uniform(0.1, 0.9,
                                       (batch_size, num_lines, cfg.line_dim))
    mask = np.zeros((batch_size, T), bool)
    mask[:, :num_lines] = True
    return Batch(
        images=jnp.asarray(rng.normal(0, 1, (batch_size, H, W, 3)),
                           jnp.float32),
        valid=jnp.ones((batch_size, H, W), jnp.bool_),
        depth=jnp.asarray(rng.uniform(0.5, 9.5, (batch_size, H, W)),
                          jnp.float32),
        seg=jnp.asarray(rng.integers(0, 2, (batch_size, H, W)), jnp.int32),
        lines=jnp.asarray(lines),
        line_mask=jnp.asarray(mask),
    )
