"""Frozen numerics: the tiny-config GlassRGBD forward on a fixed input with
PRNGKey(0) init must reproduce these values (captured on CPU, jax f32).
Catches silent numerics drift from refactors — update ONLY when a change is
intentionally numerics-affecting, and say why in the commit."""

import numpy as np
import jax
import jax.numpy as jnp

from gwdepth_tpu.config import tiny_test_config
from gwdepth_tpu.models import GlassRGBD

# Captured 2026-08-17 after pinning every LayerNorm to the torch epsilon
# (1e-5; flax default is 1e-6) — the reference-parity harness showed the
# flax default diverging 2x on the decoder's tiny-variance activations.
EXPECTED_DEPTH_GRID = np.array([
    [4.911225, 4.944747, 5.030804],
    [5.014697, 5.153501, 5.047322],
    [4.847735, 4.883462, 4.689580],
])
EXPECTED_LINES_00 = np.array(
    [0.615190, 0.513975, 0.685502, 0.574854, 0.753531, 0.688724])
EXPECTED_DEPTH_MEAN = 5.154091
EXPECTED_SEG_MEAN = -0.008449


def test_forward_numerics_frozen():
    cfg = tiny_test_config()
    model = GlassRGBD(cfg)
    x = jnp.asarray(np.linspace(-1, 1, 64 * 96 * 3, dtype=np.float32)
                    .reshape(1, 64, 96, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    d = np.asarray(out["pred_depth"][-1])
    np.testing.assert_allclose(d[0, ::31, ::47], EXPECTED_DEPTH_GRID,
                               rtol=2e-4)
    np.testing.assert_allclose(float(d.mean()), EXPECTED_DEPTH_MEAN,
                               rtol=2e-4)
    np.testing.assert_allclose(np.asarray(out["pred_lines"])[0, 0],
                               EXPECTED_LINES_00, rtol=2e-4)
    np.testing.assert_allclose(float(np.asarray(out["pred_seg"]).mean()),
                               EXPECTED_SEG_MEAN, atol=2e-5)
