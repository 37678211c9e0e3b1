"""Frozen numerics: the tiny-config GlassRGBD forward on a fixed input with
PRNGKey(0) init must reproduce these values (captured on CPU, jax f32).
Catches silent numerics drift from refactors — update ONLY when a change is
intentionally numerics-affecting, and say why in the commit."""

import numpy as np
import jax
import jax.numpy as jnp

from gwdepth_tpu.config import tiny_test_config
from gwdepth_tpu.models import GlassRGBD

EXPECTED_DEPTH_GRID = np.array([
    [4.836102, 4.593762, 4.816437],
    [5.026049, 5.515047, 5.254055],
    [4.515782, 4.940884, 4.603303],
])
EXPECTED_LINES_00 = np.array(
    [0.615190, 0.513975, 0.685503, 0.574854, 0.753531, 0.688725])
EXPECTED_DEPTH_MEAN = 5.460592
EXPECTED_SEG_MEAN = -0.034182


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
