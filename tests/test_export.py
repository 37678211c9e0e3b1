"""AOT export artifacts (gwdepth_tpu/export.py): serialize the eval
forward with baked-in weights, reload without model code, match the
direct apply."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gwdepth_tpu.config import tiny_test_config
from gwdepth_tpu.export import save_exported, load_exported
from gwdepth_tpu.models import GlassRGBD


def test_export_roundtrip_matches_apply(tmp_path):
    cfg = tiny_test_config()
    model = GlassRGBD(cfg)
    H, W = cfg.eval_hw
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(1, H, W, 3)), jnp.float32)
    valid = jnp.ones((1, H, W), bool)
    params = model.init(jax.random.PRNGKey(0), img, valid)

    path = save_exported(str(tmp_path / "m.shlo"), cfg, params)
    fwd = load_exported(path)
    depth, seg, logits, lines = fwd(img, valid)

    out = model.apply(params, img, valid)
    np.testing.assert_allclose(np.asarray(depth),
                               np.asarray(out["pred_depth"][-1]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(seg), np.asarray(out["pred_seg"]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lines),
                               np.asarray(out["pred_lines"]),
                               rtol=1e-5, atol=1e-5)
    assert len(fwd.in_avals) == 2
