"""Reverse-converter tests: flax -> torch export against the REAL
reference model.

The import direction is pinned by tests/test_reference_parity*.py; here
the exporter (convert/export_torch.py, probe-inversion over the forward
map) must reproduce a real reference state dict exactly from the
converted flax tree, load back strict into the reference model, and
actually read OUR tree (perturbation check), completing the round trip
reference -> gwdepth_tpu -> reference.
"""

from __future__ import annotations

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from reference_harness import get_ref, make_ref_args, state_dict_numpy
from gwdepth_tpu.config import GWDepthConfig
from gwdepth_tpu.convert.export_torch import (export_reference_checkpoint,
                                              glassrgbd_flax_to_torch)
from gwdepth_tpu.convert.full_model import glassrgbd_torch_to_flax, coverage
from gwdepth_tpu.convert.torch_weights import merge_params


@pytest.fixture(scope="module")
def ref():
    return get_ref()


H, W = 128, 192


def _cfg() -> GWDepthConfig:
    return GWDepthConfig(
        enc_layers=2, dec_layers=2, dim_feedforward=256, num_queries=30,
        dropout=0.0, dense_trans_layers=(2,), class_trans_layers=(1, 1, 1),
        group_attention_layers=((False, False), (False, False), (False,)),
        train_hw=(H, W), eval_hw=(H, W))


@pytest.fixture(scope="module")
def roundtrip(ref):
    """reference state dict -> flax params (production importer) ->
    exported state dict (reverse converter)."""
    cfg = _cfg()
    torch.manual_seed(31)
    model_t, _, _ = ref.glassrgbd.build(make_ref_args(cfg))
    template = state_dict_numpy(model_t)

    m_cfg = cfg
    from gwdepth_tpu.models import GlassRGBD
    m = GlassRGBD(m_cfg)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))["params"]
    overlay = glassrgbd_torch_to_flax(template)
    cov, total_n, missing = coverage(overlay, params)
    assert cov == total_n, f"uncovered {len(missing)}/{total_n}"
    params = merge_params(params, overlay)

    exported, exp_keys, pass_keys = glassrgbd_flax_to_torch(params, template)
    return model_t, template, params, exported, exp_keys, pass_keys


def test_export_reproduces_reference_state(roundtrip):
    _, template, _, exported, exp_keys, pass_keys = roundtrip
    assert set(exported) == set(template)
    # every float tensor the importer consumed must round-trip EXACTLY
    # (probe inversion is a pure gather — no arithmetic)
    for k in exp_keys:
        np.testing.assert_array_equal(
            exported[k], template[k], err_msg=f"round-trip mismatch: {k}")
    # the exported set must dominate: only integer buffers and gated-off
    # modules may pass through — NO float key may be 'unmapped' (that
    # would mean the forward converter never consumed it, contradicting
    # its 100%-coverage guarantee)
    frac = len(exp_keys) / max(len(template), 1)
    assert frac > 0.9, f"only {frac:.0%} of keys exported ({pass_keys[:8]})"
    # the only floats the importer ignores are the reference's DEAD
    # params — declared but never touched by its forward:
    #   border_mu/logsigma   multiscale_transformerr.py:404-405 (decl only)
    #   proj_seg             :451 (the forward routes BOTH token streams
    #                        through proj_dth, :572/:578 — the shared-
    #                        proj_dth quirk our rebuild preserves)
    #   pre_depth_pred       :913,966 (called only under class_pred=True,
    #                        which no shipped layer sets, :873,917)
    #   pyramid layer4       points_sample.py builds a dilated layer4 it
    #                        never calls (models/points.py docstring)
    dead = ("border_mu", "border_logsigma", "proj_seg", "pre_depth_pred",
            "layer4")
    unmapped = sorted({".".join(p for p in k.split(".") if not p.isdigit())
                       for k, why in pass_keys if why == "unmapped"
                       and not any(d in k for d in dead)})
    assert not unmapped, f"unmapped float key families: {unmapped}"


def test_export_loads_strict_into_reference(ref, roundtrip):
    model_t, _, _, exported, _, _ = roundtrip
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in exported.items()}
    missing, unexpected = model_t.load_state_dict(sd, strict=True), None
    assert not missing.missing_keys and not missing.unexpected_keys


def test_export_reads_our_tree_not_the_template(roundtrip):
    """Guard against passthrough silently masking a broken inverse: scale
    one flax leaf and require the change to surface in the export."""
    _, template, params, _, _, _ = roundtrip
    import copy
    params2 = copy.deepcopy(jax.tree.map(np.asarray, params))
    # the DETR class head exists in every config and maps 1:1
    params2["class_embed"]["kernel"] = params2["class_embed"]["kernel"] * 2.0
    exported2, _, _ = glassrgbd_flax_to_torch(params2, template)
    np.testing.assert_allclose(exported2["class_embed.weight"],
                               np.asarray(template["class_embed.weight"]) * 2)


def test_export_reference_checkpoint_file(roundtrip, tmp_path):
    """File-level contract: {'model', 'epoch'} torch.save payload the
    reference resume path consumes (main_glassrgbd.py:129-157)."""
    model_t, template, params, _, _, _ = roundtrip
    tpl_path = tmp_path / "template.pth"
    torch.save({"model": {k: torch.from_numpy(v.copy())
                          for k, v in template.items()},
                "epoch": 7}, tpl_path)
    out_path = tmp_path / "exported.pth"
    exp, _ = export_reference_checkpoint(params, str(tpl_path),
                                         str(out_path), epoch=7)
    assert exp
    loaded = torch.load(out_path, map_location="cpu", weights_only=False)
    assert loaded["epoch"] == 7
    res = model_t.load_state_dict(loaded["model"], strict=True)
    assert not res.missing_keys and not res.unexpected_keys
