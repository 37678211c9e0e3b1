"""CLI parity tail (VERDICT round-1 Missing #4): --frozen_weights partial
load and URL-checkpoint cache resolution, matching reference
src/main_glassrgbd.py:107-191."""

import os

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from gwdepth_tpu.config import tiny_test_config
from gwdepth_tpu.models import GlassRGBD
from test_full_convert import _ref_key, _to_torch_layout


def _reference_state(params):
    state = {}
    for kp, val in jax.tree_util.tree_flatten_with_path(params)[0]:
        path = tuple(k.key for k in kp)
        state[_ref_key(path)] = torch.from_numpy(
            np.ascontiguousarray(_to_torch_layout(path, np.asarray(val))))
    return state


def test_load_frozen_weights_partial(tmp_path):
    """Only encoder/decoder/class_embed/lines_embed substring groups load;
    backbone, input projections, and query embeddings stay at init
    (reference main_glassrgbd.py:165-191)."""
    from gwdepth_tpu.main import load_frozen_weights
    cfg = tiny_test_config()
    model = GlassRGBD(cfg)
    donor = jax.tree.map(
        np.asarray, model.init(jax.random.PRNGKey(7),
                               jnp.zeros((1, *cfg.train_hw, 3)))["params"])
    ck = tmp_path / "stage1.pth"
    torch.save({"model": _reference_state(donor)}, ck)

    base = jax.tree.map(
        np.asarray, model.init(jax.random.PRNGKey(8),
                               jnp.zeros((1, *cfg.train_hw, 3)))["params"])
    merged = load_frozen_weights(jax.tree.map(jnp.asarray, base), str(ck))

    def leaf(tree, *path):
        for k in path:
            tree = tree[k]
        return np.asarray(tree)

    # loaded groups carry the donor values
    np.testing.assert_allclose(
        leaf(merged, "transformer", "encoder_layer0", "linear1", "kernel"),
        leaf(donor, "transformer", "encoder_layer0", "linear1", "kernel"))
    np.testing.assert_allclose(leaf(merged, "class_embed", "kernel"),
                               leaf(donor, "class_embed", "kernel"))
    np.testing.assert_allclose(
        leaf(merged, "lines_embed", "layer0", "kernel"),
        leaf(donor, "lines_embed", "layer0", "kernel"))
    # 'encoder'/'decoder' substrings also bring the dense branch across,
    # matching the reference's substring filter
    np.testing.assert_allclose(
        leaf(merged, "dense_encoder", "proj_class1", "kernel"),
        leaf(donor, "dense_encoder", "proj_class1", "kernel"))
    # untouched groups keep the fresh init
    np.testing.assert_allclose(leaf(merged, "backbone", "conv1", "kernel"),
                               leaf(base, "backbone", "conv1", "kernel"))
    np.testing.assert_allclose(leaf(merged, "input_proj", "kernel"),
                               leaf(base, "input_proj", "kernel"))
    np.testing.assert_allclose(leaf(merged, "query_embed"),
                               leaf(base, "query_embed"))
    assert not np.allclose(leaf(merged, "backbone", "conv1", "kernel"),
                           leaf(donor, "backbone", "conv1", "kernel"))


def test_resolve_checkpoint_path(tmp_path, monkeypatch):
    from gwdepth_tpu.main import resolve_checkpoint_path
    # plain paths pass through
    assert resolve_checkpoint_path("/x/y.pth") == "/x/y.pth"
    # cached URL resolves without any network touch
    monkeypatch.setenv("TORCH_HOME", str(tmp_path))
    cache = tmp_path / "hub" / "checkpoints"
    os.makedirs(cache)
    (cache / "detr-r50-e632da11.pth").write_bytes(b"x")
    url = "https://dl.fbaipublicfiles.com/detr/detr-r50-e632da11.pth"
    assert resolve_checkpoint_path(url) == str(cache /
                                               "detr-r50-e632da11.pth")


def test_cli_flag_plumbing_line_depth_and_init_size():
    """--with_line_depth / --class_init_size reach the config in both the
    full and the --tiny CLI branches (the tiny branch silently dropping
    gates was a round-1 advisor finding)."""
    from gwdepth_tpu.main import build_argparser, config_from_args
    ap = build_argparser()
    base = ["--data_path", "/tmp/x", "--output_dir", "/tmp/y"]

    args = ap.parse_args(base + ["--with_line_depth",
                                 "--class_init_size", "16"])
    cfg = config_from_args(args)
    assert cfg.with_line_depth and cfg.class_init_size == 16

    args = ap.parse_args(base + ["--tiny", "--with_line_depth"])
    cfg = config_from_args(args)
    assert cfg.with_line_depth


def test_cli_loss_and_matcher_flags_reach_config():
    """The reference's live scalar flags (--dropout --eos_coef
    --variance_focus --set_cost_* --seg_loss_weight --min/max_depth_eval
    --pre_norm ..., src/args.py:15-20,63-81,96-100) are CLI-settable here
    too, in both branches; under --tiny, flags left at their parser
    default never override the toy dims."""
    from gwdepth_tpu.main import build_argparser, config_from_args
    ap = build_argparser()
    base = ["--data_path", "/tmp/x", "--output_dir", "/tmp/y"]
    flags = ["--dropout", "0.2", "--eos_coef", "0.3",
             "--variance_focus", "0.9", "--set_cost_class", "2.0",
             "--set_cost_line", "7.0", "--seg_loss_weight", "3.0",
             "--min_depth_eval", "0.01", "--max_depth_eval", "8.0",
             "--pre_norm", "--class_token_dim", "16"]

    cfg = config_from_args(ap.parse_args(base + flags))
    assert (cfg.dropout, cfg.eos_coef, cfg.variance_focus) == (0.2, 0.3, 0.9)
    assert (cfg.set_cost_class, cfg.set_cost_line) == (2.0, 7.0)
    assert (cfg.seg_loss_weight, cfg.min_depth_eval,
            cfg.max_depth_eval) == (3.0, 0.01, 8.0)
    assert cfg.pre_norm and cfg.class_token_dim == 16

    tcfg = config_from_args(ap.parse_args(base + ["--tiny"] + flags))
    assert (tcfg.eos_coef, tcfg.set_cost_line,
            tcfg.class_token_dim) == (0.3, 7.0, 16)
    # defaults don't leak into tiny: toy dims + canvas survive
    tcfg = config_from_args(ap.parse_args(base + ["--tiny"]))
    assert tcfg.hidden_dim == 32 and tcfg.train_hw == (64, 96)
    assert tcfg.class_token_dim == 8 and tcfg.dropout == 0.0
