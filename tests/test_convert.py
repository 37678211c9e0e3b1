"""Weight-converter tests: torch-layout state dicts -> flax params with
matching numerics (torch CPU is available as the oracle)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from gwdepth_tpu.convert.torch_weights import (
    detr_torch_to_flax, merge_params, normalize_torch_keys)
from gwdepth_tpu.models.detr import MultiheadAttention, EncoderLayer


def test_normalize_torch_keys():
    sd = {"module.transformer.x": np.zeros(1),
          "bbox_embed.layers.0.weight": np.zeros((2, 2)),
          "bn.num_batches_tracked": np.zeros(1)}
    out = normalize_torch_keys(sd)
    assert "transformer.x" in out
    assert "lines_embed.layers.0.weight" in out
    assert not any("num_batches_tracked" in k for k in out)


def test_mha_matches_torch():
    C, H, B, N = 32, 4, 2, 7
    tmha = torch.nn.MultiheadAttention(C, H, batch_first=True)
    x = np.random.default_rng(0).normal(size=(B, N, C)).astype(np.float32)
    with torch.no_grad():
        want, _ = tmha(torch.from_numpy(x), torch.from_numpy(x),
                       torch.from_numpy(x), need_weights=False)
    params = {
        "in_proj_weight": tmha.in_proj_weight.detach().numpy(),
        "in_proj_bias": tmha.in_proj_bias.detach().numpy(),
        "out_proj": {"kernel": tmha.out_proj.weight.detach().numpy().T,
                     "bias": tmha.out_proj.bias.detach().numpy()},
    }
    m = MultiheadAttention(C, H, 0.0)
    got = m.apply({"params": params}, jnp.asarray(x), jnp.asarray(x),
                  jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_detr_encoder_layer_conversion_roundtrip():
    """torch-format state dict -> converter -> our EncoderLayer runs and the
    weights land in the right slots (spot-check one tensor)."""
    C, H, FF = 32, 4, 64
    rng = np.random.default_rng(1)
    sd = {}
    for i in range(2):
        p = f"transformer.encoder.layers.{i}."
        sd[p + "self_attn.in_proj_weight"] = rng.normal(
            size=(3 * C, C)).astype(np.float32)
        sd[p + "self_attn.in_proj_bias"] = rng.normal(size=(3 * C,)).astype(np.float32)
        sd[p + "self_attn.out_proj.weight"] = rng.normal(size=(C, C)).astype(np.float32)
        sd[p + "self_attn.out_proj.bias"] = rng.normal(size=(C,)).astype(np.float32)
        sd[p + "linear1.weight"] = rng.normal(size=(FF, C)).astype(np.float32)
        sd[p + "linear1.bias"] = rng.normal(size=(FF,)).astype(np.float32)
        sd[p + "linear2.weight"] = rng.normal(size=(C, FF)).astype(np.float32)
        sd[p + "linear2.bias"] = rng.normal(size=(C,)).astype(np.float32)
        for n in ("norm1", "norm2"):
            sd[p + n + ".weight"] = np.ones(C, np.float32)
            sd[p + n + ".bias"] = np.zeros(C, np.float32)
    sd["class_embed.weight"] = rng.normal(size=(2, C)).astype(np.float32)

    params = detr_torch_to_flax(sd)
    assert "class_embed" not in params
    enc0 = params["transformer"]["encoder_layer0"]
    np.testing.assert_array_equal(
        enc0["linear1"]["kernel"],
        sd["transformer.encoder.layers.0.linear1.weight"].T)

    layer = EncoderLayer(C, H, FF, 0.0)
    x = jnp.asarray(rng.normal(size=(1, 5, C)).astype(np.float32))
    out = layer.apply({"params": enc0}, x, jnp.zeros_like(x),
                      jnp.ones((1, 5), bool))
    assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()


def test_merge_params_shape_guard():
    base = {"a": {"kernel": np.zeros((2, 2))}, "b": np.zeros(3)}
    overlay = {"a": {"kernel": np.ones((2, 2))}, "b": np.ones(4),
               "c": np.ones(1)}
    out = merge_params(base, overlay)
    np.testing.assert_array_equal(out["a"]["kernel"], np.ones((2, 2)))
    np.testing.assert_array_equal(out["b"], np.zeros(3))  # shape mismatch kept
    assert "c" not in out
