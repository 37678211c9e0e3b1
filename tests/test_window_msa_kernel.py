"""Fused window-MSA Pallas kernel vs the XLA formulation (interpret mode
on CPU; the kernel's TPU accuracy was triangulated against a CPU f32
reference at 3e-6 while the tunnel XLA path drifts 3e-2 from bf16 matmul
passes — see ops/pallas_kernels.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gwdepth_tpu.models.swin import window_msa, WindowClassAttention
from gwdepth_tpu.ops.pallas_kernels import (
    window_msa_pallas, fused_window_attention, layout_fence)


@pytest.mark.parametrize("B,nW,H,N,hd,with_mask", [
    (1, 5, 3, 9, 4, True),
    (2, 7, 2, 6, 5, False),
    (1, 130, 4, 49, 4, True),   # >1 lane chunk
])
def test_window_msa_pallas_matches_xla(B, nW, H, N, hd, with_mask):
    rng = np.random.default_rng(B * 100 + nW)
    q = jnp.asarray(rng.standard_normal((B, nW, H, N, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, nW, H, N, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, nW, H, N, hd)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((H, N, N)), jnp.float32)
    mask = None
    if with_mask:
        mask = jnp.asarray(
            np.where(rng.random((nW, N, N)) < 0.2, -100.0, 0.0), jnp.float32)
    want = window_msa(q, k, v, bias, mask)
    got = window_msa_pallas(q, k, v, bias, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fused_window_attention_matches_dense_path_and_grads():
    """fused qkv->MSA->proj equals the nn.Dense formulation on the SAME
    param tree, and its custom VJP produces finite grads."""
    rng = np.random.default_rng(3)
    B, nW, N, C, H, tC = 1, 6, 9, 32, 4, 8
    x = jnp.asarray(rng.standard_normal((B, nW, N, C)), jnp.float32)
    dt = jnp.asarray(rng.standard_normal((B, nW, N, tC)), jnp.float32)
    st = jnp.asarray(rng.standard_normal((B, nW, N, tC)), jnp.float32)
    mask = jnp.asarray(
        np.where(rng.random((nW, N, N)) < 0.2, -100.0, 0.0), jnp.float32)
    m = WindowClassAttention(C, 3, H, tC)
    p = m.init(jax.random.PRNGKey(0), x, dt, st, mask)
    want = m.apply(p, x, dt, st, mask)[0]

    a = p["params"]["attn"] if "attn" in p["params"] else p["params"]
    got = fused_window_attention(
        x, a["qkv"]["kernel"], a["qkv"]["bias"], a["proj"]["kernel"],
        a["proj"]["bias"],
        _rel_pos_bias(p, m, H),
        mask, H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    g = jax.grad(lambda xx: jnp.sum(fused_window_attention(
        xx, a["qkv"]["kernel"], a["qkv"]["bias"], a["proj"]["kernel"],
        a["proj"]["bias"], _rel_pos_bias(p, m, H), mask, H) ** 2))(x)
    assert bool(jnp.all(jnp.isfinite(g)))


def _rel_pos_bias(p, m, H):
    from gwdepth_tpu.models.swin import RelPosBias
    table = p["params"]["rel_pos_bias"]["relative_position_bias_table"]
    return RelPosBias(m.window_size, H).apply(
        {"params": {"relative_position_bias_table": table}})


def test_layout_fence_is_identity():
    rng = np.random.default_rng(0)
    for shape in [(16, 9, 5), (7, 4)]:
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(layout_fence(x, interpret=True)), np.asarray(x))


def test_window_msa_use_pallas_flag():
    """The advertised serving flag window_msa(use_pallas=True) must route
    to the kernel (ADVICE r3: the import target was wrong) — off-TPU it
    runs in interpret mode and must match the XLA formulation."""
    rng = np.random.default_rng(7)
    B, nW, H, N, hd = 1, 6, 3, 9, 4
    q = jnp.asarray(rng.standard_normal((B, nW, H, N, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, nW, H, N, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, nW, H, N, hd)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((H, N, N)), jnp.float32)
    want = window_msa(q, k, v, bias, None)
    got = window_msa(q, k, v, bias, None, use_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
