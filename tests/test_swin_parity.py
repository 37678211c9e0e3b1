"""Numerical parity: RefWindowAttention / WindowClassAttention vs torch
oracles that restate the reference math (multiscale_transformerr.py:267-332
and :455-580) op-for-op on random weights. This pins the riskiest port
numerics: the mu/sigma reparam, the 3-step conv diffusion with param-free
layer_norm over BOTH trailing axes, the q-replacement, the relative position
bias, and the channel-style class-token cross attention."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402

from gwdepth_tpu.models.swin import (
    RefWindowAttention, WindowClassAttention, relative_position_index)

RNG = np.random.default_rng(11)


def t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def torch_ref_window_attention(x, x_ref, params, nH, ws, mask=None):
    """x: (B_, N, C) windows-in-batch; x_ref: (rB, n_rf, C).
    Follows reference multiscale_transformerr.py:267-332."""
    B_, N, C = x.shape
    hd = C // nH
    scale = hd ** -0.5
    qkv = x @ t(params["qkv"]["kernel"]) + t(params["qkv"]["bias"])
    q, k, v = qkv.chunk(3, dim=-1)

    def heads(z):
        return z.reshape(z.shape[0], z.shape[1], nH, -1).permute(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)

    ref_qk = x_ref @ t(params["ref"]["ref_qk"]["kernel"]) + t(params["ref"]["ref_qk"]["bias"])
    ref_q, ref_v = ref_qk.chunk(2, dim=-1)
    rB, n_rf, _ = ref_q.shape
    n_win = B_ // rB
    mu = t(params["ref"]["diff_mu"])
    sigma = t(params["ref"]["diff_logsigma"]).exp()
    ref_q = mu + sigma * ref_q
    ref_q = heads(ref_q)
    ref_k = torch.cat([ref_q[i:i + 1].expand(n_win, -1, -1, -1)
                       for i in range(rB)], dim=0)
    ref_v = heads(ref_v)
    ref_v = torch.cat([ref_v[i:i + 1].expand(n_win, -1, -1, -1)
                       for i in range(rB)], dim=0)

    q = q * scale
    ref_attn = q @ ref_k.transpose(-2, -1)
    r = ref_attn.reshape(rB, n_win, nH, N, n_rf).permute(0, 2, 1, 3, 4) \
        .reshape(rB, nH, n_win * N, n_rf)
    w = t(params["ref"]["ref_attn_diffusion"]["conv_kernel"]).permute(3, 2, 0, 1)
    b = t(params["ref"]["ref_attn_diffusion"]["conv_bias"])
    for _ in range(3):
        upd = TF.conv2d(r, w, b, padding=1)
        upd = TF.gelu(TF.layer_norm(upd, [n_win * N, n_rf]))
        r = r + upd
    ref_attn = r.reshape(rB, nH, n_win, N, n_rf).permute(0, 2, 1, 3, 4) \
        .reshape(B_, nH, N, n_rf)
    ref_attn = TF.softmax(ref_attn, dim=-1)
    q_new = ref_attn @ ref_v

    attn = (q_new * scale) @ k.transpose(-2, -1)
    table = t(params["rel_pos_bias"]["relative_position_bias_table"])
    idx = torch.from_numpy(relative_position_index(ws).reshape(-1))
    bias = table[idx].reshape(ws * ws, ws * ws, nH).permute(2, 0, 1)
    attn = attn + bias.unsqueeze(0)
    if mask is not None:
        nW = mask.shape[0]
        attn = attn.view(B_ // nW, nW, nH, N, N) + t(mask)[None, :, None]
        attn = attn.view(-1, nH, N, N)
    attn = TF.softmax(attn, dim=-1)
    out = (attn @ v).transpose(1, 2).reshape(B_, N, C)
    return out @ t(params["proj"]["kernel"]) + t(params["proj"]["bias"])


@pytest.mark.parametrize("shifted", [False, True])
def test_ref_window_attention_matches_torch(shifted):
    B, nWn, N, C, nH, ws, n_rf = 2, 6, 49, 32, 4, 7, 8
    m = RefWindowAttention(C, ws, nH)
    x = RNG.normal(size=(B, nWn, N, C)).astype(np.float32)
    x_ref = RNG.normal(size=(B, n_rf, C)).astype(np.float32)
    if shifted:
        mask = (RNG.random((nWn, N, N)) > 0.7).astype(np.float32) * -100.0
    else:
        mask = None
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x),
                    jnp.asarray(x_ref),
                    None if mask is None else jnp.asarray(mask))["params"]
    got = m.apply({"params": params}, jnp.asarray(x), jnp.asarray(x_ref),
                  None if mask is None else jnp.asarray(mask))
    params_np = jax.tree.map(np.asarray, params)
    with torch.no_grad():
        want = torch_ref_window_attention(
            t(x.reshape(B * nWn, N, C)), t(x_ref), params_np, nH, ws,
            mask=mask)
    np.testing.assert_allclose(np.asarray(got).reshape(B * nWn, N, C),
                               want.numpy(), rtol=2e-4, atol=2e-5)


def torch_class_attention(x, dt, st, params, nH, ws, tC, mask=None):
    """(reference: multiscale_transformerr.py:455-580, group_attention off)."""
    B_, N, C = x.shape
    hd = C // nH
    scale = hd ** -0.5
    qkv = x @ t(params["qkv"]["kernel"]) + t(params["qkv"]["bias"])
    q, k, v = qkv.chunk(3, dim=-1)

    def heads(z):
        return z.reshape(z.shape[0], z.shape[1], nH, -1).permute(0, 2, 1, 3)

    q, k, v = heads(q) * scale, heads(k), heads(v)
    attn = q @ k.transpose(-2, -1)
    table = t(params["rel_pos_bias"]["relative_position_bias_table"])
    idx = torch.from_numpy(relative_position_index(ws).reshape(-1))
    bias = table[idx].reshape(ws * ws, ws * ws, nH).permute(2, 0, 1)
    attn = attn + bias.unsqueeze(0)
    if mask is not None:
        nW = mask.shape[0]
        attn = attn.view(B_ // nW, nW, nH, N, N) + t(mask)[None, :, None]
        attn = attn.view(-1, nH, N, N)
    attn = TF.softmax(attn, dim=-1)
    x_out = (attn @ v).transpose(1, 2).reshape(B_, N, C)
    x_out = x_out @ t(params["proj"]["kernel"]) + t(params["proj"]["bias"])

    def lin(name, z):
        return z @ t(params[name]["kernel"]) + t(params[name]["bias"])

    depth_q = heads(lin("cls_dth_q", dt)) * scale
    seg_q = heads(lin("cls_seg_q", st)) * scale
    t_x = torch.cat([x_out, dt, st], dim=-1)
    t_k = heads(lin("global_k", t_x))
    t_v = heads(lin("global_v", t_x))

    def token(qq):
        a = TF.softmax(qq.transpose(-2, -1) @ t_k, dim=-1)
        tok = (a @ t_v.transpose(-2, -1)).reshape(B_, -1, N).permute(0, 2, 1)
        return lin("proj_dth", tok)          # shared proj (ref :572,578)

    return x_out, token(depth_q), token(seg_q)


def test_class_attention_matches_torch():
    B, nWn, N, C, nH, ws, tC = 1, 4, 49, 32, 4, 7, 8
    m = WindowClassAttention(C, ws, nH, tC)
    x = RNG.normal(size=(B, nWn, N, C)).astype(np.float32)
    dt = RNG.normal(size=(B, nWn, N, tC)).astype(np.float32)
    st = RNG.normal(size=(B, nWn, N, tC)).astype(np.float32)
    params = m.init(jax.random.PRNGKey(1), jnp.asarray(x), jnp.asarray(dt),
                    jnp.asarray(st), None)["params"]
    gx, gd, gs = m.apply({"params": params}, jnp.asarray(x),
                         jnp.asarray(dt), jnp.asarray(st), None)
    params_np = jax.tree.map(np.asarray, params)
    with torch.no_grad():
        wx, wd, wsg = torch_class_attention(
            t(x.reshape(B * nWn, N, C)), t(dt.reshape(B * nWn, N, tC)),
            t(st.reshape(B * nWn, N, tC)), params_np, nH, ws, tC)
    np.testing.assert_allclose(np.asarray(gx).reshape(-1, N, C),
                               wx.numpy(), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gd).reshape(-1, N, tC),
                               wd.numpy(), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gs).reshape(-1, N, tC),
                               wsg.numpy(), rtol=2e-4, atol=2e-5)


def test_pallas_diffusion_matches_xla():
    """Fused Pallas diffusion kernel (interpret mode on CPU) vs the XLA
    path on the same params."""
    from gwdepth_tpu.ops.pallas_kernels import ref_attn_diffusion_pallas
    rng = np.random.default_rng(3)
    B, P, R, H = 2, 98, 8, 4
    a = rng.normal(size=(B, P, R, H)).astype(np.float32)
    w = rng.normal(size=(3, 3, H, H)).astype(np.float32) * 0.1
    b = rng.normal(size=(H,)).astype(np.float32) * 0.1

    # XLA reference path (same math as RefAttnDiffusion's fallback)
    x = jnp.asarray(a)
    for _ in range(3):
        upd = jax.lax.conv_general_dilated(
            x, jnp.asarray(w), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + jnp.asarray(b)
        mean = upd.mean(axis=(1, 2), keepdims=True)
        var = upd.var(axis=(1, 2), keepdims=True)
        upd = (upd - mean) * jax.lax.rsqrt(var + 1e-5)
        x = x + jax.nn.gelu(upd, approximate=False)

    got = ref_attn_diffusion_pallas(jnp.asarray(a), jnp.asarray(w),
                                    jnp.asarray(b), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x),
                               rtol=2e-4, atol=2e-5)
