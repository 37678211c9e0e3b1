"""Block-level parity: SwinBlock's pad -> cyclic shift -> ref-coord roll ->
nearest grid-sample -> window attention -> reverse pipeline vs a torch
oracle restating the reference block (multiscale_transformerr.py:646-788).
This pins the quirk cluster the attention-level tests can't see: the
reflected (-2 - x) coordinate roll, sampling refs from the PADDED map but
ref-pos from the UNPADDED one, and the un-pad crop."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402

from gwdepth_tpu.models.swin import SwinBlock, relative_position_index
from gwdepth_tpu.ops.window import shifted_window_attn_mask

RNG = np.random.default_rng(23)


def t(x):
    return torch.from_numpy(np.ascontiguousarray(np.asarray(x, np.float32)))


def torch_block(x, ref_coords, ref_pos, params, nH, ws, shift):
    """x: (B, H, W, C) torch; follows reference SwinTransformerBlock.forward
    (ref :646-755) for the ref-attention (1/32) block kind."""
    B, H, W, C = x.shape
    shortcut = x.reshape(B, H * W, C)
    xn = TF.layer_norm(x, (C,), t(params["norm1"]["scale"]),
                       t(params["norm1"]["bias"]))
    pad_b = (ws - H % ws) % ws
    pad_r = (ws - W % ws) % ws
    xp = TF.pad(xn.permute(0, 3, 1, 2), (0, pad_r, 0, pad_b)) \
        .permute(0, 2, 3, 1)
    Hp, Wp = H + pad_b, W + pad_r
    rc = t(ref_coords)
    rp = t(ref_pos)
    if shift > 0:
        xs = torch.roll(xp, (-shift, -shift), dims=(1, 2))
        rr = torch.zeros_like(rc)
        rr[..., 0] = rc[..., 0] - (shift / (Wp - 1)) * 2
        rr[..., 1] = rc[..., 1] - (shift / (Hp - 1)) * 2
        rr[rr < -1] = -1 - (1 + rr[rr < -1])          # reference :684
        rps = torch.roll(rp.permute(0, 3, 1, 2), (-shift, -shift),
                         dims=(2, 3))
    else:
        xs = xp
        rr = rc
        rps = rp.permute(0, 3, 1, 2)

    x_ref = TF.grid_sample(xs.permute(0, 3, 1, 2), rr, mode="nearest",
                           align_corners=False)
    x_ref_pos = TF.grid_sample(rps, rr, mode="nearest", align_corners=False)
    x_ref = (x_ref + x_ref_pos).reshape(B, C, -1).permute(0, 2, 1)

    # window partition
    xw = xs.reshape(B, Hp // ws, ws, Wp // ws, ws, C) \
        .permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)

    # --- RefWindowAttention oracle (same math as test_swin_parity) ---
    p = params["attn"]
    qkv = xw @ t(p["qkv"]["kernel"]) + t(p["qkv"]["bias"])
    q, k, v = qkv.chunk(3, dim=-1)

    def heads(z):
        return z.reshape(z.shape[0], z.shape[1], nH, -1).permute(0, 2, 1, 3)

    hd = C // nH
    scale = hd ** -0.5
    q, k, v = heads(q), heads(k), heads(v)
    pr = p["ref"]
    ref_qk = x_ref @ t(pr["ref_qk"]["kernel"]) + t(pr["ref_qk"]["bias"])
    ref_q, ref_v = ref_qk.chunk(2, dim=-1)
    rB, n_rf, _ = ref_q.shape
    B_ = xw.shape[0]
    N = ws * ws
    n_win = B_ // rB
    ref_q = t(pr["diff_mu"]) + t(pr["diff_logsigma"]).exp() * ref_q
    ref_q = heads(ref_q)
    ref_k = torch.cat([ref_q[i:i + 1].expand(n_win, -1, -1, -1)
                       for i in range(rB)], 0)
    ref_v = heads(ref_v)
    ref_v = torch.cat([ref_v[i:i + 1].expand(n_win, -1, -1, -1)
                       for i in range(rB)], 0)
    q = q * scale
    ra = q @ ref_k.transpose(-2, -1)
    r = ra.reshape(rB, n_win, nH, N, n_rf).permute(0, 2, 1, 3, 4) \
        .reshape(rB, nH, n_win * N, n_rf)
    wconv = t(pr["ref_attn_diffusion"]["conv_kernel"]).permute(3, 2, 0, 1)
    bconv = t(pr["ref_attn_diffusion"]["conv_bias"])
    for _ in range(3):
        upd = TF.conv2d(r, wconv, bconv, padding=1)
        upd = TF.gelu(TF.layer_norm(upd, [n_win * N, n_rf]))
        r = r + upd
    ra = r.reshape(rB, nH, n_win, N, n_rf).permute(0, 2, 1, 3, 4) \
        .reshape(B_, nH, N, n_rf)
    q_new = TF.softmax(ra, -1) @ ref_v

    attn = (q_new * scale) @ k.transpose(-2, -1)
    table = t(p["rel_pos_bias"]["relative_position_bias_table"])
    idx = torch.from_numpy(relative_position_index(ws).reshape(-1))
    bias = table[idx].reshape(N, N, nH).permute(2, 0, 1)
    attn = attn + bias.unsqueeze(0)
    if shift > 0:
        mask = np.asarray(shifted_window_attn_mask(Hp, Wp, ws, shift))
        nWm = mask.shape[0]
        attn = attn.view(B_ // nWm, nWm, nH, N, N) + t(mask)[None, :, None]
        attn = attn.view(-1, nH, N, N)
    attn = TF.softmax(attn, -1)
    out = (attn @ v).transpose(1, 2).reshape(B_, N, C)
    out = out @ t(p["proj"]["kernel"]) + t(p["proj"]["bias"])

    # window reverse + unshift + crop
    o = out.reshape(B, Hp // ws, Wp // ws, ws, ws, C) \
        .permute(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
    if shift > 0:
        o = torch.roll(o, (shift, shift), dims=(1, 2))
    o = o[:, :H, :W].reshape(B, H * W, C)

    xx = shortcut + o
    xn2 = TF.layer_norm(xx, (C,), t(params["norm2"]["scale"]),
                        t(params["norm2"]["bias"]))
    m = params["mlp"]
    h = TF.gelu(xn2 @ t(m["fc1"]["kernel"]) + t(m["fc1"]["bias"]))
    xx = xx + (h @ t(m["fc2"]["kernel"]) + t(m["fc2"]["bias"]))
    return xx.reshape(B, H, W, C)


@pytest.mark.parametrize("shift", [0, 3])
def test_swin_block_matches_torch(shift):
    B, H, W, C, nH, ws, L, P = 1, 10, 13, 32, 4, 7, 4, 2
    block = SwinBlock(C, nH, ws, shift, 2.0, "ref")
    x = RNG.normal(size=(B, H, W, C)).astype(np.float32)
    ref = RNG.uniform(-0.95, 0.95, (B, L, P, 2)).astype(np.float32)
    pos = RNG.normal(size=(B, H, W, C)).astype(np.float32)
    variables = block.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           jnp.asarray(ref), jnp.asarray(pos))
    got, _, _ = block.apply(variables, jnp.asarray(x), jnp.asarray(ref),
                            jnp.asarray(pos))
    params = jax.tree.map(np.asarray, variables["params"])
    with torch.no_grad():
        want = torch_block(t(x), ref, pos, params, nH, ws, shift)
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=3e-4, atol=3e-5)
