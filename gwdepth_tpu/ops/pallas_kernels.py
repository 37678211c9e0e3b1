"""Pallas TPU kernels for the hot fused ops.

`ref_attn_diffusion` — the line-reference attention diffusion loop
(reference: src/models/multiscale_transformerr.py:299-302): three iterations
of [3x3 conv over the (nW*N, n_rf) attention plane with `heads` channels →
param-free layer-norm over the whole plane per (batch, head) → exact GELU →
residual add]. As XLA ops this is ~45 kernels per block with HBM round
trips between them; the Pallas kernel keeps the whole plane resident in
VMEM for all three iterations (one batch element per grid step).

TPU-shape notes (each learned the hard way):
- the natural (P, R, H) layout puts H=16 in the lane dim -> 8x tile padding
  and a measured 134 MB VMEM spill; the kernel uses (P, R*H) full-lane rows
  instead, with channel mixing as block-diagonal kron(I_R, w) matmuls;
- Mosaic has no lowering for 1-D tile/concatenate or dynamic_slice on
  values, so the kron/tile structures are precomputed on the host and the
  per-head layer-norm is expressed as 2-D matmuls against a grouping
  matrix T = kron(J_R/R, I_H);
- erf/erfc have no lowering either, so exact GELU uses the A&S 7.1.26
  rational erf approximation (|err| <= 1.5e-7).

`ref_attn_diffusion` (the public entry) is differentiable: Pallas
forward, custom VJP through the identical XLA formulation
(models/swin.py:diffusion_xla).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gwdepth_tpu.ops import mosaic_math


def _make_kernel(P: int, RH: int):
    """dx shifts folded into the block-diagonal weights (off-diagonal
    blocks), so the kernel only pads/shifts along P (sublanes)."""
    def kernel(a_ref, wrow_ref, bias_ref, t_ref, out_ref):
        """a_ref: (1, P, RH); wrow_ref: (3, RH, RH) — one fused weight per
        dy that already contains the three dx taps as block off-diagonals;
        bias_ref: (1, RH); t_ref: (RH, RH)."""
        x = a_ref[0].astype(jnp.float32)
        T = t_ref[...]
        bias = bias_ref[...]
        ones_p = jnp.ones((1, P), jnp.float32)

        def mm(a, b):
            # HIGHEST precision: TPU f32 matmuls otherwise run bf16 passes,
            # which drifts the attention logits vs the XLA/CUDA f32 path
            return jax.lax.dot_general(
                a, b, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)

        def body(_, xc):
            xp = jnp.pad(xc, ((1, 1), (0, 0)))
            upd = mm(xp[0:P], wrow_ref[0]) \
                + mm(xp[1:P + 1], wrow_ref[1]) \
                + mm(xp[2:P + 2], wrow_ref[2]) + bias
            mean = mm(mm(ones_p, upd) / P, T)
            d = upd - mean
            var = mm(mm(ones_p, d * d) / P, T)
            u = d * jax.lax.rsqrt(var + 1e-5)
            return xc + mosaic_math.gelu(u)

        out_ref[0] = jax.lax.fori_loop(0, 3, body, x)

    return kernel


def _host_weights(w: jnp.ndarray, b: jnp.ndarray, R: int, H: int):
    """Precompute (3, RH, RH) fused row weights, tiled bias, grouping T.

    wrow[dy][ (r*H+h), (r2*H+h2) ] = w[dy, dx, h, h2] where dx = r2 - r + 1
    (valid for |r2 - r| <= 1) — i.e. the dx taps become block off-diagonals
    so the kernel's R-direction shift is free."""
    RH = R * H
    # rows are the INPUT block r2, columns the OUTPUT block r; the tap at
    # offset dx contributes where r = r2 - (dx - 1), i.e. diagonal k = 1-dx
    offdiag = {dx: jnp.asarray(
        jnp.diag(jnp.ones(R - abs(1 - dx)), k=1 - dx), jnp.float32)
        for dx in range(3)}
    wrows = []
    for dy in range(3):
        row = jnp.zeros((RH, RH), jnp.float32)
        for dx in range(3):
            block = (offdiag[dx][:, None, :, None]
                     * w[dy, dx][None, :, None, :]).reshape(RH, RH)
            row = row + block
        wrows.append(row)
    wrow = jnp.stack(wrows)                              # (3, RH, RH)
    bias = jnp.tile(b, R).reshape(1, RH)
    T = ((jnp.ones((R, R), jnp.float32) / R)[:, None, :, None]
         * jnp.eye(H, dtype=jnp.float32)[None, :, None, :]).reshape(RH, RH)
    return wrow, bias, T


@functools.partial(jax.jit, static_argnames=("interpret",))
def ref_attn_diffusion_pallas(a: jnp.ndarray, w: jnp.ndarray,
                              b: jnp.ndarray,
                              interpret: bool = False) -> jnp.ndarray:
    """a: (B, P, R, H) attention planes; w: (3, 3, H, H) conv kernel;
    b: (H,). Returns the diffused planes, same shape/dtype as `a`."""
    B, P, R, H = a.shape
    RH = R * H
    wrow, bias, T = _host_weights(w.astype(jnp.float32),
                                  b.astype(jnp.float32), R, H)
    out = pl.pallas_call(
        _make_kernel(P, RH),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, P, RH), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, RH, RH), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RH), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RH, RH), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, P, RH), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, P, RH), jnp.float32),
        # plane (P, RH) + fused weights (3, RH, RH) + T (RH, RH) + temps:
        # ~21 MB at eval size (P=980, RH=640) — above the 16 MB default
        # scoped-vmem limit, comfortably inside physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(a.reshape(B, P, RH).astype(jnp.float32), wrow, bias, T)
    return out.reshape(B, P, R, H).astype(a.dtype)


@jax.custom_vjp
def ref_attn_diffusion(a: jnp.ndarray, w: jnp.ndarray,
                       b: jnp.ndarray) -> jnp.ndarray:
    """Differentiable diffusion: Pallas forward (interpret mode off-TPU),
    VJP through the identical XLA formulation (swin.py:diffusion_xla)."""
    return ref_attn_diffusion_pallas(
        a, w, b, interpret=jax.default_backend() != "tpu")


def _diff_fwd(a, w, b):
    return ref_attn_diffusion(a, w, b), (a, w, b)


def _diff_bwd(res, ct):
    from gwdepth_tpu.models.swin import diffusion_xla
    a, w, b = res
    _, vjp = jax.vjp(diffusion_xla, a, w, b)
    return vjp(ct)


ref_attn_diffusion.defvjp(_diff_fwd, _diff_bwd)


# ---------------------------------------------------------------------------
# fused windowed multi-head attention (tiny-head_dim regime)
# ---------------------------------------------------------------------------
#
# The class transformers run W-MSA at head_dim = dense_trans_dim/8/16 = 4..8
# over ~1000 windows of N=49 tokens (reference:
# src/models/multiscale_transformerr.py:455-580). As XLA ops the per-head
# logits tensor (nW, H, N, N) is materialized f32 in HBM (~160 MB at the
# 1/4 scale) and read back twice — the three dots/softmax measured
# ~1.9 ms/block at <1% of MXU peak because the contraction depth is 4.
# This kernel keeps each window-chunk's logits row in VMEM and never
# touches the MXU: with WINDOWS ON LANES every step is a full-width VPU
# op — logits[n] accumulates over the hd taps as broadcast MACs, softmax
# reduces over sublanes (the m axis), and the attention@V products reduce
# the same way.  Layouts:
#   qT/kT/vT (H, hd, N, Wp)   biasT (H, N_m, N_n)
#   maskT (N_n, N_m, Wp)      out (H, hd, N, Wp)
# Wp = B*nW padded to a lane multiple; padded windows compute garbage that
# is sliced off by the caller.
#
# CRITICAL integration lesson: preparing these layouts with plain XLA
# transposes of the (B, nW, H, N, hd) heads tensors poisons layout
# assignment upstream — the first integration measured +3.5 ms appearing
# inside backbone/proj convs. `fused_window_attention` therefore absorbs
# every layout flip into the qkv/proj GEMMs themselves (the projection
# einsums emit (3C, N, W) / consume (C, N, W) directly, minor = windows),
# so upstream ops keep their natural layouts and no pure transpose exists.

def _msa_kernel(N: int, hd: int, has_mask: bool):
    def kernel(q_ref, k_ref, v_ref, bias_ref, *rest):
        mask_ref = rest[0] if has_mask else None
        out_ref = rest[-1]
        for n in range(N):
            acc = None
            for d in range(hd):
                t = q_ref[0, d, n:n + 1, :] * k_ref[0, d]   # (N, W)
                acc = t if acc is None else acc + t
            acc = acc + bias_ref[0, :, n:n + 1]
            if has_mask:
                acc = acc + mask_ref[n]
            # softmax over m (the sublane axis)
            mx = jnp.max(acc, axis=0, keepdims=True)
            ex = jnp.exp(acc - mx)
            attn = ex / jnp.sum(ex, axis=0, keepdims=True)
            for d in range(hd):
                out_ref[0, d, n:n + 1, :] = jnp.sum(
                    attn * v_ref[0, d], axis=0, keepdims=True)
    return kernel


@functools.partial(jax.jit,
                   static_argnames=("has_mask", "interpret"))
def _window_msa_pallas(qT, kT, vT, biasT, maskT, has_mask: bool,
                       interpret: bool = False):
    H, hd, N, Wp = qT.shape
    chunks = Wp // 128
    specs = [
        pl.BlockSpec((1, hd, N, 128), lambda h, c: (h, 0, 0, c),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hd, N, 128), lambda h, c: (h, 0, 0, c),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hd, N, 128), lambda h, c: (h, 0, 0, c),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N, N), lambda h, c: (h, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [qT, kT, vT, biasT]
    if has_mask:
        specs.append(pl.BlockSpec((N, N, 128), lambda h, c: (0, 0, c),
                                  memory_space=pltpu.VMEM))
        args.append(maskT)
    return pl.pallas_call(
        _msa_kernel(N, hd, has_mask),
        grid=(H, chunks),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, hd, N, 128), lambda h, c: (h, 0, 0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, hd, N, Wp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*args)


def _fence_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


@functools.partial(jax.jit, static_argnames=("interpret",))
def layout_fence(x, interpret: bool = False):
    """Identity copy through a Pallas call. Custom calls pin their operand
    to the default (row-major, dense-tiled) layout, so XLA's layout
    assignment cannot propagate a downstream op's exotic preferred layout
    past this point — `optimization_barrier` is layout-transparent and
    does NOT do this (measured: the fused attention's windows-minor
    einsum pushed {3,0,2,1:T(1,128)} layouts through the window-partition
    reshapes into the backbone convs, +3.5 ms; the fence stops it for the
    price of one VMEM memcpy, ~0.05 ms on 13 MB)."""
    if x.ndim < 2:
        return x
    lead = x.shape[0]
    step = 8 if lead % 8 == 0 else 1
    rest = x.shape[1:]
    return pl.pallas_call(
        _fence_kernel,
        grid=(lead // step,),
        in_specs=[pl.BlockSpec((step, *rest),
                               lambda i: (i,) + (0,) * len(rest),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((step, *rest),
                               lambda i: (i,) + (0,) * len(rest),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x)


def _prep_bias_mask(bias, mask, B, Wp, pad):
    biasT = jnp.transpose(bias.astype(jnp.float32), (0, 2, 1))
    maskT = None
    if mask is not None:
        # mask/bias are trace-time constants (built from static window
        # geometry), so these transposes/tiles fold away at compile time
        maskT = jnp.transpose(mask.astype(jnp.float32), (1, 2, 0))
        if B > 1:
            maskT = jnp.tile(maskT, (1, 1, B))
        if pad:
            maskT = jnp.pad(maskT, ((0, 0), (0, 0), (0, pad)))
    return biasT, maskT


def window_msa_pallas(q, k, v, bias, mask, interpret: bool = False):
    """Drop-in for the XLA window_msa core (models/swin.py:window_msa):
    q/k/v (B, nW, H, N, hd) with q pre-scaled, bias (H, N, N),
    mask (nW, N, N) additive or None. Returns (B, nW, N, H*hd) f32.

    Uses explicit transposes for layout prep — fine standalone, but when
    embedding in a model prefer `fused_window_attention`, which absorbs
    the layout flips into its projection GEMMs (see note above)."""
    B, nW, H, N, hd = q.shape
    W = B * nW
    Wp = -(-W // 128) * 128
    pad = Wp - W

    def to_lanes(x):
        t = jnp.transpose(x.astype(jnp.float32), (2, 4, 3, 0, 1)
                          ).reshape(H, hd, N, W)
        return jnp.pad(t, ((0, 0), (0, 0), (0, 0), (0, pad))) if pad else t

    biasT, maskT = _prep_bias_mask(bias, mask, B, Wp, pad)
    outT = _window_msa_pallas(to_lanes(q), to_lanes(k), to_lanes(v),
                              biasT, maskT, mask is not None,
                              interpret=interpret)
    out = outT[..., :W].reshape(H, hd, N, B, nW)
    return jnp.transpose(out, (3, 4, 2, 0, 1)).reshape(B, nW, N, H * hd)


def _attention_xla_reference(x, wqkv, bqkv, wproj, bproj, bias, mask,
                             num_heads: int):
    """The exact XLA math `fused_window_attention` replaces: qkv Dense ->
    split heads -> scaled window_msa -> proj Dense. Used as its VJP and
    as the off-TPU/correctness reference."""
    from gwdepth_tpu.models.swin import window_msa, _split_heads
    B, nW, N, C = x.shape
    H = num_heads
    qkv = jnp.einsum("bwnc,ce->bwne", x, wqkv) + bqkv
    q, k, v = jnp.split(qkv, 3, axis=-1)
    scale = (C // H) ** -0.5
    q = _split_heads(q, H) * scale
    k = _split_heads(k, H)
    v = _split_heads(v, H)
    out = window_msa(q, k, v, bias, mask)
    return jnp.einsum("bwnc,ck->bwnk", out, wproj) + bproj


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def fused_window_attention(x, wqkv, bqkv, wproj, bproj, bias, mask,
                           num_heads: int):
    """qkv projection -> fused W-MSA kernel -> output projection, with
    every layout flip absorbed into the projection GEMMs.

    x: (B, nW, N, C); wqkv (C, 3C); bqkv (3C,); wproj (C, C);
    bproj (C,); bias (H, N, N); mask (nW, N, N)|None.
    Returns (B, nW, N, C).

    The qkv einsum emits (3C, N, W) with windows minor — the kernel's
    exact input layout — and the proj einsum contracts the kernel's
    (C, N, W) output straight back to (W, N, C), so no standalone
    transpose exists to leak layouts into upstream ops (the failure mode
    that cost +3.5 ms in backbone convs on the first integration).

    Differentiable: Pallas forward (interpret off-TPU), VJP through the
    identical XLA formulation. The kernel's true-f32 logits are MORE
    accurate than the tunnel XLA path's bf16 matmul passes."""
    H = num_heads
    B, nW, N, C = x.shape
    hd = C // H
    W = B * nW
    Wp = -(-W // 128) * 128
    pad = Wp - W
    interpret = jax.default_backend() != "tpu"

    xf = x.reshape(W, N, C).astype(jnp.float32)
    # layout fence: without it XLA's layout assignment propagates the
    # einsum's preferred operand layout ({3,0,2,1:T(1,128)}) through the
    # window-partition reshapes all the way into the backbone convs,
    # which then run ~4x slower (measured +3.5 ms; see layout_fence)
    xf = layout_fence(xf, interpret=interpret)
    # (3C, N, W): channel-major output, windows minor — kernel layout
    qkvT = jnp.einsum("wnc,ce->enw", xf, wqkv.astype(jnp.float32),
                      preferred_element_type=jnp.float32)
    qkvT = qkvT + bqkv.astype(jnp.float32)[:, None, None]
    if pad:
        qkvT = jnp.pad(qkvT, ((0, 0), (0, 0), (0, pad)))
    qkvT = qkvT.reshape(3, H, hd, N, Wp)
    scale = hd ** -0.5
    qT = qkvT[0] * scale
    biasT, maskT = _prep_bias_mask(bias, mask, B, Wp, pad)
    outT = _window_msa_pallas(qT, qkvT[1], qkvT[2], biasT, maskT,
                              mask is not None, interpret=interpret)
    y = jnp.einsum("cnw,ck->wnk", outT.reshape(C, N, Wp)[..., :W],
                   wproj.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    y = y + bproj.astype(jnp.float32)[None, None, :]
    return y.reshape(B, nW, N, C).astype(x.dtype)


def _fwa_fwd(x, wqkv, bqkv, wproj, bproj, bias, mask, num_heads):
    return (fused_window_attention(x, wqkv, bqkv, wproj, bproj, bias,
                                   mask, num_heads),
            (x, wqkv, bqkv, wproj, bproj, bias, mask))


def _fwa_bwd(num_heads, res, ct):
    x, wqkv, bqkv, wproj, bproj, bias, mask = res
    if mask is None:
        _, vjp = jax.vjp(
            lambda *a: _attention_xla_reference(*a, None, num_heads),
            x, wqkv, bqkv, wproj, bproj, bias)
        return (*vjp(ct), None)
    _, vjp = jax.vjp(
        lambda *a: _attention_xla_reference(*a, num_heads),
        x, wqkv, bqkv, wproj, bproj, bias, mask)
    return vjp(ct)


fused_window_attention.defvjp(_fwa_fwd, _fwa_bwd)
