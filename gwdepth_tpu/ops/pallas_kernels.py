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
