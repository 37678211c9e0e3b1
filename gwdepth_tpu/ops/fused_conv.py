"""Fused 3x3-conv + LayerNorm + activation Pallas TPU kernel.

Why: the point machinery (models/points.py:PyramidLayer, reference
src/models/points/points_sample.py:45-125) and the dense decoder
(models/decoder.py, reference src/models/dense_upsample.py:74-182) are
chains of [3x3 conv -> channels-last LayerNorm -> GELU/ELU] at batch 1.
As XLA ops each link costs three HBM round trips (conv out, LN out, act
out), and the conv itself runs as an f32 (bf16x3-pass) matmul. Measured
on the v5e, the chain is bandwidth/op-count bound, not FLOPs bound
(casting the whole model to bf16 changes nothing — see STATUS.md).

The kernel computes conv+LN+act(+residual) in ONE pass with the plane
resident in VMEM:

- Layout (C, S): channels in sublanes, flattened padded spatial in
  lanes. This keeps the lane dimension full even for the decoder's
  16-channel planes, which in NHWC pad 8x to the 128 lane tile (see
  CLAUDE.md).
- The 3x3 conv is 9 shifted-slice matmuls: x is zero-padded to
  (Hp, Wp) = (H+2, W+2) and flattened, so tap (dy, dx) is the in-VMEM
  lane slice at offset dy*Wp + dx and the matmul is
  (Co, Ci) @ (Ci, H*Wp) — one large-N MXU contraction per tap, no
  im2col materialisation and no extra HBM traffic for the shifts.
  Outputs land in a (Co, H, Wp) frame whose junk columns (row-crossing
  reads of the zero borders) the caller slices off.
- Cin is tiled over a sequential grid dimension with revisited output
  blocks (the canonical Pallas K-loop), so the 800-channel SPP merge
  (5 x 160 branches) runs without materialising the concat in VMEM:
  LN/act fire only on the last chunk.
- LN reduces over sublanes (channels) in f32; GELU uses the A&S 7.1.26
  erf approximation (|err| <= 1.5e-7 — Mosaic has no erf lowering),
  ELU is exp-based.
- `fast=True` runs the tap matmuls with bf16 inputs / f32 accumulation
  (one MXU pass instead of the three bf16 passes XLA uses for f32).
  This matches the precision class of the reference's own cuDNN TF32
  convs on GPU. `fast=False` keeps XLA's default f32 conv numerics.

Forward semantics match `nn.Conv(3x3, no bias) -> nn.LayerNorm ->
gelu(exact)/elu` exactly (up to fp reassociation); the differentiable
XLA path in the callers remains the training/backward implementation.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from gwdepth_tpu.ops.mosaic_math import elu as _elu
from gwdepth_tpu.ops.mosaic_math import gelu as _gelu

# Co-split threshold for the fused conv's VMEM-resident output block
# (see the guard in conv3x3_ln_act).  Read once at import, like
# IM2COL_DEFAULT below: a mid-process flip would only affect
# not-yet-traced call sites.
import os as _os
CO_SPLIT_BYTES = int(_os.environ.get("GW_CO_SPLIT_MB", "40")) * 1024 * 1024


def _make_kernel(n_k: int, Wp: int, n_s: int, CH: int, has_ln: bool,
                 act: Optional[str], has_res: bool, fast: bool,
                 im2col: bool = False, kc: int = 0):
    """Kernel over chunk-major frames. The spatial chunk index is a MAJOR
    (untiled) ref axis so fori_loop can index it dynamically — Mosaic has
    no dynamic-offset vector load/store on the lane axis, and a
    python-unrolled chunk loop allocated ~3 full output planes of
    non-reused spill slots (94-496 MB at the 1/4-scale sizes). The x
    chunks overlap by 2*Wp+2 lanes (materialized by the caller) so every
    conv tap is a STATIC lane slice within one chunk.

    `im2col=True` gathers the 9 tap slices into a (9*kc, CH) VMEM scratch
    and runs ONE (Co, 9*kc) @ (9*kc, CH) dot per chunk instead of 9
    (Co, kc) @ (kc, CH) dots.  Rationale: at the model's 160/80-channel
    widths each narrow dot wastes most of its MXU passes on the K tail
    (ceil(160/128)=2 passes at 62.5% fill, and the same again on M), so
    the 9-dot form runs at ~26% of bf16 peak (r3 device profile); the
    9*kc contraction amortizes the K tail (1440 -> 12 passes at 93.75%
    fill) for ~1.4x fewer MXU pass-cycles, at the cost of one extra
    VMEM round trip of the slab per chunk (~6%)."""
    def kernel(*refs):
        i = 0
        x_ref = refs[i]; i += 1                     # (1, 1, n_s, Kc, CHs)
        w_ref = refs[i]; i += 1    # (1, 9, Co, Kc) | im2col: (1, Co, 9*Kc)
        if has_ln:
            g_ref = refs[i]; i += 1                 # (Co, 1)
            b_ref = refs[i]; i += 1                 # (Co, 1)
        if has_res:
            r_ref = refs[i]; i += 1                 # (1, n_s, Co, CH)
        out_ref = refs[i]; i += 1                   # (1, n_s, Co, CH)
        col_ref = refs[i] if im2col else None       # (9*Kc, CH) scratch

        k = pl.program_id(1)

        def mm(a, b):
            if fast:  # slabs arrive pre-cast to bf16 (VMEM halving); the
                a = a.astype(jnp.bfloat16)  # casts are no-ops then
                b = b.astype(jnp.bfloat16)
            return jax.lax.dot_general(
                a, b, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        def conv_chunk_taps(i, _):
            acc = None
            for dy in range(3):
                for dx in range(3):
                    o = dy * Wp + dx
                    tap = x_ref[0, 0, i, :, o:o + CH]
                    p = mm(w_ref[0, dy * 3 + dx], tap)
                    acc = p if acc is None else acc + p

            @pl.when(k != 0)
            def _():
                out_ref[0, i] = out_ref[0, i] + acc

            @pl.when(k == 0)
            def _():
                out_ref[0, i] = acc
            return 0

        def conv_chunk_im2col(i, _):
            for j in range(9):
                o = (j // 3) * Wp + (j % 3)
                col_ref[j * kc:(j + 1) * kc] = \
                    x_ref[0, 0, i, :, o:o + CH]
            acc = mm(w_ref[0], col_ref[...])

            @pl.when(k != 0)
            def _():
                out_ref[0, i] = out_ref[0, i] + acc

            @pl.when(k == 0)
            def _():
                out_ref[0, i] = acc
            return 0

        jax.lax.fori_loop(0, n_s,
                          conv_chunk_im2col if im2col else conv_chunk_taps,
                          0, unroll=False)

        if has_ln or act is not None or has_res:
            @pl.when(k == n_k - 1)
            def _():
                def epi_chunk(i, _):
                    y = out_ref[0, i]
                    if has_ln:
                        # LN reduces over sublanes (channels) per spatial
                        # position, so lane chunking is exact
                        mean = jnp.mean(y, axis=0, keepdims=True)
                        d = y - mean
                        var = jnp.mean(d * d, axis=0, keepdims=True)
                        y = d * jax.lax.rsqrt(var + 1e-5)
                        y = y * g_ref[...] + b_ref[...]
                    if act == "gelu":
                        y = _gelu(y)
                    elif act == "elu":
                        y = _elu(y)
                    if has_res:
                        y = y + r_ref[0, i]
                    out_ref[0, i] = y
                    return 0

                jax.lax.fori_loop(0, n_s, epi_chunk, 0, unroll=False)

    return kernel


def _prepare(x: jnp.ndarray):
    """NHWC (B, H, W, C) -> padded channels-major (B, C, S2) f32, with
    S2 = (H+2)*(W+2) + 2 trailing junk lanes so every tap slice of
    length H*(W+2) stays in bounds."""
    B, H, W, C = x.shape
    Wp = W + 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xt = jnp.transpose(xp, (0, 3, 1, 2)).reshape(B, C, (H + 2) * Wp)
    return jnp.pad(xt, ((0, 0), (0, 0), (0, 2))).astype(jnp.float32)


def _finish(y: jnp.ndarray, H: int, W: int):
    """(B, Co, H*(W+2)) frame -> NHWC (B, H, W, Co)."""
    B, Co, _ = y.shape
    y = y.reshape(B, Co, H, W + 2)[:, :, :, :W]
    return jnp.transpose(y, (0, 2, 3, 1))


# --------------------------------------------------------------------------
# frame chaining: consecutive fused convs pass the channels-major padded
# frame (B, C, (H+2)*(W+2)+2) between links instead of round-tripping
# NHWC.  The r5 device profile charged ~0.15-0.2 ms of NHWC<->frame
# transposes to EVERY fused conv in the 1/4 PyramidLayer (~2.2 ms/fwd
# total); inside a chain the only inter-link work is a wide-granule
# chunk-detranspose, a junk-column mask, and a lane pad — all
# HBM-bandwidth ops XLA fuses.
# --------------------------------------------------------------------------

def nhwc_to_frame(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC -> canonical zero-bordered frame (alias of `_prepare`)."""
    return _prepare(x)


def frame_to_nhwc(xf: jnp.ndarray, hw) -> jnp.ndarray:
    """Canonical frame (B, C, (H+2)*(W+2)+2) -> NHWC (B, H, W, C).
    Exact inverse of `nhwc_to_frame` on its image (drops the zero
    borders and junk lanes)."""
    H, W = hw
    B, C, _ = xf.shape
    Wp = W + 2
    y = xf[:, :, :(H + 2) * Wp].reshape(B, C, H + 2, Wp)
    return jnp.transpose(y[:, :, 1:H + 1, 1:W + 1], (0, 2, 3, 1))


@functools.partial(
    jax.jit,
    static_argnames=("act", "fast", "k_chunk", "interpret", "out_dtype",
                     "im2col", "frame_in", "frame_out", "hw"))
def conv3x3_ln_act(x: jnp.ndarray, w: jnp.ndarray,
                   ln_scale: Optional[jnp.ndarray] = None,
                   ln_bias: Optional[jnp.ndarray] = None,
                   residual: Optional[jnp.ndarray] = None,
                   *, act: Optional[str] = None, fast: bool = True,
                   k_chunk: int = 256, interpret: bool = False,
                   out_dtype=None, im2col: bool = False,
                   frame_in: bool = False, frame_out: bool = False,
                   hw=None) -> jnp.ndarray:
    """Fused y = act(LN(conv3x3(x))) [+ residual].

    x: (B, H, W, Cin) NHWC; w: (3, 3, Cin, Cout) HWIO (flax layout, no
    bias — the reference's ConvLn/UpConv convs are all bias-free);
    ln_scale/ln_bias: (Cout,) or None to skip the LayerNorm;
    residual: (B, H, W, Cout) or None; act: None | 'gelu' | 'elu'.
    Cin is processed in `k_chunk` slabs (sequential grid accumulation),
    so arbitrarily wide inputs (the 800-channel SPP concat) never hold
    more than one slab in VMEM.

    `frame_in` / `frame_out` chain consecutive fused convs in the
    canonical frame layout (`nhwc_to_frame` format; `hw` carries the
    static (H, W) a frame's shape cannot); residual must then be a
    frame too.  Junk columns of a `frame_out` result are ZEROED so the
    next link's taps read proper borders.
    """
    if frame_in:
        H, W = hw
        B, Ci, _ = x.shape
    else:
        B, H, W, Ci = x.shape
    Co = w.shape[3]
    Wp = W + 2
    Sout = H * Wp
    # lanes per in-kernel chunk.  At B > 1 the batch grid keeps extra
    # per-batch buffers live (double buffering across b steps) and the
    # bs=4 serving forward measured 848 KB over the 128 MB VMEM budget
    # at CH=4096 — the narrower chunk frees ~5 MB (out block + slab +
    # scratch all scale with CH) at ~1% more halo duplication.
    CH = min(4096 if B == 1 else 3584, -(-Sout // 128) * 128)
    n_s = -(-Sout // CH)
    Sp = n_s * CH                           # lane-padded output frame
    CHs = -(-(CH + 2 * Wp + 2) // 128) * 128  # chunk + tap halo, padded
    S2p = (n_s - 1) * CH + CHs              # slab: every chunk in bounds
    has_ln = ln_scale is not None

    # The whole (Co, Sp) f32 output block lives in VMEM across the K
    # grid; past ~40 MB (the 800->320 SPP merge = 65 MB, the backward's
    # 320->800 dx conv = 170 MB) it cannot coexist with the
    # double-buffered slabs (measured: a 65 MB out block compiles to a
    # 134 MB VMEM program and the chip has 128). Split the conv over Co
    # into kernel-sized pieces (conv only) and run any LN/act epilogue
    # in XLA — LN reduces over ALL channels, so it cannot split.  No
    # ACTIVE eval-path site splits (the 1/4 pyramid is Co=160 = 32 MB);
    # this governs the SPP merges and the backward dx convs.
    if Co * Sp * 4 > CO_SPLIT_BYTES:
        co_b = max(128, (CO_SPLIT_BYTES // (Sp * 4)) // 128 * 128)
        # frames at a split site: fall back through NHWC (no active frame
        # call site splits — the pyramid chain is Co<=320 = 32 MB)
        if frame_in or frame_out:
            xn = frame_to_nhwc(x, (H, W)) if frame_in else x
            rn = (frame_to_nhwc(residual, (H, W))
                  if frame_in and residual is not None else residual)
            y = conv3x3_ln_act(xn, w, ln_scale, ln_bias, rn, act=act,
                               fast=fast, k_chunk=k_chunk,
                               interpret=interpret,
                               out_dtype=jnp.float32, im2col=im2col)
            return (nhwc_to_frame(y) if frame_out else y).astype(
                out_dtype or jnp.float32)
        if co_b >= Co:
            # even a single kernel-sized Co piece exceeds the VMEM budget
            # (Sp too large) — splitting cannot shrink it, and recursing
            # with identical arguments would never terminate.  This
            # spatial size is outside the kernel's envelope; run XLA.
            y = conv3x3_ln_act_reference(x, w, ln_scale, ln_bias,
                                         residual=residual, act=act)
            return y.astype(out_dtype or x.dtype)
        pieces = [
            conv3x3_ln_act(x, w[..., c0:min(c0 + co_b, Co)],
                           act=None, fast=fast, k_chunk=k_chunk,
                           interpret=interpret, out_dtype=jnp.float32,
                           im2col=im2col)
            for c0 in range(0, Co, co_b)]
        y = jnp.concatenate(pieces, axis=-1)
        if has_ln or act is not None or residual is not None:
            y = conv3x3_ln_act_reference(y, None, ln_scale, ln_bias,
                                         residual=residual, act=act)
        return y.astype(out_dtype or x.dtype)

    # narrower slabs for wide inputs (the 800-ch SPP merge): two slabs are
    # live at once (double buffering) next to the revisited output block
    kc = min(k_chunk if Ci <= 256 else 128, Ci)
    n_k = -(-Ci // kc)
    Cip = n_k * kc
    if Cip != Ci:
        if frame_in:
            x = jnp.pad(x, ((0, 0), (0, Cip - Ci), (0, 0)))
        else:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, Cip - Ci)))
        w = jnp.pad(w, ((0, 0), (0, 0), (0, Cip - Ci), (0, 0)))

    # fast mode stores the padded slab and weights in bf16: the kernel
    # multiplies in bf16 anyway, and halving the double-buffered input
    # slab keeps the 1/4-scale 192x256x160 plane under the VMEM budget
    tap_dt = jnp.bfloat16 if fast else jnp.float32
    xs = x.astype(jnp.float32) if frame_in else _prepare(x)
    xs = jnp.pad(xs, ((0, 0), (0, 0), (0, S2p - xs.shape[-1])))
    xs = xs.astype(tap_dt).reshape(B, n_k, kc, S2p)
    # overlapping chunk-major slab: chunk i = lanes [i*CH, i*CH + CHs)
    # (~12% duplication at CH=4096) so in-kernel taps are static slices
    xs = jnp.stack([xs[..., i * CH:i * CH + CHs] for i in range(n_s)],
                   axis=2)                       # (B, nk, ns, kc, CHs)
    w9 = jnp.transpose(w.astype(tap_dt), (0, 1, 3, 2))
    w9 = w9.reshape(9, Co, n_k, kc).transpose(2, 0, 1, 3)  # (nk, 9, Co, kc)
    # sublane alignment for the scratch stores: copy j lands at sublane
    # offset j*kc, which must sit on the (bf16: 16 / f32: 8)-row tile
    use_im2col = im2col and kc % (16 if fast else 8) == 0

    in_specs = [
        pl.BlockSpec((1, 1, n_s, kc, CHs), lambda b, k: (b, k, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if use_im2col:
        # (nk, Co, 9*kc): row c holds the 9 tap rows contiguously in the
        # scratch's gather order (j-major), one wide contraction per chunk
        wik = jnp.transpose(w9, (0, 2, 1, 3)).reshape(n_k, Co, 9 * kc)
        in_specs.append(pl.BlockSpec((1, Co, 9 * kc),
                                     lambda b, k: (k, 0, 0),
                                     memory_space=pltpu.VMEM))
        args = [xs, wik]
    else:
        in_specs.append(pl.BlockSpec((1, 9, Co, kc),
                                     lambda b, k: (k, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args = [xs, w9]
    if has_ln:
        in_specs += [
            pl.BlockSpec((Co, 1), lambda b, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Co, 1), lambda b, k: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args += [ln_scale.astype(jnp.float32).reshape(Co, 1),
                 ln_bias.astype(jnp.float32).reshape(Co, 1)]
    if residual is not None:
        rt = (residual.astype(jnp.float32) if frame_in
              else _prepare(residual))                # (B, Co, S2)
        rt = jax.lax.dynamic_slice_in_dim(rt, Wp + 1, Sout, axis=2)
        rt = jnp.pad(rt, ((0, 0), (0, 0), (0, Sp - Sout)))
        rt = rt.reshape(B, Co, n_s, CH).transpose(0, 2, 1, 3)
        in_specs.append(pl.BlockSpec((1, n_s, Co, CH),
                                     lambda b, k: (b, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(rt)

    kernel = _make_kernel(n_k, Wp, n_s, CH, has_ln, act,
                          residual is not None, fast,
                          im2col=use_im2col, kc=kc)

    y = pl.pallas_call(
        kernel,
        grid=(B, n_k),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, n_s, Co, CH), lambda b, k: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_s, Co, CH), jnp.float32),
        scratch_shapes=([pltpu.VMEM((9 * kc, CH), tap_dt)]
                        if use_im2col else []),
        compiler_params=pltpu.CompilerParams(
            # 126 MB of the chip's 128: the bs=4 serving forward's
            # pyramid convs measure 120.3 MB scoped at CH=3584 (the
            # B>1 grid double-buffers the next batch row's slab)
            vmem_limit_bytes=126 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    y = y.transpose(0, 2, 1, 3).reshape(B, Co, Sp)
    if frame_out:
        # junk columns (row-crossing taps) MUST zero before re-framing:
        # the next link's taps read them as border values
        mask = (jnp.arange(Sout) % Wp) < W
        yf = jnp.where(mask, y[:, :, :Sout], 0.0)
        F = (H + 2) * Wp + 2
        yf = jnp.pad(yf, ((0, 0), (0, 0), (Wp + 1, F - (Wp + 1) - Sout)))
        return yf.astype(out_dtype or jnp.float32)
    out = _finish(y[:, :, :Sout], H, W)
    return out.astype(out_dtype or x.dtype)


# Model-path default for the im2col kernel formulation (see _make_kernel);
# measured in-model on the v5e eval forward: 38.94 ms/img (im2col) vs
# 40.06 (taps) with an unchanged 39.5 ms XLA control in both processes —
# default ON.  GW_IM2COL=0 flips the fused serving/training path back for
# A/B runs without touching call sites.  Read once at import: jit retrace
# caches key on the traced graph, so a mid-process flip would not apply.
import os as _os
IM2COL_DEFAULT = _os.environ.get("GW_IM2COL", "1") == "1"


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_conv_ln_act(x, w, ln_scale, ln_bias, act):
    """Differentiable fused conv+LN+act: Pallas forward (bf16 taps, f32
    accumulation — the precision class of the reference's TF32 cuDNN
    convs), XLA-reference VJP backward. On CPU backends the Pallas call
    runs in interpret mode, so the op works everywhere."""
    interp = jax.default_backend() != "tpu"
    return conv3x3_ln_act(x, w, ln_scale, ln_bias, act=act, fast=True,
                          interpret=interp, im2col=IM2COL_DEFAULT)


def _fused_fwd(x, w, ln_scale, ln_bias, act):
    return fused_conv_ln_act(x, w, ln_scale, ln_bias, act), \
        (x, w, ln_scale, ln_bias)


def _act_grad_at(act: Optional[str], n: jnp.ndarray) -> jnp.ndarray:
    """d act(n) / dn evaluated at the pre-activation n (f32)."""
    if act == "gelu":  # exact: Phi(n) + n * phi(n)
        phi = jnp.exp(-0.5 * n * n) * (1.0 / jnp.sqrt(2.0 * jnp.pi))
        Phi = 0.5 * (1.0 + jax.lax.erf(n * (2.0 ** -0.5)))
        return Phi + n * phi
    if act == "elu":
        return jnp.where(n > 0, 1.0, jnp.exp(jnp.minimum(n, 0.0)))
    return jnp.ones_like(n)


def _fused_bwd(act, res, ct):
    """Analytic VJP: one Pallas conv recompute (pre-LN activations), the
    standard per-position LayerNorm backward in XLA, a Pallas conv for
    dx (rot-180 transposed kernel), and 9 shifted-slice matmuls for dw.
    Same op count as XLA's own conv+LN backward-with-remat, but the two
    convs run through the fast kernel layout."""
    x, w, g, b = res
    interp = jax.default_backend() != "tpu"
    f32 = jnp.float32
    c = conv3x3_ln_act(x, w, act=None, fast=True, interpret=interp,
                       out_dtype=f32, im2col=IM2COL_DEFAULT)  # (B,H,W,Co) f32
    if g is None:
        # no LayerNorm in the forward — the pre-activation is the conv
        dn = ct.astype(f32) * _act_grad_at(act, c)
        dg = db = None
        dc = dn
    else:
        mu = jnp.mean(c, axis=-1, keepdims=True)
        d0 = c - mu
        inv = jax.lax.rsqrt(jnp.mean(d0 * d0, axis=-1, keepdims=True) + 1e-5)
        xhat = d0 * inv
        n = xhat * g.astype(f32) + b.astype(f32)

        dn = ct.astype(f32) * _act_grad_at(act, n)
        dg = jnp.sum(dn * xhat, axis=(0, 1, 2)).astype(g.dtype)
        db = jnp.sum(dn, axis=(0, 1, 2)).astype(b.dtype)
        dxh = dn * g.astype(f32)
        dc = inv * (dxh - jnp.mean(dxh, axis=-1, keepdims=True)
                    - xhat * jnp.mean(dxh * xhat, axis=-1, keepdims=True))

    # dx: conv with the rotated, io-transposed kernel
    w_flip = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))    # (3,3,Co,Ci)
    dx = conv3x3_ln_act(dc, w_flip.astype(f32), act=None, fast=True,
                        interpret=interp, out_dtype=f32,
                        im2col=IM2COL_DEFAULT)

    # dw[ky,kx,ci,co] = sum_{b,y,x} xpad[b,y+ky-1,x+kx-1,ci] * dc[b,y,x,co]
    B, H, W, _ = x.shape
    xpad = jnp.pad(x.astype(f32), ((0, 0), (1, 1), (1, 1), (0, 0)))
    dw = jnp.stack([
        jnp.stack([
            jnp.einsum("bhwc,bhwd->cd", xpad[:, ky:ky + H, kx:kx + W], dc,
                       preferred_element_type=f32)
            for kx in range(3)])
        for ky in range(3)])                               # (3,3,Ci,Co)
    return dx.astype(x.dtype), dw.astype(w.dtype), dg, db


fused_conv_ln_act.defvjp(_fused_fwd, _fused_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_conv_ln_act_frame(xf, w, ln_scale, ln_bias, act, hw):
    """`fused_conv_ln_act` over the canonical frame layout: xf and the
    result are `nhwc_to_frame` frames, so chained links skip the
    NHWC<->frame transposes entirely (the r5 profile charged
    ~0.15-0.2 ms of them to every fused conv in the 1/4 pyramid).
    The VJP routes through the NHWC machinery: extraction/embedding are
    exact 0/1-orthogonal linear maps, so
    d xf = embed(d x_nhwc) and ct_nhwc = extract(ct_frame) — correct by
    construction, reusing `_fused_bwd` unchanged."""
    interp = jax.default_backend() != "tpu"
    return conv3x3_ln_act(xf, w, ln_scale, ln_bias, act=act, fast=True,
                          interpret=interp, im2col=IM2COL_DEFAULT,
                          frame_in=True, frame_out=True, hw=hw)


def _frame_fwd(xf, w, ln_scale, ln_bias, act, hw):
    return fused_conv_ln_act_frame(xf, w, ln_scale, ln_bias, act, hw), \
        (xf, w, ln_scale, ln_bias)


def _frame_bwd(act, hw, res, ct):
    xf, w, g, b = res
    x = frame_to_nhwc(xf, hw)
    ct_n = frame_to_nhwc(ct, hw)
    dx, dw, dg, db = _fused_bwd(act, (x, w, g, b), ct_n)
    return nhwc_to_frame(dx).astype(xf.dtype), dw, dg, db


fused_conv_ln_act_frame.defvjp(_frame_fwd, _frame_bwd)


def conv3x3_tapdots(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """3x3/stride-1/SAME conv as 9 shifted-slice einsums (pure XLA).

    Why: XLA-TPU's native conv lowering re-blocks activations into its
    internal [H, 8, ceil(W/8)+halo, C] spatial-blocked layout around BOTH
    the forward conv and (worse) the weight-grad — the r4 train-step HLO
    carries 1582 copies totaling 8.9 GB/step, dominated by these conv
    relayouts in the PyramidLayer chains (f32[176,8,33,C] / bf16[...800]
    shapes, ~10.8 ms at HBM bandwidth).  Expressed as tap einsums the
    forward is 9 plain dots on NHWC slices (no relayout), and autodiff
    produces dw = activation^T @ grad contractions with K = B*H*W (MXU
    pass-efficient and copy-free) instead of conv-wgrad relayouts.
    Numerics: identical multiplies, f32-accumulated dots; the tap sum
    reassociates vs the native conv exactly like the Pallas kernel does."""
    B, H, W, Ci = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = None
    for dy in range(3):
        for dx in range(3):
            t = jnp.einsum("bhwc,cd->bhwd", xp[:, dy:dy + H, dx:dx + W],
                           w[dy, dx], preferred_element_type=jnp.float32)
            y = t if y is None else y + t
    return y


def conv3x3_ln_act_reference(x, w, ln_scale=None, ln_bias=None,
                             residual=None, *, act=None):
    """Pure-XLA reference implementation (tests + backward/CPU path).
    `w=None` skips the conv (LN/act/residual epilogue only)."""
    if w is None:
        y = x.astype(jnp.float32)
    else:
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.float32), w.astype(jnp.float32), (1, 1),
            ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if ln_scale is not None:
        mean = jnp.mean(y, axis=-1, keepdims=True)
        d = y - mean
        var = jnp.mean(d * d, axis=-1, keepdims=True)
        y = d * jax.lax.rsqrt(var + 1e-5) * ln_scale + ln_bias
    if act == "gelu":
        y = jax.nn.gelu(y, approximate=False)
    elif act == "elu":
        y = jax.nn.elu(y)
    if residual is not None:
        y = y + residual.astype(jnp.float32)
    return y.astype(x.dtype)
