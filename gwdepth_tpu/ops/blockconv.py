"""Space-to-depth (block-domain) 3x3 convolutions for tiny-channel stages.

Why: the dense decoder's tail (reference: src/models/dense_upsample.py:74-182)
runs 3x3 convs at 16-32 channels over 1/2- and full-resolution planes. On
TPU the minor (lane) dimension tiles to 128, so a 16-channel NHWC conv pads
8x in both operands — measured 1.7-2.0 ms per full-res conv link at
768x1024x16 vs 0.45 ms for the same pixel count at 160 channels. The fix is
a layout change, not a kernel: carry those stages in space-to-depth form,
where an (H, W, C) plane lives on the quarter-resolution grid as
(H/s, W/s, s*s*C) with 64-256 block-channels that fill the lanes.

A stride-1 3x3 conv (and its composition with the decoder's nearest x2
upsample) maps EXACTLY to a 3x3 conv on the block grid with a remapped
kernel: output sub-pixel p of a block reads input pixel m = floor((p+k-u+?)
.. per tap k, which lands in neighbour block q = floor(m/si) at sub-pixel
r = m mod si. The per-axis relation is encoded in a tiny 0/1 tensor
A[p, k, q, r] and the block kernel is

    K[qy,qx, (ry,rx,ci), (py,px,co)] =
        sum_{ky,kx} Ay[py,ky,qy,ry] * Ax[px,kx,qx,rx] * w[ky,kx,ci,co]

built from the ORIGINAL (3,3,ci,co) parameters at trace time (a few-MB
einsum on the host of the params — free). Zero-padding the block grid by
one block supplies more border zeros than the pixel conv's pad=1, but every
extra position has zero weight, so outputs are bit-exactly the same
convolution (up to fp reassociation). Everything stays differentiable and
works on any backend; it is a pure-XLA re-layout of the same math.

Verified against `lax.conv_general_dilated` + `resize_nearest_nhwc` in
tests/test_blockconv.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def space_to_depth(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/s, W/s, s*s*C); channel index (ry*s+rx)*C+ci."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // s, s, W // s, s, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H // s, W // s, s * s * C)


def depth_to_space(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """Inverse of `space_to_depth`."""
    B, h, w, C2 = x.shape
    C = C2 // (s * s)
    x = x.reshape(B, h, w, s, s, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, h * s, w * s, C)


@functools.lru_cache(maxsize=None)
def _axis_map(s_out: int, u: int) -> np.ndarray:
    """A[p, k, q, r] in {0,1}: output sub-pixel p (of s_out), conv tap
    k in {0,1,2} (offset k-1), input block offset q in {0,1,2} (offset
    q-1), input sub-pixel r (of si = s_out//u). u = output_res/input_res
    (1 for same-res conv, 2 for nearest-x2-upsample-then-conv)."""
    # the derivation assumes s_out = u * si exactly; truncating would
    # build a plausibly-shaped but mathematically wrong kernel
    assert s_out % u == 0, (s_out, u)
    si = s_out // u
    A = np.zeros((s_out, 3, 3, si), np.float32)
    for p in range(s_out):
        for k in range(3):
            m = (p + k - 1) // u  # python // floors, also for negatives
            q, r = divmod(m, si)
            assert -1 <= q <= 1, (s_out, u, p, k, q)
            A[p, k, q + 1, r] += 1.0
    return A


def block_kernel(w: jnp.ndarray, s_out: int, u: int) -> jnp.ndarray:
    """Remap a (3, 3, ci, co) stride-1 pad-1 conv kernel (optionally
    composed with a preceding nearest x2 upsample when u == 2) to the
    equivalent (3, 3, si*si*ci, s_out*s_out*co) block-grid kernel."""
    A = jnp.asarray(_axis_map(s_out, u))
    si = s_out // u
    ci, co = w.shape[2], w.shape[3]
    K = jnp.einsum("pkqr,PKQR,kKio->qQrRipPo", A, A, w)
    return K.reshape(3, 3, si * si * ci, s_out * s_out * co)


def block_conv(x: jnp.ndarray, w: jnp.ndarray, s_out: int,
               u: int = 1) -> jnp.ndarray:
    """Apply a pixel-domain 3x3 stride-1 pad-1 conv (u=1), or nearest x2
    upsample followed by such a conv (u=2), entirely on the block grid.

    x: (B, h, w, si*si*ci) block-domain input (si = s_out//u);
    w: (3, 3, ci, co) ORIGINAL pixel-domain kernel.
    Returns (B, h, w, s_out*s_out*co).
    """
    K = block_kernel(w, s_out, u)
    # NOTE: lax.conv, deliberately.  A tap-einsum form (9 shifted NHWC
    # dots, as ops/fused_conv.py:conv3x3_tapdots) was tried here to kill
    # the ~0.8 ms/forward of conv-blocking copies the native lowering
    # carries — but at these half/quarter-res pixel counts each tap dot
    # round-trips the full activation through HBM and the measured tail
    # went 5.2 -> 15.8 ms/forward.  The native conv keeps all 9 taps in
    # VMEM; its relayout copies are the cheaper evil.
    return jax.lax.conv_general_dilated(
        x, K.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def block_conv_xcy(x: jnp.ndarray, w: jnp.ndarray, s_out: int,
                   u: int = 1) -> jnp.ndarray:
    """`block_conv` emitting (px, co, py)-ordered block channels — feed
    its output to `depth_to_space_mm` for a relayout-free unblock."""
    K = block_kernel_xcy(w, s_out, u)
    return jax.lax.conv_general_dilated(
        x, K.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def block_kernel_xcy(w: jnp.ndarray, s_out: int, u: int) -> jnp.ndarray:
    """`block_kernel` with output block channels ordered (px, co, py)
    instead of (py, px, co) — the order `depth_to_space_mm` consumes.
    Pure trace-time einsum on the parameters; same math."""
    A = jnp.asarray(_axis_map(s_out, u))
    si = s_out // u
    ci, co = w.shape[2], w.shape[3]
    K = jnp.einsum("pkqr,PKQR,kKio->qQrRiPop", A, A, w)
    return K.reshape(3, 3, si * si * ci, s_out * s_out * co)


def _w_interleave(w: int, s: int, C: int) -> jnp.ndarray:
    """0/1 matrix P[(j, dj, c), (x2, c')] with x2 = j*s + dj, c' = c:
    contracting a (…, w, s, C) tensor against it interleaves the column
    blocks (and carries channels along) in ONE MXU dot.

    Built from IOTAS inside the traced graph, NOT as a baked numpy
    literal: at 768x1024 the seg head's P is 16.8 MB, and serializing it
    into the program blew the remote-TPU tunnel's upload limit
    (remote_compile HTTP 413).  The iota build materializes the same
    matrix on device for ~2 HBM passes (~40 us), zero program bytes."""
    j = jnp.arange(w)[:, None, None, None]
    dj = jnp.arange(s)[None, :, None, None]
    c = jnp.arange(C)[None, None, :, None]
    t = jnp.arange(w * s * C)[None, None, None, :]
    return ((t // C == j * s + dj) & (t % C == c)).astype(jnp.float32)


def depth_to_space_mm(y: jnp.ndarray, s: int) -> jnp.ndarray:
    """depth_to_space for block channels ordered (px, co, py) — pair with
    `block_kernel_xcy` on the producing conv.

    Rationale (r5 device profile): the final head-output d2s at C=1/2
    runs as a tiny-granule transpose at ~3% of HBM bandwidth
    (copy+reshape pairs totaling ~1.6 ms/forward at 768x1024).  With
    channels ordered (dj, c, di), the column interleave is one EXACT 0/1
    matmul (every output sums exactly one product, so f32 numerics are
    bit-identical) whose operand layout already has di trailing — and
    the row interleave then needs NO data movement at all:
    (B, h, di, x2, c) flattens to (B, h*s, x2, c) row-major as-is.
    """
    B, h, w, C2 = y.shape
    C = C2 // (s * s)
    P = _w_interleave(w, s, C)
    # contract (w, dj, c); di stays free and trails -> (B, h, di, x2*C)
    y = y.reshape(B, h, w, s, C, s)
    t = jax.lax.dot_general(
        y, P, dimension_numbers=(((2, 3, 4), (0, 1, 2)), ((), ())))
    # wait-free row interleave: (B, h, di, x2, C) -> (B, h*s, x2, C)
    t = t.reshape(B, h, s, w * s, C)
    return t.reshape(B, h * s, w * s, C)
