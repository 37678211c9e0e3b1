"""Surface-normal estimation from depth (SNE).

Jittable JAX port of the reference's aggregation-based normal estimator
(reference: src/models/sne_model.py:6-90; used offline by the dataset
toolchain's `depth_extend` normal generation — the training path never
imports it, its geometry_utils.py:8 import is commented out).

Algorithm (SNE-RoadSeg style): deproject depth to camera-space X/Y/Z,
take horizontal/vertical gradients of the inverse depth for the azimuth
`phi`, then aggregate 8 directional finite-difference estimates of the
elevation and recompose the unit normal. Reference quirks kept: the
azimuth adds pi via `atan` (not atan2), Y<=0 zeroing, fx used for both X
and Y deprojection (sne_model.py:21-22), and the final ny>0 sign flip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# 8 directional difference kernels (reference: sne_model.py:42-49)
_DIFF = np.array([[-1, 0, 0, 0, 1, 0, 0, 0, 0],
                  [0, -1, 0, 0, 1, 0, 0, 0, 0],
                  [0, 0, -1, 0, 1, 0, 0, 0, 0],
                  [0, 0, 0, -1, 1, 0, 0, 0, 0],
                  [0, 0, 0, 0, 1, -1, 0, 0, 0],
                  [0, 0, 0, 0, 1, 0, -1, 0, 0],
                  [0, 0, 0, 0, 1, 0, 0, -1, 0],
                  [0, 0, 0, 0, 1, 0, 0, 0, -1]],
                 np.float32).reshape(8, 3, 3)


def _conv3(x: jnp.ndarray, k: np.ndarray) -> jnp.ndarray:
    """(H, W) (+) 3x3 kernel, zero-pad SAME."""
    return jax.lax.conv_general_dilated(
        x[None, :, :, None], jnp.asarray(k)[:, :, None, None],
        (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))[0, :, :, 0]


def _nan_to(x: jnp.ndarray, v: float = 0.0) -> jnp.ndarray:
    return jnp.where(jnp.isnan(x), v, x)


def sne_normals(depth: jnp.ndarray, cam: jnp.ndarray) -> jnp.ndarray:
    """depth: (H, W) meters; cam: (3, 3) intrinsics (see
    `gwdepth_tpu.models.geometry` / tools.depth_completion intrinsics).
    Returns (3, H, W) unit normals, reference layout (sne_model.py:90)."""
    H, W = depth.shape
    v_map, u_map = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                                jnp.arange(W, dtype=jnp.float32),
                                indexing="ij")
    Z = depth.astype(jnp.float32)
    Y = Z * (v_map - cam[1, 2]) / cam[0, 0]   # fx for both axes (ref :21-22)
    X = Z * (u_map - cam[0, 2]) / cam[0, 0]
    bad = Y <= 0
    Z = jnp.where(bad, 0.0, Z)
    Y = jnp.where(bad, 0.0, Y)
    Z = _nan_to(Z)
    D = 1.0 / Z                                # inf where Z==0, as reference

    gx = np.array([[0, 0, 0], [-1, 0, 1], [0, 0, 0]], np.float32)
    gy = np.array([[0, -1, 0], [0, 0, 0], [0, 1, 0]], np.float32)
    nx_t = _conv3(D, gx) * cam[0, 0]
    ny_t = _conv3(D, gy) * cam[1, 1]

    phi = jnp.arctan(ny_t / nx_t) + jnp.pi     # atan, not atan2 (ref :37)
    a = jnp.cos(phi)
    b = jnp.sin(phi)

    sum_nx = jnp.zeros((H, W), jnp.float32)
    sum_ny = jnp.zeros((H, W), jnp.float32)
    sum_nz = jnp.zeros((H, W), jnp.float32)
    for i in range(8):
        X_d = _conv3(X, _DIFF[i])
        Y_d = _conv3(Y, _DIFF[i])
        Z_d = _conv3(Z, _DIFF[i])
        nz_i = (nx_t * X_d + ny_t * Y_d) / Z_d
        norm = jnp.sqrt(nx_t ** 2 + ny_t ** 2 + nz_i ** 2)
        sum_nx = sum_nx + _nan_to(nx_t / norm)
        sum_ny = sum_ny + _nan_to(ny_t / norm)
        sum_nz = sum_nz + _nan_to(nz_i / norm)

    theta = -jnp.arctan((sum_nx * a + sum_ny * b) / sum_nz)
    nx = jnp.sin(theta) * jnp.cos(phi)
    ny = jnp.sin(theta) * jnp.sin(phi)
    nz = jnp.cos(theta)
    isnan = jnp.isnan(nz)
    nx = jnp.where(isnan, 0.0, nx)
    ny = jnp.where(isnan, 0.0, ny)
    nz = jnp.where(isnan, -1.0, nz)
    sign = jnp.where(ny > 0, -1.0, 1.0)
    return jnp.stack([nx * sign, ny * sign, nz * sign], axis=0)
