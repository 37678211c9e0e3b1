"""Scalar math shared by the Mosaic (Pallas TPU) kernels.

Mosaic lowering has no erf/erfc (CLAUDE.md), so the kernels evaluate the
Abramowitz & Stegun 7.1.26 rational approximation (|err| <= 1.5e-7)
inline.  One definition here keeps the fused-conv and diffusion kernels
numerically identical — a coefficient/precision fix must hit both.
"""

from __future__ import annotations

import jax.numpy as jnp


def erf(z: jnp.ndarray) -> jnp.ndarray:
    """A&S 7.1.26 rational erf (|err| <= 1.5e-7)."""
    az = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * az)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return jnp.sign(z) * (1.0 - poly * jnp.exp(-az * az))


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf-form) GELU via the rational erf above."""
    return x * 0.5 * (1.0 + erf(x * (2.0 ** -0.5)))


def elu(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(x > 0, x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0)
