"""MeRF-style L-infinity scene contraction.

Maps unbounded coordinates into [-2, 2]^3: identity inside the unit cube,
and a per-axis inversion of the dominant axis outside
(reference: nerf/renderer.py:78-99; applied in-kernel at raymarching.cu:421-429).

The reference implements this with an in-place ``scatter_`` on the argmax
axis; here we use a branchless ``where`` on the max-magnitude mask, which XLA
fuses into surrounding elementwise work.
"""

from __future__ import annotations

import jax.numpy as jnp


def contract(x):
    """[-inf, inf]^C -> [-2, 2]^C, identity within the unit cube.

    For |x|_inf = m > 1: the dominant axis maps to sign * (2 - 1/m) and the
    remaining axes scale by 1/m.
    """
    mag = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    # avoid div-by-zero at the origin; the result there is selected away
    safe_mag = jnp.maximum(mag, 1e-12)
    is_max = jnp.abs(x) == mag
    scale = jnp.where(is_max, (2.0 - 1.0 / safe_mag) / safe_mag, 1.0 / safe_mag)
    return jnp.where(mag <= 1.0, x, x * scale)


def uncontract(z):
    """Inverse of :func:`contract` (reference renderer.py:90-99)."""
    mag = jnp.max(jnp.abs(z), axis=-1, keepdims=True)
    is_max = jnp.abs(z) == mag
    denom_other = jnp.maximum(2.0 - mag, 1e-8)
    denom_max = jnp.maximum(2.0 * mag - mag * mag, 1e-8)
    scale = jnp.where(is_max, 1.0 / denom_max, 1.0 / denom_other)
    return jnp.where(mag <= 1.0, z, z * scale)
