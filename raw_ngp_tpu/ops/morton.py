"""Morton (Z-order) 3D codes via parallel bit interleaving.

The occupancy bitfield is addressed in Morton order so neighbouring cells
share cache lines during marching (reference: raymarching/src/raymarching.cu:
56-81 ``__morton3D``/``__morton3D_invert``, exposed as ``morton3D`` /
``morton3D_invert`` bindings). Implemented here with vectorized uint32
magic-number bit spreading — pure jnp, runs on the VPU.
"""

from __future__ import annotations

import jax.numpy as jnp


def _expand_bits(v):
    """Spread the low 10 bits of v so consecutive bits land 3 apart."""
    v = v.astype(jnp.uint32)
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton3d(coords):
    """[..., 3] integer coords in [0, 1024) -> [...] uint32 Morton codes."""
    x = _expand_bits(coords[..., 0])
    y = _expand_bits(coords[..., 1])
    z = _expand_bits(coords[..., 2])
    return x | (y << jnp.uint32(1)) | (z << jnp.uint32(2))


def _compact_bits(v):
    """Inverse of :func:`_expand_bits`."""
    v = v.astype(jnp.uint32) & jnp.uint32(0x49249249)
    v = (v ^ (v >> jnp.uint32(2))) & jnp.uint32(0xC30C30C3)
    v = (v ^ (v >> jnp.uint32(4))) & jnp.uint32(0x0F00F00F)
    v = (v ^ (v >> jnp.uint32(8))) & jnp.uint32(0xFF0000FF)
    v = (v ^ (v >> jnp.uint32(16))) & jnp.uint32(0x000003FF)
    return v


def morton3d_invert(codes):
    """[...] uint32 Morton codes -> [..., 3] int32 coords."""
    codes = codes.astype(jnp.uint32)
    x = _compact_bits(codes)
    y = _compact_bits(codes >> jnp.uint32(1))
    z = _compact_bits(codes >> jnp.uint32(2))
    return jnp.stack([x, y, z], axis=-1).astype(jnp.int32)
