"""Ray generation and AABB intersection.

TPU-native ports of the reference's ray utilities:
  * slab-test near/far (reference nerf/renderer.py:139-158)
  * pinhole ray generation with pixel sampling
    (reference nerf/train_utils.py:96-172)

Everything here is jit-friendly: static shapes, no host syncs. Pixel
sampling uses ``jax.random`` keys instead of torch RNG so the whole
data->rays->render->loss step stays inside one compiled program.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def near_far_from_aabb(rays_o, rays_d, aabb, min_near: float = 0.05):
    """Slab test of rays against an axis-aligned box.

    Args:
      rays_o, rays_d: [..., 3]
      aabb: [6] = (xmin, ymin, zmin, xmax, ymax, zmax)
    Returns:
      near, far: [..., 1]; both 1e9 when the ray misses the box.
    """
    tmin = (aabb[:3] - rays_o) / (rays_d + 1e-15)
    tmax = (aabb[3:] - rays_o) / (rays_d + 1e-15)
    near = jnp.max(jnp.minimum(tmin, tmax), axis=-1, keepdims=True)
    far = jnp.min(jnp.maximum(tmin, tmax), axis=-1, keepdims=True)
    miss = far < near
    near = jnp.where(miss, 1e9, near)
    far = jnp.where(miss, 1e9, far)
    near = jnp.maximum(near, min_near)
    return near, far


def sample_pixel_indices(
    key,
    num_rays: int,
    H: int,
    W: int,
    patch_size: int = 1,
):
    """Random pixel indices, optionally in square patches
    (reference train_utils.py:119-141). Returns flat indices [num_rays]."""
    if patch_size > 1:
        num_patch = num_rays // (patch_size ** 2)
        kx, ky = jax.random.split(key)
        inds_x = jax.random.randint(kx, (num_patch,), 0, H - patch_size)
        inds_y = jax.random.randint(ky, (num_patch,), 0, W - patch_size)
        pi, pj = jnp.meshgrid(jnp.arange(patch_size), jnp.arange(patch_size),
                              indexing="ij")
        offs = jnp.stack([pi.reshape(-1), pj.reshape(-1)], axis=-1)  # [p^2, 2]
        inds = jnp.stack([inds_x, inds_y], axis=-1)[:, None, :] + offs[None]
        inds = inds.reshape(-1, 2)
        return inds[:, 0] * W + inds[:, 1]
    return jax.random.randint(key, (num_rays,), 0, H * W)


def pixel_rays(
    pose,             # [3, 4] or [4, 4] cam2world (or [N, 3/4, 4] per-ray)
    intrinsics,       # [4] = (fx, fy, cx, cy)
    flat_inds,        # [N] flat pixel indices (i*W + j is NOT used; see below)
    W: int,
):
    """Build rays through pixel centers for flat indices ``ind = row*W + col``.

    Follows the reference camera convention (train_utils.py:152-161):
    OpenGL-style, x right, y up, camera looks down -z; directions are NOT
    normalized so composited ``t`` equals metric depth.
    """
    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    row = (flat_inds // W).astype(jnp.float32) + 0.5   # j in the reference
    col = (flat_inds % W).astype(jnp.float32) + 0.5    # i in the reference
    xs = (col - cx) / fx
    ys = -(row - cy) / fy
    zs = -jnp.ones_like(xs)
    directions = jnp.stack([xs, ys, zs], axis=-1)      # [N, 3]

    rot = pose[..., :3, :3]
    trans = pose[..., :3, 3]
    if pose.ndim == 2:
        rays_d = directions @ rot.T
        rays_o = jnp.broadcast_to(trans, rays_d.shape)
    else:
        rays_d = jnp.einsum("nij,nj->ni", rot, directions)
        rays_o = jnp.broadcast_to(trans, rays_d.shape)
    return rays_o, rays_d


def full_image_rays(pose, intrinsics, H: int, W: int):
    """Rays for every pixel of an image, row-major [H*W, 3]."""
    inds = jnp.arange(H * W)
    return pixel_rays(pose, intrinsics, inds, W)


def sph_from_ray(rays_o, rays_d, radius: float):
    """Normalized spherical coords of each ray's FAR intersection with the
    ``radius`` sphere (reference raymarching.cu:163-198 / sph_from_ray):
    solve ||o + t d|| = radius for the larger root, then (theta, phi)
    with y up, both mapped to [-1, 1]. Used as the input parameterization
    of background models.

    rays_o, rays_d: [..., 3] (directions need not be unit length).
    Returns [..., 2] float32.
    """
    A = jnp.sum(rays_d * rays_d, axis=-1)
    B = jnp.sum(rays_o * rays_d, axis=-1)          # B/2 of the quadratic
    C = jnp.sum(rays_o * rays_o, axis=-1) - radius * radius
    disc = jnp.maximum(B * B - A * C, 0.0)
    t = (-B + jnp.sqrt(disc)) / A                  # larger (positive) root
    p = rays_o + t[..., None] * rays_d
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    theta = jnp.arctan2(jnp.sqrt(x * x + z * z), y)     # [0, pi)
    phi = jnp.arctan2(z, x)                             # [-pi, pi)
    return jnp.stack([2.0 * theta / jnp.pi - 1.0, phi / jnp.pi], axis=-1)
