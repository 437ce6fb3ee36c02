"""Jitted per-step ray-batch sampling.

Replaces the reference's DataLoader-collate path (colmap_provider.py:
585-656), which runs torch ops + an optional pose-optimizer forward on
every step outside the training graph. Here the whole chain — image/pixel
sampling, pose refinement, ray generation, GT gather, Bayer loss mask —
is one pure function that jits into the train step: zero host<->device
traffic per step (the reference leaks a sync per step,
raymarching.py:303; SURVEY.md §3.1).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from raw_ngp_tpu.ops.lie import apply_refinement
from raw_ngp_tpu.ops.rays import pixel_rays


def bayer_lossmult(rows, cols):
    """Binary RGB Bayer mask for integer pixel coords — RGGB pattern
    (reference raw/raw_utils.py:141-150 pixels_to_bayer_mask; applied at
    colmap_provider.py:627-630 for mosaiced training)."""
    r = ((cols % 2 == 0) & (rows % 2 == 0))
    g = (((cols % 2 == 1) & (rows % 2 == 0))
         | ((cols % 2 == 0) & (rows % 2 == 1)))
    b = ((cols % 2 == 1) & (rows % 2 == 1))
    return jnp.stack([r, g, b], axis=-1).astype(jnp.float32)


def sample_ray_batch(
    key,
    images,                 # [n, H, W, C] device array
    poses,                  # [n, 4, 4]
    intrinsics,             # [4]
    num_rays: int,          # static
    random_image_batch: bool = True,
    se3_refine=None,        # [n, 6] pose corrections or None
    pose_noise=None,        # [n, 3, 4] synthetic perturbation or None
    exposures=None,         # [n, 1] or None
    ldirs=None,             # [n, 3] or None
    cam_near_far=None,      # [n, 2] or None
    mosaiced: bool = False,
    patch_size: int = 1,
    coords=None,            # [num_rays, 2] explicit (row, col) or None
    coord_image_indices=None,  # [num_rays] image ids for coords or None
) -> Dict[str, jnp.ndarray]:
    """Sample a training ray bundle. Returns rays, GT pixels and per-ray
    conditioning, everything [num_rays, ...].

    ``coords`` replicates the reference's explicit-pixel hook
    (train_utils.py:121-123, ``coords[:, 0] * W + coords[:, 1]``): when
    given, rays go through exactly those (row, col) pixels — the entry
    point for error-map / importance sampling — drawn from
    ``coord_image_indices`` (or a single random image if omitted,
    matching the reference's one-image batches in that mode).
    """
    n, H, W, C = images.shape
    k_img, k_pix = jax.random.split(key)

    if coord_image_indices is not None:
        img_idx = jnp.asarray(coord_image_indices)
    elif random_image_batch and coords is None:
        img_idx = jax.random.randint(k_img, (num_rays,), 0, n)
    else:
        img_idx = jnp.broadcast_to(
            jax.random.randint(k_img, (1,), 0, n), (num_rays,))

    if coords is not None:
        coords = jnp.asarray(coords)
        flat = coords[:, 0] * W + coords[:, 1]
    elif patch_size > 1:
        # square-patch sampling (train_utils.py:124-138): rays come in
        # contiguous patch_size x patch_size blocks (for patch losses)
        from raw_ngp_tpu.ops.rays import sample_pixel_indices
        flat = sample_pixel_indices(k_pix, num_rays, H, W, patch_size)
        # patches share one image each
        n_patch = num_rays // (patch_size ** 2)
        img_patch = jax.random.randint(k_img, (n_patch,), 0, n)
        img_idx = jnp.repeat(img_patch, patch_size ** 2)
    else:
        flat = jax.random.randint(k_pix, (num_rays,), 0, H * W)
    rows = flat // W
    cols = flat % W

    sel_poses = poses[img_idx]                             # [N, 4, 4]
    if pose_noise is not None:
        # pre-composed synthetic perturbation, camera-space like the
        # refinement (camera_optimizers.py:96-98)
        from raw_ngp_tpu.ops.lie import compose_pose
        sel_poses = compose_pose(pose_noise[img_idx],
                                 sel_poses[:, :3, :4])
    if se3_refine is not None:
        sel_poses = apply_refinement(se3_refine[img_idx], sel_poses)

    rays_o, rays_d = pixel_rays(sel_poses, intrinsics, flat, W)

    out: Dict[str, jnp.ndarray] = {
        "rays_o": rays_o,
        "rays_d": rays_d,
        "images": images[img_idx, rows, cols],             # [N, C]
        "index": img_idx,
    }
    if exposures is not None:
        out["exposure"] = exposures[img_idx]               # [N, 1]
    if ldirs is not None:
        out["rays_ldir"] = ldirs[img_idx]                  # [N, 3]
    if cam_near_far is not None:
        out["cam_near_far"] = cam_near_far[img_idx]        # [N, 2]
    if mosaiced:
        out["lossmult"] = bayer_lossmult(rows, cols)       # [N, 3]
    return out
