"""Parity utilities around rays and probe cameras:

* sph_from_ray (reference raymarching.cu:163-198)
* rand_poses orbit sampler (reference nerf/provider.py:53-87)
* create_dodecahedron_cameras (reference nerf/train_utils.py:46-92)
* explicit-coords ray sampling (reference train_utils.py:121-123)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from raw_ngp_tpu.data.sampler import sample_ray_batch
from raw_ngp_tpu.data.trajectories import (
    create_dodecahedron_cameras,
    rand_poses,
)
from raw_ngp_tpu.ops.rays import pixel_rays, sph_from_ray


# ---------------------------------------------------------------------------
# sph_from_ray
# ---------------------------------------------------------------------------

def test_sph_from_ray_axis_directions():
    """Rays from the origin hit the sphere at the direction itself; check
    the (theta, phi) normalization for the canonical axes (y up)."""
    o = jnp.zeros((4, 3))
    d = jnp.asarray([[0.0, 1.0, 0.0],     # +y pole: theta=0
                     [0.0, -1.0, 0.0],    # -y pole: theta=pi
                     [1.0, 0.0, 0.0],     # equator, phi=0
                     [0.0, 0.0, 1.0]])    # equator, phi=pi/2
    c = np.asarray(sph_from_ray(o, d, radius=2.0))
    np.testing.assert_allclose(c[0], [-1.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(c[1, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(c[2], [0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(c[3], [0.0, 0.5], atol=1e-6)


def test_sph_from_ray_hits_sphere_and_scale_invariant():
    """The implied intersection lies on the radius sphere for off-center
    origins, uses the LARGER root (front hit from inside), and direction
    scaling does not change the result (t rescales inversely)."""
    key = jax.random.PRNGKey(0)
    ko, kd = jax.random.split(key)
    radius = 3.0
    o = jax.random.uniform(ko, (64, 3), minval=-1.0, maxval=1.0)
    d = jax.random.normal(kd, (64, 3))

    c1 = np.asarray(sph_from_ray(o, d, radius))
    c2 = np.asarray(sph_from_ray(o, 2.5 * d, radius))
    np.testing.assert_allclose(c1, c2, atol=1e-5)

    # reconstruct the hit point from (theta, phi) and check ||p|| = r
    theta = (c1[:, 0] + 1.0) * np.pi / 2.0
    phi = c1[:, 1] * np.pi
    p = np.stack([np.sin(theta) * np.cos(phi),
                  np.cos(theta),
                  np.sin(theta) * np.sin(phi)], axis=-1) * radius
    np.testing.assert_allclose(np.linalg.norm(p, axis=-1), radius,
                               atol=1e-5)
    # and p must be ON the ray, forward of the origin
    t = np.einsum("nd,nd->n", p - np.asarray(o), np.asarray(d)) \
        / np.einsum("nd,nd->n", np.asarray(d), np.asarray(d))
    assert np.all(t > 0)
    recon = np.asarray(o) + t[:, None] * np.asarray(d)
    np.testing.assert_allclose(recon, p, atol=1e-4)


# ---------------------------------------------------------------------------
# orbit / probe poses
# ---------------------------------------------------------------------------

def _check_lookat_poses(poses, radius, center=np.zeros(3)):
    R = poses[:, :3, :3]
    t = poses[:, :3, 3]
    # orthonormal rotations
    eye = np.broadcast_to(np.eye(3), R.shape)
    np.testing.assert_allclose(np.einsum("nij,nkj->nik", R, R), eye,
                               atol=1e-5)
    # camera centers on the radius sphere
    np.testing.assert_allclose(np.linalg.norm(t - center, axis=-1),
                               radius, atol=1e-5)
    # the optical axis (-z in camera frame = third column negated)
    # points back at the center
    view = -R[:, :, 2]
    to_center = (center - t)
    to_center /= np.linalg.norm(to_center, axis=-1, keepdims=True)
    np.testing.assert_allclose(view, to_center, atol=1e-5)


def test_rand_poses_orbit_contract():
    poses = rand_poses(32, radius=2.5, seed=3)
    assert poses.shape == (32, 4, 4)
    _check_lookat_poses(poses, 2.5)
    # polar range respected: y = r cos(theta), theta in [pi/3, 2pi/3]
    y = poses[:, 1, 3]
    assert np.all(np.abs(y) <= 2.5 * np.cos(np.pi / 3) + 1e-5)


def test_dodecahedron_cameras_contract():
    center = np.array([0.1, -0.2, 0.3])
    poses = create_dodecahedron_cameras(radius=1.5, center=center)
    assert poses.shape == (20, 4, 4)
    _check_lookat_poses(poses, 1.5, center)
    # the 20 vertices are distinct and symmetric about the center
    t = poses[:, :3, 3] - center
    assert len(np.unique(np.round(t, 4), axis=0)) == 20
    np.testing.assert_allclose(t.sum(axis=0), 0.0, atol=1e-4)


# ---------------------------------------------------------------------------
# explicit-coords sampling
# ---------------------------------------------------------------------------

def test_sample_ray_batch_explicit_coords():
    """coords= pins exact pixels: GT pixels and rays must match a direct
    gather / pixel_rays of those (row, col) under the same image ids."""
    key = jax.random.PRNGKey(0)
    n, H, W = 3, 8, 10
    images = jax.random.uniform(jax.random.PRNGKey(1), (n, H, W, 3))
    poses = jnp.broadcast_to(jnp.eye(4), (n, 4, 4))
    poses = poses.at[:, 2, 3].set(jnp.arange(n, dtype=jnp.float32))
    intr = jnp.asarray([5.0, 5.0, W / 2, H / 2])

    coords = jnp.asarray([[0, 0], [3, 7], [7, 9], [4, 4]])
    img_ids = jnp.asarray([0, 2, 1, 2])
    batch = sample_ray_batch(key, images, poses, intr, 4,
                             coords=coords, coord_image_indices=img_ids)
    np.testing.assert_allclose(
        batch["images"], images[img_ids, coords[:, 0], coords[:, 1]])
    flat = coords[:, 0] * W + coords[:, 1]
    ro, rd = pixel_rays(poses[img_ids], intr, flat, W)
    np.testing.assert_allclose(batch["rays_o"], ro, atol=1e-6)
    np.testing.assert_allclose(batch["rays_d"], rd, atol=1e-6)
    np.testing.assert_array_equal(batch["index"], img_ids)


def test_sample_ray_batch_coords_single_random_image():
    """Without coord_image_indices every coord ray comes from ONE image
    (the reference's one-image batch mode)."""
    key = jax.random.PRNGKey(7)
    images = jax.random.uniform(jax.random.PRNGKey(1), (4, 6, 6, 3))
    poses = jnp.broadcast_to(jnp.eye(4), (4, 4, 4))
    intr = jnp.asarray([4.0, 4.0, 3.0, 3.0])
    coords = jnp.asarray([[0, 0], [1, 1], [2, 2]])
    batch = sample_ray_batch(key, images, poses, intr, 3, coords=coords)
    assert len(np.unique(np.asarray(batch["index"]))) == 1
