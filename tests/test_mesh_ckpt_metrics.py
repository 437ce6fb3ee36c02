"""Mesh extraction, checkpoint round-trip, and metric tests."""

import os
from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raw_ngp_tpu.mesh.extract import (
    clean_mesh,
    decimate_mesh,
    export_ply,
    load_ply,
    marching_tetrahedra,
    mark_unseen_triangles,
)
from raw_ngp_tpu.train.metrics import PSNRMeter, SSIMMeter, rmse, ssim


def _sphere_grid(R=48, radius=0.6):
    ax = np.linspace(-1, 1, R)
    x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
    return (radius - np.sqrt(x ** 2 + y ** 2 + z ** 2)).astype(np.float32)


def test_marching_tets_sphere():
    R = 48
    grid = _sphere_grid(R)
    verts, faces = marching_tetrahedra(grid, 0.0)
    assert len(faces) > 100
    # vertices lie near the sphere surface of radius 0.6 (in index coords)
    world = verts / (R - 1) * 2 - 1
    r = np.linalg.norm(world, axis=-1)
    np.testing.assert_allclose(r.mean(), 0.6, atol=0.03)
    assert r.std() < 0.03
    # closed surface: every edge shared by exactly 2 faces
    edges = np.sort(np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]],
                                    faces[:, [2, 0]]]), axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).mean() > 0.99


def test_clean_mesh_removes_floaters():
    grid = _sphere_grid(48)
    # add a tiny floater blob (single positive cell -> small component)
    grid[2, 2, 2] = 1.0
    verts, faces = marching_tetrahedra(grid, 0.0)
    v2, f2 = clean_mesh(verts, faces, min_faces=100)
    assert len(f2) < len(faces)
    world = v2 / 47 * 2 - 1
    assert np.linalg.norm(world, axis=-1).max() < 0.7


def test_decimate_mesh():
    verts, faces = marching_tetrahedra(_sphere_grid(48), 0.0)
    target = len(faces) // 4
    v2, f2 = decimate_mesh(verts, faces, target)
    assert len(f2) <= target
    assert len(f2) > 10


def test_ply_roundtrip(tmp_path):
    verts, faces = marching_tetrahedra(_sphere_grid(24), 0.0)
    path = str(tmp_path / "m.ply")
    export_ply(verts, faces, path)
    v2, f2 = load_ply(path)
    np.testing.assert_allclose(v2, verts, rtol=1e-6)
    np.testing.assert_array_equal(f2, faces)


def test_mark_unseen_triangles():
    from raw_ngp_tpu.data.synthetic import look_at_pose
    R = 32
    verts, faces = marching_tetrahedra(_sphere_grid(R), 0.0)
    verts = verts / (R - 1) * 2 - 1
    # one camera on +x: back half should be mostly unseen
    pose = look_at_pose(np.array([3.0, 0, 0]), np.zeros(3))
    intr = np.array([50.0, 50.0, 32, 32])
    unseen = mark_unseen_triangles(verts, faces, pose[None], intr, 64, 64)
    cent = verts[faces].mean(1)
    front = cent[:, 0] > 0.3
    back = cent[:, 0] < -0.3
    assert unseen[back].mean() > 0.8
    assert unseen[front].mean() < 0.3


def test_checkpoint_roundtrip(tmp_path):
    from raw_ngp_tpu.config import Config
    from raw_ngp_tpu.data import make_synthetic_scene
    from raw_ngp_tpu.train import Trainer

    cfg = Config()
    cfg = replace(cfg, model=replace(
        cfg.model, num_levels=4, log2_hashmap_size=10,
        hashgrid_resolution=32, grid_mlp_hidden=16, view_mlp_hidden=16,
        prop_num_levels=2, prop_log2_hashmap_size=8,
        prop_resolutions=(16, 32), fused_encoder=False))
    cfg = replace(cfg, render=replace(cfg.render, num_steps=(16, 8, 8)))
    cfg = replace(cfg, train=replace(cfg.train, iters=50, num_rays=128,
                                     fp16=False, random_image_batch=True))
    cfg = replace(cfg, ckpt="scratch")
    ts, vs = make_synthetic_scene(n_train=4, n_val=1, H=16, W=16)
    tr = Trainer(cfg, ts, vs, workspace=str(tmp_path))
    tr.train(iters=10, log_every=10)
    path = tr.save_checkpoint()
    assert os.path.exists(path)
    p_before = np.asarray(tr.state.params["grid"]).copy()
    step_before = tr.host_step

    # fresh trainer resumes from latest
    cfg2 = replace(cfg, ckpt="latest")
    tr2 = Trainer(cfg2, ts, vs, workspace=str(tmp_path))
    assert tr2.host_step == step_before
    np.testing.assert_array_equal(np.asarray(tr2.state.params["grid"]),
                                  p_before)
    # training continues
    tr2.train(iters=5, log_every=5)
    assert tr2.host_step == step_before + 5


def test_checkpoint_rolling_retention(tmp_path):
    from raw_ngp_tpu.train.checkpoint import save_checkpoint, resolve_checkpoint
    from raw_ngp_tpu.train.state import TrainState
    import glob

    state = TrainState(params={"w": jnp.ones(3)}, opt_state=(),
                       ema_params={"w": jnp.ones(3)},
                       key=jax.random.PRNGKey(0),
                       step=jnp.zeros((), jnp.int32))
    d = str(tmp_path)
    for s in [10, 20, 30]:
        st = state.replace(step=jnp.asarray(s, jnp.int32))
        save_checkpoint(st, d, f"ngp_step{s:06d}", max_keep=2)
    ckpts = glob.glob(os.path.join(d, "ngp_step*.npz"))
    assert len(ckpts) == 2
    assert resolve_checkpoint(d, "latest").endswith("ngp_step000030.npz")
    assert resolve_checkpoint(d, "scratch") is None


def test_psnr_meter():
    m = PSNRMeter()
    v = m.update(np.full((8, 8, 3), 0.5), np.full((8, 8, 3), 0.6))
    assert v == pytest.approx(20.0, abs=0.01)   # mse 0.01 -> 20 dB


def test_ssim_properties():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (32, 32, 3))
    assert ssim(img, img) == pytest.approx(1.0, abs=1e-6)
    noisy = np.clip(img + rng.normal(0, 0.2, img.shape), 0, 1)
    s = ssim(img, noisy)
    assert 0.0 < s < 0.9
    # smooth similar images score higher than noisy ones
    smooth = np.clip(img + 0.05, 0, 1)
    assert ssim(img, smooth) > s


def test_rmse():
    assert rmse(np.zeros(4), np.ones(4)) == pytest.approx(1.0)
