"""Reflectance-field (light-direction conditioning) E2E: the model must
use the per-image light direction to explain lighting variation — the
raw_ngp headline feature (nerf/network.py:55-56, raymarching ldirs)."""

from dataclasses import replace

import numpy as np
import pytest

from raw_ngp_tpu.config import Config
from raw_ngp_tpu.data import make_synthetic_scene
from raw_ngp_tpu.train import Trainer


@pytest.mark.slow
def test_rfield_training_uses_light_dirs(tmp_path):
    train_scene, val_scene = make_synthetic_scene(
        n_train=36, n_val=2, H=40, W=40, rfield=True)
    assert train_scene.ldirs is not None

    cfg = Config()
    cfg = replace(cfg, model=replace(
        cfg.model, num_levels=8, log2_hashmap_size=14,
        hashgrid_resolution=128, grid_mlp_hidden=32, view_mlp_hidden=32,
        prop_num_levels=3, prop_log2_hashmap_size=10,
        prop_resolutions=(32, 64), rfield=True, fused_encoder=False))
    cfg = replace(cfg, render=replace(
        cfg.render, num_steps=(32, 16, 12), occupancy=False, bound=2.0))
    cfg = replace(cfg, train=replace(
        cfg.train, iters=500, num_rays=1024, fp16=False,
        random_image_batch=True))
    cfg = cfg.validate()

    tr = Trainer(cfg, train_scene, val_scene, workspace=str(tmp_path))
    tr.train(iters=500, log_every=250)
    # eval passes the per-image light dirs
    psnr = tr.evaluate()["psnr"]
    print(f"rfield val psnr {psnr:.2f}")
    assert psnr > 19.0

    # RELIGHTING: the same view under two light dirs must differ
    pose = val_scene.poses[0]
    ld_a = val_scene.ldirs[0]
    ld_b = -ld_a * np.array([1, 1, -1])    # mirrored light
    rgb_a, _ = tr.render_image(pose, ldir=ld_a)
    rgb_b, _ = tr.render_image(pose, ldir=ld_b)
    diff = np.abs(rgb_a - rgb_b).mean()
    print(f"relighting mean |diff| = {diff:.4f}")
    assert diff > 0.005


def test_rfield_grid_scene_heldout_lights_disjoint():
    """make_rfield_grid_scene: VxL train pairs, val lights never appear
    at train, all light dirs unit, val poses are train poses (held-out
    is BY LIGHT, isolating relighting generalization)."""
    from raw_ngp_tpu.data import make_rfield_grid_scene
    tr, va = make_rfield_grid_scene(n_views=4, n_lights=5,
                                    n_heldout_lights=3, n_val_views=2,
                                    H=32, W=32, textured=True)
    assert tr.images.shape == (4 * 5, 32, 32, 3)
    assert va.images.shape == (2 * 3, 32, 32, 3)
    np.testing.assert_allclose(np.linalg.norm(tr.ldirs, axis=-1), 1.0,
                               rtol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(va.ldirs, axis=-1), 1.0,
                               rtol=1e-5)
    # disjoint light sets
    d = np.linalg.norm(tr.ldirs[:, None] - va.ldirs[None], axis=-1)
    assert d.min() > 1e-3, "a held-out light appears in the train set"
    # held-out lights interpolate the train polar band (no extrapolation)
    assert va.ldirs[:, 2].min() >= tr.ldirs[:, 2].min() - 1e-6
    assert va.ldirs[:, 2].max() <= tr.ldirs[:, 2].max() + 1e-6
    # val poses drawn from the train pose set
    dp = np.linalg.norm(
        tr.poses[:, None] - va.poses[None], axis=(-2, -1))
    assert (dp.min(axis=0) < 1e-6).all()
    # different lights produce different images of the same view
    assert np.abs(tr.images[0] - tr.images[1]).mean() > 1e-3
