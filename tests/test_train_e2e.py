"""End-to-end training smoke tests on the synthetic scene: loss decreases,
PSNR rises, HDR loss path runs. The "can it learn" regression the reference
only ever ran by hand (SURVEY.md §4)."""

from dataclasses import replace

import jax
import numpy as np
import pytest

from raw_ngp_tpu.config import Config
from raw_ngp_tpu.data import make_synthetic_scene
from raw_ngp_tpu.train import Trainer


def small_cfg(**kw):
    cfg = Config()
    cfg = replace(cfg, model=replace(
        cfg.model, num_levels=8, log2_hashmap_size=15,
        hashgrid_resolution=128, grid_mlp_hidden=32, view_mlp_hidden=32,
        prop_num_levels=4, prop_log2_hashmap_size=12,
        prop_resolutions=(32, 64), fused_encoder=False))
    cfg = replace(cfg, render=replace(
        cfg.render, num_steps=(48, 24, 16), occupancy=False, bound=2.0,
        max_ray_batch=4096))
    cfg = replace(cfg, train=replace(
        cfg.train, iters=300, num_rays=1024, lr=1e-2,
        random_image_batch=True, **kw))
    return cfg.validate()


@pytest.fixture(scope="module")
def scene():
    return make_synthetic_scene(n_train=36, n_val=2, H=48, W=48)


def test_proposal_training_learns(tmp_path, scene):
    train_scene, val_scene = scene
    cfg = small_cfg()
    tr = Trainer(cfg, train_scene, val_scene, workspace=str(tmp_path))
    psnr0 = tr.evaluate()["psnr"]
    tr.train(iters=500, log_every=250)
    psnr1 = tr.evaluate()["psnr"]
    print(f"PSNR {psnr0:.2f} -> {psnr1:.2f}")
    assert psnr1 > psnr0 + 3.0, f"did not learn: {psnr0} -> {psnr1}"
    assert psnr1 > 20.0
    # loss decreased
    assert tr.stats["loss"][-1] < tr.stats["loss"][0]


def test_hdr_training_path(tmp_path):
    """HDR bracketing: per-image exposures {0.25, 1, 4} exercise the
    RawNeRF clipped loss (train_utils.py:529-536) and exposure-scaled
    eval; PSNR must improve."""
    train_scene, val_scene = make_synthetic_scene(
        n_train=24, n_val=2, H=32, W=32, hdr=True)
    assert set(np.unique(train_scene.exposures)) == {0.25, 1.0, 4.0}
    cfg = small_cfg()
    cfg = replace(cfg, data=replace(cfg.data, image_mode="HDR"))
    tr = Trainer(cfg, train_scene, val_scene, workspace=str(tmp_path))
    p0 = tr.evaluate()["psnr"]
    out = tr.train(iters=300, log_every=150)
    p1 = tr.evaluate()["psnr"]
    print(f"HDR PSNR {p0:.2f} -> {p1:.2f}")
    assert np.isfinite(tr.stats["loss"][-1])
    assert tr.stats["loss"][-1] < tr.stats["loss"][0] * 0.5
    assert p1 > p0 + 2.0
    assert out["rays_per_sec"] > 0


def test_render_image_shapes(tmp_path, scene):
    train_scene, val_scene = scene
    cfg = small_cfg()
    tr = Trainer(cfg, train_scene, val_scene, workspace=str(tmp_path))
    rgb, depth = tr.render_image(val_scene.poses[0])
    assert rgb.shape == (48, 48, 3)
    assert depth.shape == (48, 48)
    assert np.all(np.isfinite(rgb))
