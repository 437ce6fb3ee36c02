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
