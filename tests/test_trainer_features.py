"""Eval/test-time features: inference normal maps (renderer.py:618-670),
per-eval HDR exposure-level estimation (train_utils.py:1008-1017),
optimized-pose logging (main.py:112), and tensorboard histograms
(train_utils.py:919-937, 1155-1164)."""

import os
from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raw_ngp_tpu.config import Config
from raw_ngp_tpu.data import make_synthetic_scene
from raw_ngp_tpu.train import Trainer


def tiny_cfg(**render_kw):
    cfg = Config().with_preset_O()
    cfg = replace(cfg, model=replace(
        cfg.model, num_levels=4, log2_hashmap_size=12,
        hashgrid_resolution=32, grid_mlp_hidden=16, view_mlp_hidden=16))
    cfg = replace(cfg, render=replace(
        cfg.render, grid_size=16, samples_per_ray=8, march_candidates=32,
        mark_untrained=False, max_ray_batch=256, **render_kw))
    cfg = replace(cfg, train=replace(
        cfg.train, num_rays=128, iters=8, fp16=False, eval_cnt=1,
        save_cnt=1))
    return cfg.validate()


def test_normals_render_shapes_and_compositing(tmp_path):
    """compute_normals adds a composited [H, W, 3] normal map to eval
    renders; unit-normal mapping keeps values in [0, 1] and background
    pixels at bg_color."""
    cfg = tiny_cfg(compute_normals=True)
    ts, vs = make_synthetic_scene(n_train=4, n_val=1, H=16, W=16)
    tr = Trainer(cfg, ts, vs, workspace=str(tmp_path))
    tr.train(iters=4, log_every=4)
    rgb, depth, nm = tr.render_image(vs.poses[0], vs.intrinsics, 16, 16,
                                     return_normals=True)
    assert nm is not None and nm.shape == (16, 16, 3)
    assert np.all(np.isfinite(nm))
    # eval artifacts include the normal map (train_utils.py:1100-1101)
    tr.evaluate(save_artifacts=True)
    arts = os.listdir(os.path.join(str(tmp_path), "validation"))
    assert any(a.startswith("normal_") for a in arts), arts


def test_normals_flag_off_returns_none(tmp_path):
    cfg = tiny_cfg(compute_normals=False)
    ts, vs = make_synthetic_scene(n_train=4, n_val=1, H=16, W=16)
    tr = Trainer(cfg, ts, vs, workspace=str(tmp_path))
    rgb, depth, nm = tr.render_image(vs.poses[0], vs.intrinsics, 16, 16,
                                     return_normals=True)
    assert nm is None


def test_exposure_levels_estimated_on_hdr_eval(tmp_path):
    """HDR eval populates exposure_levels from the exposure==1.0 view at
    the configured percentiles (train_utils.py:1008-1017)."""
    cfg = tiny_cfg()
    cfg = replace(cfg, data=replace(cfg.data, image_mode="HDR"))
    ts, vs = make_synthetic_scene(n_train=4, n_val=2, H=16, W=16, hdr=True)
    assert vs.exposures is not None
    # ensure an exposure-1.0 view exists in the eval split
    vs.exposures[0] = 1.0
    tr = Trainer(cfg, ts, vs, workspace=str(tmp_path))
    tr.train(iters=2, log_every=2)
    assert tr.exposure_levels == {}
    tr.evaluate()
    assert set(tr.exposure_levels) == set(cfg.exposure_percentiles)
    vals = [tr.exposure_levels[p] for p in sorted(tr.exposure_levels)]
    assert all(np.isfinite(v) for v in vals)
    assert vals == sorted(vals)          # percentiles are monotone
    # stored on the scene meta for downstream consumers
    assert vs.meta.exposure_levels == tr.exposure_levels


def test_log_poses_dumps_and_errors(tmp_path):
    """--log_poses writes per-step pose snapshots and Procrustes errors."""
    cfg = tiny_cfg()
    cfg = cfg.with_pose_opt("barf", num_cameras=4)
    cfg = replace(cfg, pose_opt=replace(cfg.pose_opt, log_poses=True))
    ts, vs = make_synthetic_scene(n_train=4, n_val=1, H=16, W=16)
    tr = Trainer(cfg, ts, vs, workspace=str(tmp_path))
    tr.fit(4)
    pose_dir = os.path.join(str(tmp_path), "poses")
    dumps = os.listdir(pose_dir)
    assert dumps, "no pose dumps written"
    arr = np.load(os.path.join(pose_dir, sorted(dumps)[0]))
    assert arr.shape == (4, 3, 4)
    errs = tr.log_optimized_poses()
    assert np.isfinite(errs["rotation_deg"])
    assert np.isfinite(errs["translation"])


def test_histograms_logged(tmp_path):
    """Gradient + density-grid histograms reach the tensorboard writer."""
    cfg = tiny_cfg()
    ts, vs = make_synthetic_scene(n_train=4, n_val=1, H=16, W=16)
    tr = Trainer(cfg, ts, vs, workspace=str(tmp_path))
    tr.train(iters=2, log_every=2)

    logged = []
    class FakeWriter:
        def add_histogram(self, tag, values, step):
            logged.append(tag)
        def add_scalar(self, tag, value, step):
            logged.append(tag)
    tr.logger.writer = FakeWriter()
    tr.log_histograms()
    assert any(t.startswith("grad/grid_mlp") for t in logged), logged
    assert any(t.startswith("grad/view_mlp") for t in logged), logged
    assert any(t.startswith("grad/grid") for t in logged), logged
    assert "train/density_grid" in logged
    assert "train/mean_density" in logged


def test_adaptive_num_rays_grows(tmp_path):
    """TPU adaptive ray batching (train_utils.py:563-564 semantics): when
    the occupancy grid prunes most samples, the trainer doubles num_rays
    (sticky, capped) while the compacted point budget stays anchored to
    the base num_rays."""
    cfg = tiny_cfg()
    cfg = replace(cfg, render=replace(cfg.render,
                                      update_extra_interval=1,
                                      compact_ratio=0.5))
    cfg = replace(cfg, train=replace(cfg.train, adaptive_num_rays=True,
                                     max_num_rays=512, num_rays=128))
    ts, vs = make_synthetic_scene(n_train=4, n_val=1, H=16, W=16)
    tr = Trainer(cfg, ts, vs, workspace=str(tmp_path))
    # empty the grid: every candidate is pruned, so live points/step fall
    # far under the budget and growth must trigger
    tr.state = tr.state.replace(
        density_bitfield=jnp.zeros_like(tr.state.density_bitfield))
    tr.host_grid_updates = 20           # past the full-sweep phase
    tr._grid_update = lambda state, it: state   # keep the grid empty
    tr.train(iters=8, log_every=8)
    assert tr.num_rays == 512, tr.num_rays     # grew 128 -> 256 -> 512
    assert np.isfinite(tr.stats["loss"][-1])
    # a step function exists per (num_rays, point_budget) specialization,
    # and the empty grid also shrank the compacted point budget (the CSR
    # exact-sizing analogue) to the 1/8-of-base floor
    sizes = {k[0] for k in tr._step_cache}
    assert sizes == {128, 256, 512}, tr._step_cache
    base_budget = max(int(128 * cfg.render.samples_per_ray
                          * cfg.render.compact_ratio) // 128 * 128, 128)
    assert tr._point_budget is None or tr._point_budget < base_budget
