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


def test_fused_adam_ema_matches_optax_chain():
    """fused_adam_ema must reproduce optax.chain(skip_nonfinite, adam) +
    apply_updates + the per-step EMA map bit-close on finite-grad steps
    (schedule/bias-correction indexing included). Overflow steps freeze
    params and moments (the reference GradScaler skips optimizer.step()
    outright, train_utils.py:897-909), so the reference chain here gets
    the same freeze applied manually for comparison."""
    import optax
    from dataclasses import replace as dc_replace
    from raw_ngp_tpu.config import Config
    from raw_ngp_tpu.train.trainer import (
        fused_adam_ema,
        network_lr_schedule,
        skip_nonfinite,
    )

    cfg = Config().validate()
    cfg = dc_replace(cfg, train=dc_replace(cfg.train, adam_eps=1e-7))
    key = jax.random.PRNGKey(0)
    params = {"a": jax.random.normal(key, (64, 3)),
              "b": {"w": jax.random.normal(jax.random.fold_in(key, 1),
                                           (7,))}}
    ema = jax.tree.map(jnp.copy, params)

    ref_tx = optax.chain(
        skip_nonfinite(),
        optax.adam(learning_rate=network_lr_schedule(cfg),
                   eps=cfg.train.adam_eps))
    ref_state = ref_tx.init(params)
    ref_params, ref_ema = params, ema

    fused = fused_adam_ema(cfg)
    f_state = fused.init(params)
    f_params, f_ema = params, ema

    d = cfg.train.ema_decay
    for i in range(5):
        g = jax.tree.map(
            lambda p: jax.random.normal(jax.random.fold_in(key, 100 + i),
                                        p.shape), ref_params)
        upd, ref_state = ref_tx.update(g, ref_state, ref_params)
        ref_params = optax.apply_updates(ref_params, upd)
        ref_ema = jax.tree.map(lambda e, p: d * e + (1 - d) * p,
                               ref_ema, ref_params)
        f_params, f_ema, f_state = fused.update_apply(
            g, f_state, f_params, f_ema)

    for ka, (r, f) in zip(
            ("a", "b.w"),
            [(ref_params["a"], f_params["a"]),
             (ref_params["b"]["w"], f_params["b"]["w"])]):
        np.testing.assert_allclose(np.asarray(f), np.asarray(r),
                                   rtol=1e-5, atol=1e-7, err_msg=ka)
    np.testing.assert_allclose(np.asarray(f_ema["a"]),
                               np.asarray(ref_ema["a"]),
                               rtol=1e-5, atol=1e-7)

    # overflow step: params and moments freeze (GradScaler step-skip,
    # train_utils.py:897-909); count still advances; EMA keeps decaying
    g_inf = jax.tree.map(
        lambda p: jnp.full(p.shape, jnp.inf, p.dtype), f_params)
    p3, e3, s3 = fused.update_apply(g_inf, f_state, f_params, f_ema)
    np.testing.assert_array_equal(np.asarray(p3["a"]),
                                  np.asarray(f_params["a"]))
    np.testing.assert_array_equal(np.asarray(s3.mu["a"]),
                                  np.asarray(f_state.mu["a"]))
    np.testing.assert_array_equal(np.asarray(s3.nu["a"]),
                                  np.asarray(f_state.nu["a"]))
    assert int(s3.count) == int(f_state.count) + 1
    assert np.all(np.isfinite(np.asarray(e3["a"])))


def test_pts_ema_tracks_raw_demand_through_saturation(tmp_path):
    """The adaptation EMA must meter the RAW (pre budget-decimation)
    live-sample demand: a saturated point buffer pins the evaluated
    count at exactly the budget, which hides the falling-occupancy
    trend from the growth trigger and adaptation_quiescent() (round-5
    sparse-scene bench opened its timed window pre-growth because of
    this). With a FULL density grid the march demand is ~num_rays *
    samples_per_ray, far above the compact budget."""
    cfg = tiny_cfg(update_extra_interval=4, compact_ratio=0.25)
    cfg = replace(cfg, train=replace(cfg.train, adaptive_num_rays=True))
    ts, vs = make_synthetic_scene(n_train=4, n_val=1, H=16, W=16)
    tr = Trainer(cfg, ts, vs, workspace=str(tmp_path))
    # saturate: every grid cell occupied, and keep it that way
    tr.state = tr.state.replace(
        density_bitfield=jnp.full_like(tr.state.density_bitfield, 255))
    tr.host_grid_updates = 20
    tr._grid_update = lambda state, it: state
    # the adapt call runs on interval boundaries from a one-interval
    # stash, so cover >= 3 boundaries
    tr.train(iters=16, log_every=16)
    budget = tr._point_budget or tr.base_point_budget()
    # demand visible through the clamp: EMA well above the buffer size
    assert tr._pts_ema is not None and tr._pts_ema > 1.5 * budget, \
        (tr._pts_ema, budget)
