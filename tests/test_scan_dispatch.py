"""Multi-step scan dispatch (train.trainer.scan_train_steps): chaining k
steps into one executable must reproduce the step-by-step trajectory
exactly (same RNG chain through state.key), on the single-device path and
on the 8-device dp mesh."""

from dataclasses import replace

import numpy as np
import pytest

from raw_ngp_tpu.config import Config
from raw_ngp_tpu.data import make_synthetic_scene
from raw_ngp_tpu.train import Trainer


def _cfg(**train_kw):
    cfg = Config().with_preset_O()
    cfg = replace(cfg, model=replace(
        cfg.model, num_levels=4, log2_hashmap_size=12,
        hashgrid_resolution=64, grid_mlp_hidden=16, view_mlp_hidden=16,
        fused_encoder=False))
    cfg = replace(cfg, render=replace(
        cfg.render, occupancy=True, grid_size=16, bound=1.5,
        samples_per_ray=16, march_candidates=32, mark_untrained=False,
        update_extra_interval=4, max_ray_batch=1024))
    cfg = replace(cfg, train=replace(
        cfg.train, iters=64, num_rays=256, fp16=False,
        random_image_batch=True, **train_kw))
    return cfg.validate()


@pytest.fixture(scope="module")
def scene():
    return make_synthetic_scene(n_train=8, n_val=1, H=24, W=24)


def _leaves(tr):
    import jax
    return [np.asarray(x) for x in
            jax.tree_util.tree_leaves(tr.state.params)]


def test_scan_matches_single_step(tmp_path, scene):
    train_scene, val_scene = scene
    runs = {}
    for spd in (1, 4):
        tr = Trainer(_cfg(steps_per_dispatch=spd), train_scene, val_scene,
                     workspace=str(tmp_path / f"spd{spd}"))
        tr.train(iters=13, log_every=10 ** 9)   # 3 full chunks + 1 single
        assert tr.host_step == 13
        runs[spd] = _leaves(tr)
    for a, b in zip(runs[1], runs[4]):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_scan_matches_on_mesh(tmp_path, scene):
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from raw_ngp_tpu.config import ParallelConfig
    train_scene, val_scene = scene
    runs = {}
    for spd in (1, 4):
        cfg = replace(_cfg(steps_per_dispatch=spd),
                      parallel=ParallelConfig(num_devices=8))
        tr = Trainer(cfg, train_scene, val_scene,
                     workspace=str(tmp_path / f"mesh_spd{spd}"))
        assert tr.mesh is not None
        tr.train(iters=8, log_every=10 ** 9)
        runs[spd] = _leaves(tr)
    for a, b in zip(runs[1], runs[4]):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)
