"""Channel-axis tensor parallelism (parallel/tp.py) on the virtual CPU
mesh: exact parity with the single-device encoder/gradients, Trainer
end-to-end on a (dp, tp) 2-D mesh, and replicated-leaf consistency.

The reference has no model parallelism (SURVEY.md §2.3); these tests pin
the TPU-native extension: hash-table rows are channel-independent, so a
[n_params, C] table sharded on C with one feature all_gather reproduces
the single-device math bit-for-bit (up to summation order).
"""

from dataclasses import replace

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from raw_ngp_tpu.config import Config, ParallelConfig
from raw_ngp_tpu.data import make_synthetic_scene
from raw_ngp_tpu.models import make_field_spec
from raw_ngp_tpu.parallel.tp import (
    grid_to_2d,
    make_tp_mesh,
    state_pspecs,
)
from raw_ngp_tpu.train import Trainer, init_train_state


def tp_cfg(level_dim=2, fused=False):
    cfg = Config()
    cfg = replace(cfg, model=replace(
        cfg.model, num_levels=4, level_dim=level_dim,
        log2_hashmap_size=12, hashgrid_resolution=64, grid_mlp_hidden=16,
        view_mlp_hidden=16, fused_encoder=fused))
    cfg = replace(cfg, render=replace(
        cfg.render, occupancy=True, grid_size=16, samples_per_ray=16,
        march_candidates=64, mark_untrained=False, bound=1.5,
        compact_ratio=0.0))
    cfg = replace(cfg, train=replace(
        cfg.train, iters=100, num_rays=256, fp16=False,
        random_image_batch=True))
    return cfg


def test_grid_to_2d_and_pspecs():
    cfg = tp_cfg().validate()
    spec = make_field_spec(cfg)
    state = init_train_state(jax.random.PRNGKey(0), cfg, spec)
    n, C = spec.grid_spec.n_params, spec.grid_spec.level_dim
    st2 = grid_to_2d(state, spec)
    assert st2.params["grid"].shape == (n, C)
    assert st2.ema_params["grid"].shape == (n, C)
    # the flat and 2-D views hold identical values
    np.testing.assert_array_equal(
        np.asarray(st2.params["grid"]).reshape(-1),
        np.asarray(state.params["grid"]))
    specs = state_pspecs(st2, spec)
    assert specs.params["grid"] == P(None, "tp")
    assert specs.params["grid_mlp"][0]["w"] == P()
    assert specs.density_grid == P()


@pytest.mark.parametrize("fused,level_dim", [(False, 2), (True, 4)])
def test_tp_grads_match_single_device(fused, level_dim):
    """Gradients of the SAME fixed ray batch: (dp=4, tp=2) shard_map with
    the tp table gradient rescale == the single-device gradient."""
    from raw_ngp_tpu.data.sampler import sample_ray_batch
    from raw_ngp_tpu.train.trainer import make_batch_loss_fn

    cfg = tp_cfg(level_dim=level_dim, fused=fused).validate()
    spec = make_field_spec(cfg)
    state = init_train_state(jax.random.PRNGKey(0), cfg, spec)
    state = state.replace(density_bitfield=jnp.full_like(
        state.density_bitfield, 255))
    state = grid_to_2d(state, spec)

    ts, _ = make_synthetic_scene(n_train=4, n_val=1, H=16, W=16)
    batch = sample_ray_batch(
        jax.random.PRNGKey(7), jnp.asarray(ts.images),
        jnp.asarray(ts.poses), jnp.asarray(ts.intrinsics), 512,
        random_image_batch=True)
    aabb = jnp.asarray(ts.pts_aabb)

    loss_single = make_batch_loss_fn(cfg, spec)
    g_single = jax.jit(jax.grad(lambda p: loss_single(
        p, state, batch, aabb, None, 1.0, True)[0]))(state.params)

    n_tp = 2
    mesh = make_tp_mesh(4, n_tp)
    spec_tp = replace(spec, tp_axis="tp", tp_devices=n_tp)
    loss_tp = make_batch_loss_fn(cfg, spec_tp)

    param_specs = jax.tree.map(lambda _: P(), state.params)
    param_specs = dict(param_specs)
    param_specs["grid"] = P(None, "tp")

    def per_device(params, batch_shard):
        g = jax.grad(lambda p: loss_tp(
            p, state, batch_shard, aabb, None, 1.0, True)[0])(params)
        g = dict(g)
        g["grid"] = g["grid"] / n_tp       # all_gather transpose rescale
        return jax.tree.map(lambda x: jax.lax.pmean(x, "dp"), g)

    sharded = jax.jit(shard_map(
        per_device, mesh=mesh,
        in_specs=(param_specs, P("dp")),
        out_specs=param_specs, check_vma=False))
    g_tp = sharded(state.params, batch)

    key_of = jax.tree_util.keystr
    for (ka, a), (kb, b) in zip(
            sorted(jax.tree_util.tree_flatten_with_path(g_single)[0],
                   key=lambda kv: key_of(kv[0])),
            sorted(jax.tree_util.tree_flatten_with_path(g_tp)[0],
                   key=lambda kv: key_of(kv[0]))):
        scale = np.abs(np.asarray(a)).max() + 1e-12
        atol = 2e-6 if fused else 1e-7
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-5,
            atol=atol + 1e-6 * scale,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(ka)}")


def test_trainer_tp_end_to_end(tmp_path):
    """Trainer on an explicit (dp=4, tp=2) mesh: sharded train steps,
    channel-sharded table, consistent replicated MLPs, working eval
    render and checkpoint round-trip."""
    cfg = tp_cfg(level_dim=2)
    cfg = replace(cfg, parallel=ParallelConfig(num_devices=8,
                                               tp_devices=2),
                  train=replace(cfg.train, num_rays=256))
    cfg = cfg.validate()
    train_scene, val_scene = make_synthetic_scene(
        n_train=8, n_val=1, H=24, W=24)
    tr = Trainer(cfg, train_scene, val_scene, workspace=str(tmp_path))
    assert tr.mesh is not None and tr.mesh.devices.size == 8
    assert tr.n_tp == 2 and tr.n_dp == 4

    # the table is genuinely channel-sharded on the mesh
    gleaf = tr.state.params["grid"]
    assert gleaf.ndim == 2
    assert gleaf.sharding.spec == P(None, "tp")

    tr.train(iters=12, log_every=6)
    assert np.isfinite(tr.stats["loss"][-1])

    # replicated leaves stay bit-identical across every device (the
    # global finite-gate guarantees consistent update decisions)
    mlp = tr.state.params["grid_mlp"][0]["w"]
    shards = [np.asarray(s.data) for s in mlp.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)

    # sharded full-image eval works against the channel-sharded table
    rgb, depth = tr.render_image(val_scene.poses[0])
    assert rgb.shape == (24, 24, 3)
    assert np.all(np.isfinite(np.asarray(rgb)))

    # checkpoints survive the tp round-trip (stored gathered, re-sharded
    # on load)
    tr.save_checkpoint()
    assert tr.load_checkpoint()
    assert tr.state.params["grid"].sharding.spec == P(None, "tp")
    tr.train(iters=3, log_every=3)
    assert np.isfinite(tr.stats["loss"][-1])


def test_tp_validate_guards():
    cfg = tp_cfg(level_dim=2)
    cfg = replace(cfg, parallel=ParallelConfig(num_devices=8,
                                               tp_devices=3))
    with pytest.raises(AssertionError):
        cfg.validate()                      # 3 does not divide level_dim
    cfg = tp_cfg(level_dim=2)
    cfg = replace(cfg,
                  parallel=ParallelConfig(num_devices=8, tp_devices=2),
                  render=replace(cfg.render, occupancy=False))
    with pytest.raises(AssertionError):
        cfg.validate()                      # tp needs occupancy mode


def test_tp_pose_grads_match_single_device():
    """Pose refinement under tensor parallelism (VERDICT r3 missing #5):
    the se(3) gradient flows through the encoder's INPUT-gradient path,
    whose per-device contribution covers only the local channel shard
    and carries the n_tp-times-too-large psum_scattered cotangent — so
    the exact pose gradient is psum over tp / n_tp (parallel/tp.py).
    Pin it against the single-device gradient of the IDENTICAL sampled
    batch (same keys, dp=1)."""
    from raw_ngp_tpu.train.trainer import init_train_state, make_loss_fn

    cfg = tp_cfg(level_dim=4, fused=True)
    cfg = replace(cfg,
                  pose_opt=replace(cfg.pose_opt, mode="barf",
                                   num_cameras=4),
                  train=replace(cfg.train, random_image_batch=False,
                                num_rays=256))
    cfg = cfg.validate()
    spec = make_field_spec(cfg)
    state = init_train_state(jax.random.PRNGKey(0), cfg, spec,
                             num_cameras=4)
    # nonzero refinement so the gradient is probed off the identity
    state = state.replace(
        pose_params=0.01 * jax.random.normal(jax.random.PRNGKey(5),
                                             (4, 6)),
        density_bitfield=jnp.full_like(state.density_bitfield, 255))
    state = grid_to_2d(state, spec)

    ts, _ = make_synthetic_scene(n_train=4, n_val=1, H=16, W=16)
    scene = {"images": jnp.asarray(ts.images),
             "poses": jnp.asarray(ts.poses),
             "intrinsics": jnp.asarray(ts.intrinsics)}
    aabb = jnp.asarray(ts.pts_aabb)
    k_batch = jax.random.PRNGKey(7)

    loss_single = make_loss_fn(cfg, spec, 256)

    def single(params, pose):
        l, _ = loss_single(params, pose, state, scene, aabb,
                           k_batch, None, 1.0, True)
        return l

    gp_single = jax.jit(jax.grad(single, argnums=1))(
        state.params, state.pose_params)

    n_tp = 2
    mesh = make_tp_mesh(1, n_tp)
    spec_tp = replace(spec, tp_axis="tp", tp_devices=n_tp)
    loss_tp = make_loss_fn(cfg, spec_tp, 256)

    param_specs = dict(jax.tree.map(lambda _: P(), state.params))
    param_specs["grid"] = P(None, "tp")

    def per_device(params, pose):
        l_fn = lambda pp, po: loss_tp(pp, po, state, scene, aabb,
                                      k_batch, None, 1.0, True)[0]
        g_pose = jax.grad(l_fn, argnums=1)(params, pose)
        return jax.lax.psum(g_pose, "tp") / n_tp

    sharded = jax.jit(shard_map(
        per_device, mesh=mesh,
        in_specs=(param_specs, P()),
        out_specs=P(), check_vma=False))
    gp_tp = sharded(state.params, state.pose_params)

    scale = np.abs(np.asarray(gp_single)).max() + 1e-12
    np.testing.assert_allclose(np.asarray(gp_tp), np.asarray(gp_single),
                               rtol=1e-5, atol=2e-6 + 1e-6 * scale)


@pytest.mark.slow
def test_trainer_tp_pose_opt_end_to_end(tmp_path):
    """Trainer on a (dp=2, tp=2) mesh WITH pose refinement: the tp step's
    pose branch (psum/n_tp + pmean + freeze window) runs, pose params
    move, and replicated leaves stay consistent."""
    cfg = tp_cfg(level_dim=2)
    cfg = cfg.with_pose_opt("barf", num_cameras=8)
    cfg = replace(cfg, parallel=ParallelConfig(num_devices=4,
                                               tp_devices=2),
                  pose_opt=replace(cfg.pose_opt, num_cameras=8,
                                   noise=0.01),
                  train=replace(cfg.train, num_rays=256))
    cfg = cfg.validate()
    train_scene, val_scene = make_synthetic_scene(
        n_train=8, n_val=1, H=24, W=24)
    tr = Trainer(cfg, train_scene, val_scene, workspace=str(tmp_path))
    assert tr.n_tp == 2 and tr.n_dp == 2
    p0 = np.asarray(tr.state.pose_params)
    tr.train(iters=8, log_every=4)
    assert np.isfinite(tr.stats["loss"][-1])
    p1 = np.asarray(tr.state.pose_params)
    assert np.abs(p1 - p0).max() > 0          # pose step applied
    # replicated pose leaves identical across all 4 devices
    shards = [np.asarray(s.data)
              for s in tr.state.pose_params.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)
