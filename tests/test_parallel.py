"""Multi-device tests on the 8-way virtual CPU mesh — the fake-backend
capability the reference lacks (its DDP path was never executed,
SURVEY.md §2.3)."""

from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raw_ngp_tpu.config import Config
from raw_ngp_tpu.data import make_synthetic_scene
from raw_ngp_tpu.parallel import (
    make_mesh,
    make_parallel_train_step,
    replicate_to_mesh,
)
from raw_ngp_tpu.models import make_field_spec
from raw_ngp_tpu.train import Trainer, init_train_state, make_optimizers


def tiny_cfg(occupancy=False):
    cfg = Config()
    cfg = replace(cfg, model=replace(
        cfg.model, num_levels=4, log2_hashmap_size=12,
        hashgrid_resolution=64, grid_mlp_hidden=16, view_mlp_hidden=16,
        prop_num_levels=3, prop_log2_hashmap_size=10,
        prop_resolutions=(16, 32), fused_encoder=False))
    cfg = replace(cfg, render=replace(
        cfg.render, num_steps=(16, 8, 8), occupancy=occupancy,
        grid_size=16, samples_per_ray=16, march_candidates=64,
        mark_untrained=False, bound=1.5))
    cfg = replace(cfg, train=replace(
        cfg.train, iters=100, num_rays=256, fp16=False,
        random_image_batch=True))
    return cfg.validate()


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


@pytest.mark.parametrize("occupancy", [False, True])
def test_parallel_train_step_runs_and_updates(occupancy):
    cfg = tiny_cfg(occupancy)
    spec = make_field_spec(cfg)
    mesh = make_mesh()
    net_tx, pose_tx = make_optimizers(cfg)
    state = init_train_state(jax.random.PRNGKey(0), cfg, spec,
                             num_cameras=4)
    if occupancy:
        # bitfield starts all-zero (no samples, no grads) — mark everything
        # occupied as the density refresh would after step 0
        state = state.replace(density_bitfield=jnp.full_like(
            state.density_bitfield, 255))
    state = replicate_to_mesh(state, mesh)

    ts, _ = make_synthetic_scene(n_train=4, n_val=1, H=16, W=16)
    scene = replicate_to_mesh(
        {"images": jnp.asarray(ts.images), "poses": jnp.asarray(ts.poses),
         "intrinsics": jnp.asarray(ts.intrinsics)}, mesh)
    aabb = replicate_to_mesh(jnp.asarray(ts.pts_aabb), mesh)

    step = make_parallel_train_step(cfg, spec, net_tx, pose_tx,
                                    num_rays=256, mesh=mesh)
    p0 = np.asarray(jax.tree_util.tree_leaves(state.params)[0]).copy()
    for _ in range(3):
        state, metrics = step(state, scene, aabb)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 3
    p1 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    assert not np.allclose(p0, p1)


def test_parallel_state_replicated_after_step():
    """The sharded step must leave params identical on every device."""
    cfg = tiny_cfg(False)
    spec = make_field_spec(cfg)
    mesh = make_mesh()
    net_tx, pose_tx = make_optimizers(cfg)
    state = init_train_state(jax.random.PRNGKey(0), cfg, spec)
    state = replicate_to_mesh(state, mesh)
    ts, _ = make_synthetic_scene(n_train=4, n_val=1, H=16, W=16)
    scene = replicate_to_mesh(
        {"images": jnp.asarray(ts.images), "poses": jnp.asarray(ts.poses),
         "intrinsics": jnp.asarray(ts.intrinsics)}, mesh)
    aabb = replicate_to_mesh(jnp.asarray(ts.pts_aabb), mesh)
    step = make_parallel_train_step(cfg, spec, net_tx, pose_tx,
                                    num_rays=512, mesh=mesh)
    state, _ = step(state, scene, aabb)
    # replicated output: all shards identical
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


@pytest.mark.parametrize("occupancy,fused", [(False, False), (True, True)])
def test_parallel_grads_match_single_device_exactly(occupancy, fused):
    """REAL gradient parity: pmean over 8 shards of the SAME fixed ray
    batch == the single-device gradient over the whole batch, numerically
    (deterministic render, equal shard sizes so mean-of-means == mean).

    The occupancy variant also exercises the fused sort-backward encoder
    under shard_map. compact_ratio=0 keeps rays independent (cross-ray
    compaction couples rays through the shared point budget, which is a
    deliberate semantic of the batched step, not of the gradient math)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from raw_ngp_tpu.data.sampler import sample_ray_batch
    from raw_ngp_tpu.train.trainer import make_batch_loss_fn

    cfg = tiny_cfg(occupancy)
    cfg = replace(cfg, model=replace(cfg.model, fused_encoder=fused))
    if occupancy:
        cfg = replace(cfg, render=replace(cfg.render, compact_ratio=0.0))
    spec = make_field_spec(cfg)
    state = init_train_state(jax.random.PRNGKey(0), cfg, spec)
    if occupancy:
        state = state.replace(density_bitfield=jnp.full_like(
            state.density_bitfield, 255))

    ts, _ = make_synthetic_scene(n_train=4, n_val=1, H=16, W=16)
    batch = sample_ray_batch(
        jax.random.PRNGKey(7), jnp.asarray(ts.images),
        jnp.asarray(ts.poses), jnp.asarray(ts.intrinsics), 512,
        random_image_batch=True)
    aabb = jnp.asarray(ts.pts_aabb)
    loss_fn = make_batch_loss_fn(cfg, spec)

    def grad_of(params, batch_part):
        return jax.grad(lambda p: loss_fn(
            p, state, batch_part, aabb, None, 1.0, True)[0])(params)

    g_single = jax.jit(grad_of)(state.params, batch)

    mesh = make_mesh()

    def per_device(params, batch_shard):
        g = grad_of(params, batch_shard)
        return jax.lax.pmean(g, "dp")

    sharded = jax.jit(shard_map(
        per_device, mesh=mesh, in_specs=(P(), P("dp")), out_specs=P(),
        check_vma=False))
    g_par = sharded(state.params, batch)

    flat_s = jax.tree_util.tree_leaves(g_single)
    flat_p = jax.tree_util.tree_leaves(g_par)
    assert len(flat_s) == len(flat_p)
    # the sharded segment sums accumulate per-device (different fp32
    # association than one global sum); the fused encoder additionally
    # pre-rounds record values to fp16, so its absolute floor is the fp32
    # noise on fp16-scaled sums (~1e-6) rather than a relative bound
    atol_extra = 1e-6 if fused else 0.0
    for a, b in zip(flat_s, flat_p):
        scale = np.abs(np.asarray(a)).max() + 1e-12
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-5,
                                   atol=2e-6 * scale + atol_extra)


def test_parallel_eval_render():
    """Sharded full-image eval: ray chunks split over the mesh, results
    gathered (the all_gather analogue of train_utils.py:1043-1048)."""
    from raw_ngp_tpu.parallel import make_parallel_eval_render
    from raw_ngp_tpu.models import init_field

    cfg = tiny_cfg(False)
    spec = make_field_spec(cfg)
    mesh = make_mesh()
    params = replicate_to_mesh(
        init_field(jax.random.PRNGKey(0), spec), mesh)
    aabb = replicate_to_mesh(jnp.asarray([-1.5] * 3 + [1.5] * 3), mesh)
    N = 1024                       # divides the 8-way mesh
    rays_o = jnp.zeros((N, 3)).at[:, 2].set(2.0)
    rays_d = jax.random.normal(jax.random.PRNGKey(1), (N, 3))
    render = make_parallel_eval_render(cfg, spec, mesh, chunk=N // 8)
    img, depth, ws = render(params, None, rays_o, rays_d, aabb, 1.0)
    assert img.shape == (N, 3)
    assert np.all(np.isfinite(np.asarray(img)))
    # must equal the single-device render
    from raw_ngp_tpu.train import make_eval_render
    single = make_eval_render(cfg, spec, N)
    img1, _, _ = single(jax.device_get(params), None,
                        jax.device_get(rays_o), jax.device_get(rays_d),
                        jax.device_get(aabb), 1.0, None)
    np.testing.assert_allclose(np.asarray(img), np.asarray(img1),
                               rtol=1e-4, atol=1e-5)


def test_trainer_dp_end_to_end(tmp_path):
    """Trainer with an explicit 8-device mesh: sharded train step, sharded
    eval render, mesh-agnostic checkpointing — the 'DP is first-class'
    product path (cfg.parallel.num_devices routes here from the CLI's
    --n_devices)."""
    from raw_ngp_tpu.config import ParallelConfig

    cfg = tiny_cfg(True)
    cfg = replace(cfg, parallel=ParallelConfig(num_devices=8),
                  train=replace(cfg.train, num_rays=256))
    train_scene, val_scene = make_synthetic_scene(
        n_train=8, n_val=1, H=24, W=24)
    tr = Trainer(cfg, train_scene, val_scene, workspace=str(tmp_path))
    assert tr.mesh is not None and tr.mesh.devices.size == 8
    tr.train(iters=20, log_every=10)
    assert np.isfinite(tr.stats["loss"][-1])
    # sharded full-image eval
    rgb, depth = tr.render_image(val_scene.poses[0])
    assert rgb.shape == (24, 24, 3)
    assert np.all(np.isfinite(rgb))
    # checkpoints survive the mesh round-trip
    tr.save_checkpoint()
    assert tr.load_checkpoint()
    tr.train(iters=4, log_every=10)
    # mesh-aware adaptive batching (VERDICT r2 #6): a low live-point
    # reading must shrink the point budget / grow rays ON THE MESH and
    # the respecialized sharded step must keep training
    import jax.numpy as jnp
    rays_before, budget_before = tr.num_rays, tr._point_budget
    tr._adapt_batch({"num_points": jnp.asarray(64.0)})
    assert (tr.num_rays, tr._point_budget) != (rays_before, budget_before)
    assert tr._point_budget is not None      # budget actually shrank
    assert tr.num_rays % tr.n_devices == 0
    tr.train(iters=3, log_every=10)
    assert np.isfinite(tr.stats["loss"][-1])


@pytest.mark.slow
def test_cli_trains_on_cpu_mesh(tmp_path):
    """`cli.main()` end-to-end on the 8-device virtual CPU mesh via
    --n_devices (VERDICT r2 #8: the PRODUCT path — load_scene -> fit ->
    evaluate -> test — must be mesh-safe, not just a hand-built
    Trainer). Model shrunk through the CLI's own size flags. ~5 min of
    sharded compiles on CPU -> slow-marked."""
    from raw_ngp_tpu import cli

    argv = ["synthetic", "--data_format", "synthetic", "-O",
            "--iters", "8", "--num_rays", "256", "--n_devices", "8",
            "--grid_size", "32", "--samples_per_ray", "8",
            "--march_candidates", "32",
            "--num_levels", "4", "--level_dim", "2",
            "--hashmap_size", "12", "--hashgrid_resolution", "32",
            "--grid_mlp_hidden", "16", "--view_mlp_hidden", "16",
            "--workspace", str(tmp_path),
            "--eval_cnt", "1", "--save_cnt", "1",
            "--test_no_video", "--test_no_mesh"]
    assert cli.main(argv) == 0
    # fit ran to completion on the mesh and left artifacts behind
    import os
    assert os.path.isdir(os.path.join(str(tmp_path), "checkpoints"))


def test_adaptation_quiescent_predicate(tmp_path):
    """bench.py's settle phase asks the Trainer whether adaptive growth
    is still plausibly pending (growth keys off the falling live-sample
    EMA; two round-4 bench runs opened the timed window early on
    interval-count heuristics)."""
    cfg = tiny_cfg(True)   # occupancy + compact_ratio default > 0
    cfg = replace(cfg, train=replace(cfg.train, adaptive_num_rays=True))
    train_scene, val_scene = make_synthetic_scene(
        n_train=4, n_val=1, H=16, W=16)
    tr = Trainer(cfg, train_scene, val_scene, workspace=str(tmp_path))
    base_budget = tr.base_point_budget()
    # no reading yet -> cannot be called settled
    assert tr._pts_ema is None and not tr.adaptation_quiescent()
    # saturated live count -> growth cannot fire
    tr._pts_ema = 0.9 * base_budget
    assert tr.adaptation_quiescent()
    # low live count -> growth pending (with margin)
    tr._pts_ema = 0.3 * base_budget
    assert not tr.adaptation_quiescent()
    # within the margin band just above the firing threshold -> pending
    tr._pts_ema = 0.5 * 0.9 * base_budget * 1.05
    assert not tr.adaptation_quiescent()
    # rays at cap but a low EMA still has the budget SHRINK pending
    # (the second respecialization _adapt_batch can fire)
    tr.num_rays = cfg.train.max_num_rays or 4 * cfg.train.num_rays
    tr._pts_ema = 0.3 * base_budget
    assert not tr.adaptation_quiescent()
    # ...until the budget has shrunk to match the live count
    tr._point_budget = base_budget // 2
    assert tr.adaptation_quiescent()
    # a shrunken budget with a RISING live count has the regrow pending
    tr._pts_ema = 0.95 * (base_budget // 2)
    assert not tr.adaptation_quiescent()
