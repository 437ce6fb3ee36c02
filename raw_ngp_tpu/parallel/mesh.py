"""Data-parallel training over a device mesh.

The reference carries latent, never-activated DDP scaffolding
(train_utils.py:384-386, 1033-1048; SURVEY.md §2.3). Here ray-batch data
parallelism is first-class: a 1-D ``dp`` mesh over ICI, shard_map'd train
step where each chip samples and renders its own ray shard, gradients are
``psum``-reduced over ICI, and the (replicated) optimizer step runs
identically on every chip — the XLA-collective equivalent of DDP buckets +
NCCL all-reduce.

Model params (hash table + MLPs, ~70 MB fp32) are replicated — they fit
comfortably in each chip's HBM, and replication keeps the hot gather local
so no collective sits on the sample path.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from raw_ngp_tpu.config import Config
from raw_ngp_tpu.models.ngp import FieldSpec
from raw_ngp_tpu.train.state import TrainState
from raw_ngp_tpu.train.trainer import make_loss_fn


def make_mesh(num_devices: int = 0, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    n = num_devices if num_devices > 0 else len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def make_parallel_train_step(cfg: Config, spec: FieldSpec, net_tx, pose_tx,
                             num_rays: int, mesh: Mesh, axis: str = "dp",
                             scan_steps: int = 1):
    """Build the sharded train step.

    ``num_rays`` is the GLOBAL ray budget; each device renders
    num_rays / n_devices rays with a device-unique PRNG key.
    """
    n_dev = mesh.devices.size
    assert num_rays % n_dev == 0, "num_rays must divide the mesh"
    local_rays = num_rays // n_dev
    loss_fn = make_loss_fn(cfg, spec, local_rays)
    pose_freeze_step = int(cfg.pose_opt.end_annealing * cfg.train.iters)

    def per_device(state: TrainState, scene, aabb):
        dev = jax.lax.axis_index(axis)
        key, k_batch, k_loss = jax.random.split(state.key, 3)
        k_batch = jax.random.fold_in(k_batch, dev)
        k_loss = jax.random.fold_in(k_loss, dev)
        annealing = jnp.clip(state.step / cfg.train.iters, 0.0, 1.0)

        if state.pose_params is not None:
            (loss, aux), (g_net, g_pose) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(
                    state.params, state.pose_params, state, scene, aabb,
                    k_batch, k_loss, annealing, True)
            g_pose = jax.lax.pmean(g_pose, axis)
        else:
            (loss, aux), g_net = jax.value_and_grad(
                loss_fn, has_aux=True)(
                    state.params, None, state, scene, aabb, k_batch,
                    k_loss, annealing, True)
            g_pose = None

        # ICI all-reduce of gradients (the DDP/NCCL equivalent)
        g_net = jax.lax.pmean(g_net, axis)
        loss = jax.lax.pmean(loss, axis)

        if "prop_grids" in state.params:
            gate = ((state.step <= 3000)
                    | (state.step % 5 == 0)).astype(jnp.float32)
            g_net = dict(g_net)
            g_net["prop_grids"] = jax.tree.map(lambda g: g * gate,
                                               g_net["prop_grids"])
            g_net["prop_mlps"] = jax.tree.map(lambda g: g * gate,
                                              g_net["prop_mlps"])

        # fused Adam + overflow-skip + EMA, identical to the single-device
        # step (trainer.fused_adam_ema); pmean has already propagated any
        # non-finite grad to every device, so the local gate is global
        params, ema, opt_state = net_tx.update_apply(
            g_net, state.opt_state, state.params, state.ema_params)

        new_pose_params = state.pose_params
        new_pose_opt = state.pose_opt_state
        if state.pose_params is not None:
            freeze = (state.step >= pose_freeze_step).astype(jnp.float32)
            g_pose = jax.tree.map(lambda g: g * (1.0 - freeze), g_pose)
            p_up, new_pose_opt = pose_tx.update(
                g_pose, state.pose_opt_state, state.pose_params)
            new_pose_params = optax.apply_updates(state.pose_params, p_up)

        new_state = state.replace(
            params=params, opt_state=opt_state, ema_params=ema, key=key,
            step=state.step + 1, pose_params=new_pose_params,
            pose_opt_state=new_pose_opt)
        metrics = {"loss": loss,
                   "num_points": jax.lax.psum(aux["num_points"], axis),
                   "num_points_raw": jax.lax.psum(
                       aux.get("num_points_raw", aux["num_points"]), axis),
                   "weights_sum": jax.lax.pmean(aux["weights_sum"], axis)}
        return new_state, metrics

    # state/scene replicated; per-device divergence comes from fold_in
    sharded = shard_map(per_device, mesh=mesh,
                        in_specs=(P(), P(), P()),
                        out_specs=(P(), P()),
                        check_vma=False)
    if scan_steps > 1:
        from raw_ngp_tpu.train.trainer import scan_train_steps
        return jax.jit(scan_train_steps(sharded, scan_steps),
                       donate_argnums=(0,))
    return jax.jit(sharded, donate_argnums=(0,))


def replicate_to_mesh(tree, mesh: Mesh):
    """Place a pytree fully-replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def make_parallel_eval_render(cfg: Config, spec: FieldSpec, mesh: Mesh,
                              chunk: int, axis: str = "dp"):
    """Shard a ray chunk across the mesh for full-image eval; gather the
    shards back (the all_gather analogue of train_utils.py:1043-1048).

    Same call signature as trainer.make_eval_render so the Trainer swaps
    it in transparently: (params, grid, rays_o, rays_d, aabb, annealing,
    rays_ldir=None)."""
    from raw_ngp_tpu.train.trainer import make_eval_render
    render = make_eval_render(cfg, spec, chunk)

    def per_device(params, grid, rays_o, rays_d, aabb, annealing):
        return render(params, grid, rays_o, rays_d, aabb, annealing, None)

    def per_device_ldir(params, grid, rays_o, rays_d, aabb, annealing,
                        ldir):
        return render(params, grid, rays_o, rays_d, aabb, annealing, ldir)

    # the per-chunk render emits (image, depth, weights_sum) plus a normal
    # map when cfg.render.compute_normals — all ray-sharded
    n_out = 4 if (cfg.render.compute_normals and cfg.render.occupancy) \
        else 3
    out_specs = tuple(P(axis) for _ in range(n_out))
    sharded = jax.jit(shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(), P()),
        out_specs=out_specs, check_vma=False))
    sharded_ldir = jax.jit(shard_map(
        per_device_ldir, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(), P(), P(axis)),
        out_specs=out_specs, check_vma=False))

    def eval_render(params, grid, rays_o, rays_d, aabb, annealing,
                    rays_ldir=None):
        annealing = jnp.asarray(annealing, jnp.float32)
        if rays_ldir is None:
            return sharded(params, grid, rays_o, rays_d, aabb, annealing)
        return sharded_ldir(params, grid, rays_o, rays_d, aabb, annealing,
                            rays_ldir)

    return eval_render
