"""Tensor parallelism over the hash table's channel axis, composed with
ray-batch data parallelism on a 2-D (dp, tp) device mesh.

The reference has no model parallelism at all (its DDP scaffolding is
never activated, train_utils.py:384-386); replicating the table stops
scaling once ``2^hashmap_size * num_levels * level_dim`` outgrows one
chip's HBM. The TPU-native answer exploits a structural property of the
hash encoder: the ROW index math (hashing, windows, interpolation
weights) never looks at the channel dimension. So the [n_params, C]
table shards on C — device (i, j) of the mesh owns channels
[j*C/tp, (j+1)*C/tp) of EVERY row — and each device runs the identical
SPMD encode on its shard. One all_gather of [N, L, C/tp] along the
channel axis (models/ngp._encode) reassembles features that are
bit-equal to the single-device encode; its autodiff transpose
(psum_scatter) routes each channel block's cotangent straight back to
its owner, so the table gradient, sort, and Pallas segment-sum all stay
shard-local. The MLPs are small and replicated; their work is redundant
across tp (the Megatron trade: recompute what is cheaper than
communicating).

Collectives per step (ICI): one fwd all_gather + one bwd psum_scatter
on [points, L*C] bf16 features per encode site, plus the dp-axis pmean
of gradients. Layout: tp innermost on the mesh so the channel gathers
ride neighbor links.

Gradient accounting: every tp device computes the SAME loss from the
same gathered features, so the all_gather transpose sums tp identical
cotangents — the raw table gradient comes out tp_devices times too
large and is rescaled here. MLP gradients have no collective on their
path and are already exact (pmean over tp is an identity on them).
"""

from __future__ import annotations

from typing import Any, Dict

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


def make_tp_mesh(n_dp: int, n_tp: int, axes=("dp", "tp")) -> Mesh:
    devs = jax.devices()
    n = n_dp * n_tp
    assert len(devs) >= n, f"need {n} devices, have {len(devs)}"
    return Mesh(np.array(devs[:n]).reshape(n_dp, n_tp), axes)


def grid_to_2d(state: TrainState, spec: FieldSpec) -> TrainState:
    """Reshape every grid-table-shaped leaf (params / ema / Adam moments)
    from flat [n_params*C] to [n_params, C] so the channel axis is a real
    array axis the mesh can shard."""
    gs = spec.grid_spec
    n, C = gs.n_params, gs.level_dim

    def fix(leaf):
        if (hasattr(leaf, "shape") and leaf.ndim == 1
                and leaf.shape[0] == n * C and jnp.issubdtype(
                    leaf.dtype, jnp.floating)):
            return leaf.reshape(n, C)
        return leaf
    return jax.tree.map(fix, state)


def state_pspecs(state: TrainState, spec: FieldSpec, tp_axis: str = "tp"):
    """PartitionSpec pytree for a TrainState: grid-table leaves (now
    [n_params, C]) shard on the channel axis, everything else replicated."""
    gs = spec.grid_spec
    n, C = gs.n_params, gs.level_dim

    def pick(leaf):
        if (hasattr(leaf, "shape") and getattr(leaf, "ndim", 0) == 2
                and leaf.shape == (n, C)):
            return P(None, tp_axis)
        return P()
    return jax.tree.map(pick, state)


def place_state_tp(state: TrainState, mesh: Mesh, spec: FieldSpec,
                   tp_axis: str = "tp") -> TrainState:
    """Device placement honoring the channel sharding (the tp analogue of
    replicate_to_mesh)."""
    specs = state_pspecs(state, spec, tp_axis)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        state, specs)


def make_tp_train_step(cfg: Config, spec: FieldSpec, net_tx, pose_tx,
                       num_rays: int, mesh: Mesh,
                       dp_axis: str = "dp", tp_axis: str = "tp",
                       scan_steps: int = 1):
    """Sharded train step over the 2-D mesh: rays shard on dp, the hash
    table's channels on tp; optimizer runs per device on its local view.
    ``num_rays`` is GLOBAL; each dp row renders num_rays / n_dp rays
    (identical batch within a dp row — the tp devices of a row redundantly
    compute the same rays against different channel shards)."""
    from dataclasses import replace as dc_replace

    n_dp = mesh.shape[dp_axis]
    n_tp = mesh.shape[tp_axis]
    assert num_rays % n_dp == 0
    local_rays = num_rays // n_dp
    spec_tp = dc_replace(spec, tp_axis=tp_axis, tp_devices=n_tp)
    loss_fn = make_loss_fn(cfg, spec_tp, local_rays)
    pose_freeze_step = int(cfg.pose_opt.end_annealing * cfg.train.iters)

    def per_device(state: TrainState, scene, aabb):
        dp = jax.lax.axis_index(dp_axis)
        key, k_batch, k_loss = jax.random.split(state.key, 3)
        # fold in ONLY the dp index: the tp devices of a row must sample
        # the identical ray batch (they hold complementary channels of
        # the same model)
        k_batch = jax.random.fold_in(k_batch, dp)
        k_loss = jax.random.fold_in(k_loss, dp)
        annealing = jnp.clip(state.step / cfg.train.iters, 0.0, 1.0)

        if state.pose_params is not None:
            (loss, aux), (g_net, g_pose) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(
                    state.params, state.pose_params, state, scene, aabb,
                    k_batch, k_loss, annealing, True)
            # pose (se3) gradients flow through the encoder's INPUT
            # gradient: device j's local contribution covers only its
            # channel shard and carries the n_tp-times-too-large
            # psum_scattered feature cotangent (module docstring), so the
            # exact pose gradient is the tp-sum rescaled by 1/n_tp, then
            # dp-averaged like the dp-only path (parallel/mesh.py)
            g_pose = jax.lax.psum(g_pose, tp_axis) / n_tp
            g_pose = jax.lax.pmean(g_pose, dp_axis)
        else:
            (loss, aux), g_net = jax.value_and_grad(
                loss_fn, has_aux=True)(
                    state.params, None, state, scene, aabb, k_batch,
                    k_loss, annealing, True)
            g_pose = None

        # the all_gather transpose summed n_tp identical feature
        # cotangents into the table gradient (module docstring)
        g_net = dict(g_net)
        g_net["grid"] = g_net["grid"] / n_tp

        # dp all-reduce (the DDP equivalent); tp shards stay local
        g_net = jax.lax.pmean(g_net, dp_axis)
        loss = jax.lax.pmean(loss, dp_axis)

        # GLOBAL finite gate: per-device skip decisions would diverge —
        # a non-finite gradient on ONE tp shard must skip the update on
        # EVERY device or the replicated MLPs drift apart. (The dp-only
        # path gets this for free: pmean propagates inf to all devices.)
        ok = jnp.all(jnp.stack([
            jnp.all(jnp.isfinite(g))
            for g in jax.tree_util.tree_leaves(g_net)]))
        ok = jax.lax.pmin(jax.lax.pmin(
            ok.astype(jnp.int32), tp_axis), dp_axis) > 0
        # the globally-agreed gate feeds the fused update directly (a
        # per-device recomputation over pre-zeroed grads would diverge)
        params, ema, opt_state = net_tx.update_apply(
            g_net, state.opt_state, state.params, state.ema_params, ok=ok)

        new_pose_params = state.pose_params
        new_pose_opt = state.pose_opt_state
        if state.pose_params is not None:
            # annealing-window freeze, identical to parallel/mesh.py; the
            # psum+pmean above already made g_pose bit-identical on every
            # device, so the replicated pose step cannot drift
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
                   "num_points": jax.lax.psum(aux["num_points"], dp_axis),
                   "num_points_raw": jax.lax.psum(
                       aux.get("num_points_raw", aux["num_points"]),
                       dp_axis),
                   "weights_sum": jax.lax.pmean(aux["weights_sum"],
                                                dp_axis)}
        return new_state, metrics

    state_specs = None

    def build(state_example):
        specs = state_pspecs(state_example, spec, tp_axis)
        sharded = shard_map(
            per_device, mesh=mesh,
            in_specs=(specs, P(), P()),
            out_specs=(specs, P()),
            check_vma=False)
        if scan_steps > 1:
            from raw_ngp_tpu.train.trainer import scan_train_steps
            return jax.jit(scan_train_steps(sharded, scan_steps),
                           donate_argnums=(0,))
        return jax.jit(sharded, donate_argnums=(0,))

    def step(state, scene, aabb):
        nonlocal state_specs
        if state_specs is None:
            state_specs = build(state)
        return state_specs(state, scene, aabb)

    return step
