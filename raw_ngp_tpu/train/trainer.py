"""Trainer: jitted train/eval steps + host-side orchestration.

TPU-native redesign of the reference Trainer (nerf/train_utils.py:330-1299).
The key structural change: the reference's per-step pipeline (DataLoader
collate -> pose optimizer -> get_rays -> render -> loss -> backward ->
two optimizer steps -> LR schedulers) crosses the host/device boundary many
times per step; here the entire step is ONE jitted, donated-state function,
and the density-grid refresh is a second jitted function invoked every
``update_extra_interval`` steps (renderer.py:811-897 cadence).

Dual optimization (network Adam + pose Adam with exponential decay and a
post-annealing freeze, train_utils.py:745-751, 891-909) is two optax chains
inside the same step.
"""

from __future__ import annotations

import functools
import json
import os
import time
from dataclasses import replace
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from raw_ngp_tpu.config import Config
from raw_ngp_tpu.data.sampler import sample_ray_batch
from raw_ngp_tpu.data.scene import SceneData
from raw_ngp_tpu.models.ngp import (
    FieldSpec,
    init_field,
    make_field_spec,
)
from raw_ngp_tpu.ops.hashgrid import total_variation_loss, weight_decay_loss
from raw_ngp_tpu.ops.lie import se3_to_SE3
from raw_ngp_tpu.render.proposal import render_proposal
from raw_ngp_tpu.train.losses import (
    blend_gt_background,
    entropy_loss,
    ldr_loss,
    loss_weight_fn,
    rawnerf_loss,
)
from raw_ngp_tpu.train.state import TrainState


def network_lr_schedule(cfg: Config):
    """LambdaLR 0.1^(step/iters) on the base LR (main.py:261), or cosine
    warm restarts when anneal_lr (main.py:259)."""
    if cfg.train.anneal_lr:
        return optax.cosine_decay_schedule(cfg.train.lr, 6000, alpha=0.0)

    def sched(step):
        return cfg.train.lr * 0.1 ** jnp.minimum(
            step / cfg.train.iters, 1.0)
    return sched


def pose_lr_schedule(cfg: Config):
    """ExponentialLR decaying c_lr to 1e-2 * c_lr over the run
    (camera_optimizers.py:42-43)."""
    gamma = (1e-2) ** (1.0 / cfg.train.iters)

    def sched(step):
        return cfg.pose_opt.c_lr * gamma ** step
    return sched


def skip_nonfinite() -> optax.GradientTransformation:
    """Zero the ENTIRE update when any gradient leaf is non-finite — the
    functional equivalent of the reference's AMP GradScaler skipping a step
    whose grads overflowed (train_utils.py:404, 897-909). optax.zero_nans
    only catches NaN per-leaf; inf must be rejected too."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        ok = jnp.all(jnp.stack([
            jnp.all(jnp.isfinite(u))
            for u in jax.tree_util.tree_leaves(updates)]))
        updates = jax.tree.map(
            lambda u: jnp.where(ok, u, jnp.zeros_like(u)), updates)
        return updates, state

    return optax.GradientTransformation(init, update)


def fused_adam_ema(cfg: Config):
    """Adam + skip-nonfinite + EMA as ONE pass over every parameter leaf.

    optax.chain(skip_nonfinite, adam) + apply_updates + a separate EMA
    tree_map materializes ~4 extra full-size intermediates per step (the
    hash table is 67 MB — each pass is real HBM time; opt+ema measured
    3-4 ms of the train step). This computes m, v, p and the EMA in one
    jax.tree.map so XLA emits one fused elementwise loop per leaf.
    Finite-grad steps are bit-equal to the chain (same moment decays,
    bias corrections, schedule indexing, per-step EMA decay); overflow
    steps freeze params and moments outright, matching the reference's
    GradScaler step-skip (train_utils.py:404, 897-909) more faithfully
    than the chain's zeroed-grads-through-Adam behavior.

    Returns (init_fn(params) -> ScaleByAdamState,
             update_fn(grads, state, params, ema)
               -> (params, ema, ScaleByAdamState)).
    """
    lr_fn = network_lr_schedule(cfg)
    b1, b2 = 0.9, 0.999
    eps = cfg.train.adam_eps
    d = cfg.train.ema_decay

    def init(params):
        zeros = lambda: jax.tree.map(jnp.zeros_like, params)  # noqa: E731
        return optax.ScaleByAdamState(
            count=jnp.zeros((), jnp.int32), mu=zeros(), nu=zeros())

    def update_apply(grads, state, params, ema, ok=None):
        # `ok` override: sharded callers (parallel/tp.py) must agree on
        # ONE global skip decision — a per-device recomputation over
        # already-gated grads would let zero-grad momentum steps through
        if ok is None:
            ok = jnp.all(jnp.stack([
                jnp.all(jnp.isfinite(g))
                for g in jax.tree_util.tree_leaves(grads)]))
        ok = ok.astype(jnp.float32)
        count = state.count + 1
        cf = count.astype(jnp.float32)
        lr = lr_fn(state.count)
        # scale the STEP by the finiteness gate + bias corrections once
        # (scalars), so the per-leaf math is a single fused expression
        step_scale = ok * lr / (1.0 - b1 ** cf)
        nu_corr = 1.0 - b2 ** cf

        def leaf(p, g, m, v, e):
            # select, not multiply: inf * 0 == NaN would poison the step
            g = jnp.where(ok > 0, g, 0.0)
            m2 = b1 * m + (1.0 - b1) * g
            v2 = b2 * v + (1.0 - b2) * g * g
            p2 = p - step_scale * m2 / (jnp.sqrt(v2 / nu_corr) + eps)
            # overflow steps freeze params AND moments — the reference's
            # GradScaler skips optimizer.step() outright
            # (train_utils.py:897-909); the previous optax chain only
            # zeroed grads, letting a decayed-momentum step through
            m2 = ok * m2 + (1.0 - ok) * m
            v2 = ok * v2 + (1.0 - ok) * v
            e2 = d * e + (1.0 - d) * p2
            return p2, m2, v2, e2

        out = jax.tree.map(leaf, params, grads, state.mu, state.nu, ema)
        paths = jax.tree_util.tree_leaves(
            out, is_leaf=lambda x: isinstance(x, tuple))
        treedef = jax.tree_util.tree_structure(params)
        unzip = [jax.tree_util.tree_unflatten(
            treedef, [t[i] for t in paths]) for i in range(4)]
        p2, m2, v2, e2 = unzip
        return p2, e2, optax.ScaleByAdamState(count=count, mu=m2, nu=v2)

    return _FusedOpt(init=init, update_apply=update_apply)


class _FusedOpt:
    """init/update_apply pair from :func:`fused_adam_ema` (duck-typed like
    a GradientTransformation whose update also applies + EMAs)."""

    def __init__(self, init, update_apply):
        self.init = init
        self.update_apply = update_apply


def make_optimizers(cfg: Config):
    net_tx = fused_adam_ema(cfg)
    pose_tx = None
    if cfg.pose_opt.mode != "none":
        pose_tx = optax.chain(
            skip_nonfinite(),
            optax.adam(learning_rate=pose_lr_schedule(cfg), eps=1e-8))
    return net_tx, pose_tx


def init_train_state(key, cfg: Config, spec: FieldSpec,
                     num_cameras: int = 0) -> TrainState:
    k_model, k_noise, k_run = jax.random.split(key, 3)
    params = init_field(k_model, spec)
    net_tx, pose_tx = make_optimizers(cfg)
    opt_state = net_tx.init(params)

    pose_params = None
    pose_opt_state = None
    pose_noise = None
    if cfg.pose_opt.mode != "none":
        pose_params = jnp.zeros((num_cameras, 6), jnp.float32)
        pose_opt_state = pose_tx.init(pose_params)
        if cfg.pose_opt.noise > 0:
            # synthetic perturbation for the pose-recovery self-test
            # (camera_optimizers.py:26-36)
            kt, kr = jax.random.split(k_noise)
            scale = cfg.data.scale if cfg.data.scale > 0 else 1.0
            se3_t = (jax.random.normal(kt, (num_cameras, 3))
                     * cfg.pose_opt.noise * scale)
            se3_r = jax.random.normal(kr, (num_cameras, 3)) * cfg.pose_opt.noise
            pose_noise = se3_to_SE3(jnp.concatenate([se3_r, se3_t], axis=-1))

    # ema must be distinct buffers from params (donation aliases otherwise)
    ema0 = jax.tree.map(jnp.copy, params)
    st = TrainState(
        params=params, opt_state=opt_state, ema_params=ema0,
        key=k_run, step=jnp.zeros((), jnp.int32),
        pose_params=pose_params, pose_opt_state=pose_opt_state,
        pose_noise=pose_noise)

    if cfg.render.occupancy:
        from raw_ngp_tpu.ops.grid import init_grid_state
        st = st.replace(**init_grid_state(cfg))
    return st


def _bg_color(cfg: Config, key, n):
    mode = cfg.render.background
    if mode == "random":
        return jax.random.uniform(key, (n, 3))
    if mode in ("white", "last_sample"):
        return 1.0
    return 0.0


def render_any(params, spec, state, rays_o, rays_d, aabb, *, key,
               bg_color, cam_near_far, rays_ldir, annealing, training,
               update_proposal=True, coarse_lin=None):
    """Dispatch proposal vs occupancy rendering (renderer.py:374-377)."""
    if spec.cfg.render.occupancy:
        from raw_ngp_tpu.render.occupancy import render_occupancy
        return render_occupancy(
            params, spec, rays_o, rays_d, aabb, state.density_bitfield,
            key=key, bg_color=bg_color, cam_near_far=cam_near_far,
            rays_ldir=rays_ldir, annealing=annealing, training=training,
            coarse_lin=coarse_lin)
    return render_proposal(
        params, spec, rays_o, rays_d, aabb, key=key, bg_color=bg_color,
        cam_near_far=cam_near_far, rays_ldir=rays_ldir, annealing=annealing,
        training=training, update_proposal=update_proposal)


def make_batch_loss_fn(cfg: Config, spec: FieldSpec):
    """Render + loss assembly over an explicit ray batch (the sampling-free
    half of the step objective; used directly by the gradient-parity tests
    so sharded and single-device steps can see the identical rays)."""

    def batch_loss_fn(params, state: TrainState, batch, aabb, key,
                      annealing, update_proposal):
        rays_o, rays_d = batch["rays_o"], batch["rays_d"]
        if key is None:       # deterministic mode (gradient-parity tests)
            k_bg = k_render = None
        else:
            k_bg, k_render = jax.random.split(key)
        bg = _bg_color(cfg, k_bg, rays_o.shape[0])
        gt_rgb = blend_gt_background(batch["images"], bg)

        out = render_any(
            params, spec, state, rays_o, rays_d, aabb, key=k_render,
            bg_color=bg, cam_near_far=batch.get("cam_near_far"),
            rays_ldir=batch.get("rays_ldir"), annealing=annealing,
            training=True, update_proposal=update_proposal,
            coarse_lin=batch.get("coarse_lin"))

        if cfg.data.image_mode == "HDR":
            lw = loss_weight_fn(cfg.train.loss_weight, gt_rgb)
            loss = rawnerf_loss(out["image"], gt_rgb, batch["exposure"],
                                batch.get("lossmult", 1.0), lw)
        else:
            loss = ldr_loss(out["image"], gt_rgb)

        if "proposal_loss" in out:
            loss = loss + cfg.train.lambda_proposal * out["proposal_loss"]
        if "distort_loss" in out:
            loss = loss + cfg.train.lambda_distort * out["distort_loss"]
        if "orientation_loss" in out:
            loss = loss + cfg.train.lambda_orientation * out["orientation_loss"]
        if cfg.train.lambda_entropy > 0:
            loss = loss + cfg.train.lambda_entropy * entropy_loss(
                out["weights_sum"])
        # in-place grad regularizers of the reference become loss terms
        if cfg.train.lambda_tv > 0:
            loss = loss + cfg.train.lambda_tv * total_variation_loss(
                params["grid"], spec.grid_spec, key)
        if cfg.train.lambda_wd > 0:
            loss = loss + cfg.train.lambda_wd * weight_decay_loss(
                params["grid"], spec.grid_spec)

        aux = {"num_points": out.get("num_points", 0),
               "num_points_raw": out.get("num_points_raw",
                                         out.get("num_points", 0)),
               "weights_sum": out["weights_sum"].mean()}
        return loss, aux

    return batch_loss_fn


def make_loss_fn(cfg: Config, spec: FieldSpec, num_rays: int):
    """The full differentiable step objective: batch sampling + rendering +
    loss assembly (exposed separately for tests and NaN debugging)."""
    batch_loss_fn = make_batch_loss_fn(cfg, spec)

    def loss_fn(params, pose_params, state: TrainState, scene, aabb,
                k_batch, key, annealing, update_proposal):
        # ray generation lives INSIDE the differentiated function so pose
        # gradients flow from the loss through get_rays into the se(3)
        # refinements (the reference routes this through
        # rays_o/d.requires_grad_, colmap_provider.py:644-645)
        batch = sample_ray_batch(
            k_batch, scene["images"], scene["poses"], scene["intrinsics"],
            num_rays, random_image_batch=cfg.train.random_image_batch,
            se3_refine=pose_params, pose_noise=state.pose_noise,
            exposures=scene.get("exposures"), ldirs=scene.get("ldirs"),
            cam_near_far=scene.get("cam_near_far"),
            mosaiced=cfg.data.mosaiced)
        # per-interval cached coarse volume (the Trainer refreshes it at
        # grid-update boundaries; absent -> the march rebuilds in-graph)
        if "coarse_lin" in scene:
            batch["coarse_lin"] = scene["coarse_lin"]
        return batch_loss_fn(params, state, batch, aabb, key, annealing,
                             update_proposal)

    return loss_fn


def scan_train_steps(step_fn, n: int):
    """Chain ``n`` train steps into one executable with lax.scan (per-
    dispatch host/tunnel latency measured ~17 ms on the axon backend —
    one dispatch per grid-refresh interval instead of per step). The
    chained program is bitwise-identical to n sequential dispatches
    (same RNG chain through state.key); returns the LAST step's metrics,
    which is exactly what the interval-cadenced logging/adaptive logic
    consumed before."""

    def multi(state, scene, aabb):
        def body(st, _):
            return step_fn(st, scene, aabb)

        state, ms = jax.lax.scan(body, state, None, length=n)
        return state, jax.tree.map(lambda a: a[-1], ms)

    return multi


def make_train_step(cfg: Config, spec: FieldSpec, net_tx, pose_tx,
                    num_rays: int, scan_steps: int = 1):
    """Build the jitted train step. Scene tensors are passed as arguments
    (not closed over) so the executable is scene-independent."""
    loss_fn = make_loss_fn(cfg, spec, num_rays)
    pose_freeze_step = int(cfg.pose_opt.end_annealing * cfg.train.iters)

    def train_step(state: TrainState, scene: Dict[str, jnp.ndarray], aabb):
        key, k_batch, k_loss = jax.random.split(state.key, 3)
        annealing = jnp.clip(state.step / cfg.train.iters, 0.0, 1.0)
        update_proposal = True  # refined per-step gating handled below

        if state.pose_params is not None:
            (loss, aux), (g_net, g_pose) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(
                    state.params, state.pose_params, state, scene, aabb,
                    k_batch, k_loss, annealing, update_proposal)
        else:
            (loss, aux), g_net = jax.value_and_grad(
                loss_fn, has_aux=True)(
                    state.params, None, state, scene, aabb, k_batch,
                    k_loss, annealing, update_proposal)
            g_pose = None

        # proposal nets update on early steps then 1-in-5
        # (train_utils.py:508). The reference gates via no_grad around the
        # proposal query; since proposal_loss is the only gradient source
        # for the proposal nets, gating their grads is equivalent and keeps
        # one compiled program.
        if "prop_grids" in state.params:
            gate = ((state.step <= 3000)
                    | (state.step % 5 == 0)).astype(jnp.float32)
            g_net = dict(g_net)
            g_net["prop_grids"] = jax.tree.map(lambda g: g * gate,
                                               g_net["prop_grids"])
            g_net["prop_mlps"] = jax.tree.map(lambda g: g * gate,
                                              g_net["prop_mlps"])

        params, ema, opt_state = net_tx.update_apply(
            g_net, state.opt_state, state.params, state.ema_params)

        new_pose_params = state.pose_params
        new_pose_opt = state.pose_opt_state
        if state.pose_params is not None:
            # freeze pose refinement after the annealing window
            # (train_utils.py:745-751)
            freeze = (state.step >= pose_freeze_step).astype(jnp.float32)
            g_pose = jax.tree.map(lambda g: g * (1.0 - freeze), g_pose)
            p_updates, new_pose_opt = pose_tx.update(
                g_pose, state.pose_opt_state, state.pose_params)
            new_pose_params = optax.apply_updates(state.pose_params,
                                                  p_updates)

        # EMA of model params (train_utils.py:399-402; torch_ema decay
        # 0.95) rides inside fused_adam_ema's single pass
        new_state = state.replace(
            params=params, opt_state=opt_state, ema_params=ema, key=key,
            step=state.step + 1, pose_params=new_pose_params,
            pose_opt_state=new_pose_opt)
        metrics = {"loss": loss, **aux}
        return new_state, metrics

    if scan_steps > 1:
        return jax.jit(scan_train_steps(train_step, scan_steps),
                       donate_argnums=(0,))
    return jax.jit(train_step, donate_argnums=(0,))


def make_eval_render(cfg: Config, spec: FieldSpec, chunk: int):
    """Jitted chunk renderer for full-image eval (train_utils.py:592-607
    chunking; renderer.py:380-396 staged inference)."""

    normals = cfg.render.compute_normals and cfg.render.occupancy

    def render_chunk(params, state_grid, rays_o, rays_d, aabb, annealing,
                     rays_ldir=None):
        # eval uses the CURRENT annealing state, like the reference's
        # eval_step (train_utils.py:488-489 keeps model.annealing live)
        if cfg.render.occupancy:
            from raw_ngp_tpu.render.occupancy import render_occupancy
            out = render_occupancy(
                params, spec, rays_o, rays_d, aabb, state_grid,
                key=None, bg_color=1.0 if cfg.render.background != "black"
                else 0.0, cam_near_far=None, rays_ldir=rays_ldir,
                annealing=annealing, training=False,
                compute_normals=normals)
        else:
            out = render_proposal(
                params, spec, rays_o, rays_d, aabb, key=None,
                bg_color=1.0 if cfg.render.background != "black" else 0.0,
                cam_near_far=None, rays_ldir=rays_ldir, annealing=annealing,
                training=False)
        if normals:
            return (out["image"], out["depth"], out["weights_sum"],
                    out["normals"])
        return out["image"], out["depth"], out["weights_sum"]

    return jax.jit(render_chunk)


def dataclasses_replace_scene(scene, new_poses):
    """SceneData with replaced poses (keeps poses_gt for evaluation)."""
    import dataclasses as _dc
    if scene.poses_gt is None:
        scene = _dc.replace(scene, poses_gt=scene.poses.copy())
    return _dc.replace(scene, poses=new_poses)


class Trainer:
    """Host-side orchestration: epochs, eval cadence, checkpoints, logging
    (mirrors the responsibilities of reference Trainer,
    train_utils.py:330-463)."""

    def __init__(self, cfg: Config, train_scene: SceneData,
                 val_scene: Optional[SceneData] = None,
                 workspace: Optional[str] = None):
        self.cfg = cfg
        self.spec = make_field_spec(cfg)
        self.workspace = workspace or cfg.workspace
        os.makedirs(self.workspace, exist_ok=True)
        os.makedirs(os.path.join(self.workspace, "checkpoints"),
                    exist_ok=True)
        # persistent compilation cache (opt-in via RAW_NGP_COMPILE_CACHE
        #=<dir>): the first TPU compile of the full step costs minutes;
        # across runs (bench warmups, restarts) the cache cuts it to a
        # disk read. Opt-in because cache serialization can stall some
        # backends' compile threads (observed hanging the CPU test suite).
        cache_dir = os.environ.get("RAW_NGP_COMPILE_CACHE")
        if cache_dir:
            try:
                os.makedirs(cache_dir, exist_ok=True)
                jax.config.update("jax_compilation_cache_dir", cache_dir)
                jax.config.update(
                    "jax_persistent_cache_min_compile_time_secs", 5.0)
            except Exception:
                pass

        self.train_scene = train_scene
        self.val_scene = val_scene
        if cfg.pose_opt.identity:
            # BARF-from-scratch: start every camera at the identity pose
            # (camera_optimizers.py:99-100); ground truth stays in poses_gt
            import numpy as _np
            ident = _np.tile(_np.eye(4, dtype=_np.float32),
                             (train_scene.n_images, 1, 1))
            train_scene = dataclasses_replace_scene(train_scene, ident)
            self.train_scene = train_scene
        self.scene_arrays = self._scene_to_device(train_scene)
        self.aabb = jnp.asarray(
            train_scene.pts_aabb if train_scene.pts_aabb is not None
            and not cfg.render.contract
            else np.array([-cfg.render.bound] * 3 + [cfg.render.bound] * 3,
                          np.float32))
        # clamp the sparse-points AABB into the bound box (renderer.py:215)
        self.aabb = jnp.clip(self.aabb, -cfg.render.bound, cfg.render.bound)

        key = jax.random.PRNGKey(cfg.train.seed)
        self.net_tx, self.pose_tx = make_optimizers(cfg)
        # jit the whole init: on the remote-TPU path each eager op costs a
        # compile round-trip (~0.5 s); one fused program costs one
        init_fn = jax.jit(init_train_state, static_argnums=(1, 2, 3))
        self.state = init_fn(key, cfg, self.spec, train_scene.n_images)
        self.num_rays = cfg.train.num_rays

        # first-class data parallelism (the DDP scaffolding the reference
        # never activates, train_utils.py:384-386): num_devices=0 auto-uses
        # every chip on an accelerator backend; explicit >1 forces a mesh
        # (e.g. the 8-device virtual CPU mesh in tests); 1 = single device
        n_req = cfg.parallel.num_devices
        n_avail = len(jax.devices())
        if n_req == 0:
            self.n_devices = n_avail if jax.default_backend() != "cpu" else 1
        else:
            self.n_devices = min(n_req, n_avail)
        self.n_tp = cfg.parallel.tp_devices
        if self.n_tp > 1:
            assert self.n_devices % self.n_tp == 0, \
                "tp_devices must divide the device count"
        self.n_dp = self.n_devices // self.n_tp
        self.mesh = None
        self._eval_chunk = cfg.render.max_ray_batch
        if self.n_devices > 1:
            from raw_ngp_tpu.parallel import (
                make_mesh,
                make_parallel_eval_render,
                replicate_to_mesh,
            )
            assert self.num_rays % max(self.n_dp, 1) == 0, \
                "num_rays must divide the dp mesh axis"
            if self.n_tp > 1:
                from raw_ngp_tpu.parallel.tp import grid_to_2d, make_tp_mesh
                self.mesh = make_tp_mesh(self.n_dp, self.n_tp)
                self.state = grid_to_2d(self.state, self.spec)
            else:
                self.mesh = make_mesh(self.n_devices, cfg.parallel.mesh_axis)
            self._train_step = self._make_step(self.num_rays, None)
            # eval rays shard over the dp axis only (tp shards channels)
            self._eval_chunk = (self._eval_chunk // self.n_dp
                                * self.n_dp) or self.n_dp
            self._eval_render = make_parallel_eval_render(
                cfg, self.spec, self.mesh, self._eval_chunk,
                "dp" if self.n_tp > 1 else cfg.parallel.mesh_axis)
            # state is placed by _place_state() at the end of __init__
            self.scene_arrays = replicate_to_mesh(self.scene_arrays,
                                                  self.mesh)
            self.aabb = replicate_to_mesh(self.aabb, self.mesh)
        else:
            self._train_step = self._make_step(self.num_rays, None)
            self._eval_render = make_eval_render(cfg, self.spec,
                                                 self._eval_chunk)
        # cached coarse-probe occupancy volume: it only changes at grid-
        # refresh boundaries, but rebuilt in-graph it costs ~2.2 ms on
        # EVERY step (measured, flagship shapes) — compute once per
        # refresh and ship it with the scene arrays
        self._coarse_fn = None
        if cfg.render.occupancy and cfg.render.coarse_probes > 0:
            from raw_ngp_tpu.render.occupancy import (
                _coarse_dilate_radius, coarse_occupancy)
            _r = _coarse_dilate_radius(cfg.render.bound,
                                       cfg.render.grid_size,
                                       cfg.render.coarse_probes)
            self._coarse_fn = jax.jit(
                lambda bf: coarse_occupancy(
                    bf, cfg.render.grid_size, cfg.cascades, _r,
                    bound=cfg.render.bound))
        if cfg.render.occupancy:
            from raw_ngp_tpu.ops.grid import make_grid_update
            self._grid_update = make_grid_update(cfg, self.spec)
            from raw_ngp_tpu.ops.grid import mark_untrained_grid
            if cfg.render.mark_untrained:
                grid = mark_untrained_grid(
                    cfg, np.asarray(train_scene.poses),
                    np.asarray(train_scene.intrinsics), self.aabb,
                    cam_near_far=train_scene.cam_near_far)
                self.state = self.state.replace(density_grid=grid)
        self.stats: Dict[str, Any] = {"loss": [], "psnr": []}
        self.host_step = 0
        self.host_grid_updates = 0
        # HDR eval/test exposure levels (metadict['exposure_levels'],
        # train_utils.py:1008-1017), populated per eval by
        # estimate_exposure_levels
        self.exposure_levels: Dict[float, float] = {}
        # adaptive batching state (_adapt_batch)
        self._pts_ema = None
        self._point_budget = None      # None = base (config-derived)
        self._step_cache = {(self.num_rays, None, 1): self._train_step}
        # observability (train_utils.py:428-432 console+file, :919-937
        # tensorboard; rays/points counters per SURVEY §5.1)
        from raw_ngp_tpu.utils.logging import RunLogger, ThroughputMeter
        self.logger = RunLogger(self.workspace)
        self.throughput = ThroughputMeter()
        # checkpoint auto-resume policy (train_utils.py:444-463)
        if cfg.ckpt != "scratch":
            self.load_checkpoint()
        self._place_state()

    def _place_state(self):
        """(Re)place the train state on the mesh — replicated across dp,
        grid-table leaves channel-sharded when tp is on — after init,
        mark_untrained or checkpoint load."""
        if self.mesh is None:
            return
        if self.n_tp > 1:
            from raw_ngp_tpu.parallel.tp import grid_to_2d, place_state_tp
            # checkpoint loads restore flat tables; re-derive the 2-D view
            self.state = grid_to_2d(self.state, self.spec)
            self.state = place_state_tp(self.state, self.mesh, self.spec)
        else:
            from raw_ngp_tpu.parallel import replicate_to_mesh
            self.state = replicate_to_mesh(self.state, self.mesh)

    def _scene_to_device(self, scene: SceneData) -> Dict[str, jnp.ndarray]:
        arrays = {
            "images": jnp.asarray(scene.images),
            "poses": jnp.asarray(scene.poses),
            "intrinsics": jnp.asarray(scene.intrinsics),
        }
        if scene.exposures is not None:
            arrays["exposures"] = jnp.asarray(scene.exposures)
        if scene.cam_near_far is not None:
            arrays["cam_near_far"] = jnp.asarray(scene.cam_near_far)
        if scene.ldirs is not None:
            arrays["ldirs"] = jnp.asarray(scene.ldirs)
        return arrays

    # ------------------------------------------------------------------
    def base_point_budget(self) -> int:
        """The config-derived compacted point budget (the 2^18 anchor of
        the reference's adaptive_num_rays, train_utils.py:563-564): one
        definition shared by executable construction, the adaptive
        batcher, and the settle predicate."""
        cfg = self.cfg
        return max(int(cfg.train.num_rays * cfg.render.samples_per_ray
                       * cfg.render.compact_ratio) // 128 * 128, 128)

    def _make_step(self, num_rays: int, budget_key, scan_steps: int = 1):
        """Build the train step for an adaptive-batch key
        (num_rays, point budget; budget None = config-derived base).

        On a mesh the per-device point budget is ALWAYS explicit: the
        in-render anchor min(N, cfg.train.num_rays) (render/occupancy.py)
        is evaluated per SHARD, so once adaptive growth raises num_rays
        past the base the per-shard N grows with it and the GLOBAL
        field-eval cost scales with ray count instead of holding
        constant. base_budget/n_devices per shard keeps the single-device
        invariant (and equals the old anchor at base ray counts)."""
        cfg = self.cfg
        if self.mesh is not None:
            from raw_ngp_tpu.parallel import make_parallel_train_step
            budget = budget_key
            if (budget is None and cfg.render.occupancy
                    and cfg.render.compact_ratio > 0):
                budget = self.base_point_budget()
            cfg2 = cfg
            if budget is not None:
                # rays shard over dp only; each tp device of a row
                # redundantly renders the row's full ray shard
                per_dev = max(budget // self.n_dp // 128 * 128, 128)
                cfg2 = replace(cfg, render=replace(
                    cfg.render, point_budget=per_dev))
            if self.n_tp > 1:
                from raw_ngp_tpu.parallel.tp import make_tp_train_step
                return make_tp_train_step(
                    cfg2, self.spec, self.net_tx, self.pose_tx, num_rays,
                    self.mesh, scan_steps=scan_steps)
            return make_parallel_train_step(
                cfg2, self.spec, self.net_tx, self.pose_tx, num_rays,
                self.mesh, cfg.parallel.mesh_axis, scan_steps=scan_steps)
        cfg2 = cfg if budget_key is None else replace(
            cfg, render=replace(cfg.render, point_budget=budget_key))
        return make_train_step(cfg2, self.spec, self.net_tx,
                               self.pose_tx, num_rays,
                               scan_steps=scan_steps)

    def _get_step(self, scan_steps: int = 1):
        """Cached executable for the CURRENT adaptive-batch key at the
        given dispatch chain length."""
        key = (self.num_rays, self._point_budget, scan_steps)
        if key not in self._step_cache:
            self._step_cache[key] = self._make_step(
                self.num_rays, self._point_budget, scan_steps)
        return self._step_cache[key]

    def _adapt_batch(self, metrics):
        """TPU adaptive batching (train_utils.py:563-564 semantics). The
        reference re-sizes every batch so num_rays * samples/ray lands on
        the 2^18-point budget with exactly-counted CSR buffers
        (raymarching.cu:486-490); static XLA shapes get the same effect
        from two re-specializations, each compiled once per size:

        * GROW num_rays by powers of two (capped) while the live-sample
          count uses under half the base point budget — more rays/step at
          constant field-evaluation cost;
        * SHRINK the compacted point budget toward the measured live
          count (1.3x headroom, power-of-two fractions of the base, with
          hysteresis) — once the occupancy grid prunes, the encode/MLP
          batch stops carrying dummy slots. Demand spikes re-grow it; the
          stride decimation inside render_occupancy stays the safety net
          in between.
        """
        cfg = self.cfg
        # the EMA tracks the RAW demand, not the budget-clamped evaluated
        # count: a saturated buffer pins the clamped count at exactly the
        # budget, which hides the falling-occupancy trend from the growth
        # trigger and from adaptation_quiescent() (the round-5 sparse
        # bench timed a pre-growth window because of exactly this)
        pts = float(jax.device_get(
            metrics.get("num_points_raw", metrics["num_points"])))
        self._pts_ema = (pts if self._pts_ema is None
                         else 0.7 * self._pts_ema + 0.3 * pts)
        base_budget = self.base_point_budget()

        cap = cfg.train.max_num_rays or 4 * cfg.train.num_rays
        num_rays = self.num_rays
        if (num_rays * 2 <= cap
                and self._pts_ema * 2.0 <= 0.9 * base_budget):
            num_rays *= 2
            self._pts_ema *= 2.0     # same scene, twice the rays

        # smallest power-of-two fraction of the base budget (>= 1/8) that
        # still holds 1.3x the measured live count
        budget = base_budget
        while (budget // 2 >= base_budget // 8
               and 1.3 * self._pts_ema <= budget // 2):
            budget //= 2
        # hysteresis: re-grow promptly when demand saturates the buffer
        if 1.1 * self._pts_ema > budget:
            budget = min(budget * 2, base_budget)

        budget_key = None if budget == base_budget else budget
        key = (num_rays, budget_key)
        if key == (self.num_rays, self._point_budget):
            return
        self.num_rays, self._point_budget = key
        # mesh-aware respecialization included (the reference has no
        # modal restriction either, train_utils.py:563-564); the
        # global budget divides across devices inside _make_step
        self._train_step = self._get_step(1)
        self.logger.log(
            f"[train] adaptive batch -> num_rays {num_rays}, point "
            f"budget {budget} (live pts/step ~{self._pts_ema:.0f})")

    def _refresh_coarse_cache(self):
        """Recompute the probe coarse-occupancy volume from the CURRENT
        bitfield and ship it with the scene arrays (valid for the whole
        refresh interval — the step functions read batch["coarse_lin"])."""
        if self._coarse_fn is None:
            return
        cl = self._coarse_fn(self.state.density_bitfield)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            cl = jax.device_put(cl, NamedSharding(self.mesh, P()))
        self.scene_arrays["coarse_lin"] = cl

    def adaptation_quiescent(self, margin: float = 1.1) -> bool:
        """True when no adaptive-batch respecialization is plausibly
        pending. All three _adapt_batch triggers key off the live-sample
        EMA, which keeps FALLING as the occupancy grid prunes, so a
        benchmark cannot just wait for N unchanged intervals — it must
        also check that none of the criteria is within ``margin`` of
        firing at the current EMA:

        * ray growth: pts_ema * 2 <= 0.9 * base_budget (below cap);
        * budget shrink: 1.3 * pts_ema <= budget // 2 (above base // 8);
        * budget regrow: 1.1 * pts_ema > budget (hysteresis).
        """
        cfg = self.cfg
        if not (cfg.train.adaptive_num_rays and cfg.render.occupancy
                and cfg.render.compact_ratio > 0):
            return True
        if self._pts_ema is None:
            return False
        base_budget = self.base_point_budget()
        budget = self._point_budget or base_budget
        cap = cfg.train.max_num_rays or 4 * cfg.train.num_rays
        growth_pending = (
            self.num_rays * 2 <= cap
            and self._pts_ema * 2.0 <= margin * 0.9 * base_budget)
        shrink_pending = (
            budget // 2 >= base_budget // 8
            and 1.3 * self._pts_ema <= margin * (budget // 2))
        regrow_pending = (
            budget < base_budget
            and 1.1 * self._pts_ema * margin > budget)
        return not (growth_pending or shrink_pending or regrow_pending)

    def train(self, iters: Optional[int] = None, log_every: int = 100):
        iters = iters or self.cfg.train.iters
        t0 = time.time()
        total_rays = 0
        interval = self.cfg.render.update_extra_interval
        occupancy = self.cfg.render.occupancy
        adaptive = (self.cfg.train.adaptive_num_rays
                    and occupancy
                    and self.cfg.render.compact_ratio > 0)
        # dispatch chain length (lax.scan inside one executable): per-
        # dispatch host latency on the tunnel backend is ~17 ms — chain
        # up to a grid-refresh interval of steps per dispatch
        scan_n = self.cfg.train.steps_per_dispatch
        if scan_n == 0:
            scan_n = interval if occupancy else 16
        metrics = None
        i = 0
        while i < iters:
            # host-side step counter: no device sync in the hot loop (the
            # reference forces one per step, raymarching.py:303)
            if occupancy and self.host_step % interval == 0:
                self.state = self._grid_update(self.state,
                                               self.host_grid_updates)
                self.host_grid_updates += 1
                self._refresh_coarse_cache()
                # adapt from the PREVIOUS interval's stashed metrics: that
                # value finished long ago, so the device_get returns
                # without draining the deeply-pipelined async dispatch
                # queue (a synchronous fetch of the just-issued step cost
                # ~100 ms/step of lost overlap on the remote backend).
                # Only after the first full-sweep phase (grid dense
                # before that); one-interval staleness is absorbed by the
                # EMA.
                if adaptive and self.host_grid_updates > 16:
                    stash = getattr(self, "_adapt_stash", None)
                    if stash is not None:
                        self._adapt_batch(stash)
                    self._adapt_stash = metrics
            # steps until the next grid-refresh boundary / end of run;
            # full chunks ride the scan executable, remainders go step
            # by step (no per-length executable zoo)
            n = min(scan_n, iters - i)
            if occupancy:
                n = min(n, interval - self.host_step % interval)
            step_fn = (self._get_step(n) if n == scan_n
                       else self._get_step(1))
            if n == scan_n or n == 1:
                self.state, metrics = step_fn(
                    self.state, self.scene_arrays, self.aabb)
            else:
                for _ in range(n):
                    self.state, metrics = step_fn(
                        self.state, self.scene_arrays, self.aabb)
            prev_i, i = i, i + n
            self.host_step += n
            total_rays += n * self.num_rays
            self.throughput.update(n * self.num_rays)
            if prev_i == 0 or (prev_i // log_every) != (i // log_every):
                loss = float(metrics["loss"])
                self.stats["loss"].append(loss)
                self.logger.log(
                    f"[train] step {self.host_step:6d} "
                    f"loss {loss:.6f} "
                    f"({i / (time.time() - t0):.1f} it/s)")
                self.logger.scalar("train/loss", loss, self.host_step)
                self.logger.scalar("train/num_points",
                                   float(metrics["num_points"]),
                                   self.host_step)
                self.logger.scalars(self.throughput.rates(),
                                    self.host_step, prefix="throughput")
        # force completion of the async chain with a value fetch —
        # block_until_ready alone returns early on remote-tunnel backends
        self.stats["loss"].append(float(jax.device_get(metrics["loss"])))
        dt = time.time() - t0
        rays_per_sec = total_rays / dt
        print(f"[train] {iters} steps in {dt:.1f}s = "
              f"{rays_per_sec:,.0f} rays/s")
        return {"wall_time": dt, "rays_per_sec": rays_per_sec}

    # ------------------------------------------------------------------
    def render_image(self, pose, intrinsics=None, H=None, W=None,
                     use_ema: bool = True, ldir=None,
                     return_normals: bool = False):
        """Full-image chunked render -> (rgb [H, W, 3], depth [H, W]);
        with ``return_normals`` (requires cfg.render.compute_normals) a
        third [H, W, 3] normal map is returned (renderer.py:618-670).

        Renders with the EMA parameters by default, matching the
        reference's eval/test flow (train_utils.py:399-402 keeps a
        torch_ema copy that ``evaluate_one_epoch``/``test`` swap in);
        the EMA also damps the late-step Adam loss spikes of the sparse
        hash table, so point-in-time PSNR probes measure the model, not
        the oscillation phase. ``use_ema=False`` reads raw params."""
        scene = self.train_scene
        intrinsics = jnp.asarray(
            intrinsics if intrinsics is not None else scene.intrinsics)
        H = H or scene.H
        W = W or scene.W
        from raw_ngp_tpu.ops.rays import full_image_rays
        rays_o, rays_d = full_image_rays(jnp.asarray(pose), intrinsics, H, W)
        N = H * W
        chunk = min(self._eval_chunk, N)
        params = self.state.ema_params if use_ema else self.state.params
        grid = self.state.density_bitfield
        has_normals = (self.cfg.render.compute_normals
                       and self.cfg.render.occupancy)
        imgs, depths, norms = [], [], []
        ld = None
        for s in range(0, N, chunk):
            e = min(s + chunk, N)
            ro, rd = rays_o[s:e], rays_d[s:e]
            if e - s < chunk:    # pad to static shape
                pad = chunk - (e - s)
                ro = jnp.pad(ro, ((0, pad), (0, 0)))
                rd = jnp.pad(rd, ((0, pad), (0, 0)), constant_values=1.0)
            if ldir is not None:
                ld = jnp.broadcast_to(jnp.asarray(ldir), ro.shape)
            annealing = min(self.host_step / max(self.cfg.train.iters, 1),
                            1.0)
            out = self._eval_render(params, grid, ro, rd,
                                    self.aabb, annealing, ld)
            imgs.append(np.asarray(out[0][: e - s]))
            depths.append(np.asarray(out[1][: e - s]))
            if has_normals:
                norms.append(np.asarray(out[3][: e - s]))
        rgb = np.concatenate(imgs).reshape(H, W, 3)
        d = np.concatenate(depths).reshape(H, W)
        if return_normals:
            nm = (np.concatenate(norms).reshape(H, W, 3)
                  if has_normals else None)
            return rgb, d, nm
        return rgb, d

    def estimate_exposure_levels(self, scene: SceneData) -> Dict:
        """Per-eval HDR exposure-level estimation (train_utils.py:1008-1017):
        render the exposure==1.0 view and take percentiles of the raw
        prediction; the levels give every eval/test output a CONSISTENT
        LDR exposure instead of per-image scaling."""
        if scene.exposures is None:
            return self.exposure_levels
        ones = np.where(np.asarray(scene.exposures).reshape(-1) == 1.0)[0]
        if len(ones) == 0:
            return self.exposure_levels
        i = int(ones[0])
        rgb, _ = self.render_image(
            scene.poses[i], scene.intrinsics, scene.H, scene.W,
            ldir=scene.ldirs[i] if scene.ldirs is not None else None)
        self.exposure_levels = {
            p: float(np.percentile(rgb, p))
            for p in self.cfg.exposure_percentiles}
        if scene.meta is not None:
            scene.meta.exposure_levels = dict(self.exposure_levels)
        self.logger.log("[eval] exposure levels for consistent LDR "
                        f"output: {self.exposure_levels}")
        return self.exposure_levels

    def log_histograms(self):
        """Tensorboard histograms at eval cadence: per-parameter gradients
        of the grid/view MLPs and hash grid (train_utils.py:919-930) plus
        the density grid and mean density (train_utils.py:1155-1164).

        Gradients are recomputed once with a dedicated jitted grad over a
        fresh ray batch — the steady-state step never pays for returning
        its gradient pytree."""
        if self.logger.writer is None:
            return
        if not hasattr(self, "_grad_hist_fn"):
            loss_fn = make_loss_fn(self.cfg, self.spec, self.num_rays)

            def grads(state, scene, aabb):
                k_batch, k_loss = jax.random.split(state.key)
                annealing = jnp.clip(state.step / self.cfg.train.iters,
                                     0.0, 1.0)
                return jax.grad(loss_fn, has_aux=True)(
                    state.params, state.pose_params, state, scene, aabb,
                    k_batch, k_loss, annealing, True)[0]

            self._grad_hist_fn = jax.jit(grads)
        g = jax.device_get(self._grad_hist_fn(self.state,
                                              self.scene_arrays, self.aabb))
        step = self.host_step
        for top in ("grid", "grid_mlp", "view_mlp"):
            if top not in g:
                continue
            leaves = jax.tree_util.tree_leaves_with_path(g[top])
            for path, leaf in leaves:
                name = "".join(str(p.key) if hasattr(p, "key")
                               else f"[{p.idx}]" if hasattr(p, "idx")
                               else str(p) for p in path) or "w"
                self.logger.histogram(f"grad/{top}/{name}",
                                      np.asarray(leaf, np.float32), step)
        if self.state.density_grid is not None:
            dg = np.asarray(jax.device_get(self.state.density_grid))
            self.logger.histogram("train/density_grid", dg, step)
            self.logger.scalar(
                "train/mean_density",
                float(jax.device_get(self.state.mean_density)), step)

    def log_optimized_poses(self):
        """--log_poses: dump the current optimized poses to
        workspace/poses/ for later animation and log Procrustes-aligned
        errors (reference main.py:112, train_utils.py:737-738 allocates
        the trace; the analysis loop lives in barf/camera_optimizers.py)."""
        if self.state.pose_params is None:
            return None
        from raw_ngp_tpu.train.pose_analysis import (
            analyze_pose_optimization,
            refined_poses,
        )
        poses = refined_poses(self)
        pose_dir = os.path.join(self.workspace, "poses")
        os.makedirs(pose_dir, exist_ok=True)
        np.save(os.path.join(pose_dir,
                             f"poses_step{self.host_step:06d}.npy"),
                poses[:, :3, :4])
        errs = analyze_pose_optimization(self)
        for k, v in errs.items():
            self.logger.scalar(f"pose/{k}", v, self.host_step)
        self.logger.log(
            f"[pose] step {self.host_step}: "
            f"rot {errs['rotation_deg']:.4f} deg, "
            f"trans {errs['translation']:.5f}")
        return errs

    def evaluate(self, scene: Optional[SceneData] = None,
                 use_ema: bool = True, save_artifacts: bool = False,
                 metrics: Optional[list] = None,
                 export_npy: bool = False) -> Dict[str, float]:
        """Metrics over a validation split with optional PNG artifact dumps
        and raw .npy exports for the offline evaluator
        (train_utils.py:977-1139)."""
        from raw_ngp_tpu.train.metrics import PSNRMeter

        scene = scene or self.val_scene
        assert scene is not None
        if self.cfg.data.image_mode == "HDR":
            self.estimate_exposure_levels(scene)
        meters = metrics if metrics is not None else [PSNRMeter()]
        val_dir = os.path.join(self.workspace, "validation")
        eval_dir = os.path.join(self.workspace, "eval")
        if save_artifacts:
            os.makedirs(val_dir, exist_ok=True)
        if export_npy:
            os.makedirs(eval_dir, exist_ok=True)

        hdr = self.cfg.data.image_mode == "HDR"
        cam2rgb = None
        if hdr and scene.meta is not None and len(scene.meta.cam2rgb) > 0:
            cam2rgb = np.asarray(scene.meta.cam2rgb[0])
        want_normals = (self.cfg.render.compute_normals
                        and self.cfg.render.occupancy)
        for i in range(scene.n_images):
            rgb, depth, normal = self.render_image(
                scene.poses[i], scene.intrinsics, scene.H, scene.W,
                use_ema=use_ema,
                ldir=scene.ldirs[i] if scene.ldirs is not None else None,
                return_normals=True)
            gt = scene.images[i][..., :3]
            rgb_m, gt_m = rgb, gt
            if hdr and scene.exposures is not None:
                rgb_m = np.minimum(1.0, rgb * scene.exposures[i])
                gt_m = np.minimum(1.0, gt)
            for m in meters:
                m.update(rgb_m, gt_m)
            if export_npy:       # offline-eval protocol (:1023-1031)
                np.save(os.path.join(eval_dir, f"pred_{i:03d}.npy"), rgb)
                np.save(os.path.join(eval_dir, f"gt_{i:03d}.npy"), gt)
            if save_artifacts:   # validation dumps (:1062-1111)
                import imageio.v2 as iio
                step = self.host_step
                rgb_a, gt_a = rgb_m, gt_m
                if hdr and cam2rgb is not None and self.exposure_levels:
                    # consistent-exposure LDR dumps
                    # (train_utils.py:1075-1096): predictions and truth
                    # are postprocessed with the SAME exposure level
                    from raw_ngp_tpu.postprocess.raw import postprocess_raw
                    level = self.exposure_levels.get(
                        self.cfg.data.exposure_percentile)
                    rgb_a = postprocess_raw(rgb, cam2rgb, level)
                    gt_a = postprocess_raw(gt, cam2rgb, level)
                iio.imwrite(
                    os.path.join(val_dir, f"rgb_{step}_{i:03d}.png"),
                    (np.clip(rgb_a, 0, 1) * 255).astype(np.uint8))
                d = depth / (depth.max() + 1e-8)
                iio.imwrite(
                    os.path.join(val_dir, f"depth_{step}_{i:03d}.png"),
                    (np.clip(d, 0, 1) * 255).astype(np.uint8))
                err = np.abs(np.clip(rgb_a, 0, 1)
                             - np.clip(gt_a, 0, 1)).mean(-1)
                iio.imwrite(
                    os.path.join(val_dir, f"error_{step}_{i:03d}.png"),
                    (np.clip(err, 0, 1) * 255).astype(np.uint8))
                if want_normals and normal is not None:
                    iio.imwrite(
                        os.path.join(val_dir,
                                     f"normal_{step}_{i:03d}.png"),
                        (np.clip(normal, 0, 1) * 255).astype(np.uint8))

        result = {m.name.lower(): m.measure() for m in meters}
        if "psnr" in result:
            self.stats["psnr"].append(result["psnr"])
        return result

    # ------------------------------------------------------------------
    # checkpointing (train_utils.py:1141-1299)
    def save_checkpoint(self, name: Optional[str] = None,
                        best: bool = False):
        from raw_ngp_tpu.train.checkpoint import save_checkpoint
        ckpt_dir = os.path.join(self.workspace, "checkpoints")
        if best:
            # best checkpoint carries EMA weights (train_utils.py:1192-1215)
            state = self.state.replace(params=self.state.ema_params)
            return save_checkpoint(state, ckpt_dir, "ngp_best",
                                   stats={"psnr": self.stats["psnr"][-1:]},
                                   max_keep=self.cfg.train.max_keep_ckpt)
        name = name or f"ngp_step{self.host_step:06d}"
        return save_checkpoint(self.state, ckpt_dir, name,
                               stats={"loss": self.stats["loss"][-1:]},
                               max_keep=self.cfg.train.max_keep_ckpt)

    def load_checkpoint(self, mode: Optional[str] = None) -> bool:
        from raw_ngp_tpu.train.checkpoint import (
            load_checkpoint,
            resolve_checkpoint,
        )
        mode = mode or self.cfg.ckpt
        path = resolve_checkpoint(os.path.join(self.workspace,
                                               "checkpoints"), mode)
        if path is None:
            return False
        self.state, meta = load_checkpoint(self.state, path)
        self._place_state()
        self.host_step = int(meta.get("step", int(self.state.step)))
        interval = self.cfg.render.update_extra_interval
        self.host_grid_updates = self.host_step // max(interval, 1)
        # the restored bitfield invalidates the cached coarse volume
        if self.cfg.render.occupancy:
            self._refresh_coarse_cache()
        print(f"[ckpt] restored {path} at step {self.host_step} "
              f"({meta.get('n_loaded', '?')} arrays)")
        return True

    # ------------------------------------------------------------------
    # training with eval/save cadence (train_utils.py:724-766 semantics)
    def fit(self, iters: Optional[int] = None):
        """Train with the reference's periodic eval + checkpoint schedule
        (save ~save_cnt times, eval ~eval_cnt times per run)."""
        iters = iters or self.cfg.train.iters
        save_every = max(1, iters // max(1, self.cfg.train.save_cnt))
        eval_every = max(1, iters // max(1, self.cfg.train.eval_cnt))
        best_psnr = -1.0
        done = 0
        while done < iters:
            chunk = min(min(save_every, eval_every), iters - done)
            self.train(iters=chunk, log_every=max(chunk, 1))
            done += chunk
            if done % save_every < chunk:
                self.save_checkpoint()
            if self.cfg.pose_opt.log_poses:
                self.log_optimized_poses()
            if done % eval_every < chunk and self.val_scene is not None:
                self.log_histograms()
                r = self.evaluate()
                print(f"[eval] step {self.host_step}: "
                      + " ".join(f"{k}={v:.4f}" for k, v in r.items()))
                if r.get("psnr", -1) > best_psnr:
                    best_psnr = r["psnr"]
                    self.save_checkpoint(best=True)
        return {"best_psnr": best_psnr}

    # ------------------------------------------------------------------
    # test-trajectory video export (train_utils.py:774-861)
    def test(self, scene: SceneData, save_dir: Optional[str] = None,
             write_video: bool = True, fps: int = 25):
        import imageio.v2 as iio

        save_dir = save_dir or os.path.join(self.workspace, "results")
        os.makedirs(save_dir, exist_ok=True)
        frames_rgb, frames_depth = [], []
        frames_normal, frames_hdr = [], []
        cam2rgb = None
        meta = scene.meta if scene.meta else None
        hdr = self.cfg.data.image_mode == "HDR"
        if hdr and meta and len(meta.cam2rgb) > 0:
            cam2rgb = np.asarray(meta.cam2rgb[0])
        if hdr and not self.exposure_levels:
            # consistent-LDR exposure levels (train_utils.py:1008-1017);
            # normally populated by the eval loop, re-estimated here when
            # test runs standalone
            self.estimate_exposure_levels(scene)
        want_normals = (self.cfg.render.compute_normals
                        and self.cfg.render.occupancy)

        for i in range(scene.n_images):
            rgb, depth, normal = self.render_image(
                scene.poses[i], scene.intrinsics, scene.H, scene.W,
                ldir=scene.ldirs[i] if scene.ldirs is not None else None,
                return_normals=True)
            if hdr and cam2rgb is not None:
                from raw_ngp_tpu.postprocess.raw import (
                    postprocess_raw,
                    postprocess_raw_hdr,
                )
                if self.cfg.hdr_merge_algo != "none":
                    # HDR-merged frames feed their OWN video next to the
                    # consistently exposed LDR one (train_utils.py:851-857)
                    merged = postprocess_raw_hdr(
                        rgb, cam2rgb, self.cfg.exposure_percentiles,
                        self.cfg.hdr_merge_algo, self.cfg.data.hdr_tonemap)
                    frames_hdr.append(
                        (np.clip(merged, 0, 1) * 255).astype(np.uint8))
                level = self.exposure_levels.get(
                    self.cfg.data.exposure_percentile)
                rgb = postprocess_raw(rgb, cam2rgb, level)
            frames_rgb.append((np.clip(rgb, 0, 1) * 255).astype(np.uint8))
            d = depth / (depth.max() + 1e-8)
            frames_depth.append((np.clip(d, 0, 1) * 255).astype(np.uint8))
            if want_normals and normal is not None:
                frames_normal.append(
                    (np.clip(normal, 0, 1) * 255).astype(np.uint8))

        if write_video and len(frames_rgb) > 1:
            # pad to even dims for the codec (train_utils.py:836-848)
            def pad_even(f):
                H, W = f.shape[:2]
                return np.pad(f, [(0, H % 2), (0, W % 2)]
                              + [(0, 0)] * (f.ndim - 2))

            def write(name, frames):
                # mp4 when an ffmpeg backend exists; GIF otherwise (this
                # image ships no ffmpeg); PNG frames as the last resort
                padded = [pad_even(f) for f in frames]
                try:
                    iio.mimwrite(os.path.join(save_dir, name + ".mp4"),
                                 padded, fps=fps, quality=8,
                                 macro_block_size=1)
                except Exception:
                    try:
                        iio.mimwrite(os.path.join(save_dir, name + ".gif"),
                                     padded, fps=min(fps, 25))
                    except Exception:
                        for i, f in enumerate(frames):
                            iio.imwrite(os.path.join(
                                save_dir, f"{name}_{i:03d}.png"), f)

            write("rgb", frames_rgb)
            write("depth", frames_depth)
            if frames_normal:    # normals video (train_utils.py:854-855)
                write("normals", frames_normal)
            if frames_hdr:       # hdr-merged video (train_utils.py:856-857)
                write("hdr", frames_hdr)
        else:
            for i, f in enumerate(frames_rgb):
                iio.imwrite(os.path.join(save_dir, f"rgb_{i:03d}.png"), f)
        return frames_rgb
