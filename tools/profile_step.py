"""Stage-by-stage timing of one training step on the real TPU.

Times each jitted stage of the flagship bench config in isolation so perf
work targets the real bottleneck (axon backend: all timings force a
device_get, block_until_ready returns early over the tunnel).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_step.py
"""

import time
from dataclasses import replace
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20, warmup=3, name=""):
    for _ in range(warmup):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    # force the async chain
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    dt = (time.time() - t0) / iters * 1000
    print(f"{name:44s} {dt:9.2f} ms")
    return dt


def main():
    from raw_ngp_tpu.config import Config
    from raw_ngp_tpu.models import init_field, make_field_spec
    from raw_ngp_tpu.models.ngp import field_forward, field_density
    from raw_ngp_tpu.kernels.hash_fused import hash_encode_fused
    from raw_ngp_tpu.render.occupancy import march_rays, render_occupancy
    from raw_ngp_tpu.ops.rays import near_far_from_aabb

    cfg = Config().with_preset_O().with_tpu_profile()
    cfg = replace(cfg, train=replace(cfg.train, fp16=True, num_rays=8192))
    cfg = cfg.validate()
    spec = make_field_spec(cfg)
    gs = spec.grid_spec
    print("levels:", gs.num_levels, "C:", gs.level_dim,
          "res:", gs.resolutions, "n_params:", gs.n_params)
    from raw_ngp_tpu.kernels.hash_fused import _level_pairable
    print("pairable levels:",
          [lv for lv in range(gs.num_levels) if _level_pairable(gs, lv)])

    key = jax.random.PRNGKey(0)
    params = init_field(key, spec)

    N = cfg.train.num_rays
    K = cfg.render.samples_per_ray
    S = cfg.render.march_candidates
    B = int(N * K * cfg.render.compact_ratio)  # field-eval budget
    print(f"N={N} K={K} S={S} B={B}")

    rays_o = jax.random.uniform(jax.random.PRNGKey(1), (N, 3),
                                minval=-1.5, maxval=1.5)
    rays_d = jax.random.normal(jax.random.PRNGKey(2), (N, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    aabb = jnp.asarray([-2.0, -2, -2, 2, 2, 2], jnp.float32)
    cas = cfg.cascades
    # half-occupied bitfield: realistic-ish occupancy
    bf_key = jax.random.PRNGKey(3)
    bitfield = jax.random.randint(
        bf_key, (cas * cfg.render.grid_size ** 3 // 8,), 0, 256
    ).astype(jnp.uint8)

    x01 = jax.random.uniform(jax.random.PRNGKey(4), (B, 3))
    dirs = jax.random.normal(jax.random.PRNGKey(5), (B, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    g = jax.random.normal(jax.random.PRNGKey(6),
                          (B, gs.output_dim)).astype(jnp.float32)

    # ---- encode fwd ----
    enc = jax.jit(lambda p, x: hash_encode_fused(p, x, gs, False))
    timeit(enc, params["grid"], x01, name=f"hash encode fwd [{B}]")

    # ---- encode fwd+bwd ----
    def enc_loss(p, x):
        return (hash_encode_fused(p, x, gs, False) * g).sum()
    enc_grad = jax.jit(jax.grad(enc_loss))
    timeit(enc_grad, params["grid"], x01, name="hash encode fwd+bwd")

    # ---- field fwd (encode + MLPs + SH) ----
    ffwd = jax.jit(lambda p, x, d: field_forward(p, spec, x, d))
    timeit(ffwd, params, x01 * 2 - 1, dirs, name="field fwd (enc+MLP+SH)")

    # ---- field fwd+bwd ----
    def field_loss(p, x, d):
        s, c = field_forward(p, spec, x, d)
        return s.sum() + c.sum()
    fgrad = jax.jit(jax.grad(field_loss))
    timeit(fgrad, params, x01 * 2 - 1, dirs, name="field fwd+bwd")

    # ---- march only ----
    def march(ro, rd, bf):
        nears, fars = near_far_from_aabb(ro, rd, aabb, cfg.render.min_near)
        m = march_rays(ro, rd, bf, nears, fars, cfg.render.bound,
                       cfg.render.contract, cfg.render.grid_size, cas, S, K,
                       key=None, dt_gamma=cfg.render.dt_gamma)
        return m["ts"]
    timeit(jax.jit(march), rays_o, rays_d, bitfield,
           name=f"march ({N}x{S} candidates)")

    # ---- full render fwd ----
    rend = jax.jit(lambda p, ro, rd, bf: render_occupancy(
        p, spec, ro, rd, aabb, bf, training=False)["image"])
    timeit(rend, params, rays_o, rays_d, bitfield, name="render fwd (full)")

    # ---- full render fwd+bwd ----
    def rloss(p, ro, rd, bf):
        out = render_occupancy(p, spec, ro, rd, aabb, bf, training=True)
        return (out["image"] ** 2).sum()
    timeit(jax.jit(jax.grad(rloss)), params, rays_o, rays_d, bitfield,
           name="render fwd+bwd (full)")

    # ---- grid refresh ----
    from raw_ngp_tpu.ops.grid import make_grid_update
    from raw_ngp_tpu.train.trainer import init_train_state
    state = jax.jit(init_train_state, static_argnums=(1, 2, 3))(
        key, cfg, spec, 4)
    upd = make_grid_update(cfg, spec)
    t0 = time.time()
    st2 = upd(state, 0)
    jax.device_get(st2.mean_density)
    print(f"{'grid refresh FULL (compile+run)':44s} "
          f"{(time.time() - t0) * 1000:9.2f} ms")
    timeit(lambda s: upd(s, 0).mean_density, state, iters=3, warmup=1,
           name="grid refresh FULL")
    timeit(lambda s: upd(s, 20).mean_density, state, iters=3, warmup=1,
           name="grid refresh PARTIAL")

    # ---- full train step ----
    from raw_ngp_tpu.data import make_synthetic_scene
    from raw_ngp_tpu.train import Trainer
    tr = Trainer(cfg, *make_synthetic_scene(n_train=8, n_val=1, H=128,
                                            W=128),
                 workspace="/tmp/prof_ws")
    tr.train(iters=20, log_every=1000)  # warmup
    t0 = time.time()
    tr.train(iters=50, log_every=1000)
    jax.device_get(tr.state.mean_density)
    dt = (time.time() - t0) / 50 * 1000
    print(f"{'FULL TRAIN STEP (amortized)':44s} {dt:9.2f} ms")
    print(f"  -> {cfg.train.num_rays / dt * 1000:,.0f} rays/s")


if __name__ == "__main__":
    main()
