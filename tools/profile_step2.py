"""Stage decomposition of the training step on the real TPU.

All timed functions reduce their outputs to scalars INSIDE jit so the
remote tunnel never transfers bulk arrays (device_get of a big output
costs ~1 s/34MB and poisons naive timings).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_step2.py
"""
import time
from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=15, warmup=2, name=""):
    print("start:", name, flush=True)
    for _ in range(warmup):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    dt = (time.time() - t0) / iters * 1000
    print(f"{name:46s} {dt:9.2f} ms", flush=True)
    return dt


def main():
    from raw_ngp_tpu.config import Config
    from raw_ngp_tpu.models import init_field, make_field_spec
    from raw_ngp_tpu.models.ngp import field_forward
    from raw_ngp_tpu.kernels.hash_fused import hash_encode_fused
    from raw_ngp_tpu.render.occupancy import march_rays, render_occupancy

    cfg = Config().with_preset_O().with_tpu_profile()
    cfg = replace(cfg, train=replace(cfg.train, fp16=True, num_rays=8192))
    cfg = cfg.validate()
    spec = make_field_spec(cfg)
    gs = spec.grid_spec

    key = jax.random.PRNGKey(0)
    params = init_field(key, spec)
    N = cfg.train.num_rays
    K = cfg.render.samples_per_ray
    S = cfg.render.march_candidates
    B = int(N * K * cfg.render.compact_ratio)
    print(f"N={N} K={K} S={S} B={B}", flush=True)

    rays_o = jax.random.uniform(jax.random.PRNGKey(1), (N, 3),
                                minval=-1.5, maxval=1.5)
    rays_d = jax.random.normal(jax.random.PRNGKey(2), (N, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    aabb = jnp.asarray([-2.0, -2, -2, 2, 2, 2], jnp.float32)
    cas = cfg.cascades
    bitfield = jax.random.randint(
        jax.random.PRNGKey(3), (cas * cfg.render.grid_size ** 3 // 8,),
        0, 256).astype(jnp.uint8)
    x01 = jax.random.uniform(jax.random.PRNGKey(4), (B, 3))
    dirs = jax.random.normal(jax.random.PRNGKey(5), (B, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    cot = jax.random.normal(jax.random.PRNGKey(6), (B, gs.output_dim))

    # encode fwd (scalarized)
    timeit(jax.jit(lambda p, x: hash_encode_fused(
        p, x, gs, False, jnp.bfloat16).astype(jnp.float32).sum()),
        params["grid"], x01, name="encode fwd")

    # encode fwd+bwd
    timeit(jax.jit(jax.grad(lambda p, x: (hash_encode_fused(
        p, x, gs, False, jnp.bfloat16).astype(jnp.float32) * cot).sum())),
        params["grid"], x01, name="encode fwd+bwd", iters=8)

    # field fwd (encode + MLPs)
    timeit(jax.jit(lambda p, x, d: field_forward(
        p, spec, x, d, None, 1.0)[0].sum()),
        params, x01, dirs, name="field fwd")

    # field fwd+bwd
    def floss(p, x, d):
        sig, rgb = field_forward(p, spec, x, d, None, 1.0)
        return sig.sum() + (rgb.astype(jnp.float32) ** 2).sum()
    timeit(jax.jit(jax.grad(floss)), params, x01, dirs,
           name="field fwd+bwd", iters=8)

    # march only
    from raw_ngp_tpu.ops.rays import near_far_from_aabb
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb,
                                     cfg.render.min_near)
    timeit(jax.jit(lambda ro, rd, bf: march_rays(
        ro, rd, bf, nears, fars, cfg.render.bound, cfg.render.contract,
        cfg.render.grid_size, cas, S, K,
        dt_gamma=cfg.render.dt_gamma)["mask"].sum()),
        rays_o, rays_d, bitfield, name="march only")

    # render fwd
    timeit(jax.jit(lambda p, ro, rd, bf: render_occupancy(
        p, spec, ro, rd, aabb, bf, training=True)["image"].sum()),
        params, rays_o, rays_d, bitfield, name="render fwd")

    # render fwd+bwd
    def rloss(p, ro, rd, bf):
        out = render_occupancy(p, spec, ro, rd, aabb, bf, training=True)
        return (out["image"] ** 2).sum()
    timeit(jax.jit(jax.grad(rloss)), params, rays_o, rays_d, bitfield,
           name="render fwd+bwd", iters=8)


if __name__ == "__main__":
    main()
