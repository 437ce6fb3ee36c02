"""March-stage micro-variants (round-3 perf experiments).

CAVEAT (CLAUDE.md): argument-fed micro-benches on the axon tunnel read
high vs in-situ bisection; use for RELATIVE comparisons only and confirm
winners via tools/tpu_profile.py step.

Variants probed:
  * occupancy bit test: u8 byte gather (current) vs u32 word gather;
  * candidate -> [N, K] compaction: three scatters (ts/mask/deltas,
    current) vs ONE ts scatter with a sentinel init (mask derived);
  * cumsum orientation sanity (T-major, the fast direction).
"""

import time

import numpy as np


def timeit(fn, *a, n=10, name=""):
    import jax
    o = fn(*a)
    jax.device_get(jax.tree_util.tree_leaves(o)[0].ravel()[0])
    t0 = time.time()
    for _ in range(n):
        o = fn(*a)
    jax.device_get(jax.tree_util.tree_leaves(o)[0].ravel()[0])
    print(f"{name:48s} {(time.time()-t0)/n*1e3:9.2f} ms", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    N, S, K = 8192, 512, 64
    CAS, H = 2, 128
    nbits = CAS * H ** 3
    bitfield = jax.random.randint(key, (nbits // 8,), 0, 256,
                                  jnp.int32).astype(jnp.uint8)
    bitfield_u32 = jax.lax.bitcast_convert_type(
        bitfield.reshape(-1, 4), jnp.uint32).reshape(-1)
    index = jax.random.randint(jax.random.fold_in(key, 1), (N, S), 0,
                               nbits, jnp.int32).astype(jnp.uint32)
    occ = jax.random.uniform(jax.random.fold_in(key, 2), (N, S)) < 0.12
    t_cand = jnp.sort(jax.random.uniform(jax.random.fold_in(key, 3),
                                         (N, S)), axis=-1)

    def occ_u8(bf, idx):
        byte = bf[(idx >> jnp.uint32(3)).astype(jnp.int32)]
        bit = (byte >> (idx & jnp.uint32(7)).astype(jnp.uint8)) \
            & jnp.uint8(1)
        return bit.astype(jnp.int32).sum()

    def occ_u32(bf32, idx):
        word = bf32[(idx >> jnp.uint32(5)).astype(jnp.int32)]
        bit = (word >> (idx & jnp.uint32(31))) & jnp.uint32(1)
        return bit.astype(jnp.int32).sum()

    timeit(jax.jit(occ_u8), bitfield, index, name="occupancy test: u8 byte gather (current)")
    timeit(jax.jit(occ_u32), bitfield_u32, index, name="occupancy test: u32 word gather")

    def compact3(occ, t_cand):
        slot = jnp.cumsum(occ.astype(jnp.int32).T, axis=0).T - 1
        keep = occ & (slot < K)
        slot = jnp.where(keep, slot, K)
        rows = jnp.broadcast_to(jnp.arange(N)[:, None], (N, S))
        ts = jnp.zeros((N, K + 1), jnp.float32).at[rows, slot].set(
            t_cand, mode="drop")[:, :K]
        mask = jnp.zeros((N, K + 1), jnp.bool_).at[rows, slot].set(
            keep, mode="drop")[:, :K]
        return ts.sum() + mask.sum()

    def compact1(occ, t_cand):
        slot = jnp.cumsum(occ.astype(jnp.int32).T, axis=0).T - 1
        keep = occ & (slot < K)
        slot = jnp.where(keep, slot, K)
        rows = jnp.broadcast_to(jnp.arange(N)[:, None], (N, S))
        # sentinel init: unwritten slots stay -1 -> mask = ts >= 0
        ts = jnp.full((N, K + 1), -1.0, jnp.float32).at[rows, slot].set(
            jnp.where(keep, t_cand, -1.0), mode="drop")[:, :K]
        mask = ts >= 0.0
        return ts.sum() + mask.sum()

    timeit(jax.jit(compact3), occ, t_cand, name="march compact: ts+mask scatters (current)")
    timeit(jax.jit(compact1), occ, t_cand, name="march compact: single ts scatter, derived mask")

    def cumsum_major(occ):
        return jnp.cumsum(occ.astype(jnp.int32).T, axis=0).T.sum()

    timeit(jax.jit(cumsum_major), occ, name="slot cumsum (T-major, current)")


if __name__ == "__main__":
    main()
