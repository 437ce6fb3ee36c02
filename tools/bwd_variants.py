"""Table-gradient backward micro-variants (round-2/3 perf experiments).

CAVEAT (CLAUDE.md): argument-fed micro-benches on the axon tunnel read
3-30x high vs in-situ bisection of the real jitted step; use these for
RELATIVE comparisons only and confirm winners in-situ via
tools/tpu_profile.py step.
"""
import time
import jax, jax.numpy as jnp
import numpy as np

def timeit(fn, *a, n=10, name=""):
    print("start:", name, flush=True)
    try:
        o = fn(*a); jax.device_get(jax.tree_util.tree_leaves(o)[0])
        t0=time.time()
        for _ in range(n): o = fn(*a)
        jax.device_get(jax.tree_util.tree_leaves(o)[0])
        print(f"{name:52s} {(time.time()-t0)/n*1000:9.2f} ms", flush=True)
    except Exception as e:
        print(f"{name:52s} FAIL {str(e)[:160]}", flush=True)

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import raw_ngp_tpu.kernels.hash_fused as hf
from raw_ngp_tpu.ops.hashgrid import HashGridSpec

spec = HashGridSpec.create(input_dim=3, num_levels=8, level_dim=4,
                           log2_hashmap_size=19, desired_resolution=2048,
                           hash_variant="additive")
P, B, C, L = 32, 262144, 4, 8
M = P * B
n = spec.n_params
# realistic sparsity: ~70% of records from dummy slots share one window
key = jax.random.PRNGKey(0)
live = jax.random.bernoulli(jax.random.PRNGKey(9), 0.35, (P, B))
base_r = jax.random.randint(jax.random.PRNGKey(1), (P, B), 0, n - 2)
base = jnp.where(live, base_r, (jnp.arange(P) * 7)[:, None])
w0 = jax.random.uniform(jax.random.PRNGKey(2), (P, B))
w1 = jax.random.uniform(jax.random.PRNGKey(3), (P, B))
g = jax.random.normal(jax.random.PRNGKey(4), (B, L * C), jnp.bfloat16)
LVL = hf._level_of_window(spec, hf._matmul_split(spec))

def records(base, w0, w1, g):
    gT = g.astype(jnp.float32).T
    chans = []
    for wsel in (w0, w1):
        for c in range(C):
            chans.append(jnp.stack(
                [wsel[w] * gT[LVL[w] * C + c] for w in range(P)]).reshape(M))
    keys = base.reshape(M)
    packed = hf._pack_bf16_pairs(chans)
    s = jax.lax.sort([keys] + packed, num_keys=1)
    return s[0], hf._unpack_bf16_pairs(s[1:], 2 * C)

dn = jax.lax.ScatterDimensionNumbers(
    update_window_dims=(), inserted_window_dims=(0,),
    scatter_dims_to_operand_dims=(0,))

def finish(totals, params_shape):
    g0, g1 = totals[:, :C], totals[:, C:]
    grad = g0 + jnp.concatenate([jnp.zeros_like(g1[:1]), g1[:-1]], axis=0)
    return grad.reshape(-1).sum()

# V0: current 3-slot per-channel (repo)
def v0(base, w0, w1, g):
    ks, vals = records(base, w0, w1, g)
    totals = hf._segment_sum_sorted_scatter(ks, vals, n)
    return finish(totals, None)

# V1: 2-slot per-channel, stride-2 1-D extraction, flat assembly
def v1(base, w0, w1, g):
    ks, vals = records(base, w0, w1, g)
    boundary = ks[1:] != ks[:-1]
    is_end = jnp.concatenate([boundary, jnp.ones((1,), jnp.bool_)])
    is_start = jnp.concatenate([jnp.ones((1,), jnp.bool_), boundary])
    dest = jnp.where(is_end, 2 * ks + 1, jnp.where(is_start, 2 * ks,
                                                   2 * ks + 1))
    out = []
    for v in vals:
        v = v.astype(jnp.float32)
        inc = jnp.cumsum(v)
        exc = inc - v
        valc = jnp.where(is_end, jnp.where(is_start, v, inc), exc)
        z = jnp.zeros((2 * n,), jnp.float32)
        s = jax.lax.scatter(z, dest[:, None], valc, dn,
                            indices_are_sorted=True, unique_indices=True)
        out.append(s[1::2] - s[0::2])
    totals = jnp.stack(out, axis=-1)
    return finish(totals, None)

# V2: c64 channel pairing -> 4 scatters (3-slot)
def v2(base, w0, w1, g):
    ks, vals = records(base, w0, w1, g)
    boundary = ks[1:] != ks[:-1]
    is_end = jnp.concatenate([boundary, jnp.ones((1,), jnp.bool_)])
    is_start = jnp.concatenate([jnp.ones((1,), jnp.bool_), boundary])
    dest = jnp.where(is_end, 3 * ks + 2, jnp.where(is_start, 3 * ks,
                                                   3 * ks + 1))
    out = [None] * 8
    for i in range(0, 8, 2):
        v = (vals[i].astype(jnp.float32)
             + 1j * vals[i + 1].astype(jnp.float32)).astype(jnp.complex64)
        inc = jnp.cumsum(v)
        exc = inc - v
        valc = jnp.where(is_end, jnp.where(is_start, v, inc), exc)
        z = jnp.zeros((3 * n,), jnp.complex64)
        s = jax.lax.scatter(z, dest[:, None], valc, dn,
                            indices_are_sorted=True, unique_indices=True)
        tri = s.reshape(n, 3)
        tot = tri[:, 2] - tri[:, 0]
        out[i] = tot.real
        out[i + 1] = tot.imag
    totals = jnp.stack(out, axis=-1)
    return finish(totals, None)

# V3: sort floor (records+sort only)
def v3(base, w0, w1, g):
    ks, vals = records(base, w0, w1, g)
    return sum(v.sum() for v in vals) + ks.sum()

timeit(jax.jit(v3), base, w0, w1, g, name="V3 records+sort floor")
timeit(jax.jit(v0), base, w0, w1, g, name="V0 3-slot x8 (current)")
timeit(jax.jit(v1), base, w0, w1, g, name="V1 2-slot x8 stride2")
timeit(jax.jit(v2), base, w0, w1, g, name="V2 c64 3-slot x4")
