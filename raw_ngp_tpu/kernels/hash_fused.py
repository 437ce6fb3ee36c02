"""Fused hash-grid encode with a sort-based backward pass.

Replaces jax.grad's default gather-transpose (an XLA scatter-add) for the
hash table. Measured on a v5e chip, XLA scatter-add costs ~42 ns per corner
regardless of sortedness flags — 1.4 s/step at the reference's 2^18-point
budget — while scalar scatter-SET with sorted unique indices runs at
~1.2 ns. This module therefore computes the table gradient as:

  1. corner gradient values  v = w * dL/dfeat           (VPU, cheap)
  2. sort (corner index, v) pairs                        (lax.sort, ~120 ms)
  3. inclusive cumsum of sorted v                        (~15 ms/channel)
  4. segment totals at segment ends via an associative
     "carry last defined value" scan (no gathers)
  5. one scalar scatter-set per channel at the sorted,
     unique segment-end keys                             (~40 ms/channel)

This mirrors what the CUDA reference gets from hardware atomics
(gridencoder.cu:334-347 atomicAdd) with deterministic, sorted accumulation
(better than the reference: float atomics are order-nondeterministic).

Gradients wrt inputs (pose refinement path, gridencoder.cu:205-248 dy_dx)
are requested with ``need_input_grads=True``; they recompute the corner
gather in the backward pass instead of saving the 33M-corner residual.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from raw_ngp_tpu.ops.hashgrid import HashGridSpec, _level_indices, _smoothstep


def _corner_indices_weights(x01, spec: HashGridSpec):
    """Shared index/weight computation for all levels.

    Returns idx [B, L*2^D] int32 (flat table indices) and w [B, L*2^D]
    float32 trilinear weights, with OOB rows' weights zeroed.
    """
    B, D = x01.shape
    L = spec.num_levels
    n_corners = 1 << D
    x01 = x01.astype(jnp.float32)

    inb = jnp.all((x01 >= 0.0) & (x01 <= 1.0), axis=-1, keepdims=True)
    x01 = jnp.where(inb, x01, 0.5)

    bits = np.array([[(c >> d) & 1 for d in range(D)]
                     for c in range(n_corners)], dtype=np.float32)
    bits_j = jnp.asarray(bits)

    all_idx, all_w = [], []
    for lv in range(L):
        res = spec.resolutions[lv]
        if spec.align_corners:
            pos = x01 * (res - 1)
            grid = jnp.minimum(jnp.floor(pos), res - 2)
        else:
            pos = jnp.clip(x01 * res - 0.5, 0.0, res - 1)
            grid = jnp.floor(pos)
        frac = pos - grid
        if spec.interpolation == "smoothstep":
            frac = _smoothstep(frac)
        grid = grid.astype(jnp.int32)
        corner = jnp.minimum(grid[:, None, :] + bits_j.astype(jnp.int32),
                             res - 1)
        idx = _level_indices(spec, lv, corner).astype(jnp.int32)
        w = jnp.prod(bits_j * frac[:, None, :]
                     + (1.0 - bits_j) * (1.0 - frac[:, None, :]), axis=-1)
        all_idx.append(idx)
        all_w.append(w)
    idx = jnp.concatenate(all_idx, axis=1)
    w = jnp.concatenate(all_w, axis=1) * inb.astype(jnp.float32)
    return idx, w


def _forward(params, idx, w, spec: HashGridSpec):
    B = idx.shape[0]
    L, C = spec.num_levels, spec.level_dim
    n_corners = idx.shape[1] // L
    vals = params[idx]                                    # [B, L*2^D, C]
    feats = (vals * w[..., None].astype(params.dtype))
    return feats.reshape(B, L, n_corners, C).sum(axis=2).reshape(B, L * C)


def _segment_sum_sorted_scatter(keys_sorted, val_channels, n_rows: int):
    """Exact segment sums of the sorted per-channel 1-D value arrays
    grouped by ``keys_sorted`` (ascending): segment_total(k) =
    inclusive_csum[end(k)] - exclusive_csum[start(k)], realized as one
    sorted-unique scatter-SET per channel (the only scatter form XLA:TPU
    executes fast, ~1 ns/slice; scatter-add is ~40 ns regardless of flags,
    and associative_scan at 33M elements blows up the TPU compiler).

    Everything stays in 1-D [M] arrays: 2-D [M, C] layouts with tiny minor
    dims waste 124/128 vector lanes on TPU and multiply the cumsum cost.

    val_channels: list of C arrays [M]. Returns [n_rows, C].
    """
    boundary = keys_sorted[1:] != keys_sorted[:-1]
    is_end = jnp.concatenate([boundary, jnp.ones((1,), jnp.bool_)])
    is_start = jnp.concatenate([jnp.ones((1,), jnp.bool_), boundary])

    # Strided destinations keep the scatter's index stream MONOTONE (the
    # prerequisite for XLA's fast sorted-unique scatter path):
    #   segment start  -> 3k     (exclusive csum)
    #   middle element -> 3k + 1 (discarded slot; duplicate writes land
    #                             here, value irrelevant)
    #   segment end    -> 3k + 2 (inclusive csum)
    # Singletons take the end branch and write inc - exc = their own value.
    dest = jnp.where(
        is_end, 3 * keys_sorted + 2,
        jnp.where(is_start, 3 * keys_sorted, 3 * keys_sorted + 1))
    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(), inserted_window_dims=(0,),
        scatter_dims_to_operand_dims=(0,))

    out = []
    for v in val_channels:
        v = v.astype(jnp.float32)
        inc = jnp.cumsum(v)
        exc = inc - v
        vals_c = jnp.where(is_end,
                           jnp.where(is_start, v, inc),
                           exc)
        z = jnp.zeros((3 * n_rows,), jnp.float32)
        s = jax.lax.scatter(z, dest[:, None], vals_c, dnums,
                            indices_are_sorted=True,
                            unique_indices=True)
        tri = s.reshape(n_rows, 3)
        out.append(tri[:, 2] - tri[:, 0])
    return jnp.stack(out, axis=-1)                                 # [n_rows, C]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def hash_encode_fused(params, x01, spec: HashGridSpec,
                      need_input_grads: bool = False):
    """Drop-in replacement for ops.hashgrid.hash_encode_01 with the
    sort-based table gradient. x01 in [0, 1]^D."""
    idx, w = _corner_indices_weights(x01, spec)
    return _forward(params, idx, w, spec)


def _fused_fwd(params, x01, spec, need_input_grads):
    idx, w = _corner_indices_weights(x01, spec)
    out = _forward(params, idx, w, spec)
    return out, (params, x01, idx, w)


def _fused_bwd(spec, need_input_grads, res, g):
    params, x01, idx, w = res
    B = idx.shape[0]
    L, C = spec.num_levels, spec.level_dim
    n_corners = idx.shape[1] // L
    M = B * L * n_corners

    # corner gradient values per channel: v_c = w * g[..., c], kept as 1-D
    # [M] arrays (2-D [M, C] layouts waste vector lanes on TPU)
    g_lc = g.reshape(B, L, 1, C).astype(jnp.float32)
    w_r = w.reshape(B, L, n_corners)

    keys = idx.reshape(M)
    # pack channel PAIRS as fp16 into uint32 sort operands: halves the
    # sorted payload. fp16 pre-accumulation matches the reference exactly
    # (its backward scatters half-precision atomics, gridencoder.cu:334-347
    # half2 atomicAdd); accumulation below stays fp32.
    chans = [(w_r * g_lc[..., c]).reshape(M) for c in range(C)]
    if C % 2 == 1:
        chans.append(jnp.zeros_like(chans[0]))
    packed_ops = []
    for c in range(0, len(chans), 2):
        u = jax.lax.bitcast_convert_type(
            chans[c].astype(jnp.float16), jnp.uint16).astype(jnp.uint32)
        w = jax.lax.bitcast_convert_type(
            chans[c + 1].astype(jnp.float16), jnp.uint16).astype(jnp.uint32)
        packed_ops.append((u << 16) | w)
    sorted_ops = jax.lax.sort([keys] + packed_ops, num_keys=1)
    keys_s = sorted_ops[0]
    val_channels = []
    for ps in sorted_ops[1:]:
        u0 = (ps >> 16).astype(jnp.uint16)
        u1 = (ps & 0xFFFF).astype(jnp.uint16)
        val_channels.append(jax.lax.bitcast_convert_type(u0, jnp.float16))
        val_channels.append(jax.lax.bitcast_convert_type(u1, jnp.float16))
    grad_table = _segment_sum_sorted_scatter(keys_s, val_channels[:C],
                                             spec.n_params)
    grad_table = grad_table.astype(params.dtype)

    if not need_input_grads:
        return grad_table, jnp.zeros_like(x01)

    # input grads (pose path): differentiate through the weights with the
    # gathered values treated as constants (exactly the reference's dy_dx
    # contraction, gridencoder.cu:352-378). Recompute the gather here
    # rather than saving a [M, C] residual.
    vals = jax.lax.stop_gradient(params)[idx]              # [B, L*2^D, C]

    def weights_path(x):
        _, w2 = _corner_indices_weights(x, spec)
        feats = (vals * w2[..., None].astype(vals.dtype))
        return feats.reshape(B, L, n_corners, C).sum(axis=2).reshape(B, L * C)

    _, vjp = jax.vjp(weights_path, x01)
    (grad_x,) = vjp(g)
    return grad_table, grad_x


hash_encode_fused.defvjp(_fused_fwd, _fused_bwd)


def hash_encode_fast(params, x, spec: HashGridSpec, bound: float = 1.0,
                     need_input_grads: bool = False):
    """World-space wrapper (mirrors ops.hashgrid.hash_encode)."""
    x01 = (x + bound) / (2.0 * bound)
    return hash_encode_fused(params, x01, spec, need_input_grads)
