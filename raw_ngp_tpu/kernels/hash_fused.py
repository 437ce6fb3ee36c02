"""Fused hash-grid encode: pair-slice gathers + a sort-based backward.

Replaces jax.grad's default gather-transpose (an XLA scatter-add) for the
hash table, and halves the gather/sort volume with an exact-semantics
observation about the reference hash (gridencoder.cu:46-58):

  The per-dim hash primes are {1, 2654435761, 805459861} — dim 0's prime
  is **1**. For any cell, the two x-corners (x0, y, z) and (x0+1, y, z)
  therefore produce table indices {u, u XOR 1} in the hashed case (one of
  x0/x0+1 is even, and even^1 == even+1), i.e. the row pair {2m, 2m+1};
  in the dense (non-overflow) case they are {u, u+1}. Either way the two
  corners live in a 2-row window, so ONE gather slice of shape [2, C]
  (= 8 floats at C=4, still a single-slice cost on XLA:TPU) fetches BOTH.
  Per (point, level) that is 4 slices instead of 8 gathers, and the
  backward sorts 4 pair-records instead of 8 corner-records.

Backward (replacing CUDA atomicAdd, gridencoder.cu:334-347):

  1. pair gradient values v0 = w0 * dL/dfeat, v1 = w1 * dL/dfeat   (VPU)
  2. sort (pair base b, packed fp16 v0/v1 channels)                (lax.sort)
  3. per-channel inclusive cumsum of sorted values
  4. segment totals at segment ends -> strided monotone scatter-SET
     (the only scatter form XLA:TPU executes fast)
  5. rows gradient = G0 + shift(G1): base b accumulates v0 into row b and
     v1 into row b+1, so the two segment-sum buffers combine with a one-row
     shift — no conflicting scatter windows even where dense-level pairs
     overlap between neighboring cells.

fp16 pre-accumulation matches the reference exactly (its backward scatters
half-precision atomics via half2 atomicAdd); accumulation stays fp32.

Gradients wrt inputs (pose refinement path, gridencoder.cu:205-248 dy_dx)
are requested with ``need_input_grads=True``; they recompute the pair
gather in the backward pass instead of saving the corner-value residual.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from raw_ngp_tpu.ops.hashgrid import HashGridSpec, _level_indices, _smoothstep


def _level_is_dense(spec: HashGridSpec, lv: int) -> bool:
    """Dense (non-overflow) level: the flat index is pure stride
    arithmetic, so the two x-corners are ALWAYS at rows {i, i+1} — the
    2-row pair window is exact for every cell. Hashed levels only pair for
    even x0 (odd^1 != odd+1), so they keep per-corner records."""
    res = spec.resolutions[lv]
    hmap = spec.offsets[lv + 1] - spec.offsets[lv]
    return res ** spec.input_dim <= hmap


def _pair_scheme_ok(spec: HashGridSpec) -> bool:
    return all(_level_is_dense(spec, lv) for lv in range(spec.num_levels))


def _frac_grid(x01, spec: HashGridSpec, lv: int):
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
    return frac, grid.astype(jnp.int32), res


def _corner_indices_weights(x01, spec: HashGridSpec):
    """Per-corner index/weight computation (oracle layout, used by the
    input-gradient recompute and the tiled-overflow fallback).

    Returns idx [B, L*2^D] int32 and w [B, L*2^D] float32 with OOB rows'
    weights zeroed.
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
        frac, grid, res = _frac_grid(x01, spec, lv)
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


def _pair_indices_weights(x01, spec: HashGridSpec):
    """Pair-slice index/weight computation.

    Returns:
      base [B, L*2^(D-1)] int32 — start row of each 2-row gather window,
        clamped to n_params-2 so every [2, C] slice is in-bounds;
      w0, w1 [B, L*2^(D-1)] float32 — interpolation weight routed to row
        ``base`` / ``base+1`` (clamped corners can land both weights on
        one row; the routing indicators absorb every case).
    """
    B, D = x01.shape
    L = spec.num_levels
    n_half = 1 << (D - 1)
    x01 = x01.astype(jnp.float32)

    inb = jnp.all((x01 >= 0.0) & (x01 <= 1.0), axis=-1, keepdims=True)
    x01 = jnp.where(inb, x01, 0.5)
    inb_f = inb.astype(jnp.float32)

    # bit patterns over dims 1..D-1 for the 2^(D-1) pair groups
    hbits = np.array([[(c >> (d - 1)) & 1 for d in range(1, D)]
                      for c in range(n_half)], dtype=np.float32)
    hb = jnp.asarray(hbits)                                  # [2^(D-1), D-1]
    hb_i = hb.astype(jnp.int32)
    top = spec.n_params - 2

    bases, w0s, w1s = [], [], []
    for lv in range(L):
        frac, grid, res = _frac_grid(x01, spec, lv)
        # rest-dims corner coords [B, 2^(D-1), D-1] and weights [B, 2^(D-1)]
        rest = jnp.minimum(grid[:, None, 1:] + hb_i, res - 1)
        w_rest = jnp.prod(hb * frac[:, None, 1:]
                          + (1.0 - hb) * (1.0 - frac[:, None, 1:]), axis=-1)
        x_lo = jnp.broadcast_to(grid[:, None, :1], rest.shape[:-1] + (1,))
        x_hi = jnp.minimum(x_lo + 1, res - 1)
        cu = jnp.concatenate([x_lo, rest], axis=-1)
        cv = jnp.concatenate([x_hi, rest], axis=-1)
        u = _level_indices(spec, lv, cu).astype(jnp.int32)   # [B, 2^(D-1)]
        v = _level_indices(spec, lv, cv).astype(jnp.int32)
        w_u = (1.0 - frac[:, None, 0]) * w_rest
        w_v = frac[:, None, 0] * w_rest

        b = jnp.minimum(jnp.minimum(u, v), top)
        # route each corner weight to its slice position (0 or 1)
        w0 = w_u * (u == b) + w_v * (v == b)
        w1 = w_u * (u == b + 1) + w_v * (v == b + 1)
        bases.append(b)
        w0s.append(w0)
        w1s.append(w1)

    base = jnp.concatenate(bases, axis=1)
    w0 = jnp.concatenate(w0s, axis=1) * inb_f
    w1 = jnp.concatenate(w1s, axis=1) * inb_f
    return base, w0, w1


def _pair_gather(params, base):
    """[B, P] bases -> [B, P, 2, C] table slices (one slice per pair)."""
    B, P = base.shape
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,))
    flat = jax.lax.gather(
        params, base.reshape(-1, 1), dn, (2, params.shape[1]),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)   # bases clamped
    return flat.reshape(B, P, 2, params.shape[1])


def _pair_forward(params, base, w0, w1, spec: HashGridSpec):
    B = base.shape[0]
    L, C = spec.num_levels, spec.level_dim
    n_half = base.shape[1] // L
    vals = _pair_gather(params, base)                       # [B, P, 2, C]
    dt = params.dtype
    feats = (vals[:, :, 0, :] * w0[..., None].astype(dt)
             + vals[:, :, 1, :] * w1[..., None].astype(dt))
    return feats.reshape(B, L, n_half, C).sum(axis=2).reshape(B, L * C)


def _corner_forward(params, idx, w, spec: HashGridSpec):
    B = idx.shape[0]
    L, C = spec.num_levels, spec.level_dim
    n_corners = idx.shape[1] // L
    vals = params[idx]                                      # [B, L*2^D, C]
    feats = (vals * w[..., None].astype(params.dtype))
    return feats.reshape(B, L, n_corners, C).sum(axis=2).reshape(B, L * C)


def _pack_f16_pairs(chans):
    """List of [M] f32 arrays -> list of [M] u32 sort payloads, two fp16
    values per word (halves the sorted payload)."""
    if len(chans) % 2 == 1:
        chans = chans + [jnp.zeros_like(chans[0])]
    packed = []
    for c in range(0, len(chans), 2):
        hi = jax.lax.bitcast_convert_type(
            chans[c].astype(jnp.float16), jnp.uint16).astype(jnp.uint32)
        lo = jax.lax.bitcast_convert_type(
            chans[c + 1].astype(jnp.float16), jnp.uint16).astype(jnp.uint32)
        packed.append((hi << 16) | lo)
    return packed


def _unpack_f16_pairs(packed, n):
    chans = []
    for ps in packed:
        hi = (ps >> 16).astype(jnp.uint16)
        lo = (ps & 0xFFFF).astype(jnp.uint16)
        chans.append(jax.lax.bitcast_convert_type(hi, jnp.float16))
        chans.append(jax.lax.bitcast_convert_type(lo, jnp.float16))
    return chans[:n]


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
    """Drop-in replacement for ops.hashgrid.hash_encode_01 with pair-slice
    gathers and the sort-based table gradient. x01 in [0, 1]^D."""
    if _pair_scheme_ok(spec):
        base, w0, w1 = _pair_indices_weights(x01, spec)
        return _pair_forward(params, base, w0, w1, spec)
    idx, w = _corner_indices_weights(x01, spec)
    return _corner_forward(params, idx, w, spec)


def _fused_fwd(params, x01, spec, need_input_grads):
    if _pair_scheme_ok(spec):
        base, w0, w1 = _pair_indices_weights(x01, spec)
        out = _pair_forward(params, base, w0, w1, spec)
        return out, (params, x01, base, w0, w1)
    idx, w = _corner_indices_weights(x01, spec)
    out = _corner_forward(params, idx, w, spec)
    return out, (params, x01, idx, w)


def _pair_bwd_table(spec, res, g):
    """Table gradient through the pair scheme: sort pair records, segment-
    sum 2C channels, combine G0 + shift(G1)."""
    params, x01, base, w0, w1 = res
    B = base.shape[0]
    L, C = spec.num_levels, spec.level_dim
    n_half = base.shape[1] // L
    M = B * L * n_half

    g_lc = g.reshape(B, L, 1, C).astype(jnp.float32)        # [B, L, 1, C]
    w0r = w0.reshape(B, L, n_half)
    w1r = w1.reshape(B, L, n_half)

    keys = base.reshape(M)
    chans = ([(w0r * g_lc[..., c]).reshape(M) for c in range(C)]
             + [(w1r * g_lc[..., c]).reshape(M) for c in range(C)])
    packed = _pack_f16_pairs(chans)
    sorted_ops = jax.lax.sort([keys] + packed, num_keys=1)
    keys_s = sorted_ops[0]
    val_channels = _unpack_f16_pairs(sorted_ops[1:], 2 * C)
    totals = _segment_sum_sorted_scatter(keys_s, val_channels,
                                         spec.n_params)      # [n, 2C]
    g0, g1 = totals[:, :C], totals[:, C:]
    # v1 recorded at base b belongs to row b+1
    grad = g0 + jnp.concatenate([jnp.zeros_like(g1[:1]), g1[:-1]], axis=0)
    return grad.astype(params.dtype)


def _corner_bwd_table(spec, res, g):
    params, x01, idx, w = res
    B = idx.shape[0]
    L, C = spec.num_levels, spec.level_dim
    n_corners = idx.shape[1] // L
    M = B * L * n_corners

    g_lc = g.reshape(B, L, 1, C).astype(jnp.float32)
    w_r = w.reshape(B, L, n_corners)
    keys = idx.reshape(M)
    chans = [(w_r * g_lc[..., c]).reshape(M) for c in range(C)]
    packed = _pack_f16_pairs(chans)
    sorted_ops = jax.lax.sort([keys] + packed, num_keys=1)
    val_channels = _unpack_f16_pairs(sorted_ops[1:], C)
    grad = _segment_sum_sorted_scatter(sorted_ops[0], val_channels,
                                       spec.n_params)
    return grad.astype(params.dtype)


def _fused_bwd(spec, need_input_grads, res, g):
    pair = _pair_scheme_ok(spec)
    if pair:
        params, x01, base, w0, w1 = res
        grad_table = _pair_bwd_table(spec, res, g)
    else:
        params, x01, idx, w = res
        grad_table = _corner_bwd_table(spec, res, g)

    if not need_input_grads:
        return grad_table, jnp.zeros_like(x01)

    # input grads (pose path): differentiate through the weights with the
    # gathered values treated as constants (exactly the reference's dy_dx
    # contraction, gridencoder.cu:352-378). Recompute the gather here
    # rather than saving the corner-value residual.
    B = x01.shape[0]
    L, C = spec.num_levels, spec.level_dim
    frozen = jax.lax.stop_gradient(params)
    if pair:
        vals = _pair_gather(frozen, base)                    # [B, P, 2, C]
        n_half = base.shape[1] // L

        def weights_path(x):
            _, w0x, w1x = _pair_indices_weights(x, spec)
            dt = vals.dtype
            feats = (vals[:, :, 0, :] * w0x[..., None].astype(dt)
                     + vals[:, :, 1, :] * w1x[..., None].astype(dt))
            return feats.reshape(B, L, n_half, C).sum(axis=2).reshape(
                B, L * C)
    else:
        vals = frozen[idx]
        n_corners = idx.shape[1] // L

        def weights_path(x):
            _, w2 = _corner_indices_weights(x, spec)
            feats = (vals * w2[..., None].astype(vals.dtype))
            return feats.reshape(B, L, n_corners, C).sum(axis=2).reshape(
                B, L * C)

    _, vjp = jax.vjp(weights_path, x01)
    (grad_x,) = vjp(g)
    return grad_table, grad_x


hash_encode_fused.defvjp(_fused_fwd, _fused_bwd)


def hash_encode_fast(params, x, spec: HashGridSpec, bound: float = 1.0,
                     need_input_grads: bool = False):
    """World-space wrapper (mirrors ops.hashgrid.hash_encode)."""
    x01 = (x + bound) / (2.0 * bound)
    return hash_encode_fused(params, x01, spec, need_input_grads)
