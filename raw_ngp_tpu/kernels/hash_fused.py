"""Fused hash-grid encode: 2-row-window gathers + a sort-based backward.

Replaces jax.grad's default gather-transpose (an XLA scatter-add) for the
hash table, and halves the gather/sort volume with an exact-semantics
observation about the table index (gridencoder.cu:46-79):

  * dense (non-overflow) levels use pure stride arithmetic with dim-0
    stride 1, so the two x-corners (x0, y, z) and (x0+1, y, z) are ALWAYS
    at adjacent rows {u, u+1};
  * hashed levels with the "additive" TPU hash variant
    (ops/hashgrid.HashGridSpec.hash_variant) index as
    ``row = x + (mix(y,z) % (hmap - res))`` — adjacent by construction;
  * hashed levels with the reference "xor" hash only pair for even x0
    (prime_0 == 1 so even^1 == even+1), so they fall back to one window
    PER CORNER with the second row's weight pinned to zero — a [2, C]
    slice of <= 8 floats costs the same single-slice gather as [1, C] on
    XLA:TPU, so the unified window path loses nothing.

Either way ONE gather slice of shape [2, C] fetches both rows, so a level
costs 2^(D-1) slices when pairable and 2^D otherwise, and the backward
sorts one record per window instead of one per corner.

Backward (replacing CUDA atomicAdd, gridencoder.cu:334-347):

  1. window gradient values v0 = w0 * dL/dfeat, v1 = w1 * dL/dfeat   (VPU)
  2. sort (window base b, packed fp16 v0/v1 channels)                (lax.sort)
  3. per-channel inclusive cumsum of sorted values
  4. segment totals at segment ends -> strided monotone scatter-SET
     (the only scatter form XLA:TPU executes fast)
  5. rows gradient = G0 + shift(G1): base b accumulates v0 into row b and
     v1 into row b+1, so the two segment-sum buffers combine with a one-row
     shift — no conflicting scatter windows even where windows overlap
     between neighboring cells.

fp16 pre-accumulation matches the reference exactly (its backward scatters
half-precision atomics via half2 atomicAdd); accumulation stays fp32.

Gradients wrt inputs (pose refinement path, gridencoder.cu:205-248 dy_dx)
are requested with ``need_input_grads=True``; they recompute the window
gather in the backward pass instead of saving the corner-value residual.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from raw_ngp_tpu.ops.hashgrid import HashGridSpec, _level_indices, _smoothstep


def _level_pairable(spec: HashGridSpec, lv: int) -> bool:
    """Whether the two x-corners of any cell at this level are guaranteed
    adjacent table rows (see module docstring)."""
    res = spec.resolutions[lv]
    hmap = spec.offsets[lv + 1] - spec.offsets[lv]
    if res ** spec.input_dim <= hmap:
        return True                       # dense stride arithmetic
    return (spec.gridtype == "hash" and spec.hash_variant == "additive"
            and hmap > res)


def _windows_per_level(spec: HashGridSpec) -> Tuple[int, ...]:
    D = spec.input_dim
    return tuple((1 << (D - 1)) if _level_pairable(spec, lv) else (1 << D)
                 for lv in range(spec.num_levels))


def _pairable_split(spec: HashGridSpec) -> int:
    """Number of leading pairable levels. Pairability is monotone in the
    level index (resolutions only grow), so levels split into a pairable
    PREFIX and a non-pairable SUFFIX — each group has a uniform window
    count, letting the forward reduce with ONE reshape-sum per group.
    XLA then fuses gather -> weight -> reduce without materializing the
    [B, P, 2, C] window tensor, whose tiny minor dims tile-pad 32x on TPU
    (materializing it OOMs HBM at production sizes)."""
    k = 0
    while k < spec.num_levels and _level_pairable(spec, k):
        k += 1
    assert not any(_level_pairable(spec, lv)
                   for lv in range(k, spec.num_levels)), \
        "pairable levels must form a prefix"
    return k


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


def _window_indices_weights(x01, spec: HashGridSpec):
    """Window index/weight computation for every level.

    Returns:
      base [B, P] int32 — start row of each 2-row gather window, clamped to
        n_params-2 so every [2, C] slice is in-bounds;
      w0, w1 [B, P] float32 — interpolation weight routed to row ``base`` /
        ``base+1`` (clamped corners can land both weights on one row; the
        routing indicators absorb every case, including the degenerate
        single-corner windows of non-pairable levels where one weight is 0).
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

        if _level_pairable(spec, lv):
            b = jnp.minimum(jnp.minimum(u, v), top)
            # route each corner weight to its slice position (0 or 1)
            w0 = w_u * (u == b) + w_v * (v == b)
            w1 = w_u * (u == b + 1) + w_v * (v == b + 1)
            bases.append(b)
            w0s.append(w0)
            w1s.append(w1)
        else:
            # one degenerate window per corner: [2, C] slice at the corner's
            # row with the second row's weight 0 (same gather cost; the
            # routing below also absorbs the top clamp)
            for idx, w in ((u, w_u), (v, w_v)):
                b = jnp.minimum(idx, top)
                bases.append(b)
                w0s.append(w * (idx == b))
                w1s.append(w * (idx == b + 1))

    base = jnp.concatenate(bases, axis=1)
    w0 = jnp.concatenate(w0s, axis=1) * inb_f
    w1 = jnp.concatenate(w1s, axis=1) * inb_f
    return base, w0, w1


def _window_gather(params, base):
    """[B, P] bases -> [B, P, 2, C] table slices (one slice per window)."""
    B, P = base.shape
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,))
    flat = jax.lax.gather(
        params, base.reshape(-1, 1), dn, (2, params.shape[1]),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)   # bases clamped
    return flat.reshape(B, P, 2, params.shape[1])


def _group_extents(spec: HashGridSpec):
    """((n_levels, n_windows_per_level, window_col_offset), ...) for the
    pairable prefix and non-pairable suffix groups (empty groups omitted)."""
    D = spec.input_dim
    k = _pairable_split(spec)
    L = spec.num_levels
    groups = []
    if k > 0:
        groups.append((k, 1 << (D - 1), 0))
    if k < L:
        groups.append((L - k, 1 << D, k * (1 << (D - 1))))
    return tuple(groups)


def _window_forward(params, base, w0, w1, spec: HashGridSpec):
    B = base.shape[0]
    C = spec.level_dim
    dt = params.dtype
    parts = []
    for nl, nw, ofs in _group_extents(spec):
        p = nl * nw
        # one flat gather -> mul -> reduce chain per group. Do NOT slice
        # the gather result along the window-row dim: XLA materializes the
        # sliced [B, p, 1, C] with (1, 128) tiling — a 32x padding blowup
        # that OOMs HBM at production sizes. Interleaving the two row
        # weights instead keeps the whole chain a fusable elementwise+reduce
        # over the gather output (bitcast-reshaped, never copied).
        vals = _window_gather(params, base[:, ofs:ofs + p])  # [B, p, 2, C]
        w01 = jnp.stack([w0[:, ofs:ofs + p], w1[:, ofs:ofs + p]],
                        axis=2).astype(dt)                   # [B, p, 2]
        f = vals.reshape(B, 2 * p, C) * w01.reshape(B, 2 * p)[..., None]
        parts.append(
            f.reshape(B, nl, 2 * nw, C).sum(axis=2).reshape(B, nl * C))
    return jnp.concatenate(parts, axis=1)                   # [B, L*C]


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
    """Drop-in replacement for ops.hashgrid.hash_encode_01 with 2-row-window
    gathers and the sort-based table gradient. x01 in [0, 1]^D."""
    base, w0, w1 = _window_indices_weights(x01, spec)
    return _window_forward(params, base, w0, w1, spec)


def _fused_fwd(params, x01, spec, need_input_grads):
    base, w0, w1 = _window_indices_weights(x01, spec)
    out = _window_forward(params, base, w0, w1, spec)
    return out, (params, x01, base, w0, w1)


def _window_bwd_table(spec, res, g):
    """Table gradient through the window scheme: sort window records,
    segment-sum 2C channels, combine G0 + shift(G1)."""
    params, x01, base, w0, w1 = res
    B, P = base.shape
    C = spec.level_dim
    M = B * P

    g_lc = g.reshape(B, spec.num_levels, C).astype(jnp.float32)
    # per-group uniform [B, nl, nw] weight blocks (fusion-friendly; see
    # _pairable_split) -> per-channel flat [M] record values
    chans0, chans1 = [[] for _ in range(C)], [[] for _ in range(C)]
    lv0 = 0
    for nl, nw, ofs in _group_extents(spec):
        p = nl * nw
        w0r = w0[:, ofs:ofs + p].reshape(B, nl, nw)
        w1r = w1[:, ofs:ofs + p].reshape(B, nl, nw)
        g_grp = g_lc[:, lv0:lv0 + nl, None, :]              # [B, nl, 1, C]
        for c in range(C):
            chans0[c].append((w0r * g_grp[..., c]).reshape(B * p))
            chans1[c].append((w1r * g_grp[..., c]).reshape(B * p))
        lv0 += nl

    def cat(parts_by_b):
        # records flat in [B-major, window] order must match keys below:
        # keys = base.reshape(M) is [B, P] flattened B-major, while group
        # parts are [B, p] — interleave per B via stacking along axis 1
        return jnp.concatenate(
            [p.reshape(B, -1) for p in parts_by_b], axis=1).reshape(M)

    keys = base.reshape(M)
    chans = ([cat(chans0[c]) for c in range(C)]
             + [cat(chans1[c]) for c in range(C)])
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


def _fused_bwd(spec, need_input_grads, res, g):
    params, x01, base, w0, w1 = res
    grad_table = _window_bwd_table(spec, res, g)

    if not need_input_grads:
        return grad_table, jnp.zeros_like(x01)

    # input grads (pose path): differentiate through the weights with the
    # gathered values treated as constants (exactly the reference's dy_dx
    # contraction, gridencoder.cu:352-378). Recompute the gather here
    # rather than saving the window-value residual.
    frozen = jax.lax.stop_gradient(params)

    def weights_path(x):
        _, w0x, w1x = _window_indices_weights(x, spec)
        return _window_forward(frozen, base, w0x, w1x, spec)

    _, vjp = jax.vjp(weights_path, x01)
    (grad_x,) = vjp(g)
    return grad_table, grad_x


hash_encode_fused.defvjp(_fused_fwd, _fused_bwd)


def hash_encode_fast(params, x, spec: HashGridSpec, bound: float = 1.0,
                     need_input_grads: bool = False):
    """World-space wrapper (mirrors ops.hashgrid.hash_encode)."""
    x01 = (x + bound) / (2.0 * bound)
    return hash_encode_fused(params, x01, spec, need_input_grads)
