"""Fused hash-grid encode: 2-row-window vrow gathers + sorted segment-sum backward.

Replaces jax.grad's default gather-transpose (an XLA scatter-add) for the
hash table, and halves the gather/sort volume with an exact-semantics
observation about the table index (gridencoder.cu:46-79):

  * dense (non-overflow) levels use pure stride arithmetic with dim-0
    stride 1, so the two x-corners (x0, y, z) and (x0+1, y, z) are ALWAYS
    at adjacent rows {u, u+1};
  * hashed levels with the "additive" TPU hash variant
    (ops/hashgrid.HashGridSpec.hash_variant) index as
    ``row = c[a] + (mix(others) % (hmap - res))`` with a per-level pair
    axis a (ops/hashgrid.pair_axis) — adjacent by construction, and the
    axis rotation decorrelates the line-structured collisions a fixed
    axis would produce;
  * hashed levels with the reference "xor" hash only pair for even x0
    (prime_0 == 1 so even^1 == even+1), so they fall back to one window
    PER CORNER with the second row's weight pinned to zero — a [2, C]
    slice of <= 8 floats costs the same single-slice gather as [1, C] on
    XLA:TPU, so the unified window path loses nothing.

Either way both interpolation rows of a window are ADJACENT, so a level
costs 2^(D-1) windows when pairable and 2^D otherwise, and the backward
scatters one slice per window instead of one scalar per corner-channel.

TPU execution (measured on v5e; see _vrow_cat/_window_forward): the table
is stored FLAT [n_params*C] and gathered as 128-float vrows — narrow
[2, C] slices from a [n, C] operand run 10-100x slower because XLA tiles
any non-128 minor dimension up to 32x (T(8,128) padding) and the padded
gather falls off the fast path. Channel selection + the window->level
reduction then ride ONE fixed-tensor einsum on the MXU.

Backward (replacing CUDA atomicAdd, gridencoder.cu:334-347): sort the
window records by table row. The payload is the FACTORED outer product —
one (w0, w1) bf16-pair word plus ceil(C/2) words for the level's C
g-channels (shared by both window rows) — so the sort moves 2 + ceil(C/2)
operands instead of the 1 + C a premultiplied 2C-channel stream costs;
the w ⊗ g product is reconstructed inside the placement kernel. Totals
are placed by the streaming Pallas kernel (kernels/segsum_pallas.py) on
TPU, or by 1-D segmented scans + the monotone sorted-unique scatter-SET
on CPU — the only scatter form XLA:TPU executes fast (scatter-ADD was
measured 10-100x slower at this scale in every formulation, including
slice updates).

Gradients wrt inputs (pose refinement path, gridencoder.cu:205-248 dy_dx)
are requested with ``need_input_grads=True``; they recompute the window
gather in the backward pass instead of saving the corner-value residual.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from raw_ngp_tpu.kernels import segsum_pallas
from raw_ngp_tpu.ops.hashgrid import (
    HashGridSpec,
    _PRIMES,
    _mix_prime,
    _smoothstep,
    pair_axis,
)


def _matmul_level(spec: HashGridSpec, lv: int) -> bool:
    """Whether this level is evaluated as a separable MXU contraction
    instead of vrow gathers (see :func:`_mm_forward`). Requires: dense
    (no hashing — the contraction is exact trilinear over the full
    level), 3-D input, and shapes that keep every operand's minor dim
    >= 128 lanes (CLAUDE.md layout rule) while the [B, res^2] weight
    operand stays small enough to stream (~134 MB bf16 at the flagship
    262144-point budget and res 16)."""
    res = spec.resolutions[lv]
    hmap = spec.offsets[lv + 1] - spec.offsets[lv]
    C = spec.level_dim
    return (spec.input_dim == 3
            and res ** 3 <= hmap              # dense level
            and res * C >= 128
            and res * res >= 128
            and res * res * C <= 8192)


def _matmul_split(spec: HashGridSpec) -> int:
    """Number of leading levels on the matmul path (resolutions grow, so
    qualifying levels form a prefix). At least one level stays on the
    window path so the record machinery never sees zero windows.
    RAW_NGP_MM_LEVELS caps the count: 0 disables, N allows at most N
    matmul levels; unset = auto; any non-integer value (e.g. "off")
    disables, preserving the old anything-but-"1"-disables semantics
    (read at trace time, like RAW_NGP_CHUNKED_SORT)."""
    import os
    k = 0
    while k < spec.num_levels - 1 and _matmul_level(spec, k):
        k += 1
    env = os.environ.get("RAW_NGP_MM_LEVELS", "")
    if env and env.lower() != "auto":   # "auto" == unset == uncapped
        try:
            k = min(max(int(env), 0), k)
        except ValueError:
            k = 0
    return k


def _level_pairable(spec: HashGridSpec, lv: int) -> bool:
    """Whether the two x-corners of any cell at this level are guaranteed
    adjacent table rows (see module docstring)."""
    res = spec.resolutions[lv]
    hmap = spec.offsets[lv + 1] - spec.offsets[lv]
    if res ** spec.input_dim <= hmap:
        return True                       # dense stride arithmetic
    return (spec.gridtype == "hash" and spec.hash_variant == "additive"
            and hmap > res)


def _pairable_split(spec: HashGridSpec) -> int:
    """Number of leading pairable levels. Pairability is monotone in the
    level index (resolutions only grow), so levels split into a pairable
    PREFIX and a non-pairable SUFFIX — each group has a uniform window
    count, so window ordering stays level-major for the selection tensor
    and the window->level map (_level_of_window)."""
    k = 0
    while k < spec.num_levels and _level_pairable(spec, k):
        k += 1
    assert not any(_level_pairable(spec, lv)
                   for lv in range(k, spec.num_levels)), \
        "pairable levels must form a prefix"
    return k


def _level_indices_1d(spec: HashGridSpec, level: int, coords):
    """ops.hashgrid._level_indices on per-component 1-D uint32 arrays.

    TPU layout rule: a [B, D] coordinate array with D < 128 minor is
    tile-padded 32x by XLA; keeping each component a separate 1-D [B]
    array keeps every intermediate in the clean T(1024) layout."""
    res = spec.resolutions[level]
    hmap = spec.offsets[level + 1] - spec.offsets[level]
    D = spec.input_dim
    cu = [c.astype(jnp.uint32) for c in coords]

    index = jnp.zeros_like(cu[0])
    stride = 1
    for d in range(D):
        if stride > hmap:
            break
        index = index + cu[d] * jnp.uint32(stride & 0xFFFFFFFF)
        stride *= res
    overflow = stride > hmap

    if spec.gridtype == "hash" and overflow:
        if spec.hash_variant == "additive" and hmap > res:
            a = pair_axis(spec, level)
            g = jnp.zeros_like(cu[0])
            for d in range(D):
                if d == a:
                    continue
                g = g ^ (cu[d] * jnp.uint32(_mix_prime(d)))
            index = cu[a] + g % jnp.uint32(hmap - res)
        else:
            h = jnp.zeros_like(cu[0])
            for d in range(D):
                h = h ^ (cu[d] * jnp.uint32(_PRIMES[d]))
            index = h

    return (index % jnp.uint32(hmap)) + jnp.uint32(spec.offsets[level])


def _window_indices_weights(x01, spec: HashGridSpec):
    """Window index/weight computation for every level, WINDOW-MAJOR.

    Returns:
      base [P, B] int32 — start row of each 2-row gather window, clamped to
        n_params-2 so both interpolation rows are in-bounds;
      w0, w1 [P, B] float32 — interpolation weight routed to row ``base`` /
        ``base+1`` (clamped corners can land both weights on one row; the
        routing indicators absorb every case, including the degenerate
        single-corner windows of non-pairable levels where one weight is 0).

    Everything here is computed on 1-D [B] per-component arrays and only
    stacked to [P, B] (B minor — clean tiling) at the end: [B, small]
    layouts tile-pad 32x on TPU and turned this stage into GBs of padded
    traffic in the first implementation.
    """
    B, D = x01.shape
    L = spec.num_levels
    n_half = 1 << (D - 1)
    x01 = x01.astype(jnp.float32)
    xs = [x01[:, d] for d in range(D)]                     # D x [B]

    inb = (xs[0] >= 0.0) & (xs[0] <= 1.0)
    for d in range(1, D):
        inb = inb & (xs[d] >= 0.0) & (xs[d] <= 1.0)
    inb_f = inb.astype(jnp.float32)                        # [B]
    xs = [jnp.where(inb, x, 0.5) for x in xs]
    top = spec.n_params - 2

    bases, w0s, w1s = [], [], []
    for lv in range(_matmul_split(spec), L):
        res = spec.resolutions[lv]
        fr, gr = [], []
        for d in range(D):
            if spec.align_corners:
                pos = xs[d] * (res - 1)
                g0 = jnp.minimum(jnp.floor(pos), res - 2)
            else:
                pos = jnp.clip(xs[d] * res - 0.5, 0.0, res - 1)
                g0 = jnp.floor(pos)
            f = pos - g0
            if spec.interpolation == "smoothstep":
                f = _smoothstep(f)
            fr.append(f)
            gr.append(g0.astype(jnp.int32))
        pairable = _level_pairable(spec, lv)
        a = pair_axis(spec, lv)          # table-adjacent corner axis
        rest_dims = [d for d in range(D) if d != a]
        a_lo = gr[a]
        a_hi = jnp.minimum(a_lo + 1, res - 1)
        for h in range(n_half):
            coords_lo = [None] * D
            coords_hi = [None] * D
            coords_lo[a], coords_hi[a] = a_lo, a_hi
            w_rest = inb_f
            for j, d in enumerate(rest_dims):
                bit = (h >> j) & 1
                c = jnp.minimum(gr[d] + bit, res - 1)
                coords_lo[d] = coords_hi[d] = c
                w_rest = w_rest * (fr[d] if bit else (1.0 - fr[d]))
            u = _level_indices_1d(spec, lv, coords_lo).astype(jnp.int32)
            v = _level_indices_1d(spec, lv, coords_hi).astype(jnp.int32)
            w_u = (1.0 - fr[a]) * w_rest
            w_v = fr[a] * w_rest
            if pairable:
                b = jnp.minimum(jnp.minimum(u, v), top)
                # route each corner weight to its window position (0 or 1)
                bases.append(b)
                w0s.append(w_u * (u == b) + w_v * (v == b))
                w1s.append(w_u * (u == b + 1) + w_v * (v == b + 1))
            else:
                # one degenerate window per corner: second row's weight 0
                # (same gather cost; the routing absorbs the top clamp)
                for idx, w in ((u, w_u), (v, w_v)):
                    b = jnp.minimum(idx, top)
                    bases.append(b)
                    w0s.append(w * (idx == b))
                    w1s.append(w * (idx == b + 1))

    return jnp.stack(bases), jnp.stack(w0s), jnp.stack(w1s)   # [P, B]


@functools.lru_cache(maxsize=None)
def _mm_static(res: int, C: int):
    """Static index/selection constants for the matmul path: per-lane
    (z, y) of the folded [res^2] q axis, per-lane x of the [res*C] p
    axis, and the [res*C, C] channel-selection matrix."""
    q = np.arange(res * res, dtype=np.int32)
    p = np.arange(res * C, dtype=np.int32)
    sel = np.zeros((res * C, C), np.float32)
    sel[p, p % C] = 1.0
    return (q // res)[None, :], (q % res)[None, :], (p // C)[None, :], sel


def _corner_axis(x, res: int, spec: HashGridSpec):
    """Per-axis corner row + fraction (g0 [B] int32, f [B] f32), matching
    _window_indices_weights / the ops.hashgrid oracle bit-for-bit."""
    if spec.align_corners:
        pos = x * (res - 1)
        g0 = jnp.minimum(jnp.floor(pos), res - 2)
    else:
        pos = jnp.clip(x * res - 0.5, 0.0, res - 1)
        g0 = jnp.floor(pos)
    f = pos - g0
    if spec.interpolation == "smoothstep":
        f = _smoothstep(f)
    return g0.astype(jnp.int32), f


def _mm_axis_weights(x01, spec: HashGridSpec, lv: int):
    """(wyz [B, res^2], wx_p [B, res*C]) f32 weight operands for level
    ``lv``'s separable contraction; out-of-bounds points get all-zero
    rows (the window path's inb mask)."""
    B, D = x01.shape
    res = spec.resolutions[lv]
    C = spec.level_dim
    qz, qy, px, _ = _mm_static(res, C)
    xs = [x01[:, d].astype(jnp.float32) for d in range(D)]
    inb = (xs[0] >= 0.0) & (xs[0] <= 1.0)
    for d in range(1, D):
        inb = inb & (xs[d] >= 0.0) & (xs[d] <= 1.0)
    xs = [jnp.where(inb, x, 0.5) for x in xs]
    (gx, fx), (gy, fy), (gz, fz) = (_corner_axis(x, res, spec) for x in xs)

    def axis_w(lane_idx, g0, f):
        g0c, g1c = g0[:, None], jnp.minimum(g0 + 1, res - 1)[:, None]
        return ((1.0 - f)[:, None] * (lane_idx == g0c)
                + f[:, None] * (lane_idx == g1c))

    wyz = axis_w(qz, gz, fz) * axis_w(qy, gy, fy) \
        * inb.astype(jnp.float32)[:, None]                  # [B, res^2]
    wx_p = axis_w(px, gx, fx)                               # [B, res*C]
    return wyz, wx_p


def _mm_forward(params, x01, spec: HashGridSpec, compute_dtype=None):
    """Leading dense levels as separable MXU contractions — no gathers.

    A dense level's trilinear interpolation (gridencoder.cu:62-79 dense
    branch + :154-159) is

        out[b, c] = sum_{z,y,x} wz[b,z] wy[b,y] wx[b,x] T[z, y, x, c]

    with two nonzeros per axis weight row. Folding (z, y) into one
    4-nonzero [B, res^2] operand makes stage 1 a true matmul
    [B, res^2] @ [res^2, res*C] (the level's flat slice reshaped
    row-major: flat row = x + res*y + res^2*z), and the x contraction an
    elementwise multiply plus a [res*C, C] channel-selection matmul.
    Replaces the level's 2^(D-1) vrow gathers per point (~5 ns each at
    the measured gather floor — half the flagship's 2.1M-gather encode)
    with ~0.1 ms of MXU work at [262144 pts, res 16, C 16], and removes
    the level's records from the backward sort entirely
    (:func:`_mm_grad_table`). Exact same interpolation math as the
    window path / ops.hashgrid oracle.

    Returns [B, m*C] features for the m = _matmul_split(spec) leading
    levels (m == 0 -> [B, 0]).
    """
    B = x01.shape[0]
    m = _matmul_split(spec)
    C = spec.level_dim
    dt = compute_dtype or params.dtype
    pf = params.reshape(-1)
    outs = []
    for lv in range(m):
        res = spec.resolutions[lv]
        off = int(spec.offsets[lv])
        _, _, _, sel = _mm_static(res, C)
        wyz, wx_p = _mm_axis_weights(x01, spec, lv)
        T2 = pf[off * C:(off + res ** 3) * C].astype(dt) \
            .reshape(res * res, res * C)
        Z = wyz.astype(dt) @ T2                             # [B, res*C]
        outs.append((Z * wx_p.astype(dt)) @ jnp.asarray(sel, dt))
    if not outs:
        return jnp.zeros((B, 0), dt)
    return jnp.concatenate(outs, axis=1)                    # [B, m*C]


def _mm_grad_table(x01, g, spec: HashGridSpec, compute_dtype=None):
    """Table gradient of the matmul-path prefix: the transposed
    contraction grad_T2 = wyz^T @ (wx ⊙ (g @ sel^T)) — two matmuls per
    level instead of sort + segment-sum + scatter (the window path's
    backward). bf16 matmuls accumulate f32 on the MXU and round the
    output once, matching the bf16-total noise of the sorted path
    (and the reference's fp16 atomics, gridencoder.cu:334-347).

    g: [B, L*C] upstream cotangent. Returns flat [offsets[m]*C] f32.
    """
    m = _matmul_split(spec)
    C = spec.level_dim
    dt = compute_dtype or jnp.float32
    parts = []
    for lv in range(m):
        res = spec.resolutions[lv]
        hmap = int(spec.offsets[lv + 1]) - int(spec.offsets[lv])
        _, _, _, sel = _mm_static(res, C)
        wyz, wx_p = _mm_axis_weights(x01, spec, lv)
        g_lv = g[:, lv * C:(lv + 1) * C].astype(dt)         # [B, C]
        Gx = (g_lv @ jnp.asarray(sel.T, dt)) * wx_p.astype(dt)
        grad_T2 = wyz.astype(dt).T @ Gx                     # [res^2, res*C]
        flat = grad_T2.reshape(-1).astype(jnp.float32)
        if hmap > res ** 3:                 # /8-rounded tail rows unused
            flat = jnp.concatenate(
                [flat, jnp.zeros(((hmap - res ** 3) * C,), jnp.float32)])
        parts.append(flat)
    if not parts:
        return jnp.zeros((0,), jnp.float32)
    return jnp.concatenate(parts)


def _group_extents(spec: HashGridSpec):
    """((n_levels, n_windows_per_level, window_col_offset), ...) for the
    pairable prefix and non-pairable suffix groups (empty groups omitted)."""
    D = spec.input_dim
    m = _matmul_split(spec)     # mm levels are dense, hence pairable:
    k = _pairable_split(spec)   # the mm prefix sits inside the pairable one
    L = spec.num_levels
    groups = []
    if k > m:
        groups.append((k - m, 1 << (D - 1), 0))
    if k < L:
        groups.append((L - k, 1 << D, (k - m) * (1 << (D - 1))))
    return tuple(groups)


def _total_windows(spec: HashGridSpec) -> int:
    return sum(nl * nw for nl, nw, _ in _group_extents(spec))


def _vrow_cat(params_flat):
    """Flat [n_params*C] table -> (cat [2*Rv, 128], n_rows_of_view_A).

    TPU layout rule: any device tensor whose minor dimension is not 128
    lanes is tile-padded up to 32x by XLA (T(8,128) tiling). The table is
    therefore STORED flat and viewed as 128-float "vrows" (128/C table
    rows each). A 2-row window starting at table row b sits inside ONE
    vrow unless b is the last row of its vrow; the second view, shifted
    by half a vrow (64 floats), covers exactly those crossing windows.
    One [1, 128] row gather per window then fetches both interpolation
    rows at the measured fast-path cost (~4 ns/slice, vs ~60 ns+ for
    narrow slices from a padded [n, C] operand)."""
    pf = params_flat
    pad = (-pf.shape[0]) % 128
    pf = jnp.concatenate([pf, jnp.zeros((pad + 64,), pf.dtype)])
    A = pf[:pf.shape[0] - 64].reshape(-1, 128)
    Bv = pf[64:].reshape(-1, 128)
    return jnp.concatenate([A, Bv], axis=0), A.shape[0]


@functools.lru_cache(maxsize=None)
def _level_of_window(spec: HashGridSpec, m: int):
    """Static window -> level map (ABSOLUTE level ids, level-major window
    ordering matching _window_indices_weights; matmul-path prefix levels
    have no windows)."""
    lvl_of_w = []
    lv0 = m
    for nl, nw, _ in _group_extents(spec):
        for lv in range(lv0, lv0 + nl):
            lvl_of_w.extend([lv] * nw)
        lv0 += nl
    return tuple(lvl_of_w)


@functools.lru_cache(maxsize=None)
def _sel_tensor_np(spec: HashGridSpec, m: int):
    """Fixed selection tensor S [P, 128, (L-m)*C] folding channel
    extraction AND the window->level reduction into one MXU contraction:
    S[w, k, (l-m)*C + c] = (k mod C == c) * (level_of_window(w) == l),
    columns covering the window-path levels only (the m matmul-path
    prefix levels produce their features in _mm_forward)."""
    C = spec.level_dim
    L = spec.num_levels
    lvl_of_w = _level_of_window(spec, m)
    P = len(lvl_of_w)
    S = np.zeros((P, 128, (L - m) * C), np.float32)
    for w in range(P):
        l = lvl_of_w[w] - m
        for k in range(128):
            S[w, k, l * C + (k % C)] = 1.0
    return S


def _window_forward(params, base, w0, w1, spec: HashGridSpec,
                    compute_dtype=None):
    """Encode forward from window-major records: one 128-lane vrow gather
    per window, a lane-masked routing multiply (pure elementwise, fused
    by XLA into the gather consumer), and a per-window MXU contraction
    that both selects the C channels of the 2 target rows and sums
    windows into their level's features. Every intermediate is 1-D or
    keeps a >=128 minor dim — no tile padding anywhere (see _vrow_cat).

    base/w0/w1: [P, B] from _window_indices_weights.
    Returns [B, L*C] in the compute dtype."""
    P, B = base.shape
    C = spec.level_dim
    assert 128 % C == 0 and (C & (C - 1)) == 0 and C <= 64, \
        "level_dim must be a power of two <= 64"
    GPL = 128 // C                     # table rows per vrow
    shift = GPL.bit_length() - 1
    M = P * B
    dt = compute_dtype or params.dtype

    # canonical storage is flat [n_params*C]; legacy [n_params, C] inputs
    # (tests, external callers) are viewed flat — same row-major order
    cat, nA = _vrow_cat(params.reshape(-1).astype(dt))
    pos = base & (GPL - 1)
    cross = pos == (GPL - 1)           # window spans two vrows of view A
    vrow = jnp.where(cross, ((base - GPL // 2) >> shift) + nA,
                     base >> shift)
    p = jnp.where(cross, (GPL // 2) - 1, pos)
    rows = cat[vrow.reshape(-1)]                          # [M, 128]
    g128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) >> \
        (C.bit_length() - 1)                              # lane -> row group
    p_ = p.reshape(M, 1)
    u = (w0.reshape(M, 1) * (g128 == p_)
         + w1.reshape(M, 1) * (g128 == p_ + 1)).astype(dt)
    prod = (rows * u).reshape(P, B, 128)
    S = jnp.asarray(_sel_tensor_np(spec, _matmul_split(spec)), dt)
    # accumulated per-window matmuls [B, 128] @ [128, L*C]: windows whose
    # lanes u zeroed contribute nothing outside their own level's columns,
    # so the accumulation IS the window->level reduction
    out = jax.lax.dot_general(
        prod, S, (((2,), (1,)), ((0,), (0,)))).sum(axis=0)
    return out.astype(dt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def hash_encode_fused(params, x01, spec: HashGridSpec,
                      need_input_grads: bool = False, compute_dtype=None):
    """Drop-in replacement for ops.hashgrid.hash_encode_01 on a FLAT
    [n_params*C] table, with 128-lane vrow gathers and the sort-based
    table gradient. x01 in [0, 1]^D; compute_dtype (e.g. bfloat16) sets
    the gather/contract precision while the table and its gradient stay
    in the table's own dtype. Leading dense levels ride the gather-free
    matmul path (_mm_forward); the rest use the window scheme."""
    base, w0, w1 = _window_indices_weights(x01, spec)
    return jnp.concatenate(
        [_mm_forward(params, x01, spec, compute_dtype),
         _window_forward(params, base, w0, w1, spec, compute_dtype)],
        axis=1)


def _fused_fwd(params, x01, spec, need_input_grads, compute_dtype):
    base, w0, w1 = _window_indices_weights(x01, spec)
    out = jnp.concatenate(
        [_mm_forward(params, x01, spec, compute_dtype),
         _window_forward(params, base, w0, w1, spec, compute_dtype)],
        axis=1)
    return out, (params, x01, base, w0, w1)


def _pack_bf16_pairs(chans):
    """List of [M] f32 arrays -> list of [M] u32 sort payloads, two bf16
    values per word (halves the sorted payload; the half-precision
    pre-accumulation mirrors the reference's fp16 atomics,
    gridencoder.cu:334-347). bf16 is just the top 16 bits of f32, so the
    pack/unpack is pure u32 bit arithmetic — float16 is NOT TPU-native
    and its conversions go through slow emulation."""
    if len(chans) % 2 == 1:
        chans = chans + [jnp.zeros_like(chans[0])]
    packed = []
    for c in range(0, len(chans), 2):
        hi = jax.lax.bitcast_convert_type(chans[c], jnp.uint32) \
            & jnp.uint32(0xFFFF0000)
        lo = jax.lax.bitcast_convert_type(chans[c + 1], jnp.uint32) >> 16
        packed.append(hi | lo)
    return packed


def _unpack_bf16_pairs(packed, n):
    chans = []
    for ps in packed:
        chans.append(jax.lax.bitcast_convert_type(
            ps & jnp.uint32(0xFFFF0000), jnp.float32))
        chans.append(jax.lax.bitcast_convert_type(ps << 16, jnp.float32))
    return chans[:n]


def _segment_sum_sorted_scatter(keys_sorted, val_channels, n_rows: int):
    """Exact segment sums of the sorted per-channel 1-D value arrays
    grouped by ``keys_sorted`` (ascending), placed per row.

    The fast XLA:TPU scatter is the monotone sorted-unique SCALAR
    scatter-SET, and one pass over the record stream costs ~6 ns/index —
    with 2C channels the naive one-scatter-per-channel scheme dominated
    the whole training step. Two measured tricks halve and halve again:

      1. a segmented Hillis-Steele shift-mask scan (log2(M) masked
         shifted adds on 1-D f32 arrays, ~30 ms total) leaves every
         segment's TOTAL on its end record — totals are segment-LOCAL
         values, so unlike cumsum differences they survive low-precision
         storage without cancellation;
      2. totals are packed two-bf16-per-u32 (pure bit arithmetic) so
         2C channels ride ONLY C scatter passes. The reference rounds
         every atomic add to fp16 (gridencoder.cu:334-347); rounding the
         f32-accumulated total once to bf16 is comparable noise.

    Destinations stay monotone: every non-end record dumps into slot 2k
    (harmlessly overwritten), the end writes slot 2k+1.

    val_channels: list of arrays [M]. Returns [n_rows, len(val_channels)]
    float32.
    """
    M = keys_sorted.shape[0]
    nc = len(val_channels)
    vs = [v.astype(jnp.float32) for v in val_channels]
    s = 1
    while s < M:
        same = keys_sorted[s:] == keys_sorted[:-s]
        vs = [jnp.concatenate([v[:s], v[s:] + jnp.where(same, v[:-s], 0.0)])
              for v in vs]
        s <<= 1

    boundary = keys_sorted[1:] != keys_sorted[:-1]
    is_end = jnp.concatenate([boundary, jnp.ones((1,), jnp.bool_)])
    dest = jnp.where(is_end, 2 * keys_sorted + 1, 2 * keys_sorted)
    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(), inserted_window_dims=(0,),
        scatter_dims_to_operand_dims=(0,))

    out = []
    for pk in _pack_bf16_pairs(vs):
        z = jnp.zeros((2 * n_rows,), jnp.uint32)
        sc = jax.lax.scatter(z, dest[:, None], pk, dnums,
                             indices_are_sorted=True,
                             unique_indices=True)
        ends = sc.reshape(n_rows, 2)[:, 1]
        out.extend(_unpack_bf16_pairs([ends], 2))
    return jnp.stack(out[:nc], axis=-1)


# In-situ bisection knob (tools/tpu_profile.py bisect): "full" runs the
# real table gradient; "zero" skips records+sort+segsum entirely; "sort"
# builds and sorts the records but replaces the segment-total placement
# with a cheap sort-dependent reduction. Trace-time only — never set
# outside profiling.
TABLE_GRAD_MODE = "full"


def _chunked_sort_on() -> bool:
    """Per-level chunked sorts: L sorts of M/L records with level-local
    keys instead of one global M-record sort — less bitonic compare
    depth plus smaller working sets. Measured in-situ at the L2xC16
    flagship (tools/tpu_profile.py step, v5e): step backward 18.7 ->
    14.9 ms, full step 62.2 -> 59.9 ms — so chunked is the DEFAULT;
    RAW_NGP_CHUNKED_SORT=0 restores the global sort."""
    import os
    return os.environ.get("RAW_NGP_CHUNKED_SORT", "1") == "1"


def _iota_sort_on() -> bool:
    """RAW_NGP_IOTA_SORT=1: sort only (key, iota, w-word) and GATHER the
    g-channel payload words post-sort via the permutation — the g words
    depend only on the record's point index b (they are per-point, not
    per-window), so a [B]-length word array + one 1-D gather per word
    replaces ceil(C/2) full sort operands. Trades bitonic payload
    traffic for Ml-sized 1-D gathers; measure-then-adopt knob (queued:
    ROADMAP round-3c next-targets #4)."""
    import os
    return os.environ.get("RAW_NGP_IOTA_SORT", "0") == "1"


def _window_bwd_table_chunked(spec, res, g, compute_dtype=None):
    """Per-level variant of :func:`_window_bwd_table`: each level's
    records (a contiguous window slice, level-major ordering) sort and
    place independently into the level's own row range."""
    params, x01, base, w0, w1 = res
    C = spec.level_dim
    m = _matmul_split(spec)
    gT = g.astype(jnp.float32).T                            # [L*C, B]
    lvl_of_w = _level_of_window(spec, m)
    P, B = base.shape

    totals = []
    w_lo = 0
    for lv in range(m, spec.num_levels):
        w_hi = w_lo
        while w_hi < P and lvl_of_w[w_hi] == lv:
            w_hi += 1
        nw = w_hi - w_lo
        Ml = nw * B
        off = int(spec.offsets[lv])
        rows_l = int(spec.offsets[lv + 1]) - off
        keys_l = (base[w_lo:w_hi].reshape(Ml)
                  - jnp.uint32(off)).astype(jnp.int32)
        w_word = _pack_bf16_pairs([w0[w_lo:w_hi].reshape(Ml),
                                   w1[w_lo:w_hi].reshape(Ml)])[0]
        if _iota_sort_on():
            keys_s, perm, w_word_s = jax.lax.sort(
                [keys_l, jax.lax.iota(jnp.int32, Ml), w_word], num_keys=1)
            b_s = perm % B          # g words are per-POINT, not per-window
            g_words_B = _pack_bf16_pairs(
                [gT[lv * C + c] for c in range(C)])        # each [B]
            sorted_ops = [keys_s, w_word_s] + [gw[b_s] for gw in g_words_B]
        else:
            g_chans = [jnp.broadcast_to(gT[lv * C + c], (nw, B)).reshape(Ml)
                       for c in range(C)]
            g_words = _pack_bf16_pairs(g_chans)
            sorted_ops = jax.lax.sort(
                [keys_l, w_word] + g_words, num_keys=1)
        if segsum_pallas.use_pallas_segsum():
            t_l = segsum_pallas.segment_totals_outer_pallas(
                sorted_ops[0], sorted_ops[1], sorted_ops[2:], rows_l, C)
        else:
            w0_s, w1_s = _unpack_bf16_pairs(sorted_ops[1:2], 2)
            g_s = _unpack_bf16_pairs(sorted_ops[2:], C)
            t_l = _segment_sum_sorted_scatter(
                sorted_ops[0], [w0_s * x for x in g_s]
                + [w1_s * x for x in g_s], rows_l)
        totals.append(t_l)
        w_lo = w_hi
    totals = jnp.concatenate(totals, axis=0)   # [n_params - off_m, 2C]
    g0, g1 = totals[:, :C], totals[:, C:]
    # v1 at base b belongs to row b+1; the first suffix row receives no
    # shift-in (the matmul-path prefix has no window records)
    grad = g0 + jnp.concatenate([jnp.zeros_like(g1[:1]), g1[:-1]], axis=0)
    grad = jnp.concatenate(
        [_mm_grad_table(x01, g, spec, compute_dtype), grad.reshape(-1)])
    return grad.reshape(params.shape).astype(params.dtype)


def _window_bwd_table(spec, res, g, compute_dtype=None):
    """Table gradient through the window scheme: sort window records,
    segment-sum 2C channels, combine G0 + shift(G1) into the flat table."""
    params, x01, base, w0, w1 = res
    if TABLE_GRAD_MODE == "zero":
        return jnp.zeros_like(params)
    if TABLE_GRAD_MODE == "full" and _chunked_sort_on():
        return _window_bwd_table_chunked(spec, res, g, compute_dtype)
    P, B = base.shape
    C = spec.level_dim
    M = P * B

    # gT rows are clean 1-D [B] slices; g itself is [B, L*C] whose L*C
    # minor would tile-pad any per-level slicing — one transpose instead
    gT = g.astype(jnp.float32).T                            # [L*C, B]
    lvl_of_w = _level_of_window(spec, _matmul_split(spec))

    # outer-product payload, window-major (m = w*B + b): word 0 carries
    # the record's (w0, w1) pair, words 1.. the C g-channels of the
    # record's level — SHARED by both window rows, so the sorted stream
    # rides 1 + ceil(C/2) payload words instead of the C words the
    # premultiplied 2C channels would need (the w⊗g outer product is
    # reconstructed inside the placement kernel / after the sort)
    w_word = _pack_bf16_pairs([w0.reshape(M), w1.reshape(M)])[0]
    g_chans = [jnp.stack([gT[lvl_of_w[w] * C + c] for w in range(P)]
                         ).reshape(M) for c in range(C)]
    g_words = _pack_bf16_pairs(g_chans)

    keys = base.reshape(M)
    sorted_ops = jax.lax.sort([keys, w_word] + g_words, num_keys=1)
    keys_s = sorted_ops[0]
    if TABLE_GRAD_MODE == "sort":
        # keep the sort live (sum-of-sorted is order-invariant but XLA
        # performs no such rewrite) while skipping the placement kernel
        probe = sum(o[:: max(M // 128, 1)].astype(jnp.float32).sum()
                    for o in sorted_ops)
        # .at[].set of a tiny probe-dependent value: XLA cannot fold it
        # away (0.0 * x IS foldable when x is provably finite)
        return jnp.zeros_like(params).reshape(-1).at[0].set(
            (probe * 1e-38).astype(params.dtype)).reshape(params.shape)
    if segsum_pallas.use_pallas_segsum():
        # streaming Pallas placement: exact f32 totals, no XLA scatter
        totals = segsum_pallas.segment_totals_outer_pallas(
            keys_s, sorted_ops[1], sorted_ops[2:], spec.n_params, C)
    else:
        w0_s, w1_s = _unpack_bf16_pairs(sorted_ops[1:2], 2)
        g_s = _unpack_bf16_pairs(sorted_ops[2:], C)
        val_channels = ([w0_s * g for g in g_s]
                        + [w1_s * g for g in g_s])
        totals = _segment_sum_sorted_scatter(keys_s, val_channels,
                                             spec.n_params)  # [n, 2C]
    g0, g1 = totals[:, :C], totals[:, C:]
    # v1 recorded at base b belongs to row b+1
    grad = g0 + jnp.concatenate([jnp.zeros_like(g1[:1]), g1[:-1]], axis=0)
    grad = grad.reshape(-1)
    mm = _mm_grad_table(x01, g, spec, compute_dtype)
    if mm.shape[0]:
        # matmul-prefix rows have no window records: their slice of the
        # scattered grad is zero, so the add just places the mm grads
        grad = jnp.concatenate([mm + grad[:mm.shape[0]],
                                grad[mm.shape[0]:]])
    return grad.reshape(params.shape).astype(params.dtype)


def _fused_bwd(spec, need_input_grads, compute_dtype, res, g):
    params, x01, base, w0, w1 = res
    grad_table = _window_bwd_table(spec, res, g, compute_dtype)

    if not need_input_grads:
        return grad_table, jnp.zeros_like(x01)

    # input grads (pose path): differentiate through the weights with the
    # gathered values treated as constants (exactly the reference's dy_dx
    # contraction, gridencoder.cu:352-378). Recompute the gather here
    # rather than saving the window-value residual.
    frozen = jax.lax.stop_gradient(params)

    def weights_path(x):
        _, w0x, w1x = _window_indices_weights(x, spec)
        return jnp.concatenate(
            [_mm_forward(frozen, x, spec, compute_dtype),
             _window_forward(frozen, base, w0x, w1x, spec,
                             compute_dtype)], axis=1)

    _, vjp = jax.vjp(weights_path, x01)
    (grad_x,) = vjp(g)
    return grad_table, grad_x


hash_encode_fused.defvjp(_fused_fwd, _fused_bwd)


def hash_encode_fast(params, x, spec: HashGridSpec, bound: float = 1.0,
                     need_input_grads: bool = False, compute_dtype=None):
    """World-space wrapper (mirrors ops.hashgrid.hash_encode)."""
    x01 = (x + bound) / (2.0 * bound)
    return hash_encode_fused(params, x01, spec, need_input_grads,
                             compute_dtype)
