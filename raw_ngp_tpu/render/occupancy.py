"""Occupancy-grid volume renderer — the TPU redesign of the reference's
CUDA ray marching (the "-O" mode heart).

The CUDA design (raymarching.cu kernel_march_rays_train:338-491) walks each
ray sequentially with data-dependent early-exit, DDA empty-space skipping,
atomic compaction into exact-size buffers, and a forced host sync per step
(raymarching.py:303). All of that is hostile to XLA: dynamic shapes,
per-thread control flow, host round-trips.

TPU formulation (static shapes end to end):
  1. generate S candidate samples per ray, uniformly covering [near, far]
     with per-ray step dt = (far-near)/S and shared jitter;
  2. occupancy test every candidate against the Morton bitfield — pure
     integer gather + bit math on the VPU (the analogue of the in-kernel
     bit test at raymarching.cu:436-437), with the same mip-level selection
     (mip_from_pos / mip_from_dt, raymarching.cu:42-54) and in-kernel MeRF
     contraction (raymarching.cu:421-429);
  3. stream-compact the first K occupied candidates per ray with a cumsum
     over the mask + one scatter — the static-shape replacement for the
     two-pass atomic count/write;
  4. evaluate the field only on the [N, K] compacted samples and composite
     with the masked cumsum kernel (ops/compositing.py). The cross-ray
     compaction scatters ONE int32 column — the flat source position
     (compact_positions) — and *gathers* everything else from it: t from
     the [N, K] grid, ray id as pos // K, and per-ray o/d/ldir rows by
     ray id (gather_ray_rows). Gradients ride gathers too: the expand
     backward fetches cotangent rows at pos instead of scattering them.

Sample budget parity: the reference targets 2^18 points per step via
adaptive ray counts (train_utils.py:563-564); here N_rays * K is the static
budget and K defaults to the same ~64 points/ray average.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from raw_ngp_tpu.config import Config
from raw_ngp_tpu.models.ngp import FieldSpec, field_forward
from raw_ngp_tpu.ops.compositing import (
    composite_rays,
    composite_with_background,
)
from raw_ngp_tpu.ops.morton import morton3d
from raw_ngp_tpu.ops.rays import near_far_from_aabb


def _floor_log2_p1(x):
    """floor(log2(x)) + 1 for positive finite f32 via exponent-field
    extraction: x = m * 2^E with m in [1, 2) has biased exponent E + 127
    in bits 23-30, and floor(log2(x)) == E exactly for every positive
    normal (subnormals round up to the 1e-12 clamp first). Replaces two
    transcendental log2+floor passes per march candidate (~8.4M/step)
    with integer bit math on the VPU."""
    bits = jax.lax.bitcast_convert_type(
        jnp.maximum(x, 1e-12).astype(jnp.float32), jnp.int32)
    return (bits >> 23) - 126                               # int32


def _mip_level(pos, dt, grid_size: int, cascades: int):
    """max(mip_from_pos, mip_from_dt) (raymarching.cu:42-54, 415).

    frexp semantics: level = floor(log2(m)) + 1 for m > 0 (m in
    [2^(e-1), 2^e) maps to e), clamped to [0, cascades-1].
    """
    mx = jnp.max(jnp.abs(pos), axis=-1)
    lp = _floor_log2_p1(mx)
    md = dt * grid_size * 0.5
    ld = _floor_log2_p1(md)
    level = jnp.maximum(jnp.maximum(lp, ld), 0)
    return jnp.minimum(level, cascades - 1).astype(jnp.int32)


def occupancy_lookup(bitfield, pos, dt, bound: float, contract: bool,
                     grid_size: int, cascades: int):
    """Occupancy test + contracted coords for world positions.

    Mirrors the per-step logic of kernel_march_rays_train
    (raymarching.cu:406-442). Returns (occupied_or_outer, contracted_pos).
    ``occupied_or_outer`` is True when the bitfield bit is set OR the point
    lies outside the unit cube in contract mode (raymarching.cu:442).
    """
    pos = jnp.clip(pos, -bound, bound)
    mag = jnp.max(jnp.abs(pos), axis=-1, keepdims=True)

    cpos = pos
    if contract:
        safe = jnp.maximum(mag, 1e-12)
        scale = (2.0 - 1.0 / safe) / safe
        cpos = jnp.where(mag > 1.0, pos * scale, pos)

    level = _mip_level(pos, dt, grid_size, cascades)        # [...]
    # 2^level / 2^-level built directly in the exponent field (level is a
    # small non-negative int; avoids a transcendental exp2 per candidate)
    pow2 = jax.lax.bitcast_convert_type(
        (level + 127) << 23, jnp.float32)
    mip_bound = jnp.minimum(pow2, bound)
    mip_rbound = 1.0 / mip_bound

    # nearest grid cell (raymarching.cu:432-434)
    n = jnp.clip(0.5 * (cpos * mip_rbound[..., None] + 1.0) * grid_size,
                 0.0, grid_size - 1).astype(jnp.int32)
    index = (level.astype(jnp.uint32) * jnp.uint32(grid_size ** 3)
             + morton3d(n))
    # u32 word gathers test ~18% faster than u8 byte gathers on TPU
    # (tools/march_variants.py); little-endian view keeps bit order:
    # bit (i & 31) of word i>>5 == bit (i & 7) of byte i>>3
    bf32 = jax.lax.bitcast_convert_type(
        bitfield.reshape(-1, 4), jnp.uint32).reshape(-1)
    word = bf32[(index >> jnp.uint32(5)).astype(jnp.int32)]
    bit = (word >> (index & jnp.uint32(31))) & jnp.uint32(1)
    occ = bit.astype(jnp.bool_)
    if contract:
        occ = occ | (mag[..., 0] > 1.0)
    return occ, cpos


@functools.lru_cache(maxsize=8)
def _morton_of_linear(hc: int):
    """Static [Hc^3] permutation: Morton code of each x-major linear cell
    (host-side numpy; ~128 KB constant at Hc=32 — small enough for the
    remote-compile constant limit)."""
    x, y, z = np.meshgrid(np.arange(hc), np.arange(hc), np.arange(hc),
                          indexing="ij")

    def spread(v):
        v = v.astype(np.uint32)
        v = (v | (v << 16)) & np.uint32(0x030000FF)
        v = (v | (v << 8)) & np.uint32(0x0300F00F)
        v = (v | (v << 4)) & np.uint32(0x030C30C3)
        v = (v | (v << 2)) & np.uint32(0x09249249)
        return v

    code = spread(x) | (spread(y) << 1) | (spread(z) << 2)
    return code.reshape(-1).astype(np.int32)


@functools.lru_cache(maxsize=64)
def _axis_overlap(hc: int, mb_tgt: float, mb_src: float):
    """[hc, hc] 0/1 matrix: target-cascade axis cell a spatially overlaps
    source-cascade axis cell b (cascade ℓ's cell a covers the world
    interval [(a/hc·2−1)·mb, ((a+1)/hc·2−1)·mb]). Host-side static
    constant; boundary touches count as overlap (conservative)."""
    a = np.arange(hc + 1, dtype=np.float64)
    t = (a / hc * 2.0 - 1.0) * mb_tgt
    s = (a / hc * 2.0 - 1.0) * mb_src
    ov = (t[:-1, None] <= s[None, 1:]) & (s[None, :-1] <= t[1:, None])
    # source cells beyond the target extent clamp to the nearest edge
    # cell (the old per-cascade probe loop clamped indices the same way):
    # content just outside a finer cascade's cube must stay detectable by
    # probes that index the finer cascade, at edge-cell granularity.
    ov[0] |= s[1:] <= t[0]
    ov[-1] |= s[:-1] >= t[-1]
    return ov.astype(np.float32)


def coarse_occupancy(bitfield, grid_size: int, cascades: int,
                     dilate_radius: int, bound: float = 0.0):
    """4^3 max-pool + cross-cascade union + dilate the Morton bitfield
    into LINEAR-order coarse occupancy volumes [CAS * Hc^3] int32
    (Hc = H/4).

    Pooling rides the Morton layout: coarse cell c covers exactly the 64
    consecutive fine codes [64c, 64c+64) == u32 words 2c and 2c+1, so the
    pool is one pairwise OR. Dilation (separable running max over a
    (2r+1)^3 neighborhood) makes probe tests conservative: any fine
    sample within r coarse cells of a probe point stays detectable.

    With ``bound`` given, each cascade's volume is the UNION of every
    cascade's occupancy resampled (conservatively, via static axis
    overlap matrices) into that cascade's coordinates, so a probe needs
    ONE gather at its containing cascade instead of one per cascade —
    the probe pass is ~524k gathers/step per cascade at the flagship
    shape, so this halves it at cascades=2. The resample runs before
    dilation; dilating in cascade-ℓ cells (≥ cascade-0 cells, which set
    the radius) keeps the half-spacing guarantee conservative.
    """
    if cascades > 1 and bound <= 0.0:
        # _probe_occupancy hard-requires the union fold at cascades>1
        # (single containing-cascade gather); an unfolded multi-cascade
        # volume silently reintroduces the cascade-0 shell-dropping bug.
        raise ValueError("coarse_occupancy needs bound > 0 when "
                         "cascades > 1 (cross-cascade union fold)")
    hc = grid_size // 4
    words = jax.lax.bitcast_convert_type(
        bitfield.reshape(-1, 4), jnp.uint32).reshape(cascades, hc ** 3, 2)
    occ_m = (words[..., 0] | words[..., 1]) > 0          # Morton order
    occ_lin = occ_m[:, jnp.asarray(_morton_of_linear(hc))]
    vol = occ_lin.reshape(cascades, hc, hc, hc).astype(jnp.float32)
    if bound > 0.0 and cascades > 1:
        mbs = [float(min(2.0 ** l, bound)) for l in range(cascades)]
        folded = []
        for tgt in range(cascades):
            u = vol[tgt]
            for src in range(cascades):
                if src == tgt:
                    continue
                ov = jnp.asarray(_axis_overlap(hc, mbs[tgt], mbs[src]))
                r = vol[src]
                r = jnp.einsum("xa,ayz->xyz", ov, r)
                r = jnp.einsum("yb,xbz->xyz", ov, r)
                r = jnp.einsum("zc,xyc->xyz", ov, r)
                u = u + r
            folded.append(u)
        vol = jnp.stack(folded)
    k = 2 * dilate_radius + 1
    vol = jax.lax.reduce_window(
        vol, -jnp.inf, jax.lax.max, (1, k, k, k), (1, 1, 1, 1), "SAME")
    return (vol > 0).reshape(-1).astype(jnp.int32)


def _coarse_dilate_radius(bound: float, grid_size: int,
                          n_probes: int) -> int:
    """Worst-case probe half-spacing over the cascade-0 coarse cell size
    (higher cascades have larger cells, so cascade 0 bounds them all)."""
    hc = grid_size // 4
    max_span = 2.0 * np.sqrt(3.0) * bound
    cell0 = 2.0 * min(1.0, bound) / hc
    return max(1, int(np.ceil(max_span / n_probes / (2.0 * cell0))))


def _probe_grid(nears, fars, n_probes: int, log_spacing: bool):
    """Probe-interval grid over [near, far]: centers + interval widths.

    Uniform (default): P equal intervals, spacing [N, 1].
    Log (``log_spacing``): geometric edges e_i = near * g^i with
    g = (far/near)^(1/P), centers at the geometric means — the
    disparity-style placement for contracted/unbounded scenes, where
    uniform-t probes would spend nearly all of P on the far field and
    near-camera content would lose probe resolution entirely. This is
    the probe analogue of the reference's geometrically growing
    dt_gamma step schedule (raymarching.cu:396-401).

    Returns (t [N, P] centers, spacing [N, 1 or P] widths,
    base [N, 1], logg [N, 1]) — (base, logg) reconstruct the continuous
    edge map e(x) = base * exp(logg * x) for the log grid (logg = 0
    flags the uniform grid).
    """
    steps = jnp.arange(n_probes, dtype=jnp.float32)[None, :] + 0.5
    if log_spacing:
        base = jnp.maximum(nears, 1e-4 * fars)              # [N, 1]
        logg = jnp.log(jnp.maximum(fars / base, 1.0 + 1e-6)) / n_probes
        t = base * jnp.exp(logg * steps)                    # [N, P]
        spacing = t * (jnp.exp(0.5 * logg)
                       - jnp.exp(-0.5 * logg))              # [N, P]
        return t, spacing, base, logg
    spacing = (fars - nears) / n_probes                     # [N, 1]
    t = nears + spacing * steps                             # [N, P]
    return t, spacing, nears, jnp.zeros_like(nears)


def _probe_occupancy(rays_o, rays_d, coarse_lin, nears, fars,
                     bound: float, contract: bool, grid_size: int,
                     cascades: int, n_probes: int,
                     log_spacing: bool = False):
    """Per-ray probe-interval occupancy against the dilated coarse grid.

    Splits [near, far] into ``n_probes`` intervals (uniform, or geometric
    with ``log_spacing`` — see :func:`_probe_grid`), tests each
    interval's center with ONE gather at the probe's containing cascade.
    ``coarse_lin`` must come from :func:`coarse_occupancy` with the union
    fold (bound > 0): each cascade's volume already ORs in every other
    cascade's occupancy resampled to its coordinates, so the single
    containing-cascade test still sees cross-cascade content — a probe
    sitting just outside the unit cube (mip 1) can neighbor in-cube
    samples whose fine march tests cascade 0, and a naive per-probe mip
    gate dropped exactly those (measured: rays grazing the |x|_inf = 1
    shell rendered black; tests/test_coarse_march.py::
    test_cascade0_shell_content_not_dropped guards it).

    Returns (occ [N, P] bool, t [N, P] probe centers,
    spacing [N, 1 or P]).
    """
    hc = grid_size // 4
    t, spacing, _, _ = _probe_grid(nears, fars, n_probes, log_spacing)
    pos = rays_o[:, None, :] + rays_d[:, None, :] * t[..., None]
    pos = jnp.clip(pos, -bound, bound)
    mag = jnp.max(jnp.abs(pos), axis=-1)                    # [N, P]

    cpos = pos
    if contract:
        safe = jnp.maximum(mag[..., None], 1e-12)
        scale = (2.0 - 1.0 / safe) / safe
        cpos = jnp.where(mag[..., None] > 1.0, pos * scale, pos)

    # smallest cascade containing the (contracted) indexing coordinate
    mag_c = jnp.max(jnp.abs(cpos), axis=-1)                 # [N, P]
    lvl = jnp.clip(_floor_log2_p1(mag_c), 0, cascades - 1)
    pow2 = jax.lax.bitcast_convert_type((lvl + 127) << 23, jnp.float32)
    mb = jnp.minimum(pow2, bound)[..., None]                # [N, P, 1]
    n = jnp.clip(0.5 * (cpos / mb + 1.0) * hc,
                 0.0, hc - 1).astype(jnp.int32)
    idx = (lvl * hc ** 3
           + (n[..., 0] * hc + n[..., 1]) * hc + n[..., 2])
    # flattened 1-D gather: [N, P<128] operands are tile-padded and
    # fall off the fast gather path (CLAUDE.md layout rule)
    hit = coarse_lin[idx.reshape(-1)].reshape(idx.shape)
    occ = hit > 0
    occ = occ & (t < fars)
    return occ, t, spacing


def coarse_spans(rays_o, rays_d, coarse_lin, nears, fars, bound: float,
                 contract: bool, grid_size: int, cascades: int,
                 n_probes: int, log_spacing: bool = False):
    """Tightened per-ray [near, far] from coarse occupancy probes.

    The static-shape analogue of the reference's DDA empty-space skipping
    (raymarching.cu:446-460): instead of skipping cells mid-march, probe
    a dilated coarse grid first and shrink the span the fine candidates
    cover. Rays with no coarse hit collapse to an empty span at `far`
    (the fine march's `t < far` guard then drops every candidate).
    The one-interval safety margin is applied per probe (spacing may be
    per-probe under ``log_spacing``) before the min/max reduction.
    """
    occ, t, spacing = _probe_occupancy(
        rays_o, rays_d, coarse_lin, nears, fars, bound, contract,
        grid_size, cascades, n_probes, log_spacing)
    tin = jnp.min(jnp.where(occ, t - spacing, jnp.inf),
                  axis=1, keepdims=True)
    tout = jnp.max(jnp.where(occ, t + spacing, -jnp.inf),
                   axis=1, keepdims=True)
    near2 = jnp.maximum(nears, tin)
    far2 = jnp.minimum(fars, tout)
    empty = tin > tout
    near2 = jnp.where(empty, fars, near2)
    far2 = jnp.where(empty, fars, far2)
    return near2, far2


def cdf_candidates(rays_o, rays_d, coarse_lin, nears, fars, bound: float,
                   contract: bool, grid_size: int, cascades: int,
                   n_probes: int, num_candidates: int, jitter,
                   dt_gamma: float = 0.0, max_steps: int = 1024,
                   log_spacing: bool = False, floor: float = 0.0):
    """Candidate times distributed over OCCUPIED probe intervals only.

    Where :func:`coarse_spans` tightens to one contiguous [tin, tout] —
    wasting candidates on voids BETWEEN occupied clusters — this inverts
    the per-ray CDF of probe hits: the S candidates uniformly fill
    exactly the union of occupied intervals, so effective sample density
    is S / (occupied length) instead of S / (tout - tin). The closer
    TPU analogue of the reference's DDA skipping (raymarching.cu:446-460),
    which never spends steps inside empty coarse cells either.

    With ``dt_gamma > 0`` the composition matches the reference's growing
    step schedule INSIDE the skipping (raymarching.cu:396-401 composes
    ``dt = clamp(t * dt_gamma, dt_min, dt_max)`` with the DDA skip at
    :468-480): each occupied probe interval is weighted by
    ``spacing / clamp(t_p * dt_gamma, dt_min, dt_max)`` — the number of
    reference-march steps the interval would take — so candidate density
    inside occupied spans follows the geometric schedule (near regions
    dense, far regions coarse) and each candidate's Riemann width is the
    local reference dt scaled by (needed steps / S). dt_min/dt_max mirror
    raymarching.cu:396-397: ``2√3/max_steps`` and ``2√3·2^(cas-1)/H``.

    Pure static-shape VPU math: the inverse CDF is an unrolled P-term
    count of probes with cumulative weight <= u (no per-candidate
    searches, no [N, S, P] tensor materialized); the weighted form also
    accumulates the cumulative-weight-before and the containing probe's
    weight in the same unrolled pass.

    ``floor`` > 0 keeps an epsilon of candidate weight over UNOCCUPIED
    intervals (each gets ``floor`` x its occupied-case weight). Pure
    occupied-only placement can never sample an interval whose CENTER
    probe missed off-center fine-occupied content (fog in
    under-observed regions stays uncarved — the measured 5 dB held-out
    gap vs the span march on contracted scenes, ROADMAP round-4
    contract gates); the floor lets every interval self-heal at
    ~floor/(1+floor) of the budget. The reference needs no analogue
    because its DDA walks EVERY coarse cell boundary
    (raymarching.cu:446-460) rather than point-probing centers.

    Returns (t_cand [N, S], dt): dt is [N, 1] (uniform weights) or
    [N, S] (dt_gamma > 0) — each candidate's Riemann width. Voids
    contribute no absorption (sigma = 0 there), matching the reference
    semantics where dt after a DDA skip stays the local step, not the
    skipped distance. Empty rays (no probe hit) collapse every candidate
    to `far` (dropped by the fine march's `t < far` guard) with dt = 0.
    """
    occ, t_probe, spacing = _probe_occupancy(
        rays_o, rays_d, coarse_lin, nears, fars, bound, contract,
        grid_size, cascades, n_probes, log_spacing)
    S = num_candidates
    steps = jnp.arange(S, dtype=jnp.float32)[None, :]       # [1, S]

    if dt_gamma <= 0.0 and not log_spacing and floor <= 0.0:
        # per-ray inclusive cumulative probe-hit count, P-major (the
        # minor axis is the slow cumsum direction on TPU)
        Wt = jnp.cumsum(occ.astype(jnp.int32).T, axis=0)    # [P, N]
        w = Wt[-1][:, None].astype(jnp.float32)             # [N, 1]
        u = (steps + jitter) * (w / S)                      # [N, S)
        j_occ = jnp.floor(u)                                # occupied ordinal
        # probe index of the (j_occ+1)-th occupied interval: count probes
        # whose cumulative count hasn't passed j_occ yet (unrolled over P
        # — 32 fused [N, S] compares, no [N, S, P] intermediate)
        j32 = j_occ.astype(jnp.int32)
        p_idx = jnp.zeros(u.shape, jnp.int32)
        for p in range(n_probes):
            p_idx = p_idx + (Wt[p][:, None] <= j32).astype(jnp.int32)
        frac = u - j_occ
        t_cand = nears + (p_idx.astype(jnp.float32) + frac) * spacing
        dt = spacing * w / S                                # [N, 1]
        return t_cand, dt

    sp_full = jnp.broadcast_to(spacing, t_probe.shape)      # [N, P]
    if dt_gamma > 0.0:
        sqrt3 = 1.7320508075688772
        dt_min = 2.0 * sqrt3 / max_steps
        dt_max = 2.0 * sqrt3 * (2.0 ** (cascades - 1)) / grid_size
        dt_ref = jnp.clip(t_probe * dt_gamma, dt_min, dt_max)  # [N, P]
    else:
        # log grid without dt_gamma: weight by interval LENGTH so the
        # candidate distribution stays uniform-in-t over occupied space
        # (identical semantics to the uniform-grid integer branch)
        dt_ref = jnp.ones_like(t_probe)
    wv = sp_full / dt_ref * jnp.where(occ, 1.0, floor)      # steps needed
    Wt = jnp.cumsum(wv.T, axis=0)                           # [P, N]
    w = Wt[-1][:, None]                                     # [N, 1] total
    u = (steps + jitter) * (w / S)                          # [N, S)
    p_idx = jnp.zeros(u.shape, jnp.int32)
    cw_before = jnp.zeros(u.shape, jnp.float32)             # weight < probe
    w_at = jnp.zeros(u.shape, jnp.float32)                  # containing w
    sp_at = jnp.zeros(u.shape, jnp.float32)                 # containing len
    for p in range(n_probes):
        wt_p = Wt[p][:, None]                               # incl. cumweight
        wv_p = wv.T[p][:, None]                             # probe weight
        before = wt_p <= u
        contains = (wt_p > u) & (wt_p - wv_p <= u)
        p_idx = p_idx + before.astype(jnp.int32)
        cw_before = cw_before + jnp.where(before, wv_p, 0.0)
        w_at = w_at + jnp.where(contains, wv_p, 0.0)
        sp_at = sp_at + jnp.where(contains, sp_full.T[p][:, None], 0.0)
    frac = jnp.clip((u - cw_before) / jnp.maximum(w_at, 1e-12),
                    0.0, 1.0 - 1e-6)
    if log_spacing:
        # edge e_p = base * exp(logg * p); LINEAR placement within the
        # interval (the CDF weight density is constant per unit t inside
        # a probe): t = e_p + frac * (e_{p+1} - e_p)
        base = jnp.maximum(nears, 1e-4 * fars)
        logg = jnp.log(jnp.maximum(fars / base, 1.0 + 1e-6)) / n_probes
        e_p = base * jnp.exp(logg * p_idx.astype(jnp.float32))
        t_cand = e_p * (1.0 + frac * jnp.expm1(logg))
    else:
        t_cand = nears + (p_idx.astype(jnp.float32) + frac) * spacing
    # local candidate density in probe p is (S/w) * wv_p / spacing_p;
    # each candidate's Riemann width is its inverse:
    # dt = spacing_p * w / (S * wv_p) = dt_ref_p * w/S.
    dt = jnp.where(w_at > 0.0,
                   sp_at * w / (S * jnp.maximum(w_at, 1e-12)), 0.0)
    return t_cand, dt


def march_rays(
    rays_o, rays_d,             # [N, 3]
    bitfield,                   # [CAS * H^3 / 8] uint8
    nears, fars,                # [N, 1]
    bound: float,
    contract: bool,
    grid_size: int,
    cascades: int,
    num_candidates: int,        # S
    samples_per_ray: int,       # K
    key=None,                   # jitter (perturb)
    dt_gamma: float = 0.0,
    coarse_probes: int = 0,
    march_cdf: bool = False,
    max_steps: int = 1024,      # sets the reference dt_min (cdf+dt_gamma)
    coarse_lin=None,            # precomputed coarse_occupancy volume:
                                # it only changes at grid-refresh
                                # boundaries but costs ~2.2 ms/step
                                # rebuilt in-graph, so the Trainer caches
                                # it per refresh interval
    probe_log: bool = False,    # geometric probe intervals (contracted/
                                # unbounded scenes; see _probe_grid)
    cdf_floor: float = 0.0,     # epsilon candidate weight over unoccupied
                                # probe intervals (see cdf_candidates)
):
    """Candidate -> mask -> compact marching. Returns dict with
    ts [N, K], deltas [N, K], mask [N, K] (valid samples)."""
    N = rays_o.shape[0]
    S, K = num_candidates, samples_per_ray

    if key is not None:
        jitter = jax.random.uniform(key, (N, 1))
    else:
        jitter = 0.5

    use_cdf = march_cdf and coarse_probes > 0
    if coarse_probes > 0:
        if coarse_lin is None:
            coarse_lin = coarse_occupancy(
                bitfield, grid_size, cascades,
                _coarse_dilate_radius(bound, grid_size, coarse_probes),
                bound=bound)
        if use_cdf:
            t_cand, dt = cdf_candidates(
                rays_o, rays_d, coarse_lin, nears, fars, bound, contract,
                grid_size, cascades, coarse_probes, S, jitter,
                dt_gamma=dt_gamma, max_steps=max_steps,
                log_spacing=probe_log, floor=cdf_floor)
        else:
            nears, fars = coarse_spans(
                rays_o, rays_d, coarse_lin, nears, fars, bound, contract,
                grid_size, cascades, coarse_probes,
                log_spacing=probe_log)

    span = (fars - nears)                                   # [N, 1]
    steps = jnp.arange(S, dtype=jnp.float32)[None, :]       # [1, S]
    if use_cdf:
        pass                                                # t_cand, dt set
    elif dt_gamma > 0.0:
        # adaptive step growth (raymarching.cu:396-401,412): dt grows as
        # clamp(t * dt_gamma, dt_min, dt_max). In closed form the
        # candidate times follow t_i ~= near * (1 + dt_gamma)^i once
        # t * gamma exceeds dt_min; we use the geometric schedule
        # normalized so candidate S-1 still lands at `far`.
        g = jnp.float32(dt_gamma)
        geo = (jnp.power(1.0 + g, steps + jitter) - 1.0) \
            / (jnp.power(1.0 + g, jnp.float32(S)) - 1.0)     # [N, S] in [0,1)
        t_cand = nears + span * geo
        t_next = nears + span * (
            (jnp.power(1.0 + g, steps + jitter + 1.0) - 1.0)
            / (jnp.power(1.0 + g, jnp.float32(S)) - 1.0))
        dt = t_next - t_cand                                 # [N, S]
    else:
        dt = span / S                                        # [N, 1]
        t_cand = nears + (steps + jitter) * dt               # [N, S]

    pos = rays_o[:, None, :] + rays_d[:, None, :] * t_cand[..., None]
    occ, _ = occupancy_lookup(bitfield, pos, jnp.broadcast_to(dt, (N, S)),
                              bound, contract, grid_size, cascades)
    occ = occ & (t_cand < fars)                             # guard padding

    if S == K:
        # candidates ARE the sample slots: no within-ray packing needed,
        # so the [N, K+1] compaction scatter (the march's second-largest
        # cost) disappears; dead candidates just mask out. With the
        # CDF candidate distribution the candidates already concentrate
        # inside coarse-occupied intervals, so slot waste stays low.
        ts = jnp.where(occ, t_cand, -1.0)
        if dt_gamma > 0.0:
            deltas = jnp.where(occ, jnp.broadcast_to(dt, (N, S)), 0.0)
        else:
            deltas = jnp.broadcast_to(dt, (N, K))
        return {"ts": ts, "deltas": deltas, "mask": occ}

    # stream compaction: slot of each occupied candidate within its ray.
    # The per-ray scan runs along the MAJOR axis in [S, N] form (minor-
    # axis cumsums scan within vector lanes, ~30x slower on TPU).
    slot = jnp.cumsum(occ.astype(jnp.int32).T, axis=0).T - 1  # [N, S]
    keep = occ & (slot < K)
    slot = jnp.where(keep, slot, K)                         # K = dump slot

    rows = jnp.broadcast_to(jnp.arange(N)[:, None], (N, S))
    # ONE sentinel-init scatter; mask derived (t >= near > 0 for every
    # real sample) — halves the compaction scatter cost
    # (tools/march_variants.py: 48.6 -> 22.6 ms at [8192, 512])
    ts = jnp.full((N, K + 1), -1.0, jnp.float32).at[rows, slot].set(
        jnp.where(keep, t_cand, -1.0), mode="drop")[:, :K]
    mask = ts >= 0.0

    if dt_gamma > 0.0:
        deltas = jnp.zeros((N, K + 1), jnp.float32).at[rows, slot].set(
            dt, mode="drop")[:, :K]
    else:
        deltas = jnp.broadcast_to(dt, (N, K))
    return {"ts": ts, "deltas": deltas, "mask": mask}


def compact_positions(mask, m_pad: int):
    """Stream compaction reduced to its minimal artifact: the flat SOURCE
    index of every kept sample.

    The reference's CUDA march writes exactly-counted CSR buffers via
    atomics (raymarching.cu:486-490); this is the static-shape equivalent,
    but instead of scattering every per-sample attribute column through
    the compaction, ONE int32 column — the flat source position — is
    scattered, and every downstream attribute is *gathered* from it
    (gathers run at ~4 ns/slice on XLA:TPU; each extra scatter column
    costs ~3 ms at M = 512k).

    The scatter uses the strided monotone scheme: kept sample number c
    (1-based) writes row 2c of a [2*m_pad + 2] buffer, dropped samples
    write odd rows — a genuinely NON-DECREASING unique index stream, the
    only scatter form XLA:TPU runs at ~1 ns/slice (dump-to-m_pad schemes
    interleave and violate sortedness).

    Returns (kept [N, K], inv [M], pos [m_pad]):
      kept: mask of the first m_pad valid samples;
      inv [M]: packed row per flat sample for the gather-expand
        (m_pad = dummy row for dropped samples);
      pos [m_pad]: flat source index per packed row, ASCENDING; unfilled
        rows hold the sentinel M.
    """
    flat = mask.reshape(-1)
    M = flat.shape[0]
    c = jnp.cumsum(flat.astype(jnp.int32))                # inclusive count
    kept = flat & (c <= m_pad)
    dest = jnp.where(kept, 2 * c,
                     jnp.minimum(2 * c + 1, 2 * m_pad + 1))
    inv = jnp.where(kept, c - 1, m_pad)
    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(), inserted_window_dims=(0,),
        scatter_dims_to_operand_dims=(0,))
    buf = jax.lax.scatter(
        jnp.full((2 * m_pad + 2,), M, jnp.int32), dest[:, None],
        jnp.arange(M, dtype=jnp.int32), dnums,
        indices_are_sorted=True, unique_indices=True)
    return kept.reshape(mask.shape), inv, buf[2::2]


def compact_positions_attrs(mask, m_pad: int, attrs):
    """:func:`compact_positions` fused with the flat attribute gathers
    that always follow it (``gather_flat_sorted(attr, pos)``).

    On TPU backends the whole block — the ~6 ms monotone compact scatter
    plus one ~1 ms gather per attribute — is ONE Pallas streaming pass
    (kernels/compact_pallas.py, the reference's two-pass atomic CSR
    compaction, raymarching.cu:338-491, re-done as a sequential-grid
    one-hot MXU placement). On CPU it falls back to the oracle path;
    both produce bit-identical (pos, attrs_c), so renders don't move.

    Returns (kept [N, K], inv [M], pos [m_pad], attrs_c list of [m_pad]).
    """
    from raw_ngp_tpu.kernels import compact_pallas as cpk
    flat = mask.reshape(-1)
    M = flat.shape[0]
    if cpk.use_pallas_compact() and M < (1 << 24):
        c = jnp.cumsum(flat.astype(jnp.int32))
        kept = flat & (c <= m_pad)
        inv = jnp.where(kept, c - 1, m_pad)
        keys = jnp.where(kept, c - 1, cpk._SENTINEL)
        pos, attrs_c = cpk.compact_attrs_pallas(
            jnp.stack([a.astype(jnp.float32) for a in attrs]),
            keys, c, m_pad)
        return (kept.reshape(mask.shape), inv, pos,
                [attrs_c[i] for i in range(len(attrs))])
    kept, inv, pos = compact_positions(mask, m_pad)
    return kept, inv, pos, [
        gather_flat_sorted(a.astype(jnp.float32), pos) for a in attrs]


def _vrow_expand(packed, inv):
    """``packed[inv]`` for a [R, D] buffer with small D, executed as
    128-float vrow gathers + lane selection.

    A [R, D] operand with D < 128 minor is tile-padded up to 32x by
    XLA:TPU and [1, D] gather slices from it fall off the fast path
    (60-800 ns/slice, CLAUDE.md layout rule). Viewing the buffer flat as
    [*, 128] vrows (128/Dp slots each, D zero-padded to a power-of-two
    Dp) makes each lookup one fast [1, 128] row gather (~4 ns); the
    slot's D floats are selected with a lane mask and a [128/Dp]-fold
    reduction — pure VPU work fused into the gather consumer."""
    R, D = packed.shape
    Dp = max(1 << (D - 1).bit_length(), 4)          # pow2 slot width >= 4
    spv = 128 // Dp                                  # slots per vrow
    shift = spv.bit_length() - 1
    M = inv.shape[0]
    pad_rows = (-R) % spv
    buf = packed
    if Dp != D:
        buf = jnp.concatenate(
            [buf, jnp.zeros((R, Dp - D), buf.dtype)], axis=1)
    if pad_rows:
        buf = jnp.concatenate(
            [buf, jnp.zeros((pad_rows, Dp), buf.dtype)], axis=0)
    vrows = buf.reshape(-1, 128)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,))
    rows = jax.lax.gather(vrows, (inv >> shift)[:, None], dn, (1, 128),
                          mode=jax.lax.GatherScatterMode.CLIP)  # [M, 128]
    slot = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) >> \
        (Dp.bit_length() - 1)                        # lane -> slot id
    sel = (slot == (inv & (spv - 1))[:, None]).astype(rows.dtype)
    out = (rows * sel).reshape(M, spv, Dp).sum(axis=1)
    return out[:, :D]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def expand_from_slots(packed, inv, pos, m_pad: int):
    """Expand a packed [m_pad + 1, D] buffer back to flat samples via
    ``inv`` [M] (m_pad = dummy row).

    Forward rides vrow gathers (see _vrow_expand). The default autodiff
    transpose of this gather is a scatter-ADD at ``inv`` (~42 ns/slice on
    TPU). Each real slot appears in ``inv`` exactly once at flat position
    ``pos`` (compact_positions), so the true gradient is a permutation —
    computed as a vrow GATHER of the cotangent rows at ``pos`` (~1 ms at
    m_pad = 256k, vs ~3 ms per scatter column). Unfilled rows
    (pos == M) and the dummy row get zero — callers append the dummy row
    as a constant, so its cotangent is discarded anyway.
    """
    return _vrow_expand(packed, inv)


def _expand_fwd(packed, inv, pos, m_pad):
    return _vrow_expand(packed, inv), (inv, pos, packed.shape)


def _expand_bwd(m_pad, res, g):
    inv, pos, packed_shape = res
    M = inv.shape[0]
    g2 = g.reshape(M, -1)
    rows = _vrow_expand(g2, jnp.minimum(pos, M - 1))      # [m_pad, D]
    rows = jnp.where((pos < M)[:, None], rows, 0)
    g_packed = jnp.concatenate(
        [rows, jnp.zeros((1, g2.shape[1]), g2.dtype)], axis=0)
    return g_packed.reshape(packed_shape), None, None


expand_from_slots.defvjp(_expand_fwd, _expand_bwd)


def _gather_flat_impl(values, pos):
    M = values.shape[0]
    v = values[jnp.minimum(pos, M - 1)]
    return jnp.where(pos < M, v, 0)


@jax.custom_vjp
def gather_flat_sorted(values, pos):
    """``values[pos]`` for a flat [M] array at ASCENDING UNIQUE positions
    [m_pad] (sentinel M for unfilled rows -> 0).

    The default gather transpose is a scatter-ADD (no sortedness promise
    -> the slow XLA:TPU path). ``pos`` is strictly ascending and unique
    over the filled prefix, so the true transpose is a monotone
    sorted-unique scatter-SET: unfilled rows are remapped to M + i
    (still strictly ascending) and land past the real range."""
    return _gather_flat_impl(values, pos)


def _gather_flat_fwd(values, pos):
    return _gather_flat_impl(values, pos), (pos, values.shape[0])


def _gather_flat_bwd(res, g):
    pos, M = res
    m_pad = pos.shape[0]
    dest = jnp.where(pos < M, pos,
                     M + jnp.arange(m_pad, dtype=pos.dtype))
    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(), inserted_window_dims=(0,),
        scatter_dims_to_operand_dims=(0,))
    buf = jax.lax.scatter(
        jnp.zeros((M + m_pad,), g.dtype), dest[:, None], g, dnums,
        indices_are_sorted=True, unique_indices=True)
    return buf[:M], None


gather_flat_sorted.defvjp(_gather_flat_fwd, _gather_flat_bwd)


@jax.custom_vjp
def gather_ray_rows(buf, rid):
    """``buf[rid]`` for a per-ray attribute buffer [N + 1, D] (last row =
    sanitized dummy) indexed by an ASCENDING ray-id stream [m] (dropped
    slots point at row N).

    Forward rides the 128-float vrow gathers of :func:`_vrow_expand`.
    The default autodiff transpose would be a scatter-ADD at duplicate
    ray ids (the slow XLA:TPU path); because ``rid`` is non-decreasing
    (compaction preserves ray-major sample order), the true gradient —
    per-ray totals over each ray's samples — is a sorted segment sum,
    computed with the same shift-mask scan + monotone scatter-SET engine
    as the hash-table gradient."""
    return _vrow_expand(buf, rid)


def _gather_rows_fwd(buf, rid):
    return _vrow_expand(buf, rid), (rid, buf.shape)


def _gather_rows_bwd(res, g):
    from raw_ngp_tpu.kernels.hash_fused import _segment_sum_sorted_scatter
    rid, buf_shape = res
    gf = g.astype(jnp.float32)
    chans = [gf[:, d] for d in range(gf.shape[1])]
    totals = _segment_sum_sorted_scatter(rid, chans, buf_shape[0])
    return totals.astype(g.dtype), None


gather_ray_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


def render_occupancy(
    params,
    spec: FieldSpec,
    rays_o, rays_d,            # [N, 3]
    aabb,                      # [6]
    bitfield,                  # [CAS * H^3 / 8] uint8
    key=None,
    bg_color=0.0,
    cam_near_far=None,
    rays_ldir=None,
    annealing=1.0,
    training: bool = False,
    compute_normals: bool = False,
    coarse_lin=None,
) -> Dict[str, jnp.ndarray]:
    """Full occupancy-path render (reference run_cuda,
    renderer.py:515-676), one static-shape program for train AND inference
    (the reference's alive-ray host loop, renderer.py:583-616, is subsumed
    by the masked composite)."""
    cfg = spec.cfg
    N = rays_o.shape[0]
    K = cfg.render.samples_per_ray
    S = cfg.render.march_candidates

    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb,
                                     cfg.render.min_near)
    if cam_near_far is not None:
        nears = jnp.maximum(nears, cam_near_far[:, :1])
        fars = jnp.minimum(fars, cam_near_far[:, 1:])
    miss = fars >= 1e8
    nears = jnp.where(miss, 1.0, nears)
    fars = jnp.where(miss, 1.001, fars)

    m = march_rays(rays_o, rays_d, bitfield, nears, fars,
                   cfg.render.bound, cfg.render.contract,
                   cfg.render.grid_size, cfg.cascades, S, K, key=key,
                   dt_gamma=cfg.render.dt_gamma,
                   coarse_probes=cfg.render.coarse_probes,
                   march_cdf=cfg.render.march_cdf,
                   max_steps=cfg.render.max_steps,
                   coarse_lin=coarse_lin,
                   probe_log=cfg.render.probe_log,
                   cdf_floor=cfg.render.cdf_floor)
    ts, deltas, mask = m["ts"], m["deltas"], m["mask"]
    mask = mask & ~miss

    # sample positions are recomputed from (ray id, t) AFTER compaction
    # (pose gradients flow through the gathered o/d rows -> rays; the
    # reference needs segment_csr for this, raymarching.py:319-329); the
    # full [N, K, 3] position tensor is only materialized where a
    # consumer needs every candidate (orientation loss, no-compact path)
    ratio = cfg.render.compact_ratio
    need_full_xyzs = (ratio <= 0) or (
        training and cfg.train.lambda_orientation > 0)
    xyzs = None
    if need_full_xyzs:
        xyzs = rays_o[:, None, :] + rays_d[:, None, :] * ts[..., None]
        xyzs = jnp.clip(xyzs, -cfg.render.bound, cfg.render.bound)
        if cfg.render.contract:
            from raw_ngp_tpu.ops.contraction import contract as contract_fn
            xyzs = contract_fn(xyzs)

    # lazy broadcasts (only materialized by the consumers that read them:
    # the no-compact path and the orientation loss)
    dirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    dirs_nk = jnp.broadcast_to(dirs[:, None, :], (N, K, 3))
    raw_pts = None    # pre-decimation live-sample DEMAND (ratio > 0 only)
    ld_nk = None
    if rays_ldir is not None:
        ld_nk = jnp.broadcast_to(rays_ldir[:, None, :], (N, K, 3))
    if ratio > 0:
        # evaluate the field only on the packed valid samples — the static
        # equivalent of the reference's exact CSR compaction + 2^18-point
        # budget (adaptive_num_rays, train_utils.py:563-564). The budget
        # is anchored to the BASE cfg.train.num_rays so that adaptive ray
        # growth (Trainer._maybe_grow_num_rays) raises throughput at a
        # CONSTANT field-evaluation cost per step; smaller eval chunks
        # keep their proportional budget; cfg.render.point_budget (set by
        # the Trainer's budget-shrink adaptation) overrides outright.
        if cfg.render.point_budget is not None and training:
            m_pad = max(cfg.render.point_budget // 128 * 128, 128)
        else:
            m_pad = max(int(min(N, cfg.train.num_rays) * K * ratio)
                        // 128 * 128, 128)
        # over-budget steps decimate samples UNIFORMLY along each ray and
        # scale dt by the stride (coarser but consistent transmittance —
        # the reference instead shrinks next step's ray count); tail
        # truncation only remains as a backstop for rounding overflow
        valid_total = mask.sum()
        raw_pts = valid_total    # pre-decimation DEMAND (see num_points_raw)
        stride = jnp.maximum((valid_total + m_pad - 1) // m_pad, 1)
        k_idx = jnp.cumsum(mask.astype(jnp.int32).T, axis=0).T - 1
        mask = mask & ((k_idx % stride) == 0)
        deltas = deltas * stride.astype(deltas.dtype)
        # compact ONE int32 column — the flat source position — and
        # gather everything else from it: t from the [N, K] grid
        # (gather_flat_sorted keeps the transpose on the fast scatter-SET
        # path for the pose-gradient case), ray id derived as pos // K,
        # and o/d/ldir from one per-ray attribute row fetched by ray id
        # (o + d*t is the identical fma the full tensor would run, so
        # renders match bit-for-bit); dirs/ldir are per-ray broadcasts
        # that never needed per-sample compaction at all
        import os as _os
        compact_composite = _os.environ.get(
            "RAW_NGP_COMPACT_COMPOSITE", "1") == "1"   # A/B escape hatch
        use_cc = compact_composite and not (need_full_xyzs or
                                            compute_normals)
        # t (and, on the compact-composite path, dt) ride the compaction
        # as fused payload words: on TPU one Pallas streaming pass
        # (kernels/compact_pallas.py) replaces the ~6 ms monotone compact
        # scatter plus every per-attribute flat gather
        attrs = [ts.reshape(-1)]
        if use_cc:
            attrs.append(jnp.broadcast_to(deltas, (N, K)).reshape(-1))
        mask, inv, pos, attrs_c = compact_positions_attrs(mask, m_pad,
                                                          attrs)
        t_c = attrs_c[0]                                 # [m_pad]
        M = N * K
        # unfilled slots (sentinel pos == M) point at the sanitized dummy
        # ray row N: origin 0, unit-z direction — a zero direction NaNs
        # the SH normalization and 0*NaN poisons the backward. The
        # sentinel also keeps `rid` ASCENDING end to end, the contract
        # gather_ray_rows' segment-sum backward relies on.
        filled = pos < M
        rid = jnp.where(filled, jnp.minimum(pos, M - 1) // K, N)
        ez = jnp.array([0.0, 0.0, 1.0], rays_d.dtype)
        cols = [jnp.concatenate([rays_o, jnp.zeros((1, 3), rays_o.dtype)]),
                jnp.concatenate([rays_d, ez[None]])]
        if rays_ldir is not None:
            cols.append(jnp.concatenate([rays_ldir, ez[None]]))
        odl = gather_ray_rows(jnp.concatenate(cols, axis=1), rid)
        o_c, d_c = odl[:, :3], odl[:, 3:6]
        xyz_c = o_c + d_c * t_c[:, None]
        xyz_c = jnp.clip(xyz_c, -cfg.render.bound, cfg.render.bound)
        if cfg.render.contract:
            from raw_ngp_tpu.ops.contraction import contract as contract_fn
            xyz_c = contract_fn(xyz_c)
        dnorm = jnp.linalg.norm(d_c, axis=-1, keepdims=True)
        dirs_c = jnp.where(dnorm > 1e-8, d_c / dnorm, ez)
        ld_c = None
        if rays_ldir is not None:
            l_c = odl[:, 6:9]
            lnorm = jnp.linalg.norm(l_c, axis=-1, keepdims=True)
            ld_c = jnp.where(lnorm > 1e-8, l_c, ez)   # zero-guard only
        sig_c, rgb_c = field_forward(params, spec, xyz_c, dirs_c, ld_c,
                                     annealing)
        if use_cc:
            # composite DIRECTLY on the compacted ray-major stream
            # (ops/compositing.composite_rays_compacted): the expand
            # gathers, their transpose, and the [N, K] composite math on
            # dead lanes all disappear. Only consumers of per-sample
            # [N, K] weights (orientation loss, normal maps) still take
            # the expand path below.
            from raw_ngp_tpu.ops.compositing import composite_rays_compacted
            dt_c = attrs_c[1]
            counts = mask.sum(axis=-1)
            out = composite_rays_compacted(
                sig_c, rgb_c, t_c, dt_c, rid, filled, counts, N,
                t_thresh=cfg.render.t_thresh)
            results = {}
            if training:
                results["num_points"] = mask.sum()
                results["num_points_raw"] = raw_pts
            image = composite_with_background(
                out["image"], out["weights_sum"], bg_color)
            results["weights_sum"] = out["weights_sum"]
            results["depth"] = out["depth"]
            results["image"] = image
            return results
        # expand back (dummy row feeds dropped/invalid lanes); the custom
        # VJP keeps the transpose on the fast sorted-scatter path
        sig_rgb = jnp.concatenate([sig_c[:, None], rgb_c], axis=-1)
        padded = jnp.concatenate(
            [sig_rgb, jnp.zeros((1, 4), sig_rgb.dtype)], axis=0)
        out_flat = expand_from_slots(padded, inv, pos, m_pad)
        sigmas = out_flat[:, 0].reshape(N, K)
        rgbs = out_flat[:, 1:].reshape(N, K, 3)
    else:
        sigmas, rgbs = field_forward(params, spec, xyzs.reshape(-1, 3),
                                     dirs_nk.reshape(-1, 3),
                                     ld_nk.reshape(-1, 3)
                                     if ld_nk is not None else None,
                                     annealing)
        sigmas = sigmas.reshape(N, K)
        rgbs = rgbs.reshape(N, K, 3)

    out = composite_rays(sigmas, rgbs, ts, deltas, mask,
                         t_thresh=cfg.render.t_thresh)

    results: Dict[str, jnp.ndarray] = {}
    if training:
        results["num_points"] = mask.sum()
        # num_points counts EVALUATED samples (post budget decimation /
        # compaction truncation) and is therefore clamped at the point
        # budget; num_points_raw is the unclamped DEMAND the march
        # produced, which the Trainer's adaptive batching must see to
        # track the falling-occupancy trend through the saturated zone
        # (a budget-pinned EMA looks flat and quiescent while the grid
        # is still pruning — round-5 sparse-scene bench finding)
        results["num_points_raw"] = (raw_pts if raw_pts is not None
                                     else results["num_points"])
        results["weights"] = out["weights"]
        if cfg.train.lambda_orientation > 0:
            # Ref-NeRF orientation loss (renderer.py:558-571)
            from raw_ngp_tpu.models.ngp import field_density

            def sigma_sum(pts):
                return field_density(params, spec, pts, annealing).sum()

            g = jax.grad(sigma_sum)(
                jax.lax.stop_gradient(xyzs.reshape(-1, 3)))
            normals = -g / (jnp.linalg.norm(g, axis=-1, keepdims=True)
                            + 1e-9)
            normals = (normals + 1.0) / 2.0
            n_dot_v = (normals
                       * -dirs_nk.reshape(-1, 3)).sum(-1).reshape(N, K)
            results["orientation_loss"] = jnp.mean(
                (out["weights"] * jnp.minimum(0.0, n_dot_v) ** 2).sum(-1))

    if compute_normals:
        # inference normal-map pass (renderer.py:618-670): the reference
        # re-marches the same rays and composites
        # -normalize(grad sigma) with a second composite_rays; our march
        # is deterministic so the weights of the SAME samples are reused
        # (identical sigmas => identical composite weights)
        from raw_ngp_tpu.models.ngp import field_normals
        if ratio > 0:
            n_c = field_normals(params, spec, xyz_c, annealing)
            n_pad = jnp.concatenate(
                [n_c, jnp.zeros((1, 3), n_c.dtype)], axis=0)
            normals_nk = expand_from_slots(
                n_pad, inv, pos, m_pad).reshape(N, K, 3)
        else:
            normals_nk = field_normals(
                params, spec, xyzs.reshape(-1, 3), annealing
            ).reshape(N, K, 3)
        nm = (out["weights"][..., None]
              * normals_nk.astype(jnp.float32)).sum(axis=1)
        results["normals"] = composite_with_background(
            nm, out["weights_sum"], bg_color)

    image = composite_with_background(out["image"], out["weights_sum"],
                                      bg_color)
    results["weights_sum"] = out["weights_sum"]
    results["depth"] = out["depth"]
    results["image"] = image
    return results
