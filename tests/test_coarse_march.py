"""Two-level march (coarse span tightening, render/occupancy.py
coarse_spans): the static-shape analogue of the reference's DDA
empty-space skipping (raymarching.cu:446-460).

Safety contract tested here: the tightened span is CONSERVATIVE — every
sample the full-span fine march keeps lies inside the tightened
[near2, far2]; rays through empty space collapse to a zero span; spans
never exceed the original [near, far].
"""

from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raw_ngp_tpu.ops.grid import packbits
from raw_ngp_tpu.ops.morton import morton3d
from raw_ngp_tpu.render.occupancy import (
    _coarse_dilate_radius,
    coarse_occupancy,
    coarse_spans,
    march_rays,
)


def _random_bitfield(key, grid_size=32, cascades=2, p=0.02):
    """Sparse random occupancy (Morton order, like packbits output)."""
    dens = (jax.random.uniform(key, (cascades, grid_size ** 3))
            < p).astype(jnp.float32) * 100.0
    return packbits(dens, 1.0), dens


def _rand_rays(key, n, bound):
    ko, kd = jax.random.split(key)
    o = jax.random.uniform(ko, (n, 3), minval=-0.9 * bound,
                           maxval=0.9 * bound)
    d = jax.random.normal(kd, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


@pytest.mark.parametrize("bound,cascades", [(1.0, 1), (2.0, 2)])
def test_coarse_span_is_conservative(bound, cascades):
    gs, n_probes = 32, 64
    key = jax.random.PRNGKey(0)
    bitfield, _ = _random_bitfield(jax.random.fold_in(key, 1),
                                   grid_size=gs, cascades=cascades)
    N = 256
    ro, rd = _rand_rays(jax.random.fold_in(key, 2), N, bound)
    nears = jnp.full((N, 1), 0.05)
    fars = jnp.full((N, 1), 2.0 * np.sqrt(3.0) * bound)

    # full-span fine march (no coarse): the ground truth sample set
    m_full = march_rays(ro, rd, bitfield, nears, fars, bound, False, gs,
                        cascades, 512, 128)
    ts = np.asarray(m_full["ts"])
    mask = np.asarray(m_full["mask"])

    r = _coarse_dilate_radius(bound, gs, n_probes)
    coarse = coarse_occupancy(bitfield, gs, cascades, r, bound=bound)
    near2, far2 = coarse_spans(ro, rd, coarse, nears, fars, bound, False,
                               gs, cascades, n_probes)
    near2, far2 = np.asarray(near2), np.asarray(far2)

    # spans never widen
    assert (near2 >= np.asarray(nears) - 1e-6).all()
    assert (far2 <= np.asarray(fars) + 1e-6).all()
    # every occupied fine sample lies inside the tightened span (allow the
    # fine candidate half-spacing as numeric slop)
    slop = float(fars[0, 0] - nears[0, 0]) / 512
    kept_in = ((ts >= near2 - slop) & (ts <= far2 + slop)) | ~mask
    assert kept_in.all(), (
        f"{(~kept_in).sum()} occupied samples escaped the span")


def test_empty_scene_collapses_spans():
    gs, cascades, bound = 32, 1, 1.0
    bitfield = packbits(jnp.zeros((cascades, gs ** 3), jnp.float32), 1.0)
    N = 32
    ro, rd = _rand_rays(jax.random.PRNGKey(3), N, bound)
    nears = jnp.full((N, 1), 0.05)
    fars = jnp.full((N, 1), 3.4)
    coarse = coarse_occupancy(bitfield, gs, cascades, 1, bound=bound)
    near2, far2 = coarse_spans(ro, rd, coarse, nears, fars, bound, False,
                               gs, cascades, 64)
    np.testing.assert_allclose(np.asarray(near2), np.asarray(fars))
    np.testing.assert_allclose(np.asarray(far2), np.asarray(fars))
    # fine march over the collapsed span keeps nothing
    m = march_rays(ro, rd, bitfield, near2, far2, bound, False, gs,
                   cascades, 128, 32, coarse_probes=0)
    assert not bool(np.asarray(m["mask"]).any())


def test_march_with_coarse_keeps_same_occupied_cells():
    """March WITH the coarse pre-pass must still find occupied content:
    on a single-slab scene every kept sample's cell is occupied, and rays
    crossing the slab keep at least one sample (denser than without)."""
    gs, bound = 32, 1.0
    dens = np.zeros((1, gs ** 3), np.float32)
    # slab x in [0, 0.25) -> cells x=16..19, all y, z
    for x in range(16, 20):
        for y in range(gs):
            codes = np.asarray(morton3d(jnp.stack(
                [jnp.full((gs,), x), jnp.full((gs,), y),
                 jnp.arange(gs)], axis=-1).astype(jnp.int32)))
            dens[0, codes] = 100.0
    bitfield = packbits(jnp.asarray(dens), 1.0)

    N = 64
    ro = jnp.stack([jnp.full((N,), -0.9),
                    jnp.linspace(-0.8, 0.8, N),
                    jnp.linspace(0.8, -0.8, N)], axis=-1)
    rd = jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (N, 1))
    nears = jnp.full((N, 1), 0.05)
    fars = jnp.full((N, 1), 2.5)

    m = march_rays(ro, rd, bitfield, nears, fars, bound, False, gs, 1,
                   128, 32, coarse_probes=64)
    ts = np.asarray(m["ts"])
    mask = np.asarray(m["mask"])
    assert mask.any(axis=1).all()          # every ray crosses the slab
    # kept samples hit the slab x-range (within one fine cell of slop)
    xs = np.asarray(ro)[:, :1] + ts * 1.0  # rd = +x
    cell = 2.0 / gs
    assert ((xs[mask] >= 0.0 - cell) & (xs[mask] <= 0.25 + cell)).all()
    # span tightening concentrates samples: at least as many slab hits as
    # the full-span march at the same candidate count
    m0 = march_rays(ro, rd, bitfield, nears, fars, bound, False, gs, 1,
                    128, 32, coarse_probes=0)
    assert (np.asarray(m["mask"]).sum()
            >= np.asarray(m0["mask"]).sum())


def test_dilate_radius_scales_with_bound():
    assert _coarse_dilate_radius(1.0, 128, 64) == 1
    assert _coarse_dilate_radius(2.0, 128, 64) == 1
    assert _coarse_dilate_radius(2.0, 128, 16) >= 2


def test_cascade0_shell_content_not_dropped():
    """Regression (round-3 review, CONFIRMED repro): with a mip gate on
    the probe position, rays grazing the |x|_inf = 1 shell had every
    probe land at mag > 1 (mip 1) and never tested cascade 0 — occupied
    cascade-0 content at the shell got its span collapsed to empty and
    rendered black. Spans must keep every fine sample regardless of
    where the probes sit relative to the unit cube."""
    gs, cascades, bound, n_probes = 32, 2, 2.0, 64
    # one occupied cascade-0 cell hugging the unit-cube corner
    cell = np.asarray(morton3d(jnp.asarray([[31, 31, 16]],
                                           dtype=jnp.int32)))[0]
    dens = np.zeros((cascades, gs ** 3), np.float32)
    dens[0, cell] = 100.0                       # cascade 1 stays EMPTY
    bitfield = packbits(jnp.asarray(dens), 1.0)

    # rays that dip inside the unit cube for less than one probe spacing
    N = 27
    ro = jnp.stack([jnp.full((N,), -2.0),
                    jnp.linspace(0.93, 0.999, N),
                    jnp.full((N,), 0.02)], axis=-1)
    rd = jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (N, 1))
    nears = jnp.full((N, 1), 0.05)
    fars = jnp.full((N, 1), 2.0 * np.sqrt(3.0) * bound)

    m_full = march_rays(ro, rd, bitfield, nears, fars, bound, False, gs,
                        cascades, 512, 128, coarse_probes=0)
    m_coarse = march_rays(ro, rd, bitfield, nears, fars, bound, False,
                          gs, cascades, 512, 128, coarse_probes=n_probes)
    full_hits = np.asarray(m_full["mask"]).any(axis=1)
    coarse_hits = np.asarray(m_coarse["mask"]).any(axis=1)
    assert full_hits.any()                       # geometry is visible
    # every ray the full-span march finds content on must also find
    # content with the coarse pre-pass
    np.testing.assert_array_equal(coarse_hits[full_hits],
                                  np.ones(full_hits.sum(), bool))


def _two_slab_scene(gs=32):
    """Two occupied slabs separated by a void: x in [0, 0.25) and
    x in [0.625, 0.75)."""
    dens = np.zeros((1, gs ** 3), np.float32)
    for x in list(range(16, 20)) + list(range(26, 28)):
        for y in range(gs):
            codes = np.asarray(morton3d(jnp.stack(
                [jnp.full((gs,), x), jnp.full((gs,), y),
                 jnp.arange(gs)], axis=-1).astype(jnp.int32)))
            dens[0, codes] = 100.0
    return packbits(jnp.asarray(dens), 1.0)


def test_cdf_candidates_land_only_in_occupied_intervals():
    """march_cdf: every fine-kept sample's probe interval is occupied in
    the dilated coarse grid, BOTH slabs are sampled, and the candidate
    density inside the slabs beats the span march (which wastes
    candidates on the void between the slabs)."""
    gs, bound, P, S, K = 32, 1.0, 32, 128, 64
    bitfield = _two_slab_scene(gs)
    N = 64
    ro = jnp.stack([jnp.full((N,), -0.9),
                    jnp.linspace(-0.7, 0.7, N),
                    jnp.linspace(0.7, -0.7, N)], axis=-1)
    rd = jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (N, 1))
    nears = jnp.full((N, 1), 0.05)
    fars = jnp.full((N, 1), 2.5)

    from raw_ngp_tpu.render.occupancy import (
        cdf_candidates, coarse_occupancy, _coarse_dilate_radius)
    r = _coarse_dilate_radius(bound, gs, P)
    coarse = coarse_occupancy(bitfield, gs, 1, r, bound=bound)
    t_cand, dt = cdf_candidates(ro, rd, coarse, nears, fars, bound,
                                False, gs, 1, P, S, 0.5)
    t_cand, dt = np.asarray(t_cand), np.asarray(dt)

    # recompute the dilated probe occupancy the same way for the oracle
    from raw_ngp_tpu.render.occupancy import _probe_occupancy
    occ, t_probe, spacing = _probe_occupancy(
        ro, rd, coarse, nears, fars, bound, False, gs, 1, P)
    occ, spacing = np.asarray(occ), np.asarray(spacing)
    nears_n, fars_n = np.asarray(nears), np.asarray(fars)

    live = t_cand < fars_n - 1e-6
    p_of = np.clip(((t_cand - nears_n) / spacing).astype(int), 0, P - 1)
    hit_occ = np.take_along_axis(occ, p_of, axis=1)
    assert hit_occ[live].all(), "CDF candidate outside an occupied interval"

    # both slabs sampled on every ray: candidates near slab A and slab B
    xs = np.asarray(ro)[:, :1] + t_cand  # rd = +x
    in_a = ((xs >= -0.1) & (xs <= 0.35) & live).any(axis=1)
    in_b = ((xs >= 0.55) & (xs <= 0.85) & live).any(axis=1)
    assert in_a.all() and in_b.all()

    # dt accounts only for occupied length: strictly tighter than the
    # span march step over [tin-sp, tout+sp] (which includes the void)
    w = occ.sum(axis=1, keepdims=True)
    np.testing.assert_allclose(dt, spacing * w / S, rtol=1e-5)


def test_cdf_composes_with_dt_gamma():
    """VERDICT r3 #6: the CDF march must compose with the growing-dt
    schedule the way the reference composes DDA skipping with
    dt = clamp(t*gamma, dt_min, dt_max) (raymarching.cu:396-401 +
    :468-480): candidates land ONLY in occupied probe intervals AND
    their density inside those intervals follows the geometric schedule
    (count per interval proportional to spacing/clamp(t*gamma, ...))."""
    gs, bound, P, S = 32, 1.0, 32, 128
    gamma = 0.02        # keeps t*gamma inside (dt_min, dt_max) everywhere
    bitfield = _two_slab_scene(gs)
    N = 48
    ro = jnp.stack([jnp.full((N,), -0.9),
                    jnp.linspace(-0.6, 0.6, N),
                    jnp.linspace(0.6, -0.6, N)], axis=-1)
    rd = jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (N, 1))
    nears = jnp.full((N, 1), 0.05)
    fars = jnp.full((N, 1), 2.5)

    from raw_ngp_tpu.render.occupancy import (
        cdf_candidates, coarse_occupancy, _coarse_dilate_radius,
        _probe_occupancy)
    r = _coarse_dilate_radius(bound, gs, P)
    coarse = coarse_occupancy(bitfield, gs, 1, r, bound=bound)
    t_cand, dt = cdf_candidates(ro, rd, coarse, nears, fars, bound,
                                False, gs, 1, P, S, 0.5, dt_gamma=gamma)
    t_cand, dt = np.asarray(t_cand), np.asarray(dt)
    assert dt.shape == (N, S)           # per-candidate widths now

    occ, t_probe, spacing = _probe_occupancy(
        ro, rd, coarse, nears, fars, bound, False, gs, 1, P)
    occ, t_probe = np.asarray(occ), np.asarray(t_probe)
    spacing = np.asarray(spacing)
    nears_n, fars_n = np.asarray(nears), np.asarray(fars)

    live = t_cand < fars_n - 1e-6
    p_of = np.clip(((t_cand - nears_n) / spacing).astype(int), 0, P - 1)
    hit_occ = np.take_along_axis(occ, p_of, axis=1)
    assert hit_occ[live].all(), "candidate outside an occupied interval"

    # expected per-probe candidate count: S * w_p / W with
    # w_p = occ * spacing / clamp(t_p * gamma, dt_min, dt_max)
    sqrt3 = np.sqrt(3.0)
    dt_min, dt_max = 2 * sqrt3 / 1024, 2 * sqrt3 / gs
    dt_ref = np.clip(t_probe * gamma, dt_min, dt_max)      # [N, P]
    wv = np.where(occ, spacing / dt_ref, 0.0)
    W = wv.sum(axis=1, keepdims=True)
    expected = S * wv / W                                   # [N, P]
    counts = np.zeros((N, P))
    for p in range(P):
        counts[:, p] = ((p_of == p) & live).sum(axis=1)
    # integer allocation of a fractional target: off by at most 1+slack
    np.testing.assert_allclose(counts, expected, atol=1.5)

    # per-candidate width equals the local reference dt scaled by W/S
    dt_expect = np.take_along_axis(dt_ref, p_of, axis=1) * W / S
    np.testing.assert_allclose(dt[live], dt_expect[live], rtol=1e-4)

    # the point of dt_gamma: near candidates are denser (smaller widths)
    # than far ones — mean width among the near slab's candidates is
    # smaller than among the far slab's by ~t_near/t_far
    near_c = live & (t_cand < 1.25)
    far_c = live & (t_cand > 1.4)
    assert near_c.any() and far_c.any()
    assert dt[near_c].mean() < 0.8 * dt[far_c].mean()


def test_march_cdf_active_under_dt_gamma():
    """use_cdf no longer requires dt_gamma == 0 (render/occupancy.py):
    with march_cdf + probes + dt_gamma the march skips the void between
    slabs (a span march spends candidates there) and returns growing
    per-sample deltas."""
    from raw_ngp_tpu.render.occupancy import march_rays as _march
    gs, bound = 32, 1.0
    bitfield = _two_slab_scene(gs)
    N = 16
    ro = jnp.stack([jnp.full((N,), -0.9),
                    jnp.linspace(-0.3, 0.3, N),
                    jnp.zeros((N,))], axis=-1)
    rd = jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (N, 1))
    nears = jnp.full((N, 1), 0.05)
    fars = jnp.full((N, 1), 2.5)

    m = _march(ro, rd, bitfield, nears, fars, bound, False, gs, 1,
               64, 64, dt_gamma=0.05, coarse_probes=32, march_cdf=True)
    ts = np.asarray(m["ts"])
    mask = np.asarray(m["mask"])
    deltas = np.asarray(m["deltas"])
    assert mask.any(axis=1).all()
    # no kept sample in the void between the slabs (x in (0.4, 0.55))
    xs = np.asarray(ro)[:, :1] + ts
    in_void = (xs > 0.42) & (xs < 0.52) & mask
    assert not in_void.any()
    # deltas grow with t among kept samples of one ray (clamps aside)
    row = mask[0]
    d0 = deltas[0][row]
    t0 = ts[0][row]
    order = np.argsort(t0)
    assert d0[order][-1] >= d0[order][0]


def test_cdf_march_matches_span_march_render():
    """End-to-end render equivalence at saturating candidate counts: the
    CDF march and the span march integrate the same field, so weights_sum
    and depth agree closely on a solid-slab scene."""
    from dataclasses import replace as _replace
    from raw_ngp_tpu.render.occupancy import march_rays as _march
    gs, bound = 32, 1.0
    bitfield = _two_slab_scene(gs)
    N = 32
    ro = jnp.stack([jnp.full((N,), -0.9),
                    jnp.linspace(-0.5, 0.5, N),
                    jnp.zeros((N,))], axis=-1)
    rd = jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (N, 1))
    nears = jnp.full((N, 1), 0.05)
    fars = jnp.full((N, 1), 2.5)

    m_cdf = _march(ro, rd, bitfield, nears, fars, bound, False, gs, 1,
                   256, 128, coarse_probes=32, march_cdf=True)
    m_span = _march(ro, rd, bitfield, nears, fars, bound, False, gs, 1,
                    256, 128, coarse_probes=32, march_cdf=False)

    def integrate(m, sigma=8.0):
        # constant-density composite: weights_sum = 1 - exp(-sigma * L)
        dt = np.asarray(m["deltas"])
        mask = np.asarray(m["mask"])
        return (dt * mask).sum(axis=1) * sigma

    tau_cdf = integrate(m_cdf)
    tau_span = integrate(m_span)
    # occupied path length through both slabs is ~0.375 per ray;
    # the two marches must agree on it within a few fine steps
    np.testing.assert_allclose(tau_cdf, tau_span, rtol=0.12)
    assert (tau_cdf > 0).all()


def test_outer_cascade_content_seen_by_inner_probes():
    """Union-fold regression (round-3c): cascade-1 content just OUTSIDE
    the unit cube must stay detectable by probes sitting INSIDE the cube
    (which index cascade 0 after the single-gather rewrite). The fold
    resamples c1 into c0 coords with out-of-extent cells clamped to the
    edge cells, mirroring the old clamped-index behavior."""
    gs, cascades, bound, n_probes = 32, 2, 2.0, 64
    # one occupied cascade-1 cell just outside the +x face of the cube:
    # c1 covers [-2, 2] with 32 fine... coarse hc cells handled inside
    # coarse_occupancy; here we occupy FINE cells so packbits is real.
    # fine cascade-1 cell x index for x ~ 1.06: n = (1.06/2+1)/2*32 = 24.5
    cell = np.asarray(morton3d(jnp.asarray([[24, 16, 16]],
                                           dtype=jnp.int32)))[0]
    dens = np.zeros((cascades, gs ** 3), np.float32)
    dens[1, cell] = 100.0                       # cascade 0 stays EMPTY
    bitfield = packbits(jnp.asarray(dens), 1.0)

    # rays along +x through the cube center: every probe inside the cube
    # indexes cascade 0; the occupied sample sits just past the +x face
    N = 9
    ro = jnp.stack([jnp.full((N,), -1.8),
                    jnp.linspace(0.02, 0.12, N),
                    jnp.full((N,), 0.04)], axis=-1)
    rd = jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (N, 1))
    nears = jnp.full((N, 1), 0.05)
    fars = jnp.full((N, 1), 2.0 * np.sqrt(3.0) * bound)

    m_full = march_rays(ro, rd, bitfield, nears, fars, bound, False, gs,
                        cascades, 512, 128, coarse_probes=0)
    m_coarse = march_rays(ro, rd, bitfield, nears, fars, bound, False,
                          gs, cascades, 512, 128, coarse_probes=n_probes)
    full_hits = np.asarray(m_full["mask"]).any(axis=1)
    coarse_hits = np.asarray(m_coarse["mask"]).any(axis=1)
    assert full_hits.any()                       # geometry is visible
    np.testing.assert_array_equal(coarse_hits[full_hits],
                                  np.ones(full_hits.sum(), bool))


def test_contracted_probes_skip_empty_outer_cells():
    """Regression for the round-4 contracted-CDF held-out collapse: a
    pre-union-fold conservatism forced every mag>1 probe occupied under
    contraction, so the dt_gamma CDF weighting (1/t favors near probes)
    concentrated candidates in the EMPTY outside-cube region near the
    camera. With the fold, outer probes must test real cascade-1
    occupancy — empty outer space reports unoccupied (away from the
    dilated neighborhood of content) while in-cube content stays
    detectable."""
    from raw_ngp_tpu.render.occupancy import _probe_occupancy
    gs, cascades, bound, n_probes = 32, 2, 2.0, 32
    # content only well inside the unit cube (center cell)
    cell = np.asarray(morton3d(jnp.asarray([[16, 16, 16]],
                                           dtype=jnp.int32)))[0]
    dens = np.zeros((cascades, gs ** 3), np.float32)
    dens[0, cell] = 100.0                        # cascade 1 stays EMPTY
    bitfield = packbits(jnp.asarray(dens), 1.0)
    r = _coarse_dilate_radius(bound, gs, n_probes)
    coarse = coarse_occupancy(bitfield, gs, cascades, r, bound=bound)

    # axis ray from far outside the cube through the center, contracted
    N = 4
    ro = jnp.stack([jnp.full((N,), -1.9),
                    jnp.linspace(-0.02, 0.02, N),
                    jnp.zeros((N,))], axis=-1)
    rd = jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (N, 1))
    nears = jnp.full((N, 1), 0.05)
    fars = jnp.full((N, 1), 3.8)
    occ, t, spacing = _probe_occupancy(
        ro, rd, coarse, nears, fars, bound, True, gs, cascades, n_probes)
    occ, t = np.asarray(occ), np.asarray(t)
    x = np.asarray(ro)[:, :1] + t                 # probe x coordinate
    # probes over empty outside-cube space far from the content's dilated
    # neighborhood must be unoccupied (pre-fix: ALL of these were True)
    far_outside = x < -1.25
    assert far_outside.any()
    assert not occ[far_outside].any()
    # the content itself stays detectable on every ray
    near_content = np.abs(x) < 0.2
    assert (occ & near_content).any(axis=1).all()


def test_probe_grid_log_edges():
    """Log probe grid: edges geometric from near to far, spacing equals
    the edge differences, centers are the geometric means."""
    from raw_ngp_tpu.render.occupancy import _probe_grid
    P = 16
    nears = jnp.array([[0.05], [0.5]])
    fars = jnp.array([[50.0], [8.0]])
    t, sp, base, logg = _probe_grid(nears, fars, P, True)
    t, sp = np.asarray(t), np.asarray(sp)
    base, logg = np.asarray(base), np.asarray(logg)
    e = base * np.exp(logg * np.arange(P + 1)[None, :])     # [N, P+1]
    np.testing.assert_allclose(e[:, 0:1], np.asarray(nears), rtol=1e-5)
    np.testing.assert_allclose(e[:, -1:], np.asarray(fars), rtol=1e-5)
    np.testing.assert_allclose(sp, e[:, 1:] - e[:, :-1], rtol=1e-5)
    np.testing.assert_allclose(t, np.sqrt(e[:, 1:] * e[:, :-1]),
                               rtol=1e-5)
    # uniform grid still returns logg = 0 and [N, 1] spacing
    t_u, sp_u, _, logg_u = _probe_grid(nears, fars, P, False)
    assert np.asarray(logg_u).max() == 0.0 and sp_u.shape == (2, 1)


def test_log_cdf_candidates_in_occupied_intervals():
    """log_spacing CDF: candidates land only in occupied LOG intervals
    and the dt widths integrate to the occupied length (uniform-in-t
    weights when dt_gamma = 0)."""
    gs, bound, P, S = 32, 1.0, 32, 128
    bitfield = _two_slab_scene(gs)
    N = 64
    ro = jnp.stack([jnp.full((N,), -0.9),
                    jnp.linspace(-0.7, 0.7, N),
                    jnp.linspace(0.7, -0.7, N)], axis=-1)
    rd = jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (N, 1))
    nears = jnp.full((N, 1), 0.05)
    fars = jnp.full((N, 1), 2.5)

    from raw_ngp_tpu.render.occupancy import (
        cdf_candidates, coarse_occupancy, _coarse_dilate_radius,
        _probe_occupancy, _probe_grid)
    r = _coarse_dilate_radius(bound, gs, P)
    coarse = coarse_occupancy(bitfield, gs, 1, r, bound=bound)
    t_cand, dt = cdf_candidates(ro, rd, coarse, nears, fars, bound,
                                False, gs, 1, P, S, 0.5,
                                log_spacing=True)
    t_cand, dt = np.asarray(t_cand), np.asarray(dt)

    occ, _, sp = _probe_occupancy(ro, rd, coarse, nears, fars, bound,
                                  False, gs, 1, P, log_spacing=True)
    occ, sp = np.asarray(occ), np.asarray(sp)
    _, _, base, logg = _probe_grid(nears, fars, P, True)
    base, logg = np.asarray(base), np.asarray(logg)

    live = t_cand < np.asarray(fars) - 1e-6
    # containing log interval of each candidate
    p_of = np.clip((np.log(np.maximum(t_cand, 1e-12) / base)
                    / logg).astype(int), 0, P - 1)
    hit_occ = np.take_along_axis(occ, p_of, axis=1)
    assert hit_occ[live].all(), "log-CDF candidate in an empty interval"

    # dt integrates the occupied length: sum over candidates of dt ==
    # total occupied interval length (every candidate carries w/S of it)
    occ_len = (occ * sp).sum(axis=1)
    np.testing.assert_allclose(dt.sum(axis=1)[occ_len > 0],
                               occ_len[occ_len > 0], rtol=1e-3)


def test_log_coarse_spans_conservative():
    """Span tightening with log probes never loses an occupied fine
    sample (same contract as the uniform test, geometric intervals)."""
    gs, cascades, bound, P = 32, 2, 2.0, 64
    key = jax.random.PRNGKey(5)
    bitfield, _ = _random_bitfield(jax.random.fold_in(key, 1),
                                   grid_size=gs, cascades=cascades)
    N = 256
    ro, rd = _rand_rays(jax.random.fold_in(key, 2), N, bound)
    nears = jnp.full((N, 1), 0.05)
    fars = jnp.full((N, 1), 2.0 * np.sqrt(3.0) * bound)

    m_full = march_rays(ro, rd, bitfield, nears, fars, bound, False, gs,
                        cascades, 512, 128)
    ts = np.asarray(m_full["ts"])
    mask = np.asarray(m_full["mask"])

    r = _coarse_dilate_radius(bound, gs, P)
    coarse = coarse_occupancy(bitfield, gs, cascades, r, bound=bound)
    near2, far2 = coarse_spans(ro, rd, coarse, nears, fars, bound, False,
                               gs, cascades, P, log_spacing=True)
    near2, far2 = np.asarray(near2), np.asarray(far2)
    assert (near2 >= np.asarray(nears) - 1e-6).all()
    assert (far2 <= np.asarray(fars) + 1e-6).all()
    slop = float(fars[0, 0] - nears[0, 0]) / 512
    kept_in = ((ts >= near2 - slop) & (ts <= far2 + slop)) | ~mask
    assert kept_in.all(), (
        f"{(~kept_in).sum()} occupied samples escaped the log span")


@pytest.mark.parametrize("log_spacing", [False, True])
def test_cdf_floor_keeps_void_coverage(log_spacing):
    """cdf_floor > 0: unoccupied intervals still receive ~floor/(1+floor)
    -scaled candidate coverage (free-space supervision for contracted
    scenes), dt widths tile the FULL sampled support, and floor=0 keeps
    the pure occupied-only distribution."""
    gs, bound, P, S = 32, 1.0, 32, 256
    floor = 0.25
    bitfield = _two_slab_scene(gs)
    N = 64
    ro = jnp.stack([jnp.full((N,), -0.9),
                    jnp.linspace(-0.7, 0.7, N),
                    jnp.linspace(0.7, -0.7, N)], axis=-1)
    rd = jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (N, 1))
    nears = jnp.full((N, 1), 0.05)
    fars = jnp.full((N, 1), 2.5)

    from raw_ngp_tpu.render.occupancy import (
        cdf_candidates, coarse_occupancy, _coarse_dilate_radius,
        _probe_occupancy, _probe_grid)
    r = _coarse_dilate_radius(bound, gs, P)
    coarse = coarse_occupancy(bitfield, gs, 1, r, bound=bound)
    t_f, dt_f = cdf_candidates(ro, rd, coarse, nears, fars, bound,
                               False, gs, 1, P, S, 0.5,
                               log_spacing=log_spacing, floor=floor)
    t_f, dt_f = np.asarray(t_f), np.asarray(dt_f)

    occ, _, sp = _probe_occupancy(ro, rd, coarse, nears, fars, bound,
                                  False, gs, 1, P,
                                  log_spacing=log_spacing)
    occ = np.asarray(occ)
    sp = np.broadcast_to(np.asarray(sp), occ.shape)
    _, _, base, logg = _probe_grid(nears, fars, P, log_spacing)
    base, logg = np.asarray(base), np.asarray(logg)

    # containing interval of each candidate
    if log_spacing:
        p_of = np.clip((np.log(np.maximum(t_f, 1e-12) / base)
                        / logg).astype(int), 0, P - 1)
    else:
        span_sp = np.asarray(sp)[:, 0:1]
        p_of = np.clip(((t_f - np.asarray(nears)) / span_sp).astype(int),
                       0, P - 1)
    in_occ = np.take_along_axis(occ, p_of, axis=1)

    # expected void fraction: floor*L_unocc / (L_occ + floor*L_unocc)
    # (uniform weights; dt_gamma = 0)
    L_occ = (occ * sp).sum(axis=1)
    L_un = ((~occ) * sp).sum(axis=1)
    frac_expect = floor * L_un / (L_occ + floor * L_un)
    frac_got = 1.0 - in_occ.mean(axis=1)
    rows = L_occ > 0
    np.testing.assert_allclose(frac_got[rows], frac_expect[rows],
                               atol=0.05)

    # dt tiles the full weighted support: sum dt == L_occ + L_unocc
    # (every interval has weight when floor > 0; per-interval candidate
    # counts are floor/ceil of S*wv_p/w, so the tiling is exact only up
    # to ~P/S discretization)
    np.testing.assert_allclose(dt_f.sum(axis=1)[rows],
                               (L_occ + L_un)[rows], rtol=0.02)

    # floor=0 stays pure occupied-only
    t_0, _ = cdf_candidates(ro, rd, coarse, nears, fars, bound,
                            False, gs, 1, P, S, 0.5,
                            log_spacing=log_spacing, floor=0.0)
    t_0 = np.asarray(t_0)
    if log_spacing:
        p0 = np.clip((np.log(np.maximum(t_0, 1e-12) / base)
                      / logg).astype(int), 0, P - 1)
    else:
        p0 = np.clip(((t_0 - np.asarray(nears)) / span_sp).astype(int),
                     0, P - 1)
    live0 = t_0 < np.asarray(fars) - 1e-6
    assert np.take_along_axis(occ, p0, axis=1)[live0].all()
