"""dt_gamma schedule: quantified divergence vs the reference recurrence.

The reference grows the march step as dt = clamp(t*gamma, dt_min, dt_max)
with dt_min = 2*sqrt(3)/max_steps, dt_max = 2*sqrt(3)*bound/H
(raymarching.cu:396-401,412). The repo uses a closed-form geometric
schedule normalized so candidate S-1 lands at `far`
(render/occupancy.py:121-134) — XLA needs static shapes, and the
recurrence's step count is data-dependent.

Measured relationship (this test pins it):
  * in the unclamped region both schedules grow dt by exactly (1+gamma)
    per step — the recurrence IS geometric there;
  * where the reference clamps dt to dt_min (near the camera, while
    t*gamma < dt_min) the repo places MORE samples (up to ~2x per log
    octave) — denser near-field sampling, quality-safe;
  * where the reference clamps to dt_max (far tail) the repo places
    slightly fewer (>=0.6x per log octave).
"""

import numpy as np

import jax
import jax.numpy as jnp


def _ref_schedule(near, far, gamma, bound, H=128, max_steps=1024):
    """Numpy oracle of raymarching.cu:396-401 (no occupancy skipping)."""
    dt_min = 2 * np.sqrt(3) / max_steps
    dt_max = 2 * np.sqrt(3) * bound / H
    t, ts = near, []
    while t < far and len(ts) < 100000:
        ts.append(t)
        t += np.clip(t * gamma, dt_min, dt_max)
    return np.array(ts)


def _repo_schedule(near, far, gamma, S, jitter=0.5):
    """Closed form from render/occupancy.py:127-134."""
    steps = np.arange(S) + jitter
    geo = ((1 + gamma) ** steps - 1) / ((1 + gamma) ** S - 1)
    return near + (far - near) * geo


def test_growth_ratio_matches_reference_unclamped():
    for gamma in (1 / 128, 1 / 64):
        near, far, bound = 0.5, 6.93, 2.0
        r = _ref_schedule(near, far, gamma, bound)
        p = _repo_schedule(near, far, gamma, len(r))
        # the recurrence is exactly geometric once dt_min < t*gamma < dt_max
        dt_min = 2 * np.sqrt(3) / 1024
        dt_max = 2 * np.sqrt(3) * bound / 128
        u = (r[:-1] * gamma > dt_min * 1.01) \
            & (r[:-1] * gamma < dt_max * 0.99)      # step i unclamped
        both = u[:-1] & u[1:]
        growth_ref = (np.diff(r)[1:] / np.diff(r)[:-1])[both]
        assert both.sum() > 20                      # non-trivial region
        growth_repo = np.diff(p)[1:] / np.diff(p)[:-1]
        assert np.all(np.abs(growth_ref - (1 + gamma)) < 2e-3)
        np.testing.assert_allclose(growth_repo, 1 + gamma, rtol=1e-6)


def test_density_divergence_bounds():
    """Per-log-octave sample-count ratio repo/ref stays within the
    documented envelope: never sparser than 0.6x, denser only near."""
    for gamma, near, far, bound in ((1 / 128, 0.05, 3.46, 1.0),
                                    (1 / 128, 0.5, 6.93, 2.0),
                                    (1 / 64, 0.05, 3.46, 1.0)):
        r = _ref_schedule(near, far, gamma, bound)
        p = _repo_schedule(near, far, gamma, len(r))
        edges = np.geomspace(max(near, 1e-3), far, 7)
        hr, _ = np.histogram(r, edges)
        hp, _ = np.histogram(p, edges)
        ratio = hp / np.maximum(hr, 1)
        assert np.all(ratio >= 0.6), ratio
        assert np.all(ratio <= 2.3), ratio
        # oversampling only occurs in the near (dt_min-clamped) octaves
        assert np.all(ratio[3:] <= 1.25), ratio


def test_march_rays_implements_closed_form():
    """march_rays' dt_gamma candidates equal the documented closed form
    (ties the oracle in this file to the implementation)."""
    from raw_ngp_tpu.render.occupancy import march_rays

    S, K, gs, cas = 32, 32, 16, 1
    bitfield = jnp.full((gs ** 3 // 8,), 0xFF, jnp.uint8)  # all occupied
    ro = jnp.array([[0.0, 0.0, -0.9]])
    rd = jnp.array([[0.0, 0.0, 1.0]])
    nears = jnp.array([[0.1]])
    fars = jnp.array([[1.8]])
    gamma = 1 / 64
    m = march_rays(ro, rd, bitfield, nears, fars, 1.0, False, gs, cas,
                   S, K, key=None, dt_gamma=gamma)
    expected = _repo_schedule(0.1, 1.8, gamma, S, jitter=0.5)
    got = np.asarray(m["ts"][0])
    valid = np.asarray(m["mask"][0])
    np.testing.assert_allclose(got[valid], expected[valid], rtol=2e-4)
