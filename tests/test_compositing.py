"""Compositing and PDF-sampling tests, including a sequential numpy oracle
mirroring the CUDA per-ray loop (raymarching.cu:520-597) and gradient
checks against the hand-derived backward identities (:624-712)."""

import jax
import jax.numpy as jnp
import numpy as np

from raw_ngp_tpu.ops.compositing import (
    bins_to_weights,
    composite_rays,
    composite_with_background,
)
from raw_ngp_tpu.ops.pdf import distortion_loss, proposal_loss, sample_pdf


def sequential_oracle(sigmas, rgbs, ts, deltas, mask, t_thresh):
    """Per-ray sequential compositing, the CUDA semantics."""
    N, K = sigmas.shape
    weights = np.zeros((N, K))
    image = np.zeros((N, 3))
    depth = np.zeros(N)
    wsum = np.zeros(N)
    for n in range(N):
        T = 1.0
        for k in range(K):
            if not mask[n, k]:
                continue
            alpha = 1.0 - np.exp(-sigmas[n, k] * deltas[n, k])
            w = alpha * T
            weights[n, k] = w
            image[n] += w * rgbs[n, k]
            depth[n] += w * ts[n, k]
            wsum[n] += w
            T *= 1.0 - alpha
            if T < t_thresh:
                break
    return weights, wsum, depth, image


def test_composite_matches_sequential_oracle():
    rng = np.random.default_rng(0)
    N, K = 16, 32
    sigmas = rng.uniform(0, 5, (N, K)).astype(np.float32)
    rgbs = rng.uniform(0, 1, (N, K, 3)).astype(np.float32)
    ts = np.cumsum(rng.uniform(0.01, 0.1, (N, K)), axis=1).astype(np.float32)
    deltas = rng.uniform(0.01, 0.1, (N, K)).astype(np.float32)
    mask = rng.uniform(size=(N, K)) > 0.3

    out = composite_rays(jnp.asarray(sigmas), jnp.asarray(rgbs),
                         jnp.asarray(ts), jnp.asarray(deltas),
                         jnp.asarray(mask), t_thresh=1e-4)
    w, ws, d, img = sequential_oracle(sigmas, rgbs, ts, deltas, mask, 1e-4)
    np.testing.assert_allclose(np.asarray(out["weights"]), w, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["weights_sum"]), ws, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["depth"]), d, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["image"]), img, atol=1e-4)


def test_composite_gradients_match_finite_difference():
    rng = np.random.default_rng(1)
    N, K = 4, 8
    sigmas = jnp.asarray(rng.uniform(0.1, 2, (N, K)).astype(np.float32))
    rgbs = jnp.asarray(rng.uniform(0, 1, (N, K, 3)).astype(np.float32))
    ts = jnp.asarray(np.cumsum(rng.uniform(0.05, 0.1, (N, K)),
                               axis=1).astype(np.float32))
    deltas = jnp.asarray(rng.uniform(0.05, 0.1, (N, K)).astype(np.float32))
    mask = jnp.ones((N, K), dtype=bool)
    cot = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))

    def f(s):
        out = composite_rays(s, rgbs, ts, deltas, mask)
        return (out["image"] * cot).sum()

    g = jax.grad(f)(sigmas)
    eps = 1e-3
    for (i, k) in [(0, 0), (1, 3), (3, 7)]:
        fd = (f(sigmas.at[i, k].add(eps)) - f(sigmas.at[i, k].add(-eps))) \
            / (2 * eps)
        np.testing.assert_allclose(float(g[i, k]), float(fd), rtol=2e-2,
                                   atol=1e-4)


def test_background_compositing():
    img = jnp.zeros((4, 3))
    ws = jnp.array([0.0, 0.5, 1.0, 0.25])
    out = composite_with_background(img, ws, 1.0)
    np.testing.assert_allclose(np.asarray(out[:, 0]), [1.0, 0.5, 0.0, 0.75],
                               rtol=1e-6)


def test_bins_to_weights_sums_to_opacity():
    rng = np.random.default_rng(2)
    bins = jnp.asarray(np.sort(rng.uniform(0, 1, (8, 17)), axis=1)
                       .astype(np.float32))
    sigmas = jnp.asarray(rng.uniform(0, 50, (8, 16)).astype(np.float32))
    w, tmid, deltas = bins_to_weights(sigmas, bins)
    assert np.all(np.asarray(w) >= 0)
    assert np.all(np.asarray(w.sum(axis=-1)) <= 1.0 + 1e-5)
    # opaque mode forces full opacity
    w2, _, _ = bins_to_weights(sigmas, bins, last_sample_opaque=True)
    np.testing.assert_allclose(np.asarray(w2.sum(axis=-1)), 1.0, atol=1e-5)


def test_sample_pdf_concentrates_mass():
    # weights concentrated in [0.4, 0.6] -> resampled bins should be too
    N, T0 = 4, 32
    bins = jnp.broadcast_to(jnp.linspace(0, 1, T0 + 1), (N, T0 + 1))
    centers = (bins[:, 1:] + bins[:, :-1]) / 2
    weights = jnp.exp(-((centers - 0.5) ** 2) / (2 * 0.02 ** 2))
    new_bins = sample_pdf(bins, weights, 16)
    assert new_bins.shape == (N, 16)
    frac_inside = np.mean((np.asarray(new_bins) > 0.35)
                          & (np.asarray(new_bins) < 0.65))
    assert frac_inside > 0.7
    # sorted
    assert np.all(np.diff(np.asarray(new_bins), axis=1) >= -1e-6)


def test_proposal_loss_zero_when_consistent():
    N, T = 4, 16
    bins = jnp.broadcast_to(jnp.linspace(0, 1, T + 1), (N, T + 1))
    weights = jnp.ones((N, T)) / T
    loss = proposal_loss([bins, bins], [weights, weights])
    assert float(loss) < 1e-6


def test_proposal_loss_positive_when_undercovering():
    N, T = 4, 16
    bins = jnp.broadcast_to(jnp.linspace(0, 1, T + 1), (N, T + 1))
    w_ref = jnp.zeros((N, T)).at[:, 8].set(1.0)
    w_prop = jnp.ones((N, T)) / T   # spreads mass: undercovers the spike
    loss = proposal_loss([bins, bins], [w_prop, w_ref])
    assert float(loss) > 0.01


def test_distortion_loss_prefers_compact_weights():
    N, T = 4, 64
    bins = jnp.broadcast_to(jnp.linspace(0, 1, T + 1), (N, T + 1))
    compact = jnp.zeros((N, T)).at[:, 30:34].set(0.25)
    spread = jnp.ones((N, T)) / T
    assert float(distortion_loss(bins, compact)) < \
        float(distortion_loss(bins, spread))


def test_distortion_loss_matches_quadratic_form():
    rng = np.random.default_rng(3)
    N, T = 2, 8
    bins = jnp.broadcast_to(jnp.linspace(0, 1, T + 1), (N, T + 1))
    w = jnp.asarray(rng.uniform(0, 0.2, (N, T)).astype(np.float32))
    got = float(distortion_loss(bins, w))
    # O(T^2) oracle
    b = np.asarray(bins)
    wv = np.asarray(w)
    mids = (b[:, 1:] + b[:, :-1]) / 2
    iv = b[:, 1:] - b[:, :-1]
    total = 0.0
    for n in range(N):
        pair = np.abs(mids[n][:, None] - mids[n][None, :])
        total += (wv[n][:, None] * wv[n][None, :] * pair).sum()
        total += (wv[n] ** 2 * iv[n]).sum() / 3
    np.testing.assert_allclose(got, total / N, rtol=1e-4)


def test_compacted_composite_matches_padded():
    """composite_rays_compacted on the ray-major compacted stream must
    reproduce composite_rays on the padded [N, K] grid (the stream is
    built exactly like render_occupancy: compact_positions + gathers),
    including empty rays, truncation to m_pad, and the t_thresh mask."""
    from raw_ngp_tpu.ops.compositing import composite_rays_compacted
    from raw_ngp_tpu.render.occupancy import (
        compact_positions,
        gather_flat_sorted,
    )

    rng = np.random.default_rng(7)
    N, K = 24, 16
    m_pad = 128                          # forces truncation of some rays
    sigmas = rng.uniform(0, 5, (N, K)).astype(np.float32)
    rgbs = rng.uniform(0, 1, (N, K, 3)).astype(np.float32)
    ts = np.cumsum(rng.uniform(0.01, 0.1, (N, K)), axis=1).astype(
        np.float32)
    deltas = rng.uniform(0.01, 0.1, (N, K)).astype(np.float32)
    mask = rng.uniform(size=(N, K)) > 0.4
    mask[3] = False                      # an empty ray
    mask[7] = True                       # a full ray

    kept, inv, pos = compact_positions(jnp.asarray(mask), m_pad)
    ref = composite_rays(jnp.asarray(sigmas), jnp.asarray(rgbs),
                         jnp.asarray(ts), jnp.asarray(deltas),
                         kept, t_thresh=1e-4)

    filled = pos < N * K
    rid = jnp.where(filled, jnp.minimum(pos, N * K - 1) // K, N)
    sig_c = gather_flat_sorted(jnp.asarray(sigmas).reshape(-1), pos)
    t_c = gather_flat_sorted(jnp.asarray(ts).reshape(-1), pos)
    dt_c = gather_flat_sorted(jnp.asarray(deltas).reshape(-1), pos)
    rgb_c = jnp.stack([gather_flat_sorted(
        jnp.asarray(rgbs[..., c]).reshape(-1), pos) for c in range(3)],
        axis=-1)
    counts = jnp.asarray(kept).sum(axis=-1)
    out = composite_rays_compacted(sig_c, rgb_c, t_c, dt_c, rid, filled,
                                   counts, N, t_thresh=1e-4)
    np.testing.assert_allclose(np.asarray(out["weights_sum"]),
                               np.asarray(ref["weights_sum"]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["depth"]),
                               np.asarray(ref["depth"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["image"]),
                               np.asarray(ref["image"]), atol=1e-4)

    # gradients: same loss through both paths -> same input cotangents
    def loss_pad(s):
        o = composite_rays(s, jnp.asarray(rgbs), jnp.asarray(ts),
                           jnp.asarray(deltas), kept, t_thresh=1e-4)
        return (o["image"].sum() + o["depth"].sum()
                + o["weights_sum"].sum())

    def loss_cmp(s):
        sc = gather_flat_sorted(s.reshape(-1), pos)
        o = composite_rays_compacted(sc, rgb_c, t_c, dt_c, rid, filled,
                                     counts, N, t_thresh=1e-4)
        return (o["image"].sum() + o["depth"].sum()
                + o["weights_sum"].sum())

    g_pad = jax.grad(loss_pad)(jnp.asarray(sigmas))
    g_cmp = jax.grad(loss_cmp)(jnp.asarray(sigmas))
    np.testing.assert_allclose(np.asarray(g_cmp), np.asarray(g_pad),
                               atol=2e-4)
