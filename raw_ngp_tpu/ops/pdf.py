"""PDF resampling and proposal/distortion losses for the proposal renderer.

TPU-native ports of:
  * sample_pdf (reference nerf/renderer.py:103-136)
  * interlevel proposal loss (renderer.py:51-74)
  * distortion loss (renderer.py:24-33, via torch_efficient_distloss) —
    implemented here with the O(K) cumsum identity instead of the O(K^2)
    pairwise form.

All functions take fixed-shape [N, T] inputs and are jit/vmap friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _searchsorted_batched(a, v, side="right"):
    """Row-wise searchsorted: a [N, A] sorted, v [N, V] -> [N, V]."""
    return jax.vmap(lambda ai, vi: jnp.searchsorted(ai, vi, side=side))(a, v)


def sample_pdf(bins, weights, T: int, key=None):
    """Inverse-CDF resampling of ``T`` new bin edges (renderer.py:103-136).

    Args:
      bins: [N, T0+1] existing bin edges in [0, 1].
      weights: [N, T0].
      T: number of output edges.
      key: optional PRNG key; when given, jitter the uniform samples
        (perturb=True in the reference).
    Returns: [N, T] new edges (sorted).
    """
    N, T0 = weights.shape
    weights = weights + 0.01                       # prevent NaN (renderer.py:109)
    pdf = weights / weights.sum(axis=-1, keepdims=True)
    cdf = jnp.minimum(jnp.cumsum(pdf, axis=-1), 1.0)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)

    u = jnp.linspace(0.5 / T, 1.0 - 0.5 / T, T)
    u = jnp.broadcast_to(u, (N, T))
    if key is not None:
        u = u + (jax.random.uniform(key, (N, T)) - 0.5) / T

    inds = _searchsorted_batched(cdf, u, side="right")   # [N, T]
    below = jnp.clip(inds - 1, 0, T0)
    above = jnp.clip(inds, 0, T0)

    cdf_g0 = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_g1 = jnp.take_along_axis(cdf, above, axis=-1)
    bins_g0 = jnp.take_along_axis(bins, below, axis=-1)
    bins_g1 = jnp.take_along_axis(bins, above, axis=-1)

    t = jnp.clip(jnp.nan_to_num((u - cdf_g0) / (cdf_g1 - cdf_g0)), 0.0, 1.0)
    out = bins_g0 + t * (bins_g1 - bins_g0)
    return jax.lax.stop_gradient(out)


def interlevel_loss(bins_ref, weights_ref, bins, weights):
    """Penalty on a proposal level under-covering the final distribution
    (renderer.py:55-66). ``*_ref`` is the (detached) finest level."""
    bins_ref = jax.lax.stop_gradient(bins_ref)
    weights_ref = jax.lax.stop_gradient(weights_ref)
    Tq = weights.shape[-1]
    cw = jnp.concatenate(
        [jnp.zeros_like(weights[..., :1]), jnp.cumsum(weights, axis=-1)],
        axis=-1)                                          # [N, T+1]
    inds_lo = jnp.clip(
        _searchsorted_batched(bins[..., :-1], bins_ref[..., :-1],
                              side="right") - 1, 0, Tq - 1)
    inds_hi = jnp.clip(
        _searchsorted_batched(bins[..., 1:], bins_ref[..., 1:],
                              side="right"), 0, Tq - 1)
    cw_lo = jnp.take_along_axis(cw[..., :-1], inds_lo, axis=-1)
    cw_hi = jnp.take_along_axis(cw[..., 1:], inds_hi, axis=-1)
    w = cw_hi - cw_lo
    return (jnp.clip(weights_ref - w, min=0.0) ** 2
            / (weights_ref + 1e-8)).mean()


def proposal_loss(all_bins, all_weights):
    """Sum of interlevel losses of every proposal level against the final
    level (renderer.py:68-74)."""
    bins_ref, weights_ref = all_bins[-1], all_weights[-1]
    loss = 0.0
    for b, w in zip(all_bins[:-1], all_weights[:-1]):
        loss = loss + interlevel_loss(bins_ref, weights_ref, b, w)
    return loss


def distortion_loss(bins, weights):
    """mip-NeRF 360 distortion loss, O(K) formulation
    (renderer.py:24-33; same math as torch_efficient_distloss.eff_distloss).

    bins: [N, T+1] normalized bin edges; weights: [N, T].
    """
    intervals = bins[..., 1:] - bins[..., :-1]
    mids = bins[..., :-1] + intervals / 2.0
    # pairwise term via prefix sums:
    #   sum_{i>j} w_i w_j (m_i - m_j) * 2
    cw = jnp.cumsum(weights, axis=-1)
    cwm = jnp.cumsum(weights * mids, axis=-1)
    w_prev = cw - weights
    wm_prev = cwm - weights * mids
    loss_bi = 2.0 * (weights * (mids * w_prev - wm_prev)).sum(axis=-1)
    loss_uni = (weights ** 2 * intervals).sum(axis=-1) / 3.0
    return (loss_bi + loss_uni).mean()
