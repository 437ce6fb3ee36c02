"""Volume rendering composition on fixed-size sample grids.

TPU-native replacement for the reference's per-ray sequential CUDA
compositing (kernel_composite_rays_train_forward, raymarching.cu:520-597,
and its hand-derived suffix-sum backward :624-712).

Design: on TPU every ray carries a static number of samples [N, K] with a
validity mask, so compositing becomes exclusive-cumsum transmittance over
the K axis — fully parallel, fused by XLA, and differentiated exactly by
jax.grad (the cumsum transpose reproduces the reference's suffix-sum
gradient identities automatically, so no custom VJP is required for
correctness; a Pallas fusion can be slotted in for speed later).

Early termination ``T < T_thresh`` (raymarching.cu:576) becomes a mask:
the reference includes the sample at which T first drops below the
threshold and then stops, which equals masking sample i by
``T_after(i-1) >= T_thresh``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def composite_rays(
    sigmas,        # [N, K] density at each sample
    rgbs,          # [N, K, 3] radiance at each sample
    ts,            # [N, K] distance of each sample along the ray
    deltas,        # [N, K] step size of each sample
    mask=None,     # [N, K] bool: sample validity (occupancy / padding)
    t_thresh: float = 0.0,
):
    """Alpha-composite masked samples along each ray.

    Returns dict with:
      weights     [N, K]
      weights_sum [N]
      depth       [N]
      image       [N, 3]
    """
    sigmas = sigmas.astype(jnp.float32)
    deltas = deltas.astype(jnp.float32)
    if mask is not None:
        sigmas = jnp.where(mask, sigmas, 0.0)

    sdelta = sigmas * deltas                                  # [N, K]
    alphas = 1.0 - jnp.exp(-sdelta)
    # T_before(i) = exp(-sum_{j<i} sigma_j * delta_j). Use a shifted
    # (exclusive) cumsum, NOT csum - sdelta: when sigma*delta overflows to
    # inf the subtraction produces inf - inf = NaN for that sample, whereas
    # the shifted form stays exact (exp(-inf) = 0 downstream).
    # Scan along the MAJOR axis: an XLA:TPU cumsum over the minor (lane)
    # dimension scans within vregs and runs ~30x slower than the
    # sublane-major direction (CLAUDE.md cost model); two [N, K]<->[K, N]
    # transposes are noise by comparison.
    csum = jnp.cumsum(sdelta.T, axis=0).T
    excl = jnp.concatenate(
        [jnp.zeros_like(csum[..., :1]), csum[..., :-1]], axis=-1)
    trans_before = jnp.exp(-excl)
    weights = alphas * trans_before                           # [N, K]

    if t_thresh > 0.0:
        # keep sample i iff the *running* transmittance entering it has not
        # yet crossed the threshold (matches the post-update break in
        # raymarching.cu:573-576)
        weights = jnp.where(trans_before >= t_thresh, weights, 0.0)

    weights = jnp.nan_to_num(weights, nan=0.0)
    weights_sum = weights.sum(axis=-1)                         # [N]
    depth = (weights * ts.astype(jnp.float32)).sum(axis=-1)    # [N]
    image = (weights[..., None] * rgbs.astype(jnp.float32)).sum(axis=-2)
    return {
        "weights": weights,
        "weights_sum": weights_sum,
        "depth": depth,
        "image": image,
    }


def composite_with_background(image, weights_sum, bg_color):
    """image + (1 - acc) * bg (reference renderer.py:507, 672)."""
    if isinstance(bg_color, (int, float)):
        bg = jnp.float32(bg_color)
        return image + (1.0 - weights_sum)[..., None] * bg
    return image + (1.0 - weights_sum)[..., None] * bg_color


def bins_to_weights(sigmas, real_bins, last_sample_opaque: bool = False):
    """Proposal-path compositing from bin edges (reference
    renderer.py:471-484): deltas from consecutive bin edges, cumulative
    transmittance over them. Returns (weights, ts_mid, deltas)."""
    deltas = real_bins[..., 1:] - real_bins[..., :-1]          # [N, T]
    ds = deltas * sigmas
    if last_sample_opaque:
        # opaque background mode (renderer.py:475-476)
        ds = jnp.concatenate(
            [ds[..., :-1], jnp.full_like(ds[..., -1:], jnp.inf)], axis=-1)
    alphas = 1.0 - jnp.exp(-ds)
    # major-axis scan via transposes — see composite_rays
    csum = jnp.swapaxes(jnp.cumsum(jnp.swapaxes(ds, 0, -1), axis=0),
                        0, -1)
    # shifted exclusive cumsum — see composite_rays for the inf-safety note
    excl = jnp.concatenate(
        [jnp.zeros_like(csum[..., :1]), csum[..., :-1]], axis=-1)
    trans = jnp.exp(-excl)
    weights = jnp.nan_to_num(alphas * trans, nan=0.0)
    ts_mid = (real_bins[..., 1:] + real_bins[..., :-1]) / 2.0
    return weights, ts_mid, deltas
