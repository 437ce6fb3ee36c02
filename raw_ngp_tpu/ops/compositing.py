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


def _segmented_inclusive_scan(rid, chans):
    """Inclusive segmented prefix sums of 1-D f32 channels grouped by the
    NON-DECREASING segment-id stream ``rid`` (Hillis-Steele shift-mask
    scan: log2(M) masked shifted adds over 1-D arrays — the same engine
    as the hash-table gradient's segment totals, kernels/hash_fused.py).
    Values only ever add WITHIN a segment, so there is no cross-segment
    cancellation (a global cumsum + per-segment base subtraction would
    lose the small segments' precision to the large ones' magnitude)."""
    M = rid.shape[0]
    vs = [c.astype(jnp.float32) for c in chans]
    s = 1
    while s < M:
        same = rid[s:] == rid[:-s]
        vs = [jnp.concatenate([v[:s], v[s:] + jnp.where(same, v[:-s], 0.0)])
              for v in vs]
        s <<= 1
    return vs


def composite_rays_compacted(
    sigmas,        # [M] density per compacted sample
    rgbs,          # [M, 3] radiance per compacted sample
    ts,            # [M] sample distance along its ray
    deltas,        # [M] step size per sample
    rid,           # [M] int32 ray id, NON-DECREASING (dummy id >= N for
                   #     unfilled slots; compaction is ray-major)
    filled,        # [M] bool: slot holds a real sample
    counts,        # [N] int32 samples per ray in the compacted stream
    num_rays: int,
    t_thresh: float = 0.0,
):
    """Alpha-composite directly on the compacted ray-major sample stream.

    Mathematically identical to expanding back to the padded [N, K] grid
    and calling :func:`composite_rays` (same per-ray sample order, same
    shifted-exclusive-cumsum transmittance, reference semantics
    raymarching.cu:520-597) — but it never materializes the [N, K]
    tensors: the expand gathers, their transpose, and the [N, K]
    composite math on dead lanes all disappear. Per-ray outputs are read
    by GATHERING each ray's inclusive prefix at its last sample (the
    end index follows from ``counts``), so the whole composite is
    1-D scans + one [N]-row gather — no scatter at all.

    Returns dict with weights_sum [N], depth [N], image [N, 3] (no
    per-sample ``weights`` — callers needing them use the expand path).
    """
    sig = jnp.where(filled, sigmas.astype(jnp.float32), 0.0)
    dt = jnp.where(filled, deltas.astype(jnp.float32), 0.0)
    sdelta = sig * dt
    (incl,) = _segmented_inclusive_scan(rid, [sdelta])
    # within-segment EXCLUSIVE prefix: shift by one, zero at segment
    # starts (a shift, never `incl - sdelta`: inf - inf would NaN)
    prev_same = jnp.concatenate(
        [jnp.zeros((1,), jnp.bool_), rid[1:] == rid[:-1]])
    excl = jnp.where(
        prev_same,
        jnp.concatenate([jnp.zeros((1,), jnp.float32), incl[:-1]]), 0.0)
    trans_before = jnp.exp(-excl)
    alphas = 1.0 - jnp.exp(-sdelta)
    weights = alphas * trans_before
    if t_thresh > 0.0:
        weights = jnp.where(trans_before >= t_thresh, weights, 0.0)
    weights = jnp.nan_to_num(weights, nan=0.0)
    weights = jnp.where(filled, weights, 0.0)

    rgbs = rgbs.astype(jnp.float32)
    chans = [weights * rgbs[:, 0], weights * rgbs[:, 1],
             weights * rgbs[:, 2], weights * ts.astype(jnp.float32),
             weights]
    prefs = _segmented_inclusive_scan(rid, chans)
    # gather each ray's totals at its last sample; empty rays -> 0
    M = rid.shape[0]
    end = jnp.cumsum(counts) - 1                        # [N]
    valid = counts > 0
    end = jnp.clip(end, 0, M - 1)
    outs = [jnp.where(valid, p[end], 0.0) for p in prefs]
    return {
        "image": jnp.stack(outs[:3], axis=-1),
        "depth": outs[3],
        "weights_sum": outs[4],
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
