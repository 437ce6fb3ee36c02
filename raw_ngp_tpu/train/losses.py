"""Training losses: RawNeRF HDR loss, LDR MSE, regularizers.

TPU-native ports of the reference's loss assembly
(nerf/train_utils.py:512-557) and the experimental loss-weight windows
(raw/raw_utils.py:30-53).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp


def gaussian_weighting(values, peak_value=1.0, sigma=0.5, max_weight=1.0):
    """Literal port of raw_utils.gaussian_weighting:30-33 — note the
    reference computes exp(-(v - peak**2)/(2 sigma^2)) (peak squared, not
    the residual squared); we reproduce that behavior for parity."""
    w = jnp.exp(-(values - peak_value ** 2) / (2 * sigma ** 2))
    return jax.lax.stop_gradient(max_weight * w / jnp.max(w))


def hanning_weighting(values, max_weight=2.0):
    """Port of raw_utils.hanning_weighting:35-44: a Hann window over the
    *batch* axis, replicated to 3 channels."""
    N = values.shape[0]
    n = jnp.arange(N, dtype=jnp.float32)
    w = 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * n / (N - 1))
    w = max_weight * w / jnp.max(w)
    return jax.lax.stop_gradient(jnp.broadcast_to(w[:, None], (N, 3)))


def planck_taper_weighting(values, peak_value=0.5, start_taper=0.95,
                           max_weight=2.0):
    """Port of raw_utils.planck_taper_weighting:46-53."""
    inside = ((values >= (peak_value - start_taper))
              & (values <= (peak_value + start_taper)))
    w = max_weight * (0.5 + 0.5 * jnp.cos(
        (values - peak_value) * (jnp.pi / (2.0 * start_taper))))
    return jnp.where(inside, w, 0.0)


def loss_weight_fn(kind: str, gt_rgb):
    if kind == "gaussian":
        return gaussian_weighting(gt_rgb)
    if kind == "planck":
        return planck_taper_weighting(gt_rgb)
    if kind == "hanning":
        return hanning_weighting(gt_rgb)
    return 1.0


def rawnerf_loss(pred_rgb, gt_rgb, exposure, lossmult=1.0, loss_weight=1.0):
    """Clipped, tonemap-gradient-weighted MSE from the RawNeRF paper
    (reference train_utils.py:529-536).

      clip  = min(1, pred * exposure)
      loss  = sum(((clip - gt)^2 / (1e-3 + sg(clip))^2) * mult * w) / sum(mult)
    """
    rgb_clip = jnp.minimum(1.0, pred_rgb * exposure)
    resid_sq = (rgb_clip - gt_rgb) ** 2
    scaling = 1.0 / (1e-3 + jax.lax.stop_gradient(rgb_clip))
    data = resid_sq * scaling ** 2
    mult = jnp.broadcast_to(jnp.asarray(lossmult, jnp.float32), gt_rgb.shape)
    return (data * mult * loss_weight).sum() / mult.sum()


def ldr_loss(pred_rgb, gt_rgb):
    """Plain MSE (reference main.py:222, train_utils.py:538-541)."""
    return ((pred_rgb - gt_rgb) ** 2).mean()


def entropy_loss(weights_sum):
    """Binary entropy of per-ray opacity (train_utils.py:554-557)."""
    w = jnp.clip(weights_sum, 1e-5, 1.0 - 1e-5)
    ent = -w * jnp.log2(w) - (1.0 - w) * jnp.log2(1.0 - w)
    return ent.mean()


def blend_gt_background(images, bg_color):
    """Alpha-composite 4-channel GT over the background
    (train_utils.py:503-506)."""
    if images.shape[-1] == 4:
        return (images[..., :3] * images[..., 3:]
                + bg_color * (1.0 - images[..., 3:]))
    return images
