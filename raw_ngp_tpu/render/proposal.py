"""Proposal-network volume renderer (the reference's non-CUDA "-O2" path).

TPU-native port of NeRFRenderer.run (reference nerf/renderer.py:405-513):
nerfstudio-style hierarchical sampling — uniform bins in warped
s-space, two proposal-density iterations with PDF resampling, then the
final radiance query — followed by cumulative-transmittance compositing.

This path is fully dense and regular ([N, T] everywhere), so it runs under
vanilla jit with zero custom kernels and maps straight onto the MXU/VPU.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from raw_ngp_tpu.config import Config
from raw_ngp_tpu.models.ngp import FieldSpec, field_density, field_forward
from raw_ngp_tpu.ops.compositing import bins_to_weights, composite_with_background
from raw_ngp_tpu.ops.contraction import contract
from raw_ngp_tpu.ops.pdf import distortion_loss, proposal_loss, sample_pdf
from raw_ngp_tpu.ops.rays import near_far_from_aabb


def spacing_fn(x):
    """Warp distances: linear near, 1/x far (renderer.py:201)."""
    return jnp.where(x < 1.0, x / 2.0, 1.0 - 1.0 / (2.0 * x))


def spacing_fn_inv(s):
    """Inverse warp (renderer.py:202)."""
    return jnp.where(s < 0.5, 2.0 * s, 1.0 / (2.0 - 2.0 * s))


def render_proposal(
    params,
    spec: FieldSpec,
    rays_o,                    # [N, 3]
    rays_d,                    # [N, 3]
    aabb,                      # [6]
    key=None,                  # PRNG key -> perturbed sampling (training)
    bg_color=1.0,
    cam_near_far=None,         # [N, 2] or None
    rays_ldir=None,            # [N, 3] light dirs (rfield)
    annealing=1.0,
    training: bool = False,
    update_proposal: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Render one ray batch. Shapes are static in N and the per-level step
    counts cfg.render.num_steps."""
    cfg = spec.cfg
    N = rays_o.shape[0]
    num_steps = cfg.render.num_steps

    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb,
                                     cfg.render.min_near)
    if cam_near_far is not None:
        nears = jnp.maximum(nears, cam_near_far[:, :1])
        fars = jnp.minimum(fars, cam_near_far[:, 1:])

    # rays that miss the AABB carry the 1e9 sentinel (ops/rays.py); the
    # spacing warp would map that to inf bins whose NaN deltas poison the
    # backward pass (0 * exp(-NaN) cotangents) — the torch reference has
    # the same latent NaN (renderer.py:484 patches it only in-place).
    # Give misses a finite dummy segment and zero their weights instead.
    miss = fars >= 1e8                # [N, 1]
    nears = jnp.where(miss, 1.0, nears)
    fars = jnp.where(miss, 2.0, fars)
    hit = (~miss).astype(jnp.float32)

    s_nears = spacing_fn(nears)       # [N, 1]
    s_fars = spacing_fn(fars)         # [N, 1]

    all_bins = []
    all_weights = []
    bins = None
    weights = None
    rgbs = None
    ts_mid = None

    n_levels = len(num_steps)
    keys = (jax.random.split(key, n_levels)
            if key is not None else [None] * n_levels)

    for it, T in enumerate(num_steps):
        if it == 0:
            bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, T + 1), (N, T + 1))
            if keys[it] is not None:
                bins = bins + (jax.random.uniform(keys[it], (N, T + 1)) - 0.5) / T
                bins = jnp.clip(bins, 0.0, 1.0)
        else:
            bins = sample_pdf(bins, weights, T + 1, key=keys[it])

        real_bins = spacing_fn_inv(s_nears * (1.0 - bins) + s_fars * bins)
        ts_mid = (real_bins[..., 1:] + real_bins[..., :-1]) / 2.0    # [N, T]
        xyzs = rays_o[:, None, :] + rays_d[:, None, :] * ts_mid[..., None]
        q = contract(xyzs) if cfg.render.contract else xyzs

        if it != n_levels - 1:
            # proposal density; freeze proposal-net grads on off steps
            # (reference's set_grad_enabled(update_proposal),
            # renderer.py:460-461)
            p = params if update_proposal else jax.lax.stop_gradient(params)
            sigmas = field_density(p, spec, q.reshape(-1, 3),
                                   annealing, proposal=it).reshape(N, T)
        else:
            dirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
            dirs = jnp.broadcast_to(dirs[:, None, :], xyzs.shape)
            ld = None
            if rays_ldir is not None:
                ld = jnp.broadcast_to(rays_ldir[:, None, :],
                                      xyzs.shape).reshape(-1, 3)
            sigmas, rgbs = field_forward(params, spec, q.reshape(-1, 3),
                                         dirs.reshape(-1, 3), ld, annealing)
            sigmas = sigmas.reshape(N, T)
            rgbs = rgbs.reshape(N, T, 3)

        weights, ts_mid, _ = bins_to_weights(
            sigmas, real_bins,
            last_sample_opaque=(cfg.render.background == "last_sample"))
        weights = weights * hit       # missed rays composite to background

        if training:
            all_bins.append(bins)
            all_weights.append(weights)

    weights_sum = weights.sum(axis=-1)                       # [N]
    depth = (weights * ts_mid).sum(axis=-1)                  # [N]
    image = (weights[..., None] * rgbs).sum(axis=-2)         # [N, 3]

    results: Dict[str, jnp.ndarray] = {}
    if training:
        results["num_points"] = jnp.asarray(N * sum(num_steps))
        results["weights"] = weights
        if cfg.train.lambda_proposal > 0 and update_proposal:
            results["proposal_loss"] = proposal_loss(all_bins, all_weights)
        if cfg.train.lambda_distort > 0:
            results["distort_loss"] = distortion_loss(bins, weights)

    image = composite_with_background(image, weights_sum, bg_color)
    results["weights_sum"] = weights_sum
    results["depth"] = depth
    results["image"] = image
    return results
