"""Activation functions for density/color heads.

TPU-native equivalents of the reference's custom autograd functions
(reference: activation.py:9-22, nerf/network.py:112-138).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def trunc_exp(x):
    """exp with a clamped backward pass.

    Forward is plain exp; backward clamps the saved input to [-80, 80] before
    exponentiating so a single exploding sample cannot produce inf gradients
    (reference: activation.py:9-22).
    """
    return jnp.exp(x)


def _trunc_exp_fwd(x):
    return jnp.exp(x), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -80.0, 80.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)


def softplus_beta(x, beta: float = 2.0, threshold: float = 20.0):
    """softplus with beta and linear region above ``threshold``
    (matches torch.nn.functional.softplus semantics used at
    reference network.py:34,115)."""
    scaled = beta * x
    return jnp.where(scaled > threshold, x, jax.nn.softplus(scaled) / beta)


def density_activation(x, kind: str, beta: float = 2.0):
    """sigma head (reference network.py:112-115)."""
    if kind == "clamped_exp":
        return trunc_exp(x)
    if kind == "softplus":
        return softplus_beta(x, beta=beta)
    raise ValueError(f"unknown density activation {kind!r}")


def color_activation(x, kind: str):
    """color head (reference network.py:131-138)."""
    if kind == "exp":
        return jnp.exp(x - 5.0)
    if kind == "sigmoid":
        return jax.nn.sigmoid(x)
    if kind == "clamped_exp":
        # exp(c - 5) clamped to <= 5; the clamp bounds HDR radiance
        return jnp.minimum(jnp.exp(x - 5.0), 5.0)
    raise ValueError(f"unknown color activation {kind!r}")


def internal_activation(x, kind: str, beta: float = 2.0):
    """hidden-layer activation of the MLPs (reference network.py:31-34)."""
    if kind == "relu":
        return jax.nn.relu(x)
    if kind == "softplus":
        return softplus_beta(x, beta=beta)
    raise ValueError(f"unknown internal activation {kind!r}")
