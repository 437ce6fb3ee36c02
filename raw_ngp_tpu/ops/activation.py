"""Activation functions for density/color heads.

TPU-native equivalents of the reference's custom autograd functions
(reference: activation.py:9-22, nerf/network.py:112-138).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def trunc_exp(x):
    """exp with a clamped backward pass (reference: activation.py:9-22).

    The reference clamps the saved input at +-80, which still yields e^80
    backward amplification; it only survives because its fp16 GradScaler
    *skips* steps whose grads overflow. We run fp32 without a scaler, so we
    use torch-ngp upstream's +-15 clamp (the value the reference's comment
    alludes to) — beyond that the cotangent through alpha is ~exp(-sigma*dt)
    ~ 0 anyway, so the clamp does not bias converged training.
    """
    return jnp.exp(x)


def _trunc_exp_fwd(x):
    return jnp.exp(x), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


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
