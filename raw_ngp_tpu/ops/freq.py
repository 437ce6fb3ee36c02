"""NeRF positional (frequency) encoding.

Equivalent of the reference's CUDA freqencoder (freqencoder/src/
freqencoder.cu:30-59) and its pure-torch oracle (encoding.py:6-44):
output packs [x, sin(2^0 x), cos(2^0 x), ..., sin(2^{F-1} x), cos(2^{F-1} x)]
per input dim. Pure jnp — XLA fuses this into neighbouring elementwise work.
"""

from __future__ import annotations

import jax.numpy as jnp


def freq_encode(x, degree: int = 12, include_input: bool = True):
    """[..., D] -> [..., D * (2*degree + include_input)]."""
    freqs = 2.0 ** jnp.arange(degree, dtype=x.dtype)          # [F]
    xb = x[..., None] * freqs                                 # [..., D, F]
    enc = jnp.concatenate(
        [jnp.sin(xb), jnp.cos(xb)], axis=-1)                  # [..., D, 2F]
    enc = enc.reshape(*x.shape[:-1], -1)
    if include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc


def freq_output_dim(input_dim: int, degree: int = 12,
                    include_input: bool = True) -> int:
    return input_dim * (2 * degree + (1 if include_input else 0))
