"""Encoder factory — name-keyed construction of direction/position
encoders (reference encoding.py:47-78 get_encoder).

Returns ``(encode_fn, output_dim, params_or_none)``: stateless encoders
(identity / frequency / sh) return params=None; grid encoders return a
(HashGridSpec, init_params) pair the caller owns.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax

from raw_ngp_tpu.ops.freq import freq_encode, freq_output_dim
from raw_ngp_tpu.ops.hashgrid import (
    HashGridSpec,
    hash_encode,
    init_hashgrid_params,
)
from raw_ngp_tpu.ops.sh import sh_encode, sh_output_dim


def get_encoder(name: Optional[str], input_dim: int = 3, *,
                degree: int = 4, freq_degree: int = 12,
                num_levels: int = 16, level_dim: int = 2,
                base_resolution: int = 16, log2_hashmap_size: int = 19,
                desired_resolution: Optional[float] = 2048,
                interpolation: str = "linear", key=None):
    """Build an encoder by name: None | 'frequency' | 'sh' | 'hashgrid' |
    'tiledgrid' (encoding.py:47-78). 'frequency_torch' of the reference is
    just 'frequency' here — there is a single implementation."""
    if name is None or name == "none":
        return (lambda x, **kw: x), input_dim, None

    if name in ("frequency", "frequency_torch"):
        def enc(x, **kw):
            return freq_encode(x, degree=freq_degree)
        return enc, freq_output_dim(input_dim, freq_degree), None

    if name == "sh":
        def enc(d, **kw):
            return sh_encode(d, degree=degree)
        return enc, sh_output_dim(degree), None

    if name in ("hashgrid", "tiledgrid"):
        spec = HashGridSpec.create(
            input_dim=input_dim, num_levels=num_levels,
            level_dim=level_dim, base_resolution=base_resolution,
            log2_hashmap_size=log2_hashmap_size,
            desired_resolution=desired_resolution,
            gridtype="hash" if name == "hashgrid" else "tiled",
            interpolation=interpolation)
        params = init_hashgrid_params(
            key if key is not None else jax.random.PRNGKey(0), spec)

        def enc(x, params=params, bound: float = 1.0, **kw):
            return hash_encode(params, x, spec, bound=bound)

        return enc, spec.output_dim, (spec, params)

    raise ValueError(f"unknown encoder {name!r}")
