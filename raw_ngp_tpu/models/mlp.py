"""Functional MLP used for the grid and view heads.

Equivalent of the reference's MLP module (nerf/network.py:12-35): a stack of
Linear layers (optionally bias-free) with relu/softplus hidden activations.

Implemented as pure init/apply functions over a params pytree. Compute dtype
is a parameter: on TPU the matmuls run in bfloat16 on the MXU with float32
accumulation (``preferred_element_type``), params are kept in float32.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from raw_ngp_tpu.ops.activation import internal_activation


def init_mlp(key, dim_in: int, dim_out: int, dim_hidden: int,
             num_layers: int, bias: bool = True, dtype=jnp.float32):
    """Kaiming-uniform init matching torch.nn.Linear defaults
    (the reference relies on torch's default init)."""
    params = []
    dims = [dim_in] + [dim_hidden] * (num_layers - 1) + [dim_out]
    keys = jax.random.split(key, num_layers)
    for l in range(num_layers):
        fan_in = dims[l]
        bound = 1.0 / (fan_in ** 0.5)
        kw, kb = jax.random.split(keys[l])
        w = jax.random.uniform(kw, (dims[l], dims[l + 1]), dtype=dtype,
                               minval=-(3 ** 0.5) * bound,
                               maxval=(3 ** 0.5) * bound)
        layer = {"w": w}
        if bias:
            layer["b"] = jax.random.uniform(kb, (dims[l + 1],), dtype=dtype,
                                            minval=-bound, maxval=bound)
        params.append(layer)
    return params


def apply_mlp(params: Sequence[dict], x, activation: str = "relu",
              beta: float = 2.0, compute_dtype=jnp.float32):
    """Forward pass; hidden activation after all but the last layer
    (network.py:27-35)."""
    h = x.astype(compute_dtype)
    n = len(params)
    for l, layer in enumerate(params):
        w = layer["w"].astype(compute_dtype)
        h = jnp.dot(h, w, preferred_element_type=jnp.float32)
        if "b" in layer:
            h = h + layer["b"].astype(jnp.float32)
        if l != n - 1:
            h = internal_activation(h, activation, beta=beta)
            h = h.astype(compute_dtype)
    return h.astype(jnp.float32)
