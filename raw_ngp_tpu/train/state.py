"""Training state pytree."""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class TrainState:
    """Everything that evolves during training, as one donated pytree.

    Mirrors what the reference checkpoints (train_utils.py:1141-1217):
    model params, optimizer state, EMA weights, pose-refinement params and
    their optimizer, step counter, and the occupancy-grid extra state
    (grid values + bitfield + mean density, renderer.py:191-198).
    """

    params: Any
    opt_state: Any
    ema_params: Any
    key: jnp.ndarray
    step: jnp.ndarray                      # int32 scalar
    # pose refinement (None when pose_opt == "none")
    pose_params: Optional[jnp.ndarray] = None        # [n_cams, 6]
    pose_opt_state: Optional[Any] = None
    pose_noise: Optional[jnp.ndarray] = None         # [n_cams, 3, 4]
    # occupancy-grid extra state (None in proposal mode)
    density_grid: Optional[jnp.ndarray] = None       # [CAS, H^3] fp32
    density_bitfield: Optional[jnp.ndarray] = None   # [CAS * H^3 // 8] uint8
    mean_density: Optional[jnp.ndarray] = None       # scalar fp32
    iter_density: Optional[jnp.ndarray] = None       # int32
