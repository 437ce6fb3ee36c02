"""Performance kernels: fused/sorted implementations swapped in behind the
same signatures as the pure-jnp reference ops (tested against them)."""

from raw_ngp_tpu.kernels.hash_fused import (
    hash_encode_fast,
    hash_encode_fused,
)
