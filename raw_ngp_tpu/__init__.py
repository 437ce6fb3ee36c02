"""raw_ngp_tpu — a TPU-native neural graphics primitives framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of je-lehmann/raw_ngp
(Instant-NGP hash-grid NeRF for RAW/HDR light-stage captures, with occupancy
-grid marching, proposal-network sampling, BARF/BAA-NGP pose refinement,
RawNeRF HDR losses, reflectance-field light conditioning, and mesh export),
re-designed for TPU hardware: static shapes, fused gathers, masked
compositing, pjit/shard_map data parallelism over ICI meshes, and Pallas
kernels on the hot paths.
"""

__version__ = "0.1.0"

from raw_ngp_tpu.config import Config, default_config
