"""Core TPU-native ops: pure-jnp reference implementations.

These are the semantic ground truth for the framework — every Pallas kernel
in :mod:`raw_ngp_tpu.kernels` is tested against this layer (the same
oracle pattern the reference uses informally with its `*_pytorch`
fallbacks, cf. raymarching/raymarching.py:206-249).
"""

from raw_ngp_tpu.ops.activation import (
    color_activation,
    density_activation,
    internal_activation,
    softplus_beta,
    trunc_exp,
)
from raw_ngp_tpu.ops.compositing import (
    bins_to_weights,
    composite_rays,
    composite_with_background,
)
from raw_ngp_tpu.ops.contraction import contract, uncontract
from raw_ngp_tpu.ops.freq import freq_encode, freq_output_dim
from raw_ngp_tpu.ops.hashgrid import (
    HashGridSpec,
    hash_encode,
    hash_encode_01,
    init_hashgrid_params,
    total_variation_loss,
    weight_decay_loss,
)
from raw_ngp_tpu.ops.lie import (
    apply_refinement,
    compose_pose,
    procrustes_analysis,
    rotation_distance,
    se3_to_SE3,
    skew,
    so3_to_SO3,
)
from raw_ngp_tpu.ops.morton import morton3d, morton3d_invert
from raw_ngp_tpu.ops.pdf import (
    distortion_loss,
    interlevel_loss,
    proposal_loss,
    sample_pdf,
)
from raw_ngp_tpu.ops.rays import (
    full_image_rays,
    near_far_from_aabb,
    pixel_rays,
    sample_pixel_indices,
    sph_from_ray,
)
from raw_ngp_tpu.ops.sh import sh_encode, sh_output_dim
