from raw_ngp_tpu.models.mlp import apply_mlp, init_mlp
from raw_ngp_tpu.models.ngp import (
    FieldSpec,
    baangp_blend,
    barf_level_weights,
    field_density,
    field_forward,
    field_normals,
    init_field,
    make_field_spec,
    num_params,
)
