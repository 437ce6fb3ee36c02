from raw_ngp_tpu.parallel.mesh import (
    make_mesh,
    make_parallel_eval_render,
    make_parallel_train_step,
    replicate_to_mesh,
)
from raw_ngp_tpu.parallel.tp import (
    grid_to_2d,
    make_tp_mesh,
    make_tp_train_step,
    place_state_tp,
)
