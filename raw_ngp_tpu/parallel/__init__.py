from raw_ngp_tpu.parallel.mesh import (
    make_mesh,
    make_parallel_eval_render,
    make_parallel_train_step,
    replicate_to_mesh,
)
