from raw_ngp_tpu.render.proposal import (
    render_proposal,
    spacing_fn,
    spacing_fn_inv,
)
