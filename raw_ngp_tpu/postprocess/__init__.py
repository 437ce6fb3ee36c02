from raw_ngp_tpu.postprocess.colorchecker import (
    CLASSIC_24,
    determine_wb,
    extract_patch_means,
    solve_color_matrix,
)
from raw_ngp_tpu.postprocess.raw import (
    bilinear_demosaic,
    depth_to_normal,
    linear_to_srgb,
    pixels_to_bayer_mask,
    postprocess_raw,
    postprocess_raw_hdr,
    srgb_to_linear,
)
