from raw_ngp_tpu.postprocess.raw import (
    bilinear_demosaic,
    depth_to_normal,
    linear_to_srgb,
    pixels_to_bayer_mask,
    postprocess_raw,
    postprocess_raw_hdr,
    srgb_to_linear,
)
