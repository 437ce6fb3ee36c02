from raw_ngp_tpu.train.losses import (
    blend_gt_background,
    entropy_loss,
    gaussian_weighting,
    hanning_weighting,
    ldr_loss,
    loss_weight_fn,
    planck_taper_weighting,
    rawnerf_loss,
)
from raw_ngp_tpu.train.checkpoint import (
    load_checkpoint,
    resolve_checkpoint,
    save_checkpoint,
)
from raw_ngp_tpu.train.metrics import (
    LPIPSMeter,
    PSNRMeter,
    SSIMMeter,
    rmse,
    ssim,
)
from raw_ngp_tpu.train.state import TrainState
from raw_ngp_tpu.train.trainer import (
    Trainer,
    init_train_state,
    make_eval_render,
    make_optimizers,
    make_train_step,
    network_lr_schedule,
    pose_lr_schedule,
)
