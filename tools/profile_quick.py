"""Quick full-step timing on the real TPU (bench config). ~3 min."""

import time
from dataclasses import replace

import jax


def main():
    from raw_ngp_tpu.config import Config
    from raw_ngp_tpu.data import make_synthetic_scene
    from raw_ngp_tpu.train import Trainer

    cfg = Config().with_preset_O().with_tpu_profile()
    cfg = replace(cfg, train=replace(cfg.train, fp16=True, num_rays=8192))
    cfg = cfg.validate()
    print("hash_variant:", cfg.model.hash_variant)

    tr = Trainer(cfg, *make_synthetic_scene(n_train=8, n_val=1, H=128,
                                            W=128),
                 workspace="/tmp/prof_ws2")
    tr.train(iters=20, log_every=1000)  # warmup/compile
    t0 = time.time()
    tr.train(iters=50, log_every=1000)
    jax.device_get(tr.state.mean_density)
    dt = (time.time() - t0) / 50 * 1000
    print(f"FULL TRAIN STEP: {dt:.2f} ms -> "
          f"{cfg.train.num_rays / dt * 1000:,.0f} rays/s")


if __name__ == "__main__":
    main()
