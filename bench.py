"""Benchmark: flagship occupancy-path training throughput on real hardware.

Prints ONE JSON line:
  {"metric": "train_rays_per_sec", "value": N, "unit": "rays/s",
   "vs_baseline": N / BASELINE_RAYS_PER_SEC}

Baseline: the reference publishes no numbers (BASELINE.md); the north-star
target from BASELINE.json is >=2x torch-ngp A100 rays/sec. Published
torch-ngp-style trainers sustain ~2.5e5 rays/s on A100 at the default
2^18-points-per-step budget, so vs_baseline is measured against
2 * 2.5e5 = 5e5 rays/s. vs_baseline >= 1.0 means the target is met.
"""

import json
import os
import sys
import time
from dataclasses import replace

import numpy as np

BASELINE_RAYS_PER_SEC = 5.0e5


def main():
    # persistent compilation cache: the bench pays ~400 s of warmup
    # compiles otherwise; the cache survives in /tmp across driver runs
    # on this machine (opt-out by pre-setting RAW_NGP_COMPILE_CACHE="").
    os.environ.setdefault("RAW_NGP_COMPILE_CACHE", "/tmp/raw_ngp_jax_cache")

    import jax

    from raw_ngp_tpu.config import Config
    from raw_ngp_tpu.data import make_synthetic_scene
    from raw_ngp_tpu.train import Trainer

    # flagship: occupancy marching with the TPU hash-grid profile (same
    # param count & MLP widths as the reference; see with_tpu_profile), at
    # the reference's EXACT 2^18-points-per-step budget: 8192 rays x K=64
    # candidates x 0.5 compaction = 262144 field evaluations per step
    # (the reference's adaptive_num_rays settles in this rays regime too)
    cfg = Config().with_preset_O().with_tpu_profile()
    cfg = replace(cfg, train=replace(cfg.train, fp16=True, num_rays=8192))
    cfg = cfg.validate()

    train_scene, val_scene = make_synthetic_scene(
        n_train=36, n_val=2, H=128, W=128)
    tr = Trainer(cfg, train_scene, val_scene, workspace="/tmp/bench_ws")

    # warmup: compile + the 16 FULL density-grid sweeps (renderer.py:824
    # cadence: refreshes 0-15 sweep every cell; steady state uses the much
    # cheaper partial refresh, so measure past refresh 16 like a real run)
    warmup = 18 * cfg.render.update_extra_interval   # 288: past the 16
    tr.train(iters=warmup, log_every=1000)           # full-sweep refreshes

    # steady-state measurement. MULTIPLE of the scan-dispatch chunk
    # (update_extra_interval): a remainder would compile the single-step
    # executable inside the timed window (~45 s on the tunnel).
    iters = 12 * cfg.render.update_extra_interval
    t0 = time.time()
    tr.train(iters=iters, log_every=10 ** 9)
    jax.block_until_ready(tr.state.params["grid"])
    dt = time.time() - t0

    rays_per_sec = iters * tr.num_rays / dt
    points_per_sec = rays_per_sec * cfg.render.samples_per_ray

    # quality benchmark beside throughput (VERDICT r1 #6; protocol mirrors
    # debug/eval.py:157-205 pred-vs-gt PSNR). Two numbers:
    # * train-view PSNR: the sharp regression metric — training-math or
    #   rendering regressions tank it immediately (measured ~29-31 dB at 480
    #   steps on this scene);
    # * held-out PSNR: view generalization; at 36 views this scene is
    #   sparse and hash-collision structure dominates it (see
    #   ROADMAP.md quality notes).
    psnr = tr.evaluate()["psnr"]
    rgb_t, _ = tr.render_image(train_scene.poses[0], train_scene.intrinsics,
                               train_scene.H, train_scene.W)
    gt_t = train_scene.images[0][..., :3]
    mse_t = float(np.mean((np.clip(rgb_t, 0, 1) - gt_t) ** 2))
    psnr_train = -10.0 * np.log10(mse_t + 1e-12)

    result = {
        "metric": "train_rays_per_sec",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
        "extra": {
            "points_per_sec": round(points_per_sec, 1),
            "iters": iters,
            "wall_time_s": round(dt, 2),
            "num_rays": tr.num_rays,
            "samples_per_ray": cfg.render.samples_per_ray,
            "psnr_trainview_at_480_steps": round(float(psnr_train), 3),
            "psnr_trainview_floor": 27.0,
            "psnr_heldout_at_480_steps": round(float(psnr), 3),
            "backend": jax.default_backend(),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
