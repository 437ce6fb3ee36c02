"""Benchmark: flagship occupancy-path training throughput on real hardware.

Prints ONE JSON line:
  {"metric": "train_rays_per_sec", "value": N, "unit": "rays/s",
   "vs_baseline": N / BASELINE_RAYS_PER_SEC}

Baseline: the reference publishes no numbers (BASELINE.md); the north-star
target from BASELINE.json is >=2x torch-ngp A100 rays/sec. Published
torch-ngp-style trainers sustain ~2.5e5 rays/s on A100 at the default
2^18-points-per-step budget, so vs_baseline is measured against
2 * 2.5e5 = 5e5 rays/s. vs_baseline >= 1.0 means the target is met.

Accounting (VERDICT r3 weak #1): throughput is the trainer's OWN meter
(train() returns total_rays/dt where total_rays accumulates the actual
per-dispatch num_rays) over a window in which the adaptive batch has
SETTLED — warmup continues until (num_rays, point budget) is unchanged
for 3 consecutive refresh intervals, and the timed window asserts
num_rays stayed constant. Both live-points/s (measured live samples)
and candidate-points/s (num_rays * samples_per_ray) are reported.

TWO scenes are measured (VERDICT r4 #2): the flagship dense 128^2 scene
(the honest worst case — its occupancy keeps the adaptive batch at 16384
rays) and a sparse scene (sphere_scale 0.35) whose occupancy lets
adaptive growth reach 32768 rays — the regime where the 5e5 target is
met. The headline value/vs_baseline stays the flagship (worst-case
honesty); the sparse row ships in extra["sparse_scene"] with the same
settled-window fields. RAW_NGP_BENCH_SCENES=flagship skips the second
scene (halves bench wall time for quick regression checks).
"""

import json
import os
import sys
import time
from dataclasses import replace

import numpy as np

BASELINE_RAYS_PER_SEC = 5.0e5


def run_scene(cfg, train_scene, val_scene, workspace):
    """Train to a settled adaptive batch, time a clean window, and return
    the measurement row (shared by the flagship and sparse scenes)."""
    from raw_ngp_tpu.train import Trainer

    interval = cfg.render.update_extra_interval
    tr = Trainer(cfg, train_scene, val_scene, workspace=workspace)

    # warmup: compile + the 16 FULL density-grid sweeps (renderer.py:824
    # cadence: refreshes 0-15 sweep every cell; steady state uses the much
    # cheaper partial refresh)
    tr.train(iters=18 * interval, log_every=1000)

    # let the adaptive batch SETTLE: growth respecializes the executable
    # and changes num_rays; timing across that transition mixes two batch
    # sizes (and, on a cold remote cache, hides a recompile inside the
    # window). Growth keys off the live-sample EMA, which keeps FALLING
    # as the occupancy grid prunes, so it can fire hundreds of steps
    # after warmup — interval-count heuristics twice opened the window
    # too early, and a margin on the growth criterion alone was beaten
    # once more by the trend (the EMA crosses the whole margin band on
    # its way down). Settle until (a) 6 unchanged intervals, (b) the
    # trainer reports no adaptation within margin of firing, AND (c) the
    # EMA itself has PLATEAUED (<3% move over the last 3 intervals);
    # hard cap so a never-settling config still terminates (flagged).
    # ... AND (d) a minimum settle horizon: the sparse scene's raw demand
    # PLATEAUS above the budget until the occupancy prune cliff (~step
    # 400-670) collapses per-ray demand ~7x and growth fires — an
    # instantaneous trend check cannot see a delayed cliff, so the
    # round-5 sparse window once opened at step 384 in a local plateau
    # (8192 rays) when the true steady state is 32768 (ROADMAP round-4
    # sparse section). 24 intervals puts the earliest window opening at
    # step 672, the perf_sweep horizon where that steady state was
    # measured.
    stable = settled = 0
    ema_hist = []
    while settled < 90:
        before = (tr.num_rays, tr._point_budget)
        tr.train(iters=interval, log_every=10 ** 9)
        settled += 1
        stable = stable + 1 if (tr.num_rays, tr._point_budget) == before \
            else 0
        ema_hist.append(tr._pts_ema)
        ema_flat = (len(ema_hist) >= 4
                    and ema_hist[-4] is not None
                    and ema_hist[-1] is not None
                    and abs(ema_hist[-1] - ema_hist[-4])
                    <= 0.03 * ema_hist[-1])
        if settled >= 24 and stable >= 6 and ema_flat \
                and tr.adaptation_quiescent():
            break
    settle_capped = settled >= 90

    # steady-state measurement, MULTIPLE of the scan-dispatch chunk
    # (a remainder would compile the single-step executable inside the
    # timed window, ~45 s on the tunnel). The settle heuristics above
    # minimize the chance of a respecialization landing mid-window, but
    # the growth EMA crawls asymptotically through every threshold
    # (three settle heuristics were each beaten once), so the window
    # itself is the final arbiter: if (num_rays, point budget) changed
    # inside it, the timing contains a recompile — discard and re-time
    # (the respecialized executable is then already compiled, so the
    # retry window is clean by construction).
    iters = 12 * interval
    attempts = 0
    while True:
        attempts += 1
        key_at_open = (tr.num_rays, tr._point_budget)
        res = tr.train(iters=iters, log_every=10 ** 9)
        batch_settled = ((tr.num_rays, tr._point_budget) == key_at_open)
        if batch_settled or attempts >= 3:
            break

    # the trainer's own meter: total_rays/dt with total_rays accumulated
    # per dispatch at the num_rays actually in effect (trainer.py train())
    rays_per_sec = res["rays_per_sec"]
    ms_per_step = res["wall_time"] / iters * 1e3
    # live samples actually evaluated by the field per step vs the
    # K-candidate upper bound. The trainer EMA now tracks the RAW demand
    # (pre budget-decimation), so evaluated = min(demand, point budget).
    # None (not NaN) when adaptive batching is off: NaN is not valid JSON
    budget_now = tr._point_budget or tr.base_point_budget()
    live_pts = (min(float(tr._pts_ema), float(budget_now))
                if tr._pts_ema is not None else None)
    steps_per_sec = rays_per_sec / tr.num_rays
    live_points_per_sec = (steps_per_sec * live_pts
                           if live_pts is not None else None)
    candidate_points_per_sec = rays_per_sec * cfg.render.samples_per_ray

    # quality benchmark beside throughput (VERDICT r1 #6; protocol mirrors
    # debug/eval.py:157-205 pred-vs-gt PSNR). Two numbers:
    # * train-view PSNR: the sharp regression metric — training-math or
    #   rendering regressions tank it immediately;
    # * held-out PSNR: view generalization (36 views is sparse; see
    #   ROADMAP quality notes).
    psnr = tr.evaluate()["psnr"]
    rgb_t, _ = tr.render_image(train_scene.poses[0], train_scene.intrinsics,
                               train_scene.H, train_scene.W)
    gt_t = train_scene.images[0][..., :3]
    mse_t = float(np.mean((np.clip(rgb_t, 0, 1) - gt_t) ** 2))
    psnr_train = -10.0 * np.log10(mse_t + 1e-12)

    return {
        "rays_per_sec": round(rays_per_sec, 1),
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
        "ms_per_step": round(ms_per_step, 2),
        "num_rays": tr.num_rays,
        "batch_settled_across_window": batch_settled,
        "window_attempts": attempts,
        "settle_capped": settle_capped,
        "live_points_per_step": (round(live_pts, 1)
                                 if live_pts is not None else None),
        "live_points_per_sec": (round(live_points_per_sec, 1)
                                if live_points_per_sec is not None
                                else None),
        "candidate_points_per_sec": round(candidate_points_per_sec, 1),
        "iters": iters,
        "wall_time_s": round(res["wall_time"], 2),
        "samples_per_ray": cfg.render.samples_per_ray,
        "steps_total": tr.host_step,
        "psnr_trainview": round(float(psnr_train), 3),
        "psnr_heldout": round(float(psnr), 3),
    }


def main():
    # compile cache: NOTE this is best-effort only — compilation happens
    # on the far side of the tpu tunnel, where the REMOTE cache (not this
    # local dir) decides warmup cost; after a relay restart every first
    # run pays full compiles (~400 s). See ROADMAP "Timing trap".
    os.environ.setdefault("RAW_NGP_COMPILE_CACHE", "/tmp/raw_ngp_jax_cache")

    import jax

    from raw_ngp_tpu.config import Config
    from raw_ngp_tpu.data import make_synthetic_scene

    # flagship: occupancy marching with the TPU hash-grid profile (same
    # param count & MLP widths as the reference; see with_tpu_profile), at
    # the reference's EXACT 2^18-points-per-step budget: 8192 rays x K=64
    # candidates x 0.5 compaction = 262144 field evaluations per step
    # (the reference's adaptive_num_rays settles in this rays regime too)
    cfg = Config().with_preset_O().with_tpu_profile()
    cfg = replace(cfg, train=replace(cfg.train, fp16=True, num_rays=8192))
    cfg = cfg.validate()

    scenes = os.environ.get("RAW_NGP_BENCH_SCENES", "both")
    flagship = None
    if scenes != "sparse":
        train_scene, val_scene = make_synthetic_scene(
            n_train=36, n_val=2, H=128, W=128)
        flagship = run_scene(cfg, train_scene, val_scene, "/tmp/bench_ws")

    extra = {}
    if flagship is not None:
        extra = dict(flagship)
        extra.pop("rays_per_sec")
        extra.pop("vs_baseline")
        # floor raised 27 -> 31 after the round-4 20k-schedule runs
        # (bench-horizon train-view measured 33.99-36.24 across round-4
        # configurations; a drop below 31 means a real training/rendering
        # regression, not noise)
        extra["psnr_trainview_floor"] = 31.0
    extra["backend"] = jax.default_backend()

    # sparse scene: occupancy prunes enough that adaptive growth reaches
    # 32768 rays at the same 2^18 budget — the regime where one chip
    # exceeds the 5e5 target (ROADMAP round-4 sparse-scene section)
    if scenes != "flagship":
        cfg_s = replace(cfg, train=replace(cfg.train, max_num_rays=32768))
        tr_s, va_s = make_synthetic_scene(
            n_train=36, n_val=2, H=128, W=128, sphere_scale=0.35)
        extra["sparse_scene"] = run_scene(cfg_s, tr_s, va_s,
                                          "/tmp/bench_ws_sparse")

    head = flagship if flagship is not None else extra["sparse_scene"]
    result = {
        "metric": "train_rays_per_sec",
        "value": head["rays_per_sec"],
        "unit": "rays/s",
        "vs_baseline": head["vs_baseline"],
        "extra": extra,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
