"""A/B sweep for march-shape variants on the real TPU chip.

Round-3 state (tools/tpu_profile.py step, v5e): the 236 ms train step
splits into march 82.5 ms, field fwd+bwd ~84 ms, bwd+opt+ema ~84 ms,
grid refresh 14.5 ms/step amortized. The march is the largest single
stage; the two-level coarse pre-pass (render/occupancy.coarse_spans)
tightens [near, far] so fewer fine candidates cover the occupied span.

This harness measures, per variant: steady-state rays/s over a timed
window AND bench.py's train-view/held-out PSNR floors at 472 steps, so
march_candidates cuts are quality-gated exactly like the round-2 hash
study.

Usage (real TPU, ~6 min per variant with a warm compile cache):
  python tools/perf_sweep.py                     # default grid
  python tools/perf_sweep.py --variants 512:0 256:32 128:32:cdf
    (march_candidates:coarse_probes[:levels:chans][:cdf])

Writes /tmp/perf_sweep.json.
"""

import argparse
import json
import os
import time
from dataclasses import replace

import numpy as np


def run_variant(march_candidates: int, coarse_probes: int,
                num_levels: int = 0, level_dim: int = 0,
                iters: int = 480, timed: int = 192,
                march_cdf: bool = False, samples_per_ray: int = 0,
                compact_ratio: float = 0.0,
                grid_partial_fraction: float = 0.0,
                sphere_scale: float = 1.0,
                max_num_rays: int = 0,
                dt_gamma: float = 0.0,
                contract: bool = False,
                probe_log: bool = False,
                cdf_floor: float = 0.0):
    # NOTE: both the warmup and the timed window must be MULTIPLES of the
    # scan-dispatch chunk (update_extra_interval = 16): a remainder would
    # compile the single-step executable inside the timed window (~45 s
    # on the tunnel) and poison the measurement.
    import jax
    from raw_ngp_tpu.config import Config
    from raw_ngp_tpu.data import make_synthetic_scene
    from raw_ngp_tpu.train import Trainer

    # EXACTLY bench.py's flagship configuration + scene
    cfg = Config().with_preset_O().with_tpu_profile()
    cfg = replace(cfg, train=replace(cfg.train, fp16=True, num_rays=8192))
    cfg = replace(cfg, render=replace(
        cfg.render, march_candidates=march_candidates,
        coarse_probes=coarse_probes, march_cdf=march_cdf))
    if samples_per_ray:
        # K (and optionally the compaction ratio) change together so a
        # variant can hold the 2^18-points-per-step budget: e.g.
        # K=S=96 with ratio 1/3 keeps 8192 * 96 / 3 = 262144
        cfg = replace(cfg, render=replace(
            cfg.render, samples_per_ray=samples_per_ray,
            compact_ratio=compact_ratio or cfg.render.compact_ratio))
    if grid_partial_fraction:
        # ROADMAP round-3c queue item: refresh fewer cells per update
        # (0.25 -> 0.125 roughly halves the ~4 ms/step amortized refresh)
        cfg = replace(cfg, render=replace(
            cfg.render, grid_partial_fraction=grid_partial_fraction))
    if num_levels:
        # ROADMAP path 4: an L x C reshape at constant L*C halves the
        # sort/segsum record count M per level halving (8 levels x C4 ->
        # 4 x C8 is M/2) at some multiresolution-ladder quality risk
        cfg = replace(cfg, model=replace(
            cfg.model, num_levels=num_levels, level_dim=level_dim))
    if max_num_rays:
        # VERDICT r4 #7: let adaptive growth run past the default 4x cap
        # on sparse scenes (tighter occupancy -> more rays at constant
        # point budget is the cheapest throughput lever)
        cfg = replace(cfg, train=replace(cfg.train,
                                         max_num_rays=max_num_rays))
    if dt_gamma or contract:
        # VERDICT r4 #6 quality gate: the unbounded/contracted regime
        # where real captures live (bound > 1, growing dt), with or
        # without the CDF composition
        cfg = replace(cfg, render=replace(
            cfg.render, dt_gamma=dt_gamma,
            contract=contract or cfg.render.contract,
            bound=2.0 if contract else cfg.render.bound,
            mark_untrained=False if contract else cfg.render.mark_untrained))
    if probe_log or cdf_floor:
        # round-5 contracted mitigations: geometric probe intervals and
        # the CDF epsilon floor (free-space supervision in center-missed
        # intervals) — see render/occupancy.cdf_candidates
        cfg = replace(cfg, render=replace(
            cfg.render, probe_log=probe_log, cdf_floor=cdf_floor))
    cfg = cfg.validate()
    train_scene, val_scene = make_synthetic_scene(
        n_train=36, n_val=2, H=128, W=128, sphere_scale=sphere_scale)
    tag = (f"{march_candidates}_{coarse_probes}"
           f"{'_cdf' if march_cdf else ''}"
           f"{'_log' if probe_log else ''}"
           f"{f'_f{cdf_floor}' if cdf_floor else ''}"
           f"{f'_L{num_levels}C{level_dim}' if num_levels else ''}"
           f"{f'_K{samples_per_ray}' if samples_per_ray else ''}"
           f"{f'_pf{grid_partial_fraction}' if grid_partial_fraction else ''}")
    tr = Trainer(cfg, train_scene, val_scene,
                 workspace=f"/tmp/sweep_ws_{tag}")
    tr.train(iters=iters - timed, log_every=10 ** 9)    # warmup + fit
    r = tr.train(iters=timed, log_every=10 ** 9)        # timed window

    held = float(tr.evaluate()["psnr"])
    rgb_t, _ = tr.render_image(train_scene.poses[0], train_scene.intrinsics,
                               train_scene.H, train_scene.W)
    gt_t = np.asarray(train_scene.images[0][..., :3])
    mse = float(np.mean((np.clip(np.asarray(rgb_t), 0, 1) - gt_t) ** 2))
    return {
        "march_candidates": march_candidates,
        "coarse_probes": coarse_probes,
        "march_cdf": march_cdf,
        "rays_per_sec": round(r["rays_per_sec"], 1),
        "ms_per_step": round(1e3 * r["wall_time"] / timed, 1),
        "num_rays_settled": tr.num_rays,
        "live_pts_per_step": (round(float(tr._pts_ema), 1)
                              if tr._pts_ema is not None else None),
        "psnr_trainview": round(-10.0 * np.log10(mse + 1e-12), 3),
        "psnr_heldout": round(held, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", nargs="*",
                    default=["512:0", "512:32", "256:32", "256:64",
                             "192:64", "256:32:4:8"],
                    help="march_candidates:coarse_probes[:levels:chans]")
    ap.add_argument("--out", default="/tmp/perf_sweep.json")
    # Warmup must cover BOTH compiles: the initial 8192-ray executable AND
    # the adaptive-growth 16384-ray respecialization (fires ~step 300 on
    # the bench scene) — a cold remote compile (~45-90 s on the tunnel)
    # landing inside the timed window poisons the row (measured 03/2026:
    # 620 "ms/step" rows that were really one compile + fast steps).
    ap.add_argument("--iters", type=int, default=672)
    ap.add_argument("--timed", type=int, default=192)
    ap.add_argument("--sphere_scale", type=float, default=1.0,
                    help="shrink the scene geometry (sparser occupancy; "
                         "VERDICT r4 #7 adaptive ray-growth study)")
    ap.add_argument("--max_num_rays", type=int, default=0,
                    help="raise the adaptive growth cap (default 4x base)")
    ap.add_argument("--dt_gamma", type=float, default=0.0,
                    help="growing-dt schedule (composes with march_cdf)")
    ap.add_argument("--contract", action="store_true",
                    help="MeRF contraction at bound=2 (cascades=2)")
    args = ap.parse_args()
    assert args.timed % 16 == 0 and (args.iters - args.timed) % 16 == 0
    os.environ.setdefault("RAW_NGP_COMPILE_CACHE", "/tmp/raw_ngp_jax_cache")

    results = []
    for v in args.variants:
        toks = v.split(":")
        cdf = "cdf" in toks
        plog = "log" in toks
        K = next((int(t[1:]) for t in toks
                  if t.startswith("k") and t != "cdf"), 0)
        pf = next((float(t[2:]) for t in toks if t.startswith("pf")), 0.0)
        fl = next((float(t[1:]) for t in toks
                   if t.startswith("f") and len(t) > 1
                   and t[1] in "0123456789."), 0.0)
        ratio = next((float(t[1:]) for t in toks
                      if t.startswith("r") and not t.startswith("pf")), 0.0)
        parts = [int(t) for t in toks
                 if t not in ("cdf", "log")
                 and not t.startswith(("k", "r", "pf", "f"))]
        mc, cp = parts[0], parts[1]
        L, C = (parts[2], parts[3]) if len(parts) > 2 else (0, 0)
        t0 = time.time()
        rec = run_variant(mc, cp, L, C, march_cdf=cdf,
                          samples_per_ray=K, compact_ratio=ratio,
                          grid_partial_fraction=pf,
                          iters=args.iters, timed=args.timed,
                          sphere_scale=args.sphere_scale,
                          max_num_rays=args.max_num_rays,
                          dt_gamma=args.dt_gamma, contract=args.contract,
                          probe_log=plog, cdf_floor=fl)
        if plog:
            rec["probe_log"] = True
        if fl:
            rec["cdf_floor"] = fl
        if pf:
            rec["grid_partial_fraction"] = pf
        if K:
            rec["samples_per_ray"] = K
            rec["compact_ratio"] = ratio
        if L:
            rec["levels_x_chans"] = f"{L}x{C}"
        rec["wall_s"] = round(time.time() - t0, 1)
        results.append(rec)
        print(json.dumps(rec), flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    base = results[0]
    best = max(results, key=lambda r: r["rays_per_sec"]
               if r["psnr_trainview"] >= base["psnr_trainview"] - 0.3
               else -1)
    print(json.dumps({"baseline": base, "best_quality_gated": best}))


if __name__ == "__main__":
    main()
