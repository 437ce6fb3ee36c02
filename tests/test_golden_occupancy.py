"""Golden-image regression for the FLAGSHIP configuration: occupancy
marching + fused encoder + additive hash + grid refresh in the loop
(the composition bench.py ships; VERDICT r2 #4). The proposal-path
golden (test_golden.py) does not cover this composition — a
rendering-math regression in the occupancy+fused path previously could
only be caught by the TPU-only bench PSNR floor.

v2 (VERDICT r3 #5): pins the SHIPPED march composition — S == K (the
early-return no-scatter path at render/occupancy.py march_rays),
march_cdf + coarse probes (inverse-CDF candidate placement), and
composite_rays_compacted on the compacted stream — scaled down like
before. The v1 golden used S=96/K=24, which exercised the compaction
scatter branch the flagship no longer takes.

Regenerate after INTENTIONAL rendering-math changes with:
  PYTHONPATH=. python tests/test_golden_occupancy.py regenerate
"""

import os
import sys
from dataclasses import replace

import numpy as np

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden",
                           "occupancy_render_v2.npy")


def _train_and_render():
    import jax
    from raw_ngp_tpu.config import Config
    from raw_ngp_tpu.data import make_synthetic_scene
    from raw_ngp_tpu.train import Trainer

    # miniature of bench.py's flagship: -O occupancy + tpu profile
    # (additive hash, fused encoder), deterministic, fp32 for hermetic
    # cross-platform stability, grid refresh firing in the loop
    cfg = Config().with_preset_O().with_tpu_profile()
    # num_levels / level_dim inherit from the profile so this golden
    # tracks the shipped flagship grid shape
    cfg = replace(cfg, model=replace(
        cfg.model, log2_hashmap_size=12,
        hashgrid_resolution=64, grid_mlp_hidden=16, view_mlp_hidden=16))
    # S == K + march_cdf + probes: the flagship march composition (the
    # with_tpu_profile() preset sets march_cdf=True, coarse_probes=16;
    # S == K takes the early-return no-scatter path and the default
    # compact_ratio routes compositing through composite_rays_compacted)
    cfg = replace(cfg, render=replace(
        cfg.render, grid_size=32, samples_per_ray=24, march_candidates=24,
        max_ray_batch=4096))
    cfg = replace(cfg, train=replace(
        cfg.train, iters=150, num_rays=512, seed=0, fp16=False,
        adaptive_num_rays=False))
    cfg = replace(cfg, ckpt="scratch").validate()
    # the golden must pin the shipped march composition — fail loudly if
    # a preset change silently reroutes it to another branch
    assert (cfg.render.samples_per_ray == cfg.render.march_candidates
            and cfg.render.march_cdf and cfg.render.coarse_probes > 0
            and cfg.render.compact_ratio > 0), "not the flagship branch"
    train_scene, val_scene = make_synthetic_scene(n_train=12, n_val=1,
                                                  H=32, W=32, seed=0)
    tr = Trainer(cfg, train_scene, val_scene,
                 workspace="/tmp/ws_golden_occ")
    tr.train(iters=150, log_every=150)
    rgb, _ = tr.render_image(val_scene.poses[0])
    return rgb.astype(np.float32), val_scene.images[0]


def test_golden_render_occupancy():
    if not os.path.exists(GOLDEN_PATH):
        import pytest
        pytest.skip("golden file missing (run regenerate)")
    rgb, gt = _train_and_render()
    golden = np.load(GOLDEN_PATH)
    mse = float(np.mean((rgb - golden) ** 2))
    psnr_vs_golden = -10 * np.log10(max(mse, 1e-12))
    assert psnr_vs_golden > 35.0, f"render drifted: {psnr_vs_golden:.2f} dB"
    # GT resemblance is a sanity floor only (12.9 dB at regeneration —
    # 150 steps on a 32x32 scene); the drift assertion above is the net
    mse_gt = float(np.mean((np.clip(rgb, 0, 1) - gt) ** 2))
    assert -10 * np.log10(max(mse_gt, 1e-12)) > 12.0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "regenerate":
        sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
        import conftest  # noqa: F401  (forces CPU backend)
        rgb, gt = _train_and_render()
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        np.save(GOLDEN_PATH, rgb)
        mse_gt = float(np.mean((np.clip(rgb, 0, 1) - gt) ** 2))
        print(f"wrote {GOLDEN_PATH}; PSNR vs GT = "
              f"{-10 * np.log10(max(mse_gt, 1e-12)):.2f} dB")
