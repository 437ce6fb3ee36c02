"""Golden-image regression: a fully deterministic tiny training run whose
rendered output is compared against a committed golden render (the
hermetic version of the reference's debug/eval.py protocol, SURVEY §4c).

Regenerate the golden after INTENTIONAL rendering-math changes with:
  JAX_PLATFORMS=cpu python tests/test_golden.py regenerate
"""

import os
import sys
from dataclasses import replace

import numpy as np

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden",
                           "proposal_render_v1.npy")


def _train_and_render():
    import jax
    from raw_ngp_tpu.config import Config
    from raw_ngp_tpu.data import make_synthetic_scene
    from raw_ngp_tpu.train import Trainer

    cfg = Config()
    cfg = replace(cfg, model=replace(
        cfg.model, num_levels=4, log2_hashmap_size=12,
        hashgrid_resolution=64, grid_mlp_hidden=16, view_mlp_hidden=16,
        prop_num_levels=3, prop_log2_hashmap_size=10,
        prop_resolutions=(16, 32), fused_encoder=False))
    cfg = replace(cfg, render=replace(cfg.render, num_steps=(24, 12, 8),
                                      max_ray_batch=4096))
    cfg = replace(cfg, train=replace(
        cfg.train, iters=150, num_rays=512, seed=0, fp16=False,
        random_image_batch=True))
    cfg = replace(cfg, ckpt="scratch").validate()
    train_scene, val_scene = make_synthetic_scene(n_train=12, n_val=1,
                                                  H=32, W=32, seed=0)
    tr = Trainer(cfg, train_scene, val_scene, workspace="/tmp/ws_golden")
    tr.train(iters=150, log_every=150)
    rgb, _ = tr.render_image(val_scene.poses[0])
    return rgb.astype(np.float32), val_scene.images[0]


def test_golden_render():
    if not os.path.exists(GOLDEN_PATH):
        import pytest
        pytest.skip("golden file missing (run regenerate)")
    rgb, gt = _train_and_render()
    golden = np.load(GOLDEN_PATH)
    mse = float(np.mean((rgb - golden) ** 2))
    psnr_vs_golden = -10 * np.log10(max(mse, 1e-12))
    # tight against the committed golden (catches silent math changes),
    # loose enough for cross-version jnp drift
    assert psnr_vs_golden > 35.0, f"render drifted: {psnr_vs_golden:.2f} dB"
    # and it must still resemble the ground truth
    mse_gt = float(np.mean((np.clip(rgb, 0, 1) - gt) ** 2))
    assert -10 * np.log10(max(mse_gt, 1e-12)) > 14.0


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
