"""Tests for offline tooling (offline_eval, colmap2nerf, downscale) and
the encoder factory."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax

from raw_ngp_tpu.ops.encoding import get_encoder


def test_encoder_factory():
    enc, dim, _ = get_encoder(None, input_dim=3)
    assert dim == 3
    enc, dim, _ = get_encoder("sh", degree=4)
    assert dim == 16
    out = enc(np.array([[0.0, 0, 1.0]]))
    assert out.shape == (1, 16)
    enc, dim, _ = get_encoder("frequency", input_dim=3, freq_degree=6)
    assert dim == 3 * 13
    enc, dim, state = get_encoder("hashgrid", num_levels=4,
                                  log2_hashmap_size=10,
                                  desired_resolution=64,
                                  key=jax.random.PRNGKey(0))
    assert dim == 8
    out = enc(np.random.default_rng(0).uniform(-1, 1, (5, 3))
              .astype(np.float32), bound=1.0)
    assert out.shape == (5, 8)
    enc_t, dim_t, _ = get_encoder("tiledgrid", num_levels=4,
                                  log2_hashmap_size=10,
                                  desired_resolution=64)
    assert dim_t == 8
    with pytest.raises(ValueError):
        get_encoder("bogus")


def test_offline_eval(tmp_path):
    sys.path.insert(0, "tools")
    import offline_eval

    d = str(tmp_path)
    rng = np.random.default_rng(0)
    for i in range(3):
        gt = rng.uniform(0, 1, (24, 24, 3)).astype(np.float32)
        pred = np.clip(gt + rng.normal(0, 0.05, gt.shape), 0, 1)
        np.save(os.path.join(d, f"pred_{i:03d}.npy"), pred)
        np.save(os.path.join(d, f"gt_{i:03d}.npy"), gt)
    result = offline_eval.main([d])
    assert result["n_images"] == 3
    assert 20 < result["psnr"] < 35
    assert 0 < result["ssim"] <= 1
    # raw postprocess path
    result2 = offline_eval.main([d, "--raw", "--calibration",
                                 _write_calib(tmp_path)])
    assert np.isfinite(result2["psnr"])


def _write_calib(tmp_path):
    p = str(tmp_path / "calib.json")
    with open(p, "w") as f:
        json.dump({"cam2rgb": np.eye(3).tolist(), "exposure": 1.0}, f)
    return p


def test_colmap2nerf(tmp_path):
    sys.path.insert(0, "tools")
    sys.path.insert(0, "tests")
    import colmap2nerf
    from test_providers import make_colmap_dataset

    root = make_colmap_dataset(str(tmp_path))
    out = colmap2nerf.main([root])
    with open(out) as f:
        t = json.load(f)
    assert len(t["frames"]) == 10
    assert t["w"] == 48 and t["h"] == 40
    m = np.array(t["frames"][0]["transform_matrix"])
    assert m.shape == (4, 4)
    # result is loadable by the nerf provider
    from dataclasses import replace
    from raw_ngp_tpu.config import Config
    from raw_ngp_tpu.data.providers import load_nerf_scene
    cfg = Config()
    cfg = replace(cfg, data=replace(cfg.data, path=root,
                                    data_format="nerf", scale=1.0))
    scene = load_nerf_scene(cfg, "train")
    assert scene.n_images == 8      # 10 minus every-8th val


def test_downscale(tmp_path):
    import cv2
    sys.path.insert(0, "tools")
    import downscale

    os.makedirs(tmp_path / "images")
    for i in range(2):
        cv2.imwrite(str(tmp_path / "images" / f"{i}.png"),
                    np.zeros((64, 48, 3), np.uint8))
    downscale.main([str(tmp_path), "--factor", "4"])
    out = cv2.imread(str(tmp_path / "images_4" / "0.png"))
    assert out.shape == (16, 12, 3)
