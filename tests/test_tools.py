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


def test_exr_tools_wb_solve(monkeypatch):
    """Synthesize a mosaiced Macbeth checker under a known color matrix and
    verify the least-squares solve recovers it."""
    sys.path.insert(0, "tools")
    import exr_tools

    M_true = np.array([[1.2, -0.1, 0.05], [-0.05, 1.1, -0.02],
                       [0.02, -0.08, 1.3]])
    cam_patches = exr_tools.MACBETH @ np.linalg.inv(M_true).T
    shape = (4 * 150 + 200, 6 * 150 + 200)
    full = np.zeros((*shape, 3), np.float32)
    idx = 0
    for r in range(4):
        for c in range(6):
            full[60 + r * 150:140 + r * 150,
                 50 + c * 150:130 + c * 150] = cam_patches[idx]
            idx += 1
    img = np.zeros(shape, np.float32)
    img[0::2, 0::2] = full[0::2, 0::2, 0]
    img[0::2, 1::2] = full[0::2, 1::2, 1]
    img[1::2, 0::2] = full[1::2, 0::2, 1]
    img[1::2, 1::2] = full[1::2, 1::2, 2]
    monkeypatch.setattr(exr_tools, "load_exr_image", lambda p: img)
    M = exr_tools.solve_wb("dummy", crop=(0, 0, shape[1], shape[0]),
                           rotate_deg=0)
    assert np.abs(M - M_true).max() < 0.05


def test_exr_tools_convert_and_mask(tmp_path, monkeypatch):
    sys.path.insert(0, "tools")
    import exr_tools
    import imageio.v2 as iio

    rng = np.random.default_rng(0)
    mosaic = rng.uniform(0, 1, (32, 32)).astype(np.float32)
    monkeypatch.setattr(exr_tools, "load_exr_image", lambda p: mosaic)
    out = str(tmp_path / "o.png")
    assert exr_tools.convert_exr_to_png("dummy.exr", out)
    img = iio.imread(out)
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8

    mask = np.zeros((32, 32), np.uint8)
    mask[8:24, 8:24] = 255
    mpath = str(tmp_path / "m.png")
    iio.imwrite(mpath, mask)
    outm = str(tmp_path / "om.png")
    exr_tools.main(["mask", out, mpath, outm, "--bg", "black"])
    masked = iio.imread(outm)
    assert masked[0, 0].max() == 0
    assert masked[16, 16].max() > 0
