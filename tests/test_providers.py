"""Provider tests: COLMAP binary IO round-trip, full COLMAP pipeline on a
generated on-disk dataset, transforms.json loader, RAW postprocess math."""

import json
import os
from dataclasses import replace

import numpy as np
import pytest

from raw_ngp_tpu.config import Config
from raw_ngp_tpu.data.colmap_io import (
    ColmapCamera,
    ColmapImage,
    ColmapPoint3D,
    qvec_to_rotmat,
    read_cameras_binary,
    read_images_binary,
    read_points3d_binary,
    write_cameras_binary,
    write_images_binary,
    write_points3d_binary,
)
from raw_ngp_tpu.data.providers import (
    load_colmap_scene,
    load_nerf_scene,
    load_scene,
)
from raw_ngp_tpu.data.reflectance import (
    load_light_dirs,
    write_light_dirs_calibration,
)
from raw_ngp_tpu.data.synthetic import look_at_pose, make_synthetic_scene
from raw_ngp_tpu.postprocess.raw import (
    bilinear_demosaic,
    linear_to_srgb,
    pixels_to_bayer_mask,
    postprocess_raw,
    srgb_to_linear,
)


def _rotmat_to_qvec(R):
    """Inverse of qvec_to_rotmat for test data."""
    t = np.trace(R)
    w = np.sqrt(max(0, 1 + t)) / 2
    x = (R[2, 1] - R[1, 2]) / (4 * w)
    y = (R[0, 2] - R[2, 0]) / (4 * w)
    z = (R[1, 0] - R[0, 1]) / (4 * w)
    return np.array([w, x, y, z])


def make_colmap_dataset(root, n_images=10, H=40, W=48):
    """Synthesize a valid COLMAP dataset with rendered LDR images."""
    import cv2
    os.makedirs(os.path.join(root, "sparse", "0"), exist_ok=True)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)

    cams = {1: ColmapCamera(1, "PINHOLE", W, H,
                            np.array([50.0, 50.0, W / 2, H / 2]))}
    write_cameras_binary(cams, os.path.join(root, "sparse/0/cameras.bin"))

    rng = np.random.default_rng(0)
    images = {}
    for i in range(n_images):
        theta = 2 * np.pi * i / n_images
        eye = np.array([3 * np.cos(theta), 3 * np.sin(theta), 1.0])
        c2w_gl = look_at_pose(eye, np.zeros(3))
        # COLMAP poses are OpenCV-convention (y down, camera looks +z)
        c2w_cv = c2w_gl @ np.diag([1.0, -1.0, -1.0, 1.0])
        w2c = np.linalg.inv(c2w_cv)
        q = _rotmat_to_qvec(w2c[:3, :3])
        xys = rng.uniform(0, [W, H], (20, 2))
        pids = rng.integers(1, 50, 20).astype(np.int64)
        images[i + 1] = ColmapImage(i + 1, q, w2c[:3, 3], 1,
                                    f"img_{i:03d}.png", xys, pids)
        img = (rng.uniform(0, 255, (H, W, 3))).astype(np.uint8)
        cv2.imwrite(os.path.join(root, "images", f"img_{i:03d}.png"), img)
    write_images_binary(images, os.path.join(root, "sparse/0/images.bin"))

    pts = {k: ColmapPoint3D(k, rng.uniform(-1, 1, 3),
                            rng.integers(0, 255, 3), rng.uniform(0.1, 2))
           for k in range(1, 50)}
    write_points3d_binary(pts, os.path.join(root, "sparse/0/points3D.bin"))
    return root


def test_colmap_binary_roundtrip(tmp_path):
    root = make_colmap_dataset(str(tmp_path))
    cams = read_cameras_binary(os.path.join(root, "sparse/0/cameras.bin"))
    assert cams[1].model == "PINHOLE"
    assert cams[1].width == 48
    ims = read_images_binary(os.path.join(root, "sparse/0/images.bin"))
    assert len(ims) == 10
    assert ims[1].name == "img_000.png"
    assert ims[1].point3d_ids.dtype == np.int64
    pts = read_points3d_binary(os.path.join(root, "sparse/0/points3D.bin"))
    assert len(pts) == 49


def test_qvec_rotmat_identity():
    R = qvec_to_rotmat(np.array([1.0, 0, 0, 0]))
    np.testing.assert_allclose(R, np.eye(3), atol=1e-12)


def test_load_colmap_scene(tmp_path):
    root = make_colmap_dataset(str(tmp_path))
    cfg = Config()
    cfg = replace(cfg, data=replace(cfg.data, path=root,
                                    data_format="colmap"))
    train = load_colmap_scene(cfg, "train")
    val = load_colmap_scene(cfg, "val")
    assert train.images.shape[1:] == (40, 48, 3)
    assert train.n_images + val.n_images == 10
    assert val.n_images == 2                     # every 8th of 10
    # poses auto-scaled: mean camera distance ~1
    dist = np.linalg.norm(train.poses[:, :3, 3], axis=-1).mean()
    assert 0.5 < dist < 2.0
    assert train.pts_aabb is not None
    # camera convention: cameras should look roughly at the origin
    fwd = -train.poses[:, :3, 2]
    to_origin = -train.poses[:, :3, 3]
    to_origin /= np.linalg.norm(to_origin, axis=-1, keepdims=True)
    cos = (fwd * to_origin).sum(-1)
    assert np.mean(cos) > 0.7


def test_load_colmap_test_trajectories(tmp_path):
    root = make_colmap_dataset(str(tmp_path))
    cfg = Config()
    cfg = replace(cfg, data=replace(cfg.data, path=root,
                                    data_format="colmap",
                                    camera_traj="circle"))
    test = load_colmap_scene(cfg, "test")
    assert test.poses.shape == (100, 4, 4)
    cfg2 = replace(cfg, data=replace(cfg.data, camera_traj="interp"))
    test2 = load_colmap_scene(cfg2, "test", n_test=6)
    assert len(test2.poses) > 10


def test_load_nerf_scene_blender(tmp_path):
    import cv2
    root = str(tmp_path)
    os.makedirs(os.path.join(root, "train"))
    frames = []
    for i in range(4):
        pose = look_at_pose(np.array([2.0, i * 0.1, 1.0]), np.zeros(3))
        name = f"train/r_{i}"
        cv2.imwrite(os.path.join(root, name + ".png"),
                    np.full((32, 32, 3), 128, np.uint8))
        frames.append({"file_path": name,
                       "transform_matrix": pose.tolist()})
    with open(os.path.join(root, "transforms_train.json"), "w") as f:
        json.dump({"camera_angle_x": 0.8, "frames": frames}, f)
    cfg = Config()
    cfg = replace(cfg, data=replace(cfg.data, path=root,
                                    data_format="nerf", scale=0.8))
    scene = load_nerf_scene(cfg, "train")
    assert scene.images.shape == (4, 32, 32, 3)
    assert scene.intrinsics[0] == pytest.approx(
        32 / (2 * np.tan(0.4)), rel=1e-5)
    # translation scaled by 0.8
    assert np.linalg.norm(scene.poses[0, :3, 3]) == pytest.approx(
        0.8 * np.linalg.norm([2.0, 0, 1.0]), rel=1e-5)


def test_load_scene_dispatch_synthetic():
    cfg = Config()
    cfg = replace(cfg, data=replace(cfg.data, data_format="synthetic"))
    scene = load_scene(cfg, "train")
    assert scene.images.ndim == 4


def test_light_dirs_roundtrip(tmp_path):
    positions = np.array([[1.0, 0, 1.35], [-1.0, 0, 1.35],
                          [0, 1.0, 1.35], [0, -1.0, 1.35]])
    path = str(tmp_path / "leds.txt")
    write_light_dirs_calibration(path, positions)
    dirs = load_light_dirs(path)
    assert dirs.shape == (4, 3)
    np.testing.assert_allclose(np.linalg.norm(dirs, axis=-1), 1.0,
                               rtol=1e-6)
    # first LED at +x of the centroid -> direction points toward -x
    assert dirs[0, 0] < -0.9


def test_srgb_roundtrip():
    x = np.linspace(0.001, 1.0, 64)
    np.testing.assert_allclose(srgb_to_linear(linear_to_srgb(x)), x,
                               rtol=1e-4)


def test_bilinear_demosaic_constant():
    bayer = np.full((16, 16), 0.5, np.float32)
    rgb = bilinear_demosaic(bayer)
    assert rgb.shape == (16, 16, 3)
    np.testing.assert_allclose(rgb, 0.5, rtol=1e-6)


def test_bayer_mask_pattern():
    x, y = np.meshgrid(np.arange(4), np.arange(4), indexing="xy")
    m = pixels_to_bayer_mask(x, y)
    assert m[0, 0, 0] == 1        # R at (0,0)
    assert m[0, 1, 1] == 1        # G at x=1,y=0
    assert m[1, 1, 2] == 1        # B at (1,1)
    np.testing.assert_allclose(m.sum(-1), 1.0)


def test_postprocess_raw_range():
    rng = np.random.default_rng(0)
    raw = rng.uniform(0, 1, (8, 8, 3)).astype(np.float32)
    out = postprocess_raw(raw, np.eye(3), exposure=0.9)
    assert out.shape == (8, 8, 3)
    assert out.min() >= 0 and out.max() <= 1 + 1e-6
