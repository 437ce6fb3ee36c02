"""CLI end-to-end: the user-facing surface (reference main.py flow)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from raw_ngp_tpu.cli import args_to_config, build_parser


def test_preset_composition():
    args = build_parser().parse_args(["/data", "-O", "--iters", "100"])
    cfg = args_to_config(args)
    assert cfg.render.occupancy
    assert cfg.train.fp16
    assert cfg.train.random_image_batch
    assert cfg.train.iters == 100

    args = build_parser().parse_args(["/data", "-O2"])
    cfg = args_to_config(args)
    assert cfg.render.contract and not cfg.render.occupancy
    assert not cfg.render.mark_untrained

    args = build_parser().parse_args(["/data", "--lightstage"])
    cfg = args_to_config(args)
    assert cfg.data.image_mode == "HDR"
    assert cfg.data.clip and cfg.data.masked
    assert cfg.render.occupancy
    assert cfg.data.camera_traj == "circle"


def test_pose_opt_rewires_batching(tmp_path):
    os.makedirs(tmp_path / "images")
    for i in range(5):
        (tmp_path / "images" / f"{i}.png").touch()
    args = build_parser().parse_args(
        [str(tmp_path), "--pose_opt", "barf"])
    cfg = args_to_config(args)
    assert cfg.pose_opt.mode == "barf"
    assert cfg.pose_opt.num_cameras == 5
    assert not cfg.train.random_image_batch       # main.py:162
    assert cfg.data.train_split == "trainval"     # main.py:164


def test_exposure_percentiles_presets():
    args = build_parser().parse_args(["/d", "--bracketing"])
    cfg = args_to_config(args)
    assert len(cfg.exposure_percentiles) == 7     # main.py:203-210
    assert cfg.hdr_merge_algo == "robertson"      # main.py:207-208
    args = build_parser().parse_args(["/d"])
    cfg = args_to_config(args)
    assert len(cfg.exposure_percentiles) == 4


@pytest.mark.slow
def test_cli_end_to_end(tmp_path):
    """Full user flow: train on the synthetic dataset via the CLI, then
    resume in --test mode producing video frames and a mesh."""
    ws = str(tmp_path / "ws")
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.getcwd())
    base = [sys.executable, "-m", "raw_ngp_tpu.cli", "unused",
            "--data_format", "synthetic", "--workspace", ws,
            "--iters", "120", "--num_rays", "512",
            "--num_steps", "24", "12", "8",
            "--hashmap_size", "12", "--hashgrid_resolution", "64",
            "--save_cnt", "2", "--eval_cnt", "2",
            "--mcubes_reso", "64", "--decimate_target", "5000",
            "--density_thresh", "1.5",
            "--no_fused_encoder", "--test_no_video"]
    r = subprocess.run(base, capture_output=True, text=True, timeout=900,
                       env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "[final eval]" in r.stdout
    # artifacts exist
    assert os.path.exists(os.path.join(ws, "checkpoints"))
    ckpts = os.listdir(os.path.join(ws, "checkpoints"))
    assert any(c.startswith("ngp_step") for c in ckpts)
    assert any(c.startswith("ngp_best") for c in ckpts)
    val_pngs = os.listdir(os.path.join(ws, "validation"))
    assert any(p.startswith("rgb_") for p in val_pngs)
    # test frames written (no video because test_no_video only skips mp4
    # when scene has <2 frames; results dir must exist)
    assert os.path.exists(os.path.join(ws, "results"))
    # mesh written
    meshes = os.listdir(os.path.join(ws, "mesh"))
    assert "mesh_0.ply" in meshes
