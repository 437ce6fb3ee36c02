"""Pose-refinement evaluation: Procrustes pre-alignment + rotation /
translation error.

Port of the BARF analysis utilities (reference barf/pose_analysis.py:
101-131, barf/pose_eval.py:159-202, camera_optimizers.py:55-86): align the
refined camera set to ground truth with a similarity transform estimated
from the camera centers, then report mean rotation error (degrees) and
translation error. This closes the reference's noise-injection
pose-recovery debugging loop (SURVEY.md §4.4) as an automated test.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from raw_ngp_tpu.ops.lie import apply_refinement


def prealign_cameras(pred_poses: np.ndarray,
                     gt_poses: np.ndarray) -> np.ndarray:
    """Similarity-align predicted c2w poses onto GT via Procrustes on the
    camera centers (pose_eval.py prealign_cameras)."""
    X0 = pred_poses[:, :3, 3]
    X1 = gt_poses[:, :3, 3]
    t0, t1 = X0.mean(0), X1.mean(0)
    X0c, X1c = X0 - t0, X1 - t1
    s0 = np.sqrt((X0c ** 2).sum(-1).mean()) + 1e-12
    s1 = np.sqrt((X1c ** 2).sum(-1).mean()) + 1e-12
    U, _, Vt = np.linalg.svd((X0c / s0).T @ (X1c / s1))
    R = U @ Vt
    if np.linalg.det(R) < 0:
        U[:, -1] *= -1
        R = U @ Vt
    # x1 ≈ ((x0 - t0)/s0) @ R * s1 + t1
    aligned = pred_poses.copy()
    aligned[:, :3, 3] = ((X0 - t0) / s0) @ R * s1 + t1
    aligned[:, :3, :3] = np.einsum("ji,njk->nik", R, pred_poses[:, :3, :3])
    return aligned


def rotation_error_deg(R1: np.ndarray, R2: np.ndarray) -> np.ndarray:
    """Per-camera geodesic rotation distance in degrees."""
    Rd = np.einsum("nij,nkj->nik", R1, R2)
    tr = np.trace(Rd, axis1=1, axis2=2)
    cos = np.clip((tr - 1) / 2, -1 + 1e-7, 1 - 1e-7)
    return np.rad2deg(np.arccos(cos))


def evaluate_camera_alignment(pred_poses: np.ndarray,
                              gt_poses: np.ndarray) -> Dict[str, float]:
    """Mean rotation (deg) and translation errors after pre-alignment
    (pose_eval.py evaluate_camera_alignment)."""
    aligned = prealign_cameras(pred_poses, gt_poses)
    rot = rotation_error_deg(aligned[:, :3, :3], gt_poses[:, :3, :3])
    trans = np.linalg.norm(aligned[:, :3, 3] - gt_poses[:, :3, 3], axis=-1)
    return {"rotation_deg": float(rot.mean()),
            "translation": float(trans.mean())}


def refined_poses(trainer) -> np.ndarray:
    """Current optimized camera poses [n, 4, 4]: base poses composed with
    the injected noise (self-test mode) and the learned se(3) refinements
    — the live value of the reference's `poses + pose_offsets`
    (camera_optimizers.py:55-70)."""
    import jax.numpy as jnp

    assert trainer.state.pose_params is not None, "pose_opt is off"
    scene = trainer.train_scene
    base = jnp.asarray(scene.poses)[:, :3, :4]
    if trainer.state.pose_noise is not None:
        from raw_ngp_tpu.ops.lie import compose_pose
        base = compose_pose(trainer.state.pose_noise, base)
    refined = np.asarray(apply_refinement(trainer.state.pose_params, base))
    refined4 = np.tile(np.eye(4, dtype=np.float32),
                       (len(refined), 1, 1))
    refined4[:, :3, :4] = refined
    return refined4


def analyze_pose_optimization(trainer) -> Dict[str, float]:
    """Refined-vs-GT pose errors for a trainer with pose refinement
    (camera_optimizers.py:55-86 without the hard-coded debug paths)."""
    scene = trainer.train_scene
    gt = np.asarray(scene.poses_gt if scene.poses_gt is not None
                    else scene.poses)
    return evaluate_camera_alignment(refined_poses(trainer), gt)
