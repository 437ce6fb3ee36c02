"""Test-time camera trajectories (reference colmap_provider.py:459-519)."""

from __future__ import annotations

import numpy as np


def circle_poses(radius: float, num_frames: int = 100,
                 theta_deg: float = 80.0) -> np.ndarray:
    """360-degree orbit at fixed polar angle, looking at the origin
    (colmap_provider.py:461-488)."""
    theta = np.deg2rad(theta_deg)
    poses = []
    for i in range(num_frames):
        phi = np.deg2rad(i / num_frames * 360.0)
        center = np.array([
            radius * np.sin(theta) * np.sin(phi),
            radius * np.sin(theta) * np.cos(phi),
            radius * np.cos(theta),
        ])

        def normalize(v):
            return v / (np.linalg.norm(v) + 1e-10)

        forward = normalize(center)          # looking inward (-forward)
        up = np.array([0.0, 0.0, 1.0])
        right = normalize(np.cross(forward, up))
        up = normalize(np.cross(right, forward))
        pose = np.eye(4)
        pose[:3, :3] = np.stack((right, up, forward), axis=-1)
        pose[:3, 3] = center
        poses.append(pose)
    return np.stack(poses).astype(np.float32)


def interp_poses(poses: np.ndarray, n_anchors: int = 5, n_test: int = 24,
                 seed: int = 0) -> np.ndarray:
    """Slerp interpolation between randomly chosen training poses
    (colmap_provider.py:489-506)."""
    from scipy.spatial.transform import Rotation, Slerp

    rng = np.random.default_rng(seed)
    fs = rng.choice(len(poses), min(n_anchors, len(poses)), replace=False)
    out = []
    pose0 = poses[fs[0]]
    for k in range(1, len(fs)):
        pose1 = poses[fs[k]]
        rots = Rotation.from_matrix(np.stack([pose0[:3, :3],
                                              pose1[:3, :3]]))
        slerp = Slerp([0, 1], rots)
        for i in range(n_test + 1):
            ratio = np.sin(((i / n_test) - 0.5) * np.pi) * 0.5 + 0.5
            pose = np.eye(4, dtype=np.float32)
            pose[:3, :3] = slerp(ratio).as_matrix()
            pose[:3, 3] = (1 - ratio) * pose0[:3, 3] + ratio * pose1[:3, 3]
            out.append(pose)
        pose0 = pose1
    return np.stack(out).astype(np.float32)


def interp_light_dirs(start: np.ndarray, end: np.ndarray,
                      num: int = 100) -> np.ndarray:
    """Linear light-direction sweep for relighting videos
    (colmap_provider.py:511-517)."""
    t = np.linspace(0, 1, num)[:, None]
    return ((1 - t) * start[None] + t * end[None]).astype(np.float32)
