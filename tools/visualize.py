"""Visualization tooling: camera poses, light rigs, contraction warp.

matplotlib-based equivalents of the reference's trimesh viewers
(colmap_provider.visualize_poses:68-106, reflectance/plot_lights.py,
scripts/vis_contract.py). Writes PNGs instead of opening interactive
windows (headless image).

Usage:
  python tools/visualize.py poses <workspace-or-scene-root> [--out f.png]
  python tools/visualize.py lights <led_calibration_file> [--out f.png]
  python tools/visualize.py contract [--out f.png]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plot_poses(poses: np.ndarray, out: str, bound: float = 2.0,
               points: np.ndarray | None = None):
    """Draw camera frusta as line fans (visualize_poses equivalent)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(111, projection="3d")
    size = 0.07 * bound
    for pose in poses:
        pos = pose[:3, 3]
        x_ax, y_ax, z_ax = pose[:3, 0], pose[:3, 1], pose[:3, 2]
        corners = [pos + size * (sx * x_ax + sy * y_ax) - size * z_ax
                   for sx, sy in ((1, 1), (-1, 1), (-1, -1), (1, -1))]
        for c in corners:
            ax.plot(*zip(pos, c), c="tab:blue", lw=0.5)
        loop = corners + [corners[0]]
        ax.plot(*zip(*loop), c="tab:blue", lw=0.5)
    if points is not None:
        sub = points[:: max(len(points) // 2000, 1)]
        ax.scatter(sub[:, 0], sub[:, 1], sub[:, 2], s=0.5, c="tab:orange",
                   alpha=0.3)
    for lim in (ax.set_xlim, ax.set_ylim, ax.set_zlim):
        lim(-bound, bound)
    ax.set_title(f"{len(poses)} cameras")
    fig.savefig(out, dpi=120, bbox_inches="tight")
    plt.close(fig)


def plot_lights(calibration_path: str, out: str):
    """LED rig directions on the unit sphere (plot_lights.py equivalent)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from raw_ngp_tpu.data.reflectance import load_light_dirs
    dirs = load_light_dirs(calibration_path)
    fig = plt.figure(figsize=(7, 7))
    ax = fig.add_subplot(111, projection="3d")
    ax.scatter(dirs[:, 0], dirs[:, 1], dirs[:, 2], c=np.arange(len(dirs)),
               cmap="viridis", s=18)
    for i, d in enumerate(dirs[:: max(len(dirs) // 24, 1)]):
        ax.text(*d, str(i), fontsize=6)
    ax.set_title(f"{len(dirs)} light directions (pointing at origin)")
    fig.savefig(out, dpi=120, bbox_inches="tight")
    plt.close(fig)


def plot_contract(out: str, bound: float = 8.0):
    """2D slice of the MeRF contraction (scripts/vis_contract.py
    equivalent)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from raw_ngp_tpu.ops.contraction import contract

    lin = np.linspace(-bound, bound, 41)
    xs, ys = np.meshgrid(lin, lin)
    pts = np.stack([xs.ravel(), ys.ravel(), np.zeros(xs.size)], -1)
    z = np.asarray(contract(jnp.asarray(pts, jnp.float32)))
    fig, axes = plt.subplots(1, 2, figsize=(12, 6))
    axes[0].scatter(pts[:, 0], pts[:, 1], s=2)
    axes[0].set_title("world")
    axes[1].scatter(z[:, 0], z[:, 1], s=2)
    axes[1].set_title("contracted (L-inf, [-2, 2])")
    for a in axes:
        a.set_aspect("equal")
    fig.savefig(out, dpi=120, bbox_inches="tight")
    plt.close(fig)


def main(argv=None):
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    pp = sub.add_parser("poses")
    pp.add_argument("root")
    pp.add_argument("--out", default="poses.png")
    pp.add_argument("--bound", type=float, default=2.0)
    pl = sub.add_parser("lights")
    pl.add_argument("calibration")
    pl.add_argument("--out", default="lights.png")
    pc = sub.add_parser("contract")
    pc.add_argument("--out", default="contract.png")
    pc.add_argument("--bound", type=float, default=8.0)
    args = p.parse_args(argv)

    if args.cmd == "poses":
        from dataclasses import replace
        from raw_ngp_tpu.config import Config
        from raw_ngp_tpu.data.providers import load_scene
        cfg = Config()
        cfg = replace(cfg, data=replace(cfg.data, path=args.root))
        scene = load_scene(cfg, "trainval")
        plot_poses(np.asarray(scene.poses), args.out, args.bound)
        print(f"wrote {args.out}")
    elif args.cmd == "lights":
        plot_lights(args.calibration, args.out)
        print(f"wrote {args.out}")
    elif args.cmd == "contract":
        plot_contract(args.out, args.bound)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
