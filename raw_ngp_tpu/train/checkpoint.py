"""Checkpoint save/load with the reference's retention policy.

Equivalent of Trainer.save_checkpoint / load_checkpoint
(nerf/train_utils.py:1141-1299): full state (params, optimizer, EMA, pose
refinement, occupancy grid, step) with rolling ``max_keep`` retention, a
separate metric-keyed best checkpoint holding EMA weights, and
scratch/latest/latest_model/best/path resume modes.

Format: one .npz per checkpoint (flattened pytree leaves keyed by their
tree paths) + a JSON sidecar of scalars — dependency-free and
forward-compatible (missing keys are tolerated on load, like the
reference's try/except component loading, train_utils.py:1245-1299).
"""

from __future__ import annotations

import glob
import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from raw_ngp_tpu.train.state import TrainState


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = jax.tree_util.keystr(path)
        out[key] = np.asarray(leaf)
    return out, treedef


def save_checkpoint(state: TrainState, ckpt_dir: str, name: str,
                    stats: Optional[Dict[str, Any]] = None,
                    max_keep: int = 2) -> str:
    """Write ``<ckpt_dir>/<name>.npz`` (+ .json) and prune old rolling
    checkpoints (train_utils.py:1182-1188)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    leaves, _ = _flatten_with_paths(jax.device_get(state))
    path = os.path.join(ckpt_dir, f"{name}.npz")
    np.savez(path, **leaves)
    meta = {"step": int(state.step), "stats": stats or {}}
    with open(os.path.join(ckpt_dir, f"{name}.json"), "w") as f:
        json.dump(meta, f)

    # rolling retention for step-named checkpoints
    step_ckpts = sorted(
        glob.glob(os.path.join(ckpt_dir, "ngp_step*.npz")),
        key=lambda p: int(re.findall(r"step(\d+)", p)[0]))
    for old in step_ckpts[:-max_keep] if max_keep > 0 else []:
        os.remove(old)
        sidecar = old[:-4] + ".json"
        if os.path.exists(sidecar):
            os.remove(sidecar)
    return path


def load_checkpoint(state: TrainState, path: str) -> Tuple[TrainState, Dict]:
    """Restore into an initialized state template. Missing/mismatched
    leaves keep their initialized values (tolerant resume,
    train_utils.py:1245-1299)."""
    data = np.load(path, allow_pickle=False)
    flat, treedef = jax.tree_util.tree_flatten_with_path(state)
    new_leaves = []
    n_loaded = 0
    for p, leaf in flat:
        key = jax.tree_util.keystr(p)
        if key in data.files and data[key].shape == np.shape(leaf):
            new_leaves.append(jax.numpy.asarray(data[key]))
            n_loaded += 1
        else:
            new_leaves.append(leaf)
    restored = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(state), new_leaves)
    meta = {}
    sidecar = path[:-4] + ".json"
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            meta = json.load(f)
    meta["n_loaded"] = n_loaded
    return restored, meta


def resolve_checkpoint(ckpt_dir: str, mode: str) -> Optional[str]:
    """scratch/latest/latest_model/best/<path> resolution
    (train_utils.py:444-463)."""
    if mode == "scratch":
        return None
    if mode in ("latest", "latest_model"):
        ckpts = sorted(
            glob.glob(os.path.join(ckpt_dir, "ngp_step*.npz")),
            key=lambda p: int(re.findall(r"step(\d+)", p)[0]))
        return ckpts[-1] if ckpts else None
    if mode == "best":
        best = os.path.join(ckpt_dir, "ngp_best.npz")
        return best if os.path.exists(best) else \
            resolve_checkpoint(ckpt_dir, "latest")
    return mode if os.path.exists(mode) else None
