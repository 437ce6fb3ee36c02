"""Additive (TPU pair-aligned) hash variant: index properties, collision
statistics, and end-to-end quality parity with the reference xor hash.

The additive variant (ops/hashgrid.HashGridSpec.hash_variant) replaces the
reference's prime-XOR attach of dim 0 (gridencoder.cu:46-58) with an
additive attach, making the two x-corners of every cell adjacent table rows
so the fused encoder pair-windows every level (kernels/hash_fused.py)."""

from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raw_ngp_tpu.config import Config
from raw_ngp_tpu.ops.hashgrid import (
    HashGridSpec,
    _level_indices,
    hash_encode_01,
    init_hashgrid_params,
)


def _spec(variant):
    return HashGridSpec.create(input_dim=3, num_levels=6, level_dim=2,
                               base_resolution=4, log2_hashmap_size=9,
                               desired_resolution=64, hash_variant=variant)


def test_additive_pair_axis_corners_adjacent():
    """row(c[a]+1) == row(c[a]) + 1 for every vertex of every level,
    where a is the level's (rotating) pair axis."""
    from raw_ngp_tpu.ops.hashgrid import pair_axis

    spec = _spec("additive")
    key = jax.random.PRNGKey(0)
    for lv in range(spec.num_levels):
        res = spec.resolutions[lv]
        a = pair_axis(spec, lv)
        coords = jax.random.randint(key, (512, 3), 0, res - 1)
        r0 = _level_indices(spec, lv, coords)
        r1 = _level_indices(spec, lv, coords.at[:, a].add(1))
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r0) + 1)
        # rows stay inside the level's table
        lo, hi = spec.offsets[lv], spec.offsets[lv + 1]
        assert int(r0.min()) >= lo and int(r1.max()) < hi


def test_additive_rows_cover_table():
    """Hashed-level rows spread over the whole level (no clustering that
    would starve parts of the table)."""
    spec = _spec("additive")
    lv = spec.num_levels - 1                   # finest level, hashed
    res = spec.resolutions[lv]
    hmap = spec.offsets[lv + 1] - spec.offsets[lv]
    assert res ** 3 > hmap                     # really hashed
    coords = jax.random.randint(jax.random.PRNGKey(1), (20000, 3), 0, res)
    rows = np.asarray(_level_indices(spec, lv, coords)) - spec.offsets[lv]
    # the bulk [res, hmap-res) is uniformly covered; the two res-sized
    # tails taper linearly (row = x + g with x < res, g < hmap - res)
    hist, _ = np.histogram(rows, bins=64, range=(res, hmap - res))
    assert hist.min() > 0.3 * hist.mean()
    assert hist.max() < 3.0 * hist.mean()
    assert rows.min() >= 0 and rows.max() < hmap


def test_oob_inputs_zero_both_variants():
    for variant in ("xor", "additive"):
        spec = _spec(variant)
        params = init_hashgrid_params(jax.random.PRNGKey(0), spec)
        x = jnp.array([[1.5, 0.5, 0.5], [-0.1, 0.2, 0.3]])
        out = hash_encode_01(params, x, spec)
        np.testing.assert_array_equal(np.asarray(out), 0.0)


@pytest.mark.slow
def test_additive_learns_like_xor(tmp_path):
    """Occupancy-mode training with the TPU profile (additive hash, fused
    encoder) must reach PSNR comparable to the same model with the
    reference xor hash — collision-structure quality parity."""
    from raw_ngp_tpu.data import make_synthetic_scene
    from raw_ngp_tpu.train import Trainer

    def run(variant, ws):
        cfg = Config().with_preset_O()
        cfg = replace(cfg, model=replace(
            cfg.model, num_levels=6, level_dim=4, log2_hashmap_size=13,
            hashgrid_resolution=256, grid_mlp_hidden=32, view_mlp_hidden=32,
            hash_variant=variant, fused_encoder=True))
        cfg = replace(cfg, render=replace(
            cfg.render, grid_size=64, samples_per_ray=32,
            march_candidates=128, mark_untrained=False,
            max_ray_batch=4096))
        cfg = replace(cfg, train=replace(cfg.train, iters=400,
                                         num_rays=1024, fp16=False))
        cfg = cfg.validate()
        train_scene, val_scene = make_synthetic_scene(
            n_train=24, n_val=2, H=48, W=48)
        tr = Trainer(cfg, train_scene, val_scene, workspace=str(ws))
        tr.train(iters=400, log_every=200)
        return tr.evaluate()["psnr"]

    p_xor = run("xor", tmp_path / "xor")
    p_add = run("additive", tmp_path / "add")
    print(f"PSNR xor={p_xor:.2f} additive={p_add:.2f}")
    # the substantive assertion is collision-structure PARITY with the
    # reference hash; the absolute floor guards gross breakage (measured
    # 19.5 vs 19.1 at this tiny step count/seed)
    assert p_add > 18.5
    assert p_add > p_xor - 1.0, (p_xor, p_add)
