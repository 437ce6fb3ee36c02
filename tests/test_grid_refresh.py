"""Partial density-grid refresh (ops/grid.make_grid_update partial_sweep):
the occupied half must deterministically re-query every occupied cell
when they fit the budget (reference resamples with replacement,
renderer.py:853-880 — full coverage is strictly better), stride-decimate
above budget, and stay correct when nothing is occupied yet.
"""

from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np

from raw_ngp_tpu.config import Config
from raw_ngp_tpu.models.ngp import make_field_spec
from raw_ngp_tpu.ops.grid import make_grid_update
from raw_ngp_tpu.train.trainer import init_train_state


def _setup(grid_size=32):
    cfg = Config().with_preset_O()
    cfg = replace(cfg, render=replace(cfg.render, grid_size=grid_size,
                                      bound=1.0))
    cfg = cfg.validate()
    spec = make_field_spec(cfg)
    st = init_train_state(jax.random.PRNGKey(0), cfg, spec)
    return cfg, spec, st


def test_partial_refresh_covers_all_occupied_cells():
    cfg, spec, st = _setup()
    h3 = cfg.render.grid_size ** 3
    update = make_grid_update(cfg, spec)

    # occupied set: 1000 scattered cells, well under the partial budget
    rng = np.random.default_rng(3)
    occ_cells = np.unique(rng.integers(0, h3, 1000))
    dg = np.zeros((cfg.cascades, h3), np.float32)       # visited, empty
    dg[0, occ_cells] = 5.0
    st = st.replace(density_grid=jnp.asarray(dg),
                    iter_density=jnp.asarray(20, jnp.int32))
    st2 = update(st, host_iter=20)
    new = np.asarray(st2.density_grid)

    # every occupied cell was re-queried: its value is exactly
    # max(decay * old, sigma) -- since old = 5.0 and the untrained field
    # has tiny sigma, a refreshed cell reads 5.0 * 0.95; a skipped cell
    # would still read 5.0
    assert np.isclose(new[0, occ_cells], 4.75, atol=1e-3).all(), (
        f"{(~np.isclose(new[0, occ_cells], 4.75, atol=1e-3)).sum()} "
        "occupied cells were not refreshed")


def test_partial_refresh_decimates_over_budget():
    cfg, spec, st = _setup()
    h3 = cfg.render.grid_size ** 3
    update = make_grid_update(cfg, spec)

    # every cell occupied: way over the n_partial budget
    st = st.replace(density_grid=jnp.full((cfg.cascades, h3), 5.0),
                    iter_density=jnp.asarray(20, jnp.int32))
    st2 = update(st, host_iter=20)
    new = np.asarray(st2.density_grid)

    refreshed = np.isclose(new[0], 4.75, atol=1e-3).sum()
    n_partial = max(int(h3 * cfg.render.grid_partial_fraction)
                    // 2 ** 15 * 2 ** 15, min(2 ** 15, h3 // 4))
    # the occupied half touches ~n_partial distinct cells (random half
    # may overlap them); decimation keeps the count near budget
    assert refreshed >= n_partial * 0.9
    assert refreshed <= 2 * n_partial + 1


def test_partial_refresh_empty_grid_no_nan():
    cfg, spec, st = _setup()
    update = make_grid_update(cfg, spec)
    st = st.replace(iter_density=jnp.asarray(20, jnp.int32))
    st2 = update(st, host_iter=20)
    assert np.isfinite(np.asarray(st2.density_grid)).all()
    assert np.isfinite(float(st2.mean_density))
