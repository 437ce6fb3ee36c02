"""Model + proposal-renderer tests: shapes, annealing semantics, gradient
flow, and a can-it-overfit sanity check on a single analytic scene."""

from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raw_ngp_tpu.config import Config
from raw_ngp_tpu.models import (
    baangp_blend,
    barf_level_weights,
    field_density,
    field_forward,
    init_field,
    make_field_spec,
)
from raw_ngp_tpu.render import render_proposal, spacing_fn, spacing_fn_inv


def tiny_config(**render_kw):
    cfg = Config()
    cfg = replace(cfg, model=replace(
        cfg.model, num_levels=4, log2_hashmap_size=12,
        hashgrid_resolution=64, grid_mlp_hidden=16, view_mlp_hidden=16,
        prop_num_levels=3, prop_log2_hashmap_size=10,
        prop_resolutions=(32, 64), fused_encoder=False))
    cfg = replace(cfg, render=replace(
        cfg.render, num_steps=(32, 16, 8), occupancy=False, **render_kw))
    return cfg.validate()


def test_field_shapes():
    cfg = tiny_config()
    spec = make_field_spec(cfg)
    params = init_field(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (128, 3),
                           minval=-1, maxval=1)
    d = jax.random.normal(jax.random.PRNGKey(2), (128, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    sigma, color = field_forward(params, spec, x, d)
    assert sigma.shape == (128,)
    assert color.shape == (128, 3)
    assert np.all(np.asarray(sigma) >= 0)
    assert np.all(np.asarray(color) >= 0)
    # clamped_exp color is bounded by 5 (network.py:138)
    assert np.all(np.asarray(color) <= 5.0)


def test_field_density_proposal_dispatch():
    cfg = tiny_config()
    spec = make_field_spec(cfg)
    params = init_field(jax.random.PRNGKey(0), spec)
    x = jnp.zeros((16, 3))
    s_final = field_density(params, spec, x, proposal=-1)
    s_p0 = field_density(params, spec, x, proposal=0)
    s_p1 = field_density(params, spec, x, proposal=1)
    assert s_final.shape == s_p0.shape == s_p1.shape == (16,)
    # different nets -> different outputs
    assert not np.allclose(np.asarray(s_p0), np.asarray(s_p1))


def test_rfield_needs_light_dirs():
    cfg = tiny_config()
    cfg = replace(cfg, model=replace(cfg.model, rfield=True))
    spec = make_field_spec(cfg)
    params = init_field(jax.random.PRNGKey(0), spec)
    x = jnp.zeros((4, 3))
    d = jnp.tile(jnp.array([[0.0, 0, 1]]), (4, 1))
    with pytest.raises(ValueError):
        field_forward(params, spec, x, d)
    sigma, color = field_forward(params, spec, x, d, ld=d)
    assert color.shape == (4, 3)


def test_barf_weights_progression():
    cfg = tiny_config()
    cfg = cfg.with_pose_opt("barf", 4)
    # at annealing=0: only first level on; at end: all on
    w0 = np.asarray(barf_level_weights(cfg, 0.0))
    w1 = np.asarray(barf_level_weights(cfg, 1.0))
    assert w0[0] == w0[1] == 1.0
    assert np.all(w0[2:] == 0.0)
    np.testing.assert_allclose(w1, 1.0)
    wm = np.asarray(barf_level_weights(cfg, 0.17))
    assert 0 < wm[2:].sum() < len(wm) - 2


def test_baangp_blend_shapes_and_limits():
    cfg = tiny_config()
    cfg = cfg.with_pose_opt("baangp", 4)
    width = cfg.model.num_levels * cfg.model.level_dim
    feats = jax.random.normal(jax.random.PRNGKey(0), (8, width))
    out0 = baangp_blend(cfg, 0.0, feats)
    out1 = baangp_blend(cfg, 1.0, feats)
    assert out0.shape == feats.shape
    # fully annealed -> identity
    np.testing.assert_allclose(np.asarray(out1), np.asarray(feats),
                               rtol=1e-5)
    # at zero, masked levels are filled with level-0 features
    lvl0 = np.asarray(feats[:, :2])
    np.testing.assert_allclose(np.asarray(out0[:, 2:4]), lvl0, rtol=1e-5)


def test_spacing_fn_roundtrip():
    x = jnp.array([0.05, 0.5, 1.0, 2.0, 100.0])
    s = spacing_fn(x)
    np.testing.assert_allclose(np.asarray(spacing_fn_inv(s)), np.asarray(x),
                               rtol=1e-4)
    assert np.all(np.asarray(s) <= 1.0) and np.all(np.asarray(s) >= 0)


def _sphere_scene_rays(n, key):
    """Rays from a ring of cameras looking at a unit sphere at origin."""
    k1, k2 = jax.random.split(key)
    theta = jax.random.uniform(k1, (n,), minval=0, maxval=2 * np.pi)
    origins = jnp.stack([2.5 * jnp.cos(theta), 2.5 * jnp.sin(theta),
                         jnp.zeros_like(theta)], axis=-1)
    jitter = 0.2 * jax.random.normal(k2, (n, 3))
    dirs = -origins + jitter
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    return origins, dirs


def test_render_proposal_shapes_and_ranges():
    cfg = tiny_config()
    spec = make_field_spec(cfg)
    params = init_field(jax.random.PRNGKey(0), spec)
    o, d = _sphere_scene_rays(64, jax.random.PRNGKey(1))
    aabb = jnp.array([-2.0, -2, -2, 2, 2, 2])
    out = render_proposal(params, spec, o, d, aabb,
                          key=jax.random.PRNGKey(2), training=True)
    assert out["image"].shape == (64, 3)
    assert out["depth"].shape == (64,)
    assert "proposal_loss" in out
    assert np.all(np.isfinite(np.asarray(out["image"])))
    ws = np.asarray(out["weights_sum"])
    assert np.all(ws >= 0) and np.all(ws <= 1 + 1e-4)


def test_render_proposal_contract_mode():
    cfg = tiny_config(contract=True, mark_untrained=False)
    spec = make_field_spec(cfg)
    params = init_field(jax.random.PRNGKey(0), spec)
    o, d = _sphere_scene_rays(32, jax.random.PRNGKey(1))
    aabb = jnp.array([-2.0, -2, -2, 2, 2, 2])
    out = render_proposal(params, spec, o, d, aabb)
    assert np.all(np.isfinite(np.asarray(out["image"])))


def test_render_gradients_reach_all_params():
    cfg = tiny_config()
    spec = make_field_spec(cfg)
    params = init_field(jax.random.PRNGKey(0), spec)
    o, d = _sphere_scene_rays(32, jax.random.PRNGKey(1))
    aabb = jnp.array([-2.0, -2, -2, 2, 2, 2])
    target = jnp.ones((32, 3)) * 0.5

    def loss_fn(p):
        out = render_proposal(p, spec, o, d, aabb,
                              key=jax.random.PRNGKey(2), training=True)
        return ((out["image"] - target) ** 2).mean() + out["proposal_loss"]

    grads = jax.grad(loss_fn)(params)
    # every leaf gets a finite gradient; main grid + mlps get nonzero
    for path, g in jax.tree_util.tree_leaves_with_path(grads):
        assert np.all(np.isfinite(np.asarray(g))), path
    assert float(jnp.abs(grads["grid"]).sum()) > 0
    assert float(jnp.abs(grads["grid_mlp"][0]["w"]).sum()) > 0
    assert float(jnp.abs(grads["prop_grids"][0]).sum()) > 0
