"""Hash-grid encoder tests: layout parity with the reference CUDA encoder
(gridencoder/src/gridencoder.cu), gradient checks, and an independent numpy
oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raw_ngp_tpu.ops.hashgrid import (
    HashGridSpec,
    hash_encode,
    hash_encode_01,
    init_hashgrid_params,
    total_variation_loss,
    weight_decay_loss,
)

PRIMES = (1, 2654435761, 805459861)


def numpy_oracle(params, x01, spec):
    """Straight-line numpy reimplementation of gridencoder.cu kernel_grid
    (forward, linear interpolation, align_corners=False)."""
    B, D = x01.shape
    L, C = spec.num_levels, spec.level_dim
    params = params.reshape(spec.n_params, C)   # canonical storage is flat
    out = np.zeros((B, L * C), dtype=np.float64)
    offsets = spec.offsets
    for b in range(B):
        if np.any(x01[b] < 0) or np.any(x01[b] > 1):
            continue
        for lv in range(L):
            res = spec.resolutions[lv]
            hmap = offsets[lv + 1] - offsets[lv]
            pos = np.clip(x01[b] * res - 0.5, 0, res - 1)
            grid = np.floor(pos).astype(np.uint64)
            frac = pos - grid
            acc = np.zeros(C)
            for corner in range(2 ** D):
                w = 1.0
                coord = np.zeros(D, dtype=np.uint64)
                for d in range(D):
                    if (corner >> d) & 1:
                        w *= frac[d]
                        coord[d] = min(grid[d] + 1, res - 1)
                    else:
                        w *= 1 - frac[d]
                        coord[d] = grid[d]
                # index: tiled with early-out, else hash
                stride = 1
                index = np.uint32(0)
                for d in range(D):
                    if stride > hmap:
                        break
                    index = np.uint32(index + np.uint32(coord[d])
                                      * np.uint32(stride & 0xFFFFFFFF))
                    stride *= res
                if spec.gridtype == "hash" and stride > hmap:
                    index = np.uint32(0)
                    for d in range(D):
                        index ^= np.uint32(
                            (int(coord[d]) * PRIMES[d]) & 0xFFFFFFFF)
                idx = int(index % np.uint32(hmap)) + offsets[lv]
                acc += w * np.asarray(params[idx], dtype=np.float64)
            out[b, lv * C:(lv + 1) * C] = acc
    return out


@pytest.fixture(scope="module")
def small_spec():
    return HashGridSpec.create(input_dim=3, num_levels=4, level_dim=2,
                               base_resolution=4, log2_hashmap_size=7,
                               desired_resolution=32)


def test_offsets_and_sizes(small_spec):
    offs = small_spec.offsets
    assert offs[0] == 0
    assert all(o % 8 == 0 for o in offs)
    # first level 4^3=64 < 128 so dense; rounded to /8
    assert offs[1] == 64
    assert small_spec.n_params == offs[-1]


def test_default_spec_matches_reference_defaults():
    # reference network.py:48: L=16, C=2, log2_T=19, desired 2048*bound(=2)
    spec = HashGridSpec.create(num_levels=16, level_dim=2,
                               log2_hashmap_size=19,
                               desired_resolution=4096)
    assert spec.output_dim == 32
    assert spec.resolutions[0] == 16
    # the reference's ceil(base * scale**i) lands on 4097 due to fp rounding
    # (grid.py:128); we reproduce that exactly
    assert spec.resolutions[-1] == 4097
    # capped levels have exactly 2^19 params
    assert spec.offsets[-1] - spec.offsets[-2] == 2 ** 19


def test_matches_numpy_oracle(small_spec):
    key = jax.random.PRNGKey(0)
    params = init_hashgrid_params(key, small_spec)
    x01 = jax.random.uniform(jax.random.PRNGKey(1), (32, 3))
    got = np.asarray(hash_encode_01(params, x01, small_spec))
    want = numpy_oracle(np.asarray(params), np.asarray(x01), small_spec)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-7)


def test_matches_oracle_hash_overflow():
    # force hashed levels: tiny table, big resolution
    spec = HashGridSpec.create(input_dim=3, num_levels=3, level_dim=2,
                               base_resolution=16, log2_hashmap_size=5,
                               desired_resolution=64)
    params = init_hashgrid_params(jax.random.PRNGKey(2), spec)
    x01 = jax.random.uniform(jax.random.PRNGKey(3), (16, 3))
    got = np.asarray(hash_encode_01(params, x01, spec))
    want = numpy_oracle(np.asarray(params), np.asarray(x01), spec)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-7)


def test_oob_inputs_zero(small_spec):
    params = init_hashgrid_params(jax.random.PRNGKey(0), small_spec)
    x = jnp.array([[1.5, 0.5, 0.5], [-0.1, 0.2, 0.3]])
    out = hash_encode_01(params, x, small_spec)
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_bound_mapping(small_spec):
    params = init_hashgrid_params(jax.random.PRNGKey(0), small_spec)
    x = jnp.array([[0.0, 0.0, 0.0]])
    out_b = hash_encode(params, x, small_spec, bound=2.0)
    out_01 = hash_encode_01(params, jnp.array([[0.5, 0.5, 0.5]]), small_spec)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_01),
                               rtol=1e-6)


def test_param_gradients_finite_difference(small_spec):
    """Scatter-add backward vs central differences on a few table entries."""
    params = init_hashgrid_params(jax.random.PRNGKey(0), small_spec)
    x01 = jax.random.uniform(jax.random.PRNGKey(1), (8, 3))
    cot = jax.random.normal(jax.random.PRNGKey(2),
                            (8, small_spec.output_dim))

    def f(p):
        return (hash_encode_01(p, x01, small_spec) * cot).sum()

    g = jax.grad(f)(params)
    eps = 1e-3
    rng = np.random.default_rng(0)
    nz = np.flatnonzero(np.asarray(g))          # flat table entries
    sel = rng.choice(nz, size=min(10, len(nz)), replace=False)
    for i in sel:
        p_plus = params.at[i].add(eps)
        p_minus = params.at[i].add(-eps)
        fd = (f(p_plus) - f(p_minus)) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), float(fd), rtol=1e-2,
                                   atol=1e-4)


def test_input_gradients_flow(small_spec):
    """d(features)/d(position) must be nonzero — this is the path pose
    gradients take (reference routes them via dy_dx,
    gridencoder.cu:205-248)."""
    params = jax.random.normal(jax.random.PRNGKey(0),
                               (small_spec.n_params, small_spec.level_dim))
    x01 = jnp.array([[0.37, 0.52, 0.61]])

    def f(x):
        return hash_encode_01(params, x, small_spec).sum()

    g = jax.grad(f)(x01)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.any(np.abs(np.asarray(g)) > 1e-6)
    # finite-difference check
    eps = 1e-4
    for d in range(3):
        xp = x01.at[0, d].add(eps)
        xm = x01.at[0, d].add(-eps)
        fd = (f(xp) - f(xm)) / (2 * eps)
        np.testing.assert_allclose(float(g[0, d]), float(fd), rtol=5e-2,
                                   atol=1e-3)


def test_max_level_zeroes_tail(small_spec):
    params = init_hashgrid_params(jax.random.PRNGKey(0), small_spec)
    x01 = jax.random.uniform(jax.random.PRNGKey(1), (4, 3))
    out = hash_encode_01(params, x01, small_spec, max_level=2)
    C = small_spec.level_dim
    assert np.any(np.asarray(out[:, :2 * C]) != 0)
    np.testing.assert_array_equal(np.asarray(out[:, 2 * C:]), 0.0)


def test_regularizer_losses(small_spec):
    params = init_hashgrid_params(jax.random.PRNGKey(0), small_spec)
    wd = weight_decay_loss(params, small_spec)
    assert float(wd) > 0
    tv = total_variation_loss(params, small_spec, jax.random.PRNGKey(1),
                              n_samples=512)
    assert np.isfinite(float(tv))
    g = jax.grad(lambda p: weight_decay_loss(p, small_spec))(params)
    # gradient is emb / n_level
    lo, hi = small_spec.offsets[0], small_spec.offsets[1]
    np.testing.assert_allclose(np.asarray(g[lo:hi]),
                               np.asarray(params[lo:hi]) / (hi - lo),
                               rtol=1e-5)
