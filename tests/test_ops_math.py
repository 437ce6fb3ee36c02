"""Unit tests for core math ops: activations, contraction, rays, morton,
SH/freq encodings, Lie maps. Includes finite-difference gradient checks
(SURVEY.md §4 test plan, item b)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raw_ngp_tpu.ops import (
    color_activation,
    contract,
    density_activation,
    freq_encode,
    freq_output_dim,
    morton3d,
    morton3d_invert,
    near_far_from_aabb,
    pixel_rays,
    se3_to_SE3,
    sh_encode,
    so3_to_SO3,
    softplus_beta,
    trunc_exp,
    uncontract,
)


def test_trunc_exp_forward_backward():
    x = jnp.array([-2.0, 0.0, 3.0])
    np.testing.assert_allclose(trunc_exp(x), np.exp([-2.0, 0.0, 3.0]),
                               rtol=1e-6)
    # backward clamps: grad at x=100 equals exp(15), not exp(100)
    g = jax.grad(lambda v: trunc_exp(v).sum())(jnp.array([100.0]))
    np.testing.assert_allclose(g, np.exp(15.0), rtol=1e-5)
    g2 = jax.grad(lambda v: trunc_exp(v).sum())(jnp.array([2.0]))
    np.testing.assert_allclose(g2, np.exp(2.0), rtol=1e-5)


def test_softplus_beta_matches_torch_semantics():
    # softplus(x, beta) = log(1 + exp(beta x)) / beta, linear above thresh
    x = jnp.linspace(-5, 5, 11)
    expected = np.log1p(np.exp(2.0 * np.asarray(x))) / 2.0
    np.testing.assert_allclose(softplus_beta(x, beta=2.0), expected,
                               rtol=1e-5)
    # linear region
    big = jnp.array([50.0])
    np.testing.assert_allclose(softplus_beta(big, beta=2.0), 50.0, rtol=1e-6)


def test_color_activations():
    x = jnp.array([0.0, 5.0, 8.0])
    np.testing.assert_allclose(color_activation(x, "exp"),
                               np.exp(np.asarray(x) - 5.0), rtol=1e-6)
    clamped = color_activation(x, "clamped_exp")
    assert float(clamped[2]) == pytest.approx(5.0)  # exp(3) > 5 clamps
    sig = color_activation(x, "sigmoid")
    np.testing.assert_allclose(sig[0], 0.5, rtol=1e-6)


def test_density_activation_dispatch():
    x = jnp.array([1.0])
    np.testing.assert_allclose(density_activation(x, "clamped_exp"),
                               np.e, rtol=1e-6)
    assert float(density_activation(x, "softplus", beta=2.0)[0]) > 0


def test_contract_identity_inside_unit_cube():
    x = jnp.array([[0.3, -0.2, 0.5]])
    np.testing.assert_allclose(contract(x), x, atol=1e-7)


def test_contract_outside_maps_to_shell():
    x = jnp.array([[4.0, 0.0, 0.0], [0.0, -8.0, 2.0]])
    z = contract(x)
    # dominant axis -> sign * (2 - 1/m); others scale by 1/m
    np.testing.assert_allclose(z[0], [2 - 1 / 4, 0, 0], rtol=1e-6)
    np.testing.assert_allclose(z[1], [0, -(2 - 1 / 8), 2 / 8], rtol=1e-6)
    assert jnp.all(jnp.abs(z) <= 2.0)


def test_contract_uncontract_roundtrip():
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (256, 3), minval=-10, maxval=10)
    z = contract(x)
    x2 = uncontract(z)
    np.testing.assert_allclose(x2, x, rtol=1e-4, atol=1e-4)


def test_near_far_from_aabb():
    aabb = jnp.array([-1.0, -1, -1, 1, 1, 1])
    o = jnp.array([[0.0, 0, 5], [0, 0, 5]])
    d = jnp.array([[0.0, 0, -1], [0, 1, 0]])   # hit, miss
    near, far = near_far_from_aabb(o, d, aabb, min_near=0.05)
    np.testing.assert_allclose(near[0, 0], 4.0, rtol=1e-6)
    np.testing.assert_allclose(far[0, 0], 6.0, rtol=1e-6)
    assert float(near[1, 0]) == pytest.approx(1e9)


def test_morton_roundtrip():
    rng = np.random.default_rng(0)
    coords = rng.integers(0, 1024, size=(1000, 3)).astype(np.int32)
    codes = morton3d(jnp.asarray(coords))
    back = morton3d_invert(codes)
    np.testing.assert_array_equal(np.asarray(back), coords)


def test_morton_small_values():
    # (1,0,0)->1, (0,1,0)->2, (0,0,1)->4, (1,1,1)->7
    c = jnp.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1]])
    np.testing.assert_array_equal(np.asarray(morton3d(c)), [1, 2, 4, 7])


def test_sh_encode_dims_and_dc():
    d = jnp.array([[0.0, 0.0, 1.0]])
    for degree in range(1, 9):
        out = sh_encode(d, degree)
        assert out.shape == (1, degree ** 2)
    out = sh_encode(d, 4)
    np.testing.assert_allclose(out[0, 0], 0.28209479, rtol=1e-5)


def test_sh_orthonormality():
    # random unit dirs: SH basis functions should be orthonormal under
    # uniform sphere measure (Monte Carlo check, loose tolerance)
    key = jax.random.PRNGKey(1)
    v = jax.random.normal(key, (200000, 3))
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    B = sh_encode(v, 3, normalize=False)  # [N, 9]
    G = (B.T @ B) / v.shape[0] * (4 * np.pi)
    np.testing.assert_allclose(np.asarray(G), np.eye(9), atol=0.05)


def test_freq_encode_shape_and_values():
    x = jnp.array([[0.5, -0.25]])
    out = freq_encode(x, degree=3)
    assert out.shape == (1, freq_output_dim(2, 3))
    # first entries are the input itself
    np.testing.assert_allclose(out[0, :2], [0.5, -0.25], rtol=1e-6)


def test_so3_exp_matches_rodrigues():
    w = jnp.array([[0.0, 0.0, np.pi / 2]])
    R = so3_to_SO3(w)[0]
    expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float32)
    np.testing.assert_allclose(np.asarray(R), expected, atol=1e-5)
    # R is a rotation
    np.testing.assert_allclose(np.asarray(R @ R.T), np.eye(3), atol=1e-6)


def test_se3_exp_zero_is_identity():
    Rt = se3_to_SE3(jnp.zeros((1, 6)))[0]
    np.testing.assert_allclose(np.asarray(Rt[:, :3]), np.eye(3), atol=1e-7)
    np.testing.assert_allclose(np.asarray(Rt[:, 3]), 0, atol=1e-7)


def test_se3_grad_finite():
    def f(wu):
        return se3_to_SE3(wu).sum()
    g = jax.grad(f)(jnp.array([0.1, -0.2, 0.3, 1.0, 2.0, 3.0]))
    assert np.all(np.isfinite(np.asarray(g)))
    g0 = jax.grad(f)(jnp.zeros(6))
    assert np.all(np.isfinite(np.asarray(g0)))


def test_pixel_rays_center_pixel_points_forward():
    # camera at origin looking down -z; center pixel ray = (0, 0, -1)
    pose = jnp.eye(4)
    intr = jnp.array([100.0, 100.0, 50.0, 50.0])  # fx fy cx cy
    W = 100
    ind = jnp.array([49 * W + 49])   # row 49 col 49 -> +0.5 = 49.5 ~ cx
    o, d = pixel_rays(pose, intr, ind, W)
    np.testing.assert_allclose(np.asarray(o[0]), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(d[0]), [-0.005, 0.005, -1.0],
                               atol=1e-6)
