"""Fused (sort-backward) hash encoder vs the pure-jnp reference op —
forward equality and gradient equality (the oracle pattern of SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raw_ngp_tpu.kernels.hash_fused import hash_encode_fused
from raw_ngp_tpu.ops.hashgrid import (
    HashGridSpec,
    hash_encode_01,
    init_hashgrid_params,
)


@pytest.fixture(scope="module", params=["xor", "additive"])
def spec(request):
    # levels 0-1 are dense, 2-5 hashed: under "xor" the hashed levels take
    # the degenerate one-corner-window path, under "additive" every level
    # is pair-windowed — both fused paths are exercised against the oracle
    return HashGridSpec.create(input_dim=3, num_levels=6, level_dim=2,
                               base_resolution=4, log2_hashmap_size=9,
                               desired_resolution=64,
                               hash_variant=request.param)


def test_forward_matches_reference(spec):
    params = init_hashgrid_params(jax.random.PRNGKey(0), spec)
    x01 = jax.random.uniform(jax.random.PRNGKey(1), (257, 3))
    # include some OOB rows
    x01 = x01.at[0].set(jnp.array([1.5, 0.5, 0.5]))
    got = hash_encode_fused(params, x01, spec)
    want = hash_encode_01(params, x01, spec)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-8)


def test_table_gradient_matches_reference(spec):
    params = jax.random.normal(jax.random.PRNGKey(0),
                               (spec.n_params, spec.level_dim)) * 0.1
    x01 = jax.random.uniform(jax.random.PRNGKey(1), (129, 3))
    cot = jax.random.normal(jax.random.PRNGKey(2),
                            (129, spec.output_dim))

    g_fused = jax.grad(
        lambda p: (hash_encode_fused(p, x01, spec) * cot).sum())(params)
    g_ref = jax.grad(
        lambda p: (hash_encode_01(p, x01, spec) * cot).sum())(params)
    # fused bwd pre-rounds record values AND the final per-row totals to
    # bf16 (the reference rounds every half2 atomic add to fp16,
    # gridencoder.cu:334-347; one bf16 rounding of the f32-accumulated
    # total is comparable noise) -> bf16-appropriate tolerance
    scale = np.abs(np.asarray(g_ref)).max()
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=3e-2, atol=1e-2 * scale)


def test_input_gradient_matches_reference(spec):
    params = jax.random.normal(jax.random.PRNGKey(0),
                               (spec.n_params, spec.level_dim)) * 0.1
    x01 = jax.random.uniform(jax.random.PRNGKey(1), (65, 3),
                             minval=0.05, maxval=0.95)
    cot = jax.random.normal(jax.random.PRNGKey(2), (65, spec.output_dim))

    g_fused = jax.grad(
        lambda x: (hash_encode_fused(params, x, spec, True) * cot).sum())(x01)
    g_ref = jax.grad(
        lambda x: (hash_encode_01(params, x, spec) * cot).sum())(x01)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-5)


def test_no_input_grads_returns_zeros(spec):
    params = init_hashgrid_params(jax.random.PRNGKey(0), spec)
    x01 = jax.random.uniform(jax.random.PRNGKey(1), (33, 3))
    g = jax.grad(
        lambda x: hash_encode_fused(params, x, spec, False).sum())(x01)
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_grad_under_jit_and_vmap_composition(spec):
    """The custom_vjp must compose with jit (it is used inside the train
    step)."""
    params = init_hashgrid_params(jax.random.PRNGKey(0), spec)
    x01 = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))

    @jax.jit
    def loss(p):
        return hash_encode_fused(p, x01, spec).sum()

    g = jax.jit(jax.grad(loss))(params)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).sum()) > 0


@pytest.mark.parametrize("level_dim", [4, 8, 16])
def test_wide_channel_layouts_match_reference(level_dim):
    """C=16 is the shipped flagship TPU profile (L2xC16,
    config.with_tpu_profile); C=4/C=8 are earlier profile shapes still
    reachable via tools/perf_sweep.py — pin all fused paths (forward +
    table gradient) against the oracle."""
    spec = HashGridSpec.create(input_dim=3, num_levels=4,
                               level_dim=level_dim, base_resolution=4,
                               log2_hashmap_size=9, desired_resolution=32,
                               hash_variant="additive")
    params = jax.random.normal(jax.random.PRNGKey(0),
                               (spec.n_params, spec.level_dim)) * 0.1
    x01 = jax.random.uniform(jax.random.PRNGKey(1), (129, 3))
    got = hash_encode_fused(params, x01, spec)
    want = hash_encode_01(params, x01, spec)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-8)

    cot = jax.random.normal(jax.random.PRNGKey(2),
                            (129, spec.output_dim))
    g_fused = jax.grad(
        lambda p: (hash_encode_fused(p, x01, spec) * cot).sum())(params)
    g_ref = jax.grad(
        lambda p: (hash_encode_01(p, x01, spec) * cot).sum())(params)
    scale = np.abs(np.asarray(g_ref)).max()
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=3e-2, atol=1e-2 * scale)


def test_iota_sort_backward_matches_default(monkeypatch):
    """RAW_NGP_IOTA_SORT=1 (permutation-gather payloads) must produce the
    same table gradient as the default payload-carrying sort (both ride
    the chunked per-level path; totals are order-invariant sums, so only
    bf16 packing noise may differ)."""
    spec = HashGridSpec.create(num_levels=2, level_dim=16,
                               log2_hashmap_size=12,
                               desired_resolution=256,
                               hash_variant="additive")
    key = jax.random.PRNGKey(11)
    params = init_hashgrid_params(key, spec).reshape(-1)
    x = jax.random.uniform(jax.random.fold_in(key, 1), (4096, 3))
    gout = jax.random.normal(jax.random.fold_in(key, 2),
                             (4096, spec.num_levels * spec.level_dim))

    def table_grad():
        # fresh trace per env value: the knob is read at trace time
        return jax.jit(jax.grad(lambda p: (hash_encode_fused(
            p, x, spec, False, jnp.float32) * gout).sum()))(params)

    monkeypatch.setenv("RAW_NGP_CHUNKED_SORT", "1")
    monkeypatch.setenv("RAW_NGP_IOTA_SORT", "0")
    g_def = np.asarray(table_grad())
    monkeypatch.setenv("RAW_NGP_IOTA_SORT", "1")
    g_iota = np.asarray(table_grad())
    scale = np.abs(g_def).max() + 1e-12
    np.testing.assert_allclose(g_iota, g_def, atol=2e-2 * scale)


def test_matmul_level_path_matches_window_path(monkeypatch):
    """The gather-free matmul path for leading dense levels
    (hash_fused._mm_forward / _mm_grad_table) must match the window path
    (RAW_NGP_MM_LEVELS=0) and the oracle: forward, table gradient, and
    the pose-path input gradients. Flagship-like L2xC16 spec: level 0 is
    dense res 16 (on the matmul path), level 1 hashed."""
    from raw_ngp_tpu.kernels import hash_fused as hf
    spec = HashGridSpec.create(num_levels=2, level_dim=16,
                               log2_hashmap_size=12,
                               desired_resolution=256,
                               hash_variant="additive")
    key = jax.random.PRNGKey(21)
    params = init_hashgrid_params(key, spec).reshape(-1)
    x = jax.random.uniform(jax.random.fold_in(key, 1), (2048, 3))
    gout = jax.random.normal(jax.random.fold_in(key, 2),
                             (2048, spec.num_levels * spec.level_dim))

    def run(need_input_grads=False):
        def loss(p, xx):
            return (hash_encode_fused(p, xx, spec, need_input_grads,
                                      jnp.float32) * gout).sum()
        out = jax.jit(lambda p, xx: hash_encode_fused(
            p, xx, spec, need_input_grads, jnp.float32))(params, x)
        gp, gx = jax.jit(jax.grad(loss, argnums=(0, 1)))(params, x)
        return np.asarray(out), np.asarray(gp), np.asarray(gx)

    monkeypatch.setenv("RAW_NGP_MM_LEVELS", "1")
    assert hf._matmul_split(spec) == 1      # level 0 on the matmul path
    out_mm, gp_mm, gx_mm = run(True)
    monkeypatch.setenv("RAW_NGP_MM_LEVELS", "0")
    assert hf._matmul_split(spec) == 0
    out_w, gp_w, gx_w = run(True)

    np.testing.assert_allclose(out_mm, out_w, rtol=1e-5, atol=1e-6)
    scale = np.abs(gp_w).max() + 1e-12
    np.testing.assert_allclose(gp_mm, gp_w, atol=2e-2 * scale)
    xscale = np.abs(gx_w).max() + 1e-12
    np.testing.assert_allclose(gx_mm, gx_w, atol=1e-3 * xscale)

    # oracle cross-check of the matmul-path forward
    monkeypatch.setenv("RAW_NGP_MM_LEVELS", "1")
    want = hash_encode_01(params.reshape(spec.n_params, spec.level_dim),
                          x, spec)
    np.testing.assert_allclose(out_mm, np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_matmul_level_path_matches_window_path_bf16(monkeypatch):
    """Training runs the encoder in bfloat16, where the mm path's bf16
    matmul gradient (single rounding) takes a different numeric route
    than the sorted path's bf16-packed totals — compare them under the
    bf16 tolerance already used by the window-path tests (ADVICE r3)."""
    from raw_ngp_tpu.kernels import hash_fused as hf
    spec = HashGridSpec.create(num_levels=2, level_dim=16,
                               log2_hashmap_size=12,
                               desired_resolution=256,
                               hash_variant="additive")
    key = jax.random.PRNGKey(31)
    params = init_hashgrid_params(key, spec).reshape(-1)
    x = jax.random.uniform(jax.random.fold_in(key, 1), (2048, 3))
    gout = jax.random.normal(jax.random.fold_in(key, 2),
                             (2048, spec.num_levels * spec.level_dim))

    def run():
        def loss(p, xx):
            return (hash_encode_fused(p, xx, spec, False, jnp.bfloat16)
                    .astype(jnp.float32) * gout).sum()
        out = jax.jit(lambda p, xx: hash_encode_fused(
            p, xx, spec, False, jnp.bfloat16))(params, x)
        gp = jax.jit(jax.grad(loss))(params, x)
        return np.asarray(out, np.float32), np.asarray(gp, np.float32)

    monkeypatch.setenv("RAW_NGP_MM_LEVELS", "1")
    assert hf._matmul_split(spec) == 1
    out_mm, gp_mm = run()
    monkeypatch.setenv("RAW_NGP_MM_LEVELS", "0")
    assert hf._matmul_split(spec) == 0
    out_w, gp_w = run()

    oscale = np.abs(out_w).max() + 1e-12
    np.testing.assert_allclose(out_mm, out_w, atol=1.5e-2 * oscale)
    scale = np.abs(gp_w).max() + 1e-12
    np.testing.assert_allclose(gp_mm, gp_w, atol=3e-2 * scale)
