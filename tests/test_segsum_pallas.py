"""Oracle tests for the Pallas segment-totals kernel (interpret mode).

The kernel is the TPU placement engine for the fused-encoder table
gradient (kernels/segsum_pallas.py); on CPU it runs through the Pallas
interpreter, so sizes here are tiny. Coverage: random streams, empty
rows/blocks, a single giant segment (dense-level skew), tile-boundary
straddling, block-boundary straddling, and the bf16 value contract.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import raw_ngp_tpu.kernels.segsum_pallas as sp
from raw_ngp_tpu.kernels.hash_fused import (_pack_bf16_pairs,
                                            _unpack_bf16_pairs)


def _trunc_bf16(v):
    """_pack_bf16_pairs keeps the top 16 bits (truncation, not
    round-to-nearest) — the oracle must model the same quantization."""
    return (np.asarray(v, np.float32).view(np.uint32)
            & np.uint32(0xFFFF0000)).view(np.float32)


def _oracle(keys, chans, n_rows):
    """np.add.at over the bf16-truncated channel values (the kernel's
    inputs are bf16-packed, its accumulation exact f32)."""
    out = np.zeros((n_rows, len(chans)), np.float32)
    for c, v in enumerate(chans):
        np.add.at(out[:, c], keys, _trunc_bf16(v))
    return out


def _run(keys, chans, n_rows):
    order = np.argsort(keys, kind="stable")
    keys_s = np.asarray(keys)[order].astype(np.int32)
    chans_s = [jnp.asarray(np.asarray(c)[order], jnp.float32)
               for c in chans]
    packed = _pack_bf16_pairs(chans_s)
    # round-trip through the pack so the oracle sees identical values
    sp.FORCE_INTERPRET = True
    try:
        out = sp.segment_totals_pallas(jnp.asarray(keys_s), packed,
                                       n_rows, len(chans))
    finally:
        sp.FORCE_INTERPRET = False
    return np.asarray(out)


@pytest.mark.parametrize("n_chan", [2, 4, 8, 16])
def test_random_stream(n_chan):
    rng = np.random.default_rng(0)
    M, n_rows = 4096, 1400          # 3 blocks, partial last block
    keys = rng.integers(0, n_rows, M)
    chans = [rng.standard_normal(M).astype(np.float32)
             for _ in range(n_chan)]
    out = _run(keys, chans, n_rows)
    ref = _oracle(np.sort(keys), [c[np.argsort(keys, kind="stable")]
                                  for c in chans], n_rows)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-4)


def test_dense_skew_single_segment():
    """1M-records-into-few-rows skew, miniaturized: one row owns almost
    every record (dense level 0 pattern) and spans many tiles."""
    rng = np.random.default_rng(1)
    M, n_rows = 8192, 600
    keys = np.concatenate([np.full(M - 100, 7), rng.integers(0, n_rows, 100)])
    chans = [rng.standard_normal(M).astype(np.float32) for _ in range(4)]
    out = _run(keys, chans, n_rows)
    srt = np.argsort(keys, kind="stable")
    ref = _oracle(np.sort(keys), [c[srt] for c in chans], n_rows)
    # a ~8000-term bf16-value sum accumulated in f32: loose rtol on the
    # big row, tight elsewhere
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=5e-3)


def test_block_and_tile_boundaries():
    """Records exactly at R and TK multiples, plus empty blocks."""
    n_rows = 5 * sp._R              # 5 blocks; blocks 1 and 3 empty
    keys = np.array([0, 0, sp._R - 1, sp._R - 1,
                     2 * sp._R, 2 * sp._R + 1,
                     4 * sp._R, n_rows - 1] * 300)
    rng = np.random.default_rng(2)
    chans = [rng.standard_normal(keys.size).astype(np.float32)
             for _ in range(2)]
    out = _run(keys, chans, n_rows)
    srt = np.argsort(keys, kind="stable")
    ref = _oracle(np.sort(keys), [c[srt] for c in chans], n_rows)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=2e-3)
    # untouched blocks stay exactly zero
    assert np.all(out[sp._R:2 * sp._R] == 0)
    assert np.all(out[3 * sp._R:4 * sp._R] == 0)


def test_pack_roundtrip():
    rng = np.random.default_rng(3)
    chans = [jnp.asarray(rng.standard_normal(256), jnp.float32)
             for _ in range(5)]
    packed = _pack_bf16_pairs(list(chans))
    back = _unpack_bf16_pairs(packed, 5)
    for a, b in zip(chans, back):
        np.testing.assert_allclose(_trunc_bf16(a), np.asarray(b),
                                   rtol=0, atol=0)


def test_fused_encoder_grad_via_pallas_matches_xla():
    """End-to-end: the fused encoder's table gradient through the Pallas
    placement path equals the XLA scan+scatter path (up to the bf16
    total rounding the XLA path applies and Pallas doesn't)."""
    from raw_ngp_tpu.kernels.hash_fused import hash_encode_fused
    from raw_ngp_tpu.ops.hashgrid import HashGridSpec, init_hashgrid_params

    spec = HashGridSpec.create(input_dim=3, num_levels=4, level_dim=2,
                               log2_hashmap_size=10, desired_resolution=64,
                               hash_variant="additive")
    params = init_hashgrid_params(jax.random.PRNGKey(0), spec)
    x01 = jax.random.uniform(jax.random.PRNGKey(1), (512, 3))

    def loss(p):
        out = hash_encode_fused(p, x01, spec, False, None)
        return (out * jnp.arange(out.size).reshape(out.shape)).sum()

    g_xla = jax.grad(loss)(params)
    sp.FORCE_INTERPRET = True
    try:
        g_pl = jax.grad(loss)(params)
    finally:
        sp.FORCE_INTERPRET = False
    scale = float(jnp.abs(g_xla).max()) + 1e-8
    np.testing.assert_allclose(np.asarray(g_pl) / scale,
                               np.asarray(g_xla) / scale,
                               rtol=0, atol=6e-3)
