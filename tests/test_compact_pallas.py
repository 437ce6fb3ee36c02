"""Oracle tests for the Pallas streaming-compaction kernel
(kernels/compact_pallas.py, interpret mode on CPU).

The kernel is a drop-in for render/occupancy.compact_positions' monotone
compact scatter PLUS the gather_flat_sorted attribute gathers that follow
it, so the oracle IS those functions. Coverage: random masks at several
keep rates, empty/full masks, overflow past m_pad (truncation), m_pad not
a multiple of the block size, tile-boundary straddling, bit-exactness of
f32 payloads (subnormals, huge, negative), large flat indices, and the
custom-VJP gradient against the oracle path's gradient.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import raw_ngp_tpu.kernels.compact_pallas as cp
from raw_ngp_tpu.render.occupancy import (compact_positions,
                                          gather_flat_sorted)


def _run(mask_flat, attrs, m_pad):
    """Kernel path under FORCE_INTERPRET; returns (pos, attrs_c)."""
    flat = jnp.asarray(mask_flat, bool)
    c = jnp.cumsum(flat.astype(jnp.int32))
    kept = flat & (c <= m_pad)
    keys = jnp.where(kept, c - 1, cp._SENTINEL)
    cp.FORCE_INTERPRET = True
    try:
        pos, attrs_c = cp.compact_attrs_pallas(
            jnp.asarray(attrs, jnp.float32), keys, c, m_pad)
    finally:
        cp.FORCE_INTERPRET = False
    return np.asarray(pos), np.asarray(attrs_c)


def _oracle(mask_flat, attrs, m_pad):
    n = int(np.sqrt(len(mask_flat)))
    # compact_positions takes a 2-D mask; any factorization works
    mask2 = jnp.asarray(mask_flat, bool).reshape(1, -1)
    _, _, pos = compact_positions(mask2, m_pad)
    attrs_c = [gather_flat_sorted(jnp.asarray(a, jnp.float32), pos)
               for a in attrs]
    return np.asarray(pos), np.stack([np.asarray(a) for a in attrs_c])


@pytest.mark.parametrize("keep_rate", [0.03, 0.25, 0.9])
def test_random_mask_matches_oracle(keep_rate):
    rng = np.random.default_rng(7)
    M, m_pad = 5000, 1024            # M not a tile multiple; 2 blocks
    mask = rng.random(M) < keep_rate
    attrs = [rng.standard_normal(M).astype(np.float32),
             rng.standard_normal(M).astype(np.float32)]
    pos_k, att_k = _run(mask, attrs, m_pad)
    pos_o, att_o = _oracle(mask, attrs, m_pad)
    np.testing.assert_array_equal(pos_k, pos_o)
    np.testing.assert_array_equal(att_k, att_o)   # bit-exact contract


def test_overflow_truncates_like_oracle():
    rng = np.random.default_rng(1)
    M, m_pad = 4096, 512             # ~2048 kept >> 512 slots
    mask = rng.random(M) < 0.5
    attrs = [rng.standard_normal(M).astype(np.float32)]
    pos_k, att_k = _run(mask, attrs, m_pad)
    pos_o, att_o = _oracle(mask, attrs, m_pad)
    np.testing.assert_array_equal(pos_k, pos_o)
    np.testing.assert_array_equal(att_k, att_o)
    assert (pos_k < M).all()         # every slot filled


def test_empty_and_full_mask():
    M, m_pad = 2048, 640             # m_pad NOT a multiple of _R
    attrs = [np.linspace(-3, 3, M, dtype=np.float32)]
    pos_k, att_k = _run(np.zeros(M, bool), attrs, m_pad)
    assert (pos_k == M).all()
    assert (att_k == 0.0).all()
    pos_k, att_k = _run(np.ones(M, bool), attrs, m_pad)
    pos_o, att_o = _oracle(np.ones(M, bool), attrs, m_pad)
    np.testing.assert_array_equal(pos_k, pos_o)
    np.testing.assert_array_equal(att_k, att_o)


def test_payload_bits_exact():
    """Arbitrary f32 bit patterns reconstruct exactly (the byte-split
    contract): subnormals, huge, negative zero, tiny."""
    vals = np.array([1e-38, -1e-38, 3.4e38, -0.0, 0.0, 1.5e-42,
                     np.float32(np.pi), -np.float32(np.e)], np.float32)
    rng = np.random.default_rng(3)
    M = 1536
    attrs = [rng.choice(vals, M).astype(np.float32)]
    mask = rng.random(M) < 0.5
    pos_k, att_k = _run(mask, attrs, 512)
    pos_o, att_o = _oracle(mask, attrs, 512)
    np.testing.assert_array_equal(pos_k, pos_o)
    assert (att_k.view(np.uint32) == att_o.view(np.uint32)).all()


def test_large_flat_index_exact():
    """Indices near the 3-byte limit survive the byte-split placement."""
    M = (1 << 21) + 1024             # 2M records, few kept
    rng = np.random.default_rng(5)
    mask = np.zeros(M, bool)
    kept_idx = np.sort(rng.choice(M, 700, replace=False))
    mask[kept_idx] = True
    flat = jnp.asarray(mask)
    c = jnp.cumsum(flat.astype(jnp.int32))
    keys = jnp.where(flat, c - 1, cp._SENTINEL)
    cp.FORCE_INTERPRET = True
    try:
        pos, _ = cp.compact_attrs_pallas(
            jnp.zeros((1, M), jnp.float32), keys, c, 1024)
    finally:
        cp.FORCE_INTERPRET = False
    pos = np.asarray(pos)
    np.testing.assert_array_equal(pos[:700], kept_idx)
    assert (pos[700:] == M).all()


def test_gradient_matches_oracle_path():
    rng = np.random.default_rng(11)
    M, m_pad = 3000, 512
    mask = rng.random(M) < 0.3
    t = rng.standard_normal(M).astype(np.float32)
    dt = rng.standard_normal(M).astype(np.float32)
    g = rng.standard_normal((2, m_pad)).astype(np.float32)

    flat = jnp.asarray(mask)
    c = jnp.cumsum(flat.astype(jnp.int32))
    keys = jnp.where(flat & (c <= m_pad), c - 1, cp._SENTINEL)

    def f_kernel(attrs):
        cp.FORCE_INTERPRET = True
        try:
            _, attrs_c = cp.compact_attrs_pallas(attrs, keys, c, m_pad)
        finally:
            cp.FORCE_INTERPRET = False
        return (attrs_c * g).sum()

    def f_oracle(attrs):
        _, _, pos = compact_positions(flat.reshape(1, -1), m_pad)
        a0 = gather_flat_sorted(attrs[0], pos)
        a1 = gather_flat_sorted(attrs[1], pos)
        return (jnp.stack([a0, a1]) * g).sum()

    attrs = jnp.stack([jnp.asarray(t), jnp.asarray(dt)])
    gk = jax.grad(f_kernel)(attrs)
    go = jax.grad(f_oracle)(attrs)
    np.testing.assert_array_equal(np.asarray(gk), np.asarray(go))
