"""Pallas TPU kernel: streaming compaction of a masked record stream.

This retires the last scalar-rate block of the training step: the
[N*K ~ 1M]-record monotone compact scatter in
render/occupancy.compact_positions (~6 ms at the scalar-core ~6 ns/record
rate, ~600x off HBM bandwidth for what is a sequential write stream) PLUS
the two flat attribute gathers that follow it (t and dt at ~4 ns/slice).
The reference does this compaction with a two-pass atomic CSR write
(raymarching.cu:338-491); this is the TPU-native equivalent.

One streaming pass produces, for every packed output slot, the flat
source index AND any number of u32 payload words (t / dt bits ride along
for free in the same DMA stream):

  * the host computes the keep-mask's inclusive cumsum `c` (1-D cumsums
    are fast on XLA:TPU) and keys = c-1 (the output rank) for kept
    records, SENTINEL for dropped ones;
  * the record stream is tiled [n_tiles, 8, 128]; the output grid
    iterates rank blocks of R slots. Ranks are non-decreasing in flat
    order, so block j's records live in the contiguous stream range
    [bs[j], bs[j+1]) found with one tiny searchsorted over `c`;
  * each block double-buffers DMA of its tiles from HBM and places
    records with the one-hot MXU contraction of the segsum playbook
    (kernels/segsum_pallas.py): out-of-block and sentinel keys fall out
    of the one-hot automatically, so tile-boundary rounding needs no
    fix-ups;
  * payload words are split into 4 bytes -> 4 bf16 channels each
    (0..255 is EXACT in bf16), contracted against the one-hot on the
    MXU, and recombined to u32 in-kernel. Every slot receives exactly
    one contribution, so arbitrary f32/u32 payload BITS reconstruct
    exactly — no reliance on f32-matmul precision modes.

The grid is sequential on the core, so per-block record-count skew costs
nothing; total work is O(M + m_pad) regardless of mask distribution.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TK = 1024              # records per tile = 8 sublanes x 128 lanes
_R = 512                # output slots per grid block
_SENTINEL = 0x7F000000  # pad key: larger than any real rank


def _kernel(starts_ref, ends_ref, keys_hbm, words_hbm, out_ref,
            kbuf, wbuf, sem, *, n_words: int, R: int):
    j = pl.program_id(0)
    t0 = starts_ref[j]
    n_t = ends_ref[j] - t0
    r0 = j * R
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0) + r0

    def key_dma(slot, t):
        return pltpu.make_async_copy(keys_hbm.at[t], kbuf.at[slot],
                                     sem.at[slot, 0])

    def word_dma(slot, t):
        return pltpu.make_async_copy(words_hbm.at[:, t], wbuf.at[slot],
                                     sem.at[slot, 1])

    @pl.when(n_t > 0)
    def _():
        key_dma(0, t0).start()
        word_dma(0, t0).start()

    def tile_body(i, acc):
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < n_t)
        def _():
            key_dma(1 - slot, t0 + i + 1).start()
            word_dma(1 - slot, t0 + i + 1).start()

        key_dma(slot, t0 + i).wait()
        word_dma(slot, t0 + i).wait()
        keys = kbuf[slot]                        # (8, 128) i32
        pw = wbuf[slot]                          # (n_words, 8, 128) u32
        # byte planes: (n_words, 8, 128) each, values 0..255 (bf16-exact).
        # Mosaic has no direct u32->bf16 cast; route via i32 -> f32.
        bytes_ = [((pw >> s) & jnp.uint32(0xFF)).astype(jnp.int32)
                  .astype(jnp.float32).astype(jnp.bfloat16)
                  for s in (0, 8, 16, 24)]

        for a in range(8):
            rows = []
            for w in range(n_words):
                for b in bytes_:
                    rows.append(b[w, a:a + 1, :])
            vt = jnp.concatenate(rows, axis=0)   # (4*n_words, 128) bf16
            onehot = (iota_r == keys[a:a + 1, :]).astype(jnp.bfloat16)
            acc = acc + jax.lax.dot_general(
                vt, onehot, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (4*n_words, R)
        return acc

    acc = jax.lax.fori_loop(
        0, n_t, tile_body, jnp.zeros((4 * n_words, R), jnp.float32))
    # recombine the 4 byte channels of each word; every slot got exactly
    # one contribution, so the f32 accumulators hold exact 0..255 ints
    # (static sublane slices — no sublane-splitting reshape in Mosaic)
    bb = acc.astype(jnp.int32).astype(jnp.uint32)
    outs = []
    for w in range(n_words):
        outs.append(bb[4 * w + 0:4 * w + 1]
                    | (bb[4 * w + 1:4 * w + 2] << 8)
                    | (bb[4 * w + 2:4 * w + 3] << 16)
                    | (bb[4 * w + 3:4 * w + 4] << 24))
    out_ref[:] = jnp.concatenate(outs, axis=0)


@functools.partial(jax.jit, static_argnums=(3, 4))
def _compact_words_impl(count_incl, keys, words, m_pad: int,
                        interpret: bool):
    M = keys.shape[0]
    n_words = words.shape[0]
    pad = (-M) % _TK
    n_tiles = (M + pad) // _TK
    keys_p = jnp.concatenate(
        [keys.astype(jnp.int32), jnp.full((pad,), _SENTINEL, jnp.int32)])
    words_p = jnp.concatenate(
        [words, jnp.zeros((n_words, pad), jnp.uint32)], axis=1)
    keys3 = keys_p.reshape(n_tiles, 8, 128)
    words4 = words_p.reshape(n_words, n_tiles, 8, 128)

    n_blocks = -(-m_pad // _R)
    # block j covers ranks [j*R, (j+1)*R): its records are those with
    # inclusive count in [j*R + 1, (j+1)*R], a contiguous flat range
    bounds = jnp.arange(n_blocks + 1, dtype=jnp.int32) * _R + 1
    bs = jnp.searchsorted(count_incl, bounds, side="left").astype(jnp.int32)
    starts = bs[:-1] // _TK
    ends = -(-bs[1:] // _TK)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((n_words, _R), lambda j, *_: (0, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, 8, 128), jnp.int32),
                        pltpu.VMEM((2, n_words, 8, 128), jnp.uint32),
                        pltpu.SemaphoreType.DMA((2, 2))],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, n_words=n_words, R=_R),
        out_shape=jax.ShapeDtypeStruct((n_words, n_blocks * _R),
                                       jnp.uint32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts, ends, keys3, words4)
    return out[:, :m_pad]


# Tests monkeypatch this to force interpret-mode execution on CPU.
FORCE_INTERPRET = False


def use_pallas_compact() -> bool:
    """Platform gate, mirroring segsum_pallas.use_pallas_segsum."""
    if os.environ.get("RAW_NGP_NO_PALLAS"):
        return False
    if os.environ.get("RAW_NGP_NO_PALLAS_COMPACT"):
        return False
    if FORCE_INTERPRET:
        return True
    return jax.default_backend() not in ("cpu",)


def compact_words_pallas(count_incl, keys, words, m_pad: int):
    """Streaming compaction of u32 payload words.

    count_incl: [M] i32 inclusive cumsum of the keep mask (non-decreasing).
    keys: [M] i32 = count_incl - 1 for kept records with rank < m_pad,
      _SENTINEL otherwise. Kept ranks are therefore 0,1,2,... in flat
      order, each appearing exactly once.
    words: [n_words, M] u32 payloads (e.g. flat index, f32 bits).
    Returns [n_words, m_pad] u32; slots with no record hold 0.
    """
    return _compact_words_impl(count_incl, keys, jnp.asarray(words),
                               m_pad, FORCE_INTERPRET)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def compact_attrs_pallas(attrs, keys, count_incl, m_pad: int):
    """Fused compaction: flat source index + compacted f32 attributes.

    attrs: [n_attr, M] f32 per-record attributes (differentiable).
    keys / count_incl: see compact_words_pallas.
    Returns (pos [m_pad] i32, attrs_c [n_attr, m_pad] f32):
      pos: flat source index per packed slot, ASCENDING over the filled
        prefix; unfilled slots hold the sentinel M (drop-in for the
        scatter in render/occupancy.compact_positions);
      attrs_c[i] == attrs[i][pos] with 0 for unfilled slots (drop-in for
        gather_flat_sorted at pos).
    """
    return _compact_attrs_fwd(attrs, keys, count_incl, m_pad)[0]


def _compact_attrs_fwd(attrs, keys, count_incl, m_pad):
    M = attrs.shape[1]
    if M >= (1 << 24):
        raise ValueError("compact_attrs_pallas: flat index must fit "
                         "3 payload bytes (M < 2^24)")
    idx = jax.lax.iota(jnp.uint32, M)
    words = jnp.concatenate(
        [idx[None],
         jax.lax.bitcast_convert_type(
             attrs.astype(jnp.float32), jnp.uint32)], axis=0)
    out = compact_words_pallas(count_incl, keys, words, m_pad)
    n_kept = jnp.minimum(count_incl[-1], m_pad)
    filled = jnp.arange(m_pad, dtype=jnp.int32) < n_kept
    pos = jnp.where(filled, out[0].astype(jnp.int32), M)
    attrs_c = jax.lax.bitcast_convert_type(out[1:], jnp.float32)
    return (pos, attrs_c), (pos, M)


def _compact_attrs_bwd(m_pad, res, g):
    """Transpose of the attribute compaction: each filled slot reads flat
    position pos[i] exactly once, so the gradient is a monotone
    sorted-unique scatter-SET per channel (the only fast scatter form on
    XLA:TPU; unfilled slots are remapped past the real range)."""
    pos, M = res
    _, g_attrs = g
    dest = jnp.where(pos < M, pos,
                     M + jnp.arange(m_pad, dtype=pos.dtype))
    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(), inserted_window_dims=(0,),
        scatter_dims_to_operand_dims=(0,))
    rows = []
    for i in range(g_attrs.shape[0]):
        buf = jax.lax.scatter(
            jnp.zeros((M + m_pad,), g_attrs.dtype), dest[:, None],
            g_attrs[i], dnums,
            indices_are_sorted=True, unique_indices=True)
        rows.append(buf[:M])
    return jnp.stack(rows), None, None


compact_attrs_pallas.defvjp(_compact_attrs_fwd, _compact_attrs_bwd)
