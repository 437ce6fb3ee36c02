"""Pallas TPU kernel: segment totals of a sorted record stream.

This is the table-gradient placement engine behind the fused hash encoder
backward (kernels/hash_fused.py). The reference accumulates the table
gradient with one fp16 atomicAdd per corner-channel
(gridencoder.cu:334-347); XLA:TPU has no fast scatter-ADD, and the
round-2 fallback (segmented shift-mask scan + C monotone scalar
scatter-SET passes) cost ~250 ms/step at M = 8.4M records — 50% of the
whole training step.

This kernel replaces scan + scatter with a single streaming pass:

  * the record stream (already sorted by table row; XLA's bitonic sort is
    cheap at ~5 ns/record) is tiled as [n_tiles, 8, 128] with bf16-pair
    packed payloads [C_packed, n_tiles, 8, 128];
  * the output grid iterates ROW BLOCKS of R rows; records for block j
    are the contiguous sorted-stream range [bs[j], bs[j+1]) located with
    one tiny XLA searchsorted over the n_blocks+1 boundaries;
  * each block double-buffers DMA of its record tiles from HBM and
    accumulates   acc[c, r] += sum_k v[c, k] * (key[k] == r)
    as an MXU contraction against an iota-built one-hot — start tiles
    are rounded DOWN to a tile boundary and out-of-block records fall
    out of the one-hot automatically, so no alignment fix-ups exist;
  * accumulation is EXACT float32 (the bf16-packed record values are
    MXU-native inputs); the round-2 path rounded per-row totals to bf16.

TPU execution notes (why this shape):
  * the grid is sequential on the core, so per-block record-count skew
    (dense low-res levels funnel 1M records into 4096 rows) costs
    nothing — total work is O(M + n_rows) regardless of distribution;
  * the one-hot is built by comparing a (1, 128) key row against a
    (R, 128) row-iota — R compares/record on the VPU, no transposes or
    sublane relayouts anywhere;
  * per 128-record row: one (R, 128) compare + one [2C, 128] x [R, 128]^T
    MXU contraction, both pipelined against the next tile's DMA.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TK = 1024            # records per tile = 8 sublanes x 128 lanes
_R = 512              # output rows per grid block
_SENTINEL = 0x7F000000  # pad key: larger than any real row id


def _kernel(starts_ref, ends_ref, keys_hbm, vals_hbm, out_ref,
            kbuf, vbuf, sem, *, n_chan: int, n_packed: int, R: int,
            outer_c: int):
    j = pl.program_id(0)
    t0 = starts_ref[j]
    n_t = ends_ref[j] - t0
    r0 = j * R
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0) + r0

    def key_dma(slot, t):
        return pltpu.make_async_copy(keys_hbm.at[t], kbuf.at[slot],
                                     sem.at[slot, 0])

    def val_dma(slot, t):
        return pltpu.make_async_copy(vals_hbm.at[:, t], vbuf.at[slot],
                                     sem.at[slot, 1])

    @pl.when(n_t > 0)
    def _():
        key_dma(0, t0).start()
        val_dma(0, t0).start()

    def tile_body(i, acc):
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < n_t)
        def _():
            key_dma(1 - slot, t0 + i + 1).start()
            val_dma(1 - slot, t0 + i + 1).start()

        key_dma(slot, t0 + i).wait()
        val_dma(slot, t0 + i).wait()
        keys = kbuf[slot]                               # (8, 128) i32
        pv = vbuf[slot]                                 # (n_packed, 8, 128)
        hi = jax.lax.bitcast_convert_type(
            pv & jnp.uint32(0xFFFF0000), jnp.float32)
        lo = jax.lax.bitcast_convert_type(pv << 16, jnp.float32)

        for a in range(8):
            # channel order matches _pack_bf16_pairs: (2p, 2p+1) ride
            # word p as (hi, lo)
            if outer_c > 0:
                # outer-product payload: word 0 = (w0, w1), words 1.. =
                # the C g-channels shared by both window rows; the 2C
                # premultiplied channels are reconstructed here so the
                # sorted stream carries 1 + ceil(C/2) words instead of C
                w0 = hi[0, a:a + 1, :]
                w1 = lo[0, a:a + 1, :]
                rows = []
                for p in range(1, n_packed):
                    rows.append(hi[p, a:a + 1, :])
                    rows.append(lo[p, a:a + 1, :])
                gmat = jnp.concatenate(rows[:outer_c], axis=0)  # (C, 128)
                vt = jnp.concatenate([w0 * gmat, w1 * gmat], axis=0)
            else:
                rows = []
                for p in range(n_packed):
                    rows.append(hi[p, a:a + 1, :])
                    rows.append(lo[p, a:a + 1, :])
                vt = jnp.concatenate(rows[:n_chan], axis=0)  # (n_chan, 128)
            onehot = (iota_r == keys[a:a + 1, :]).astype(jnp.bfloat16)
            acc = acc + jax.lax.dot_general(
                vt.astype(jnp.bfloat16), onehot,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)      # (n_chan, R)
        return acc

    out_ref[:] = jax.lax.fori_loop(
        0, n_t, tile_body, jnp.zeros((n_chan, R), jnp.float32))


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def _segment_totals_impl(keys_sorted, packed_stack, n_rows: int,
                         n_chan: int, interpret: bool, outer_c: int = 0):
    M = keys_sorted.shape[0]
    n_packed = packed_stack.shape[0]
    pad = (-M) % _TK
    n_tiles = (M + pad) // _TK
    keys_p = jnp.concatenate(
        [keys_sorted.astype(jnp.int32),
         jnp.full((pad,), _SENTINEL, jnp.int32)])
    vals_p = jnp.concatenate(
        [packed_stack, jnp.zeros((n_packed, pad), jnp.uint32)], axis=1)
    keys3 = keys_p.reshape(n_tiles, 8, 128)
    vals4 = vals_p.reshape(n_packed, n_tiles, 8, 128)

    n_blocks = -(-n_rows // _R)
    bounds = jnp.arange(n_blocks + 1, dtype=jnp.int32) * _R
    bs = jnp.searchsorted(keys_p, bounds).astype(jnp.int32)
    starts = bs[:-1] // _TK
    ends = -(-bs[1:] // _TK)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((n_chan, _R), lambda j, *_: (0, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, 8, 128), jnp.int32),
                        pltpu.VMEM((2, n_packed, 8, 128), jnp.uint32),
                        pltpu.SemaphoreType.DMA((2, 2))],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, n_chan=n_chan, n_packed=n_packed, R=_R,
                          outer_c=outer_c),
        out_shape=jax.ShapeDtypeStruct((n_chan, n_blocks * _R),
                                       jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts, ends, keys3, vals4)
    return out[:, :n_rows].T                           # [n_rows, n_chan]


# Tests monkeypatch this to force interpret-mode execution on CPU.
FORCE_INTERPRET = False


def use_pallas_segsum() -> bool:
    """Platform gate: the Mosaic kernel runs on real TPU backends (incl.
    the axon tunnel, which compiles Mosaic server-side); CPU test runs
    fall back to the XLA scan+scatter path unless FORCE_INTERPRET."""
    if os.environ.get("RAW_NGP_NO_PALLAS"):
        return False
    if FORCE_INTERPRET:
        return True
    return jax.default_backend() not in ("cpu",)


def segment_totals_pallas(keys_sorted, packed_vals, n_rows: int,
                          n_chan: int):
    """Exact f32 per-row totals of a SORTED record stream.

    keys_sorted: [M] int32 ascending row ids in [0, n_rows).
    packed_vals: list of [M] uint32, two bf16 channel values per word in
      kernels.hash_fused._pack_bf16_pairs order.
    Returns [n_rows, n_chan] float32 (drop-in for
    _segment_sum_sorted_scatter, but without its bf16 total rounding).
    """
    return _segment_totals_impl(keys_sorted, jnp.stack(packed_vals),
                                n_rows, n_chan, FORCE_INTERPRET)


def segment_totals_outer_pallas(keys_sorted, w_packed, g_packed,
                                n_rows: int, c: int):
    """Per-row totals of the OUTER-PRODUCT record stream w ⊗ g.

    keys_sorted: [M] int32 ascending row ids in [0, n_rows).
    w_packed: [M] uint32, (w0, w1) bf16 pair per record.
    g_packed: list of [M] uint32, the record's C shared g-channels as
      bf16 pairs (_pack_bf16_pairs order).
    Returns [n_rows, 2*c] float32: columns [0, c) are per-row totals of
    w0*g, columns [c, 2c) of w1*g — exactly what
    kernels.hash_fused._window_bwd_table consumes, at 1 + ceil(c/2)
    sorted payload words instead of c."""
    stack = jnp.stack([w_packed] + list(g_packed))
    return _segment_totals_impl(keys_sorted, stack, n_rows, 2 * c,
                                FORCE_INTERPRET, outer_c=c)
