"""Multi-cascade occupancy grid: density refresh, bit packing, frustum
culling.

TPU-native equivalent of the reference's density-grid machinery:
  * update_extra_state (nerf/renderer.py:811-897): periodic density sweep,
    EMA-max update, threshold -> packbits
  * packbits CUDA kernel (raymarching.cu:268-289): 8 cells/byte in Morton
    order
  * mark_untrained_grid (renderer.py:716-809): cells outside every camera
    frustum or the AABB are pinned to -1

Redesigns for TPU:
  * the grid lives in Morton order (same as the reference) so the marching
    bit test is one gather per sample;
  * the reference's "half random / half occupied" partial refresh
    (renderer.py:853-880) resamples occupied cells via nonzero() — a
    dynamic-shape op. Here the occupied half is drawn by inverse-CDF
    sampling over the occupancy mask (cumsum + searchsorted), which is
    static-shape and jit-friendly;
  * everything is one jitted function of the donated TrainState — no host
    round-trips at the update cadence.
"""

from __future__ import annotations

import functools
import math
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from raw_ngp_tpu.config import Config
from raw_ngp_tpu.ops.morton import morton3d, morton3d_invert


def init_grid_state(cfg: Config) -> Dict[str, jnp.ndarray]:
    """Zero-initialized grid buffers (renderer.py:191-198)."""
    cas = cfg.cascades
    h3 = cfg.render.grid_size ** 3
    return dict(
        density_grid=jnp.zeros((cas, h3), jnp.float32),
        density_bitfield=jnp.zeros((cas * h3) // 8, jnp.uint8),
        mean_density=jnp.zeros((), jnp.float32),
        iter_density=jnp.zeros((), jnp.int32),
    )


def packbits(density_grid, thresh):
    """[CAS, H^3] Morton-ordered densities -> uint8 bitfield
    (raymarching.cu:268-289: bit i of byte b is cell b*8+i)."""
    occ = (density_grid.reshape(-1) > thresh)
    occ = occ.reshape(-1, 8)
    weights = (2 ** np.arange(8)).astype(np.uint8)
    return (occ.astype(jnp.uint8) * weights).sum(axis=-1).astype(jnp.uint8)


def _cascade_coords_to_world(coords, cas_bound, half_grid, grid_size, key):
    """Integer grid coords -> jittered world positions at one cascade
    (renderer.py:837-846)."""
    xyz = 2.0 * coords.astype(jnp.float32) / (grid_size - 1) - 1.0
    xyz = xyz * (cas_bound - half_grid)
    noise = (jax.random.uniform(key, xyz.shape) * 2.0 - 1.0) * half_grid
    return xyz + noise


def make_grid_update(cfg: Config, spec, decay: float = 0.95):
    """Build the jitted density-grid refresh (renderer.py:811-897).

    Full sweep for the first 16 refreshes, then a partial refresh of
    H^3/4 random + H^3/4 occupancy-biased cells per cascade.
    """
    from raw_ngp_tpu.models.ngp import field_density

    grid_size = cfg.render.grid_size
    h3 = grid_size ** 3
    cascades = cfg.cascades
    bound = cfg.grid_bound
    # cells per refresh half (reference: H^3/4 + H^3/4, renderer.py:855);
    # rounded to a multiple of 2^15 so the lax.map chunking stays exact
    n_partial = max(int(h3 * cfg.render.grid_partial_fraction)
                    // 2 ** 15 * 2 ** 15, min(2 ** 15, h3 // 4))

    def query_sigma(params, xyz):
        return jax.lax.stop_gradient(
            field_density(params, spec, xyz, annealing=1.0))

    def full_sweep(params, key):
        """tmp_grid for every cell of every cascade. Coords are derived
        in-graph from iota (no multi-MB embedded constants) and the chunked
        query is a lax.map (one compiled body, not an unrolled graph)."""
        all_coords = morton3d_invert(
            jax.lax.iota(jnp.uint32, h3))               # [H^3, 3]
        S = min(2 ** 16, h3)   # h3 is a power of 8, so S always divides it
        tmp = []
        keys = jax.random.split(key, cascades)
        for cas in range(cascades):
            cas_bound = min(2 ** cas, bound)
            half = cas_bound / grid_size
            xyz = _cascade_coords_to_world(all_coords, cas_bound, half,
                                           grid_size, keys[cas])
            sig = jax.lax.map(lambda c: query_sigma(params, c),
                              xyz.reshape(-1, S, 3))
            tmp.append(sig.reshape(-1))
        return jnp.stack(tmp)                           # [CAS, H^3]

    def partial_sweep(params, density_grid, key, cas: int):
        """-1 everywhere except refreshed cells of ONE cascade
        (renderer.py:853-880 resampling; cascades refresh round-robin
        across updates — the reference refreshes all each time, but one
        density query here costs ~200 ns of table gathers so the sweep is
        a first-order step cost on TPU and alternating halves it while
        keeping the same per-cascade EMA cadence)."""
        tmp = jnp.full((cascades, h3), -1.0, jnp.float32)
        k_rand, k_occ, k_noise = jax.random.split(key, 3)
        cas_bound = min(2 ** cas, bound)
        half = cas_bound / grid_size
        # random half, sorted so its result scatter-SET runs on the fast
        # monotone path (duplicates are fine for SET: same cell, same
        # refresh)
        rand_idx = jax.lax.sort(jax.random.randint(
            k_rand, (n_partial,), 0, h3).astype(jnp.uint32))
        # occupied half: EVERY occupied cell when they fit the budget
        # (deterministic full coverage beats sampling); over budget,
        # stride-decimate the occupied ordinals with a random phase.
        # Replaces the inverse-CDF searchsorted (a 21-step binary search
        # per sample — ~40 ms at 512k samples over a 2M-cell CDF) with
        # one cumsum + one monotone scatter, and comes out ALREADY
        # sorted, so the full-stream 1M-id sort disappears too.
        occ = density_grid[cas] > 0                       # [h3]
        c = jnp.cumsum(occ.astype(jnp.int32))             # inclusive count
        total = c[-1]
        stride = jnp.maximum((total + n_partial - 1) // n_partial, 1)
        phase = jax.random.randint(k_occ, (), 0, 1 << 30) % stride
        keep = occ & ((c - 1) % stride == phase)
        ck = jnp.cumsum(keep.astype(jnp.int32))
        kept = keep & (ck <= n_partial)
        dest = jnp.where(kept, 2 * ck,
                         jnp.minimum(2 * ck + 1, 2 * n_partial + 1))
        dnums = jax.lax.ScatterDimensionNumbers(
            update_window_dims=(), inserted_window_dims=(0,),
            scatter_dims_to_operand_dims=(0,))
        buf = jax.lax.scatter(
            jnp.full((2 * n_partial + 2,), h3, jnp.int32), dest[:, None],
            jax.lax.iota(jnp.int32, h3), dnums,
            indices_are_sorted=True, unique_indices=True)
        # unfilled slots re-query the last cell (stays sorted; harmless
        # duplicate SET) — also covers the nothing-occupied-yet case
        occ_idx = jnp.minimum(buf[2::2], h3 - 1).astype(jnp.uint32)
        idx = jnp.concatenate([rand_idx, occ_idx])
        coords = morton3d_invert(idx)
        xyz = _cascade_coords_to_world(coords, cas_bound, half,
                                       grid_size, k_noise)
        # chunked query (lax.map) — unchunked, the hash-encode
        # intermediates for 2*n_partial points exceed HBM
        S = min(2 ** 16, 2 * n_partial)
        sig = jax.lax.map(lambda c: query_sigma(params, c),
                          xyz.reshape(-1, S, 3)).reshape(-1)
        # two monotone scatters (each half is sorted; their concat is not)
        tmp = tmp.at[cas, rand_idx.astype(jnp.int32)].set(
            sig[:n_partial], indices_are_sorted=True)
        tmp = tmp.at[cas, occ_idx.astype(jnp.int32)].set(
            sig[n_partial:], indices_are_sorted=True)
        return tmp

    density_thresh = cfg.render.density_thresh

    def finish(density_grid, tmp):
        """EMA-max merge + threshold + packbits (renderer.py:883-894)."""
        valid = (density_grid >= 0) & (tmp >= 0)
        new_grid = jnp.where(valid,
                             jnp.maximum(density_grid * decay, tmp),
                             density_grid)
        mean_density = jnp.mean(jnp.clip(new_grid, 0.0, None))
        thresh = jnp.minimum(mean_density, density_thresh)
        bitfield = packbits(new_grid, thresh)
        return new_grid, bitfield, mean_density

    @jax.jit
    def update_full(state):
        key, k = jax.random.split(state.key)
        tmp = full_sweep(state.params, k)
        grid, bits, mean = finish(state.density_grid, tmp)
        return state.replace(density_grid=grid, density_bitfield=bits,
                             mean_density=mean,
                             iter_density=state.iter_density + 1, key=key)

    @functools.partial(jax.jit, static_argnums=(1,))
    def update_partial(state, cas: int):
        key, k = jax.random.split(state.key)
        tmp = partial_sweep(state.params, state.density_grid, k, cas)
        grid, bits, mean = finish(state.density_grid, tmp)
        return state.replace(density_grid=grid, density_bitfield=bits,
                             mean_density=mean,
                             iter_density=state.iter_density + 1, key=key)

    def update(state, host_iter=None):
        # host-side branch on the refresh count (static cadence decision,
        # mirrors renderer.py:824/854); both branches are cached jits.
        # host_iter avoids a device sync when the caller tracks the count.
        it = host_iter if host_iter is not None else int(state.iter_density)
        if it < 16:
            return update_full(state)
        return update_partial(state, (it - 16) % cascades)

    return update


def _morton3d_invert_np(codes: np.ndarray) -> np.ndarray:
    """Host-side Morton decode (keeps init off the device tunnel)."""
    def compact(v):
        v = v.astype(np.uint32) & np.uint32(0x49249249)
        v = (v ^ (v >> 2)) & np.uint32(0xC30C30C3)
        v = (v ^ (v >> 4)) & np.uint32(0x0F00F00F)
        v = (v ^ (v >> 8)) & np.uint32(0xFF0000FF)
        v = (v ^ (v >> 16)) & np.uint32(0x000003FF)
        return v
    return np.stack([compact(codes), compact(codes >> 1),
                     compact(codes >> 2)], axis=-1).astype(np.int32)


def mark_untrained_grid(cfg: Config, poses, intrinsics, aabb,
                        cam_near_far=None) -> jnp.ndarray:
    """Initial density grid with -1 in cells no camera can see
    (renderer.py:716-809). Host-side, runs once before training."""
    grid_size = cfg.render.grid_size
    h3 = grid_size ** 3
    cascades = cfg.cascades
    bound = cfg.grid_bound

    poses = np.asarray(poses)
    fx, fy, cx, cy = np.asarray(intrinsics)
    aabb = np.asarray(aabb)
    B = poses.shape[0]

    coords = _morton3d_invert_np(np.arange(h3, dtype=np.uint32))
    world = (2.0 * coords.astype(np.float32) / (grid_size - 1)
             - 1.0)                                      # [-1, 1]

    grid = np.zeros((cascades, h3), np.float32)
    min_near = (cfg.render.min_near if cam_near_far is None
                else np.asarray(cam_near_far)[:, 0][:, None])

    for cas in range(cascades):
        cas_bound = min(2 ** cas, bound)
        half = cas_bound / grid_size
        pts = world * (cas_bound - half)                 # [H^3, 3]

        in_aabb = np.all(pts >= (aabb[:3] - half), axis=-1) & \
            np.all(pts <= (aabb[3:] + half), axis=-1)

        seen = np.zeros(h3, bool)
        S = 16
        for head in range(0, B, S):
            ps = poses[head:head + S]
            cam = pts[None] - ps[:, None, :3, 3]
            cam = np.einsum("bnc,bcr->bnr", cam, ps[:, :3, :3])
            cam[..., 2] *= -1                            # forward is -z
            mn = (min_near if np.isscalar(min_near)
                  else min_near[head:head + S])
            mask_z = cam[..., 2] > mn
            mask_x = np.abs(cam[..., 0]) < (cx / fx * cam[..., 2] + half * 2)
            mask_y = np.abs(cam[..., 1]) < (cy / fy * cam[..., 2] + half * 2)
            seen |= (mask_z & mask_x & mask_y).any(axis=0)

        grid[cas, ~(seen & in_aabb)] = -1.0

    n_masked = int((grid < 0).sum())
    print(f"[mark_untrained_grid] {n_masked} / {cascades * h3} cells masked")
    return jnp.asarray(grid)
