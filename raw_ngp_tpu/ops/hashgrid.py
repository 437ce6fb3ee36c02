"""Multiresolution hash-grid encoding (Instant-NGP §3), TPU-native.

Replaces the reference CUDA extension (gridencoder/src/gridencoder.cu,
wrapper gridencoder/grid.py). Semantics are matched bit-for-bit where they
affect quality:

  * spatial hash = XOR of per-dim primes {1, 2654435761, 805459861}
    (gridencoder.cu:46-58)
  * tiled-vs-hash index dispatch with the cumulative-stride early-out
    (gridencoder.cu:62-79): dims stop contributing once the running stride
    exceeds the level's table size, and the hash is only used for hash-type
    grids whose dense size overflows the table
  * per-level table size min(2^log2_T, res^D) rounded up to a multiple of 8
    (grid.py:124-137); init U(-1e-4, 1e-4) (grid.py:144-146)
  * align_corners=False sampling: pos = clamp(x*res - 0.5, 0, res-1)
    (gridencoder.cu:148-149); out-of-[0,1] inputs produce zeros
    (gridencoder.cu:105-130)

Design for TPU: all levels are fused into ONE gather over a flat parameter
table (indices [B, L*2^D]) so XLA emits a single large dynamic-gather; the
backward pass is the gather transpose — a scatter-add in fp32, replacing
CUDA atomicAdd (gridencoder.cu:334-347). A Pallas kernel can be swapped in
behind the same function signature (see raw_ngp_tpu/kernels/).

Uint32 wrap-around arithmetic intentionally matches the CUDA kernel.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# per-dim hash primes (gridencoder.cu:49)
_PRIMES = (1, 2654435761, 805459861, 3674653429, 2097192037, 1434869437,
           2165219737)


@dataclass(frozen=True)
class HashGridSpec:
    """Static description of a hash-grid encoder; all fields are Python
    values so they become compile-time constants under jit."""

    input_dim: int = 3
    num_levels: int = 16
    level_dim: int = 2
    per_level_scale: float = 2.0
    base_resolution: int = 16
    log2_hashmap_size: int = 19
    gridtype: str = "hash"            # "hash" | "tiled"
    align_corners: bool = False
    interpolation: str = "linear"     # "linear" | "smoothstep"
    # "xor": reference hash (prime-XOR, gridencoder.cu:46-58).
    # "additive": TPU pair-aligned variant — dim 0 attaches ADDITIVELY to a
    # prime-XOR hash of the remaining dims, row = x + mix(y,z), so the two
    # x-corners of ANY cell occupy adjacent table rows and every level (not
    # just dense ones) is served by 2-row-window gathers and pair-record
    # gradients (see kernels/hash_fused.py). Same collision load factor;
    # quality validated against the xor hash in tests/test_hash_variant.py.
    hash_variant: str = "xor"

    @staticmethod
    def create(input_dim=3, num_levels=16, level_dim=2,
               base_resolution=16, log2_hashmap_size=19,
               desired_resolution=None, per_level_scale=2.0,
               gridtype="hash", align_corners=False,
               interpolation="linear", hash_variant="xor") -> "HashGridSpec":
        """Mirror of GridEncoder.__init__ (grid.py:103-108): a desired finest
        resolution overrides per_level_scale."""
        if desired_resolution is not None:
            per_level_scale = float(np.exp2(
                np.log2(desired_resolution / base_resolution)
                / max(num_levels - 1, 1)))
        return HashGridSpec(
            input_dim=input_dim, num_levels=num_levels, level_dim=level_dim,
            per_level_scale=per_level_scale, base_resolution=base_resolution,
            log2_hashmap_size=log2_hashmap_size, gridtype=gridtype,
            align_corners=align_corners, interpolation=interpolation,
            hash_variant=hash_variant)

    @property
    def resolutions(self) -> Tuple[int, ...]:
        """Per-level resolutions: ceil(2^(l*S) * H) (gridencoder.cu:133,
        equivalently grid.py:128)."""
        s = math.log2(self.per_level_scale)
        return tuple(int(math.ceil(2.0 ** (lv * s) * self.base_resolution))
                     for lv in range(self.num_levels))

    @property
    def offsets(self) -> Tuple[int, ...]:
        """Cumulative per-level table offsets (grid.py:124-133)."""
        offs = [0]
        max_params = 2 ** self.log2_hashmap_size
        for res in self.resolutions:
            params = min(max_params, res ** self.input_dim)
            params = int(math.ceil(params / 8) * 8)
            offs.append(offs[-1] + params)
        return tuple(offs)

    @property
    def n_params(self) -> int:
        return self.offsets[-1]

    @property
    def output_dim(self) -> int:
        return self.num_levels * self.level_dim


def init_hashgrid_params(key, spec: HashGridSpec,
                         dtype=jnp.float32) -> jnp.ndarray:
    """U(-1e-4, 1e-4) init (grid.py:144-146). fp32 — gradients scatter-add
    into this table, so keep full precision.

    The table is stored FLAT [n_params * level_dim] (row r's channels at
    [r*C, (r+1)*C)): on TPU a [n, C] device array is tile-padded 32x by
    XLA's (8, 128) tiling, which bloats HBM and knocks every gather off
    the fast path (kernels/hash_fused.py measurements). Consumers that
    want the logical 2-D view reshape on entry."""
    return jax.random.uniform(
        key, (spec.n_params * spec.level_dim,), dtype=dtype,
        minval=-1e-4, maxval=1e-4)


def pair_axis(spec: HashGridSpec, level: int) -> int:
    """Axis along which the two interpolation corners of the additive
    hash variant are table-adjacent at this level. Dense (non-overflow)
    levels pair along axis 0 (their stride-1 axis); hashed additive
    levels rotate per level to decorrelate collisions (see
    _level_indices). For the xor variant this is always axis 0 (its
    even-coordinate pairing comes from prime_0 == 1)."""
    res = spec.resolutions[level]
    hmap = spec.offsets[level + 1] - spec.offsets[level]
    dense = res ** spec.input_dim <= hmap
    if dense or spec.hash_variant != "additive":
        return 0
    return level % spec.input_dim


def _mix_prime(d: int) -> int:
    """Prime for dimension d inside the additive variant's mix hash.
    _PRIMES[0] == 1 would leave dim 0 unmixed when another axis is the
    pair axis, so dim 0 borrows a large prime."""
    return _PRIMES[d] if d > 0 else _PRIMES[3]


def _level_indices(spec: HashGridSpec, level: int, corner_coords):
    """Flat table index for integer corner coords [..., D] at one level.

    Reproduces get_grid_index (gridencoder.cu:62-79) including the
    cumulative-stride early-out and uint32 wrap-around.
    """
    res = spec.resolutions[level]
    hmap = spec.offsets[level + 1] - spec.offsets[level]
    D = spec.input_dim

    coords = corner_coords.astype(jnp.uint32)
    index = jnp.zeros(coords.shape[:-1], dtype=jnp.uint32)
    stride = 1
    for d in range(D):
        if stride > hmap:
            break
        index = index + coords[..., d] * jnp.uint32(stride & 0xFFFFFFFF)
        stride *= res
    overflow = stride > hmap

    if spec.gridtype == "hash" and overflow:
        if spec.hash_variant == "additive" and hmap > res:
            # TPU pair-aligned hash: row = c[a] + (mix(others) % (hmap -
            # res)) with pair axis a = level % D. c[a] <= res-1 and
            # mix < hmap - res, so row <= hmap - 2 with NO wraparound —
            # the rows of c[a] and c[a]+1 are always adjacent and both
            # stay inside this level's table. Rotating ``a`` per level
            # decorrelates the collision structure: with a fixed axis,
            # whole cell LINES map to contiguous row ranges and collide
            # line-with-line, which shows up as structured ghosting on
            # held-out views; rotation leaves at most ceil(L/D) levels
            # aliasing along any given direction.
            a = pair_axis(spec, level)
            g = jnp.zeros(coords.shape[:-1], dtype=jnp.uint32)
            for d in range(D):
                if d == a:
                    continue
                g = g ^ (coords[..., d] * jnp.uint32(_mix_prime(d)))
            index = coords[..., a] + g % jnp.uint32(hmap - res)
        else:
            h = jnp.zeros(coords.shape[:-1], dtype=jnp.uint32)
            for d in range(D):
                h = h ^ (coords[..., d] * jnp.uint32(_PRIMES[d]))
            index = h

    return (index % jnp.uint32(hmap)) + jnp.uint32(spec.offsets[level])


def _smoothstep(t):
    return t * t * (3.0 - 2.0 * t)


def hash_encode_01(params, x01, spec: HashGridSpec, max_level=None):
    """Encode positions already mapped to [0, 1]^D.

    Args:
      params: flat [n_params*C] table (or legacy [n_params, C]).
      x01: [B, D] float32.
      max_level: optional static int — zero out levels >= max_level
        (grid.py:41,52).
    Returns:
      [B, L*C] features, dtype of params.
    """
    B, D = x01.shape
    L, C = spec.num_levels, spec.level_dim
    params = params.reshape(spec.n_params, C)
    n_corners = 1 << D
    x01 = x01.astype(jnp.float32)

    # out-of-bound inputs produce zeros (gridencoder.cu:105-130); the negated
    # in-bounds form also catches NaN inputs, which the CUDA comparison lets
    # through
    inb = jnp.all((x01 >= 0.0) & (x01 <= 1.0), axis=-1, keepdims=True)
    oob = ~inb  # [B, 1]
    x01 = jnp.where(oob, 0.5, x01)  # keep downstream indices well-defined

    # corner bit patterns [2^D, D]
    bits = np.array([[(c >> d) & 1 for d in range(D)]
                     for c in range(n_corners)], dtype=np.float32)
    bits_j = jnp.asarray(bits)

    all_idx = []
    all_w = []
    active = L if max_level is None else min(max_level, L)
    for lv in range(L):
        res = spec.resolutions[lv]
        if spec.align_corners:
            pos = x01 * (res - 1)
            grid = jnp.minimum(jnp.floor(pos), res - 2)
        else:
            pos = jnp.clip(x01 * res - 0.5, 0.0, res - 1)
            grid = jnp.floor(pos)
        frac = pos - grid                                   # [B, D]
        if spec.interpolation == "smoothstep":
            frac = _smoothstep(frac)
        grid = grid.astype(jnp.int32)

        # corner coords [B, 2^D, D], clamped to res-1 (gridencoder.cu:182)
        corner = jnp.minimum(grid[:, None, :] + bits_j.astype(jnp.int32),
                             res - 1)
        idx = _level_indices(spec, lv, corner)              # [B, 2^D]
        # trilinear weights: prod_d (bit ? frac : 1-frac)
        w = jnp.prod(bits_j * frac[:, None, :]
                     + (1.0 - bits_j) * (1.0 - frac[:, None, :]),
                     axis=-1)                                # [B, 2^D]
        if lv >= active:
            w = jnp.zeros_like(w)
        all_idx.append(idx)
        all_w.append(w)

    idx = jnp.concatenate(all_idx, axis=1)                  # [B, L*2^D]
    w = jnp.concatenate(all_w, axis=1).astype(params.dtype)  # [B, L*2^D]

    # one fused gather over the whole table
    vals = params[idx.astype(jnp.int32)]                    # [B, L*2^D, C]
    feats = (vals * w[..., None]).reshape(B, L, n_corners, C).sum(axis=2)
    feats = feats.reshape(B, L * C)
    return jnp.where(oob, 0.0, feats)


def hash_encode(params, x, spec: HashGridSpec, bound: float = 1.0,
                max_level=None):
    """Encode world positions in [-bound, bound]^D (grid.py:152-170)."""
    x01 = (x + bound) / (2.0 * bound)
    return hash_encode_01(params, x01, spec, max_level=max_level)


# ---------------------------------------------------------------------------
# regularizers — differentiable losses replacing the reference's in-place
# gradient kernels (gridencoder.cu:525-631 TV, :670-703 weight decay).
# Adding `lambda * loss` to the objective yields the same parameter update
# as the reference's direct grad injection under Adam.
# ---------------------------------------------------------------------------

def weight_decay_loss(params, spec: HashGridSpec):
    """Level-meaned weight decay (zip-nerf style, gridencoder.cu:670-703):
    each level contributes ||emb_l||^2 / (2 * n_params_l) so gradients are
    weight * emb / n_params_l."""
    params = params.reshape(spec.n_params, spec.level_dim)
    total = 0.0
    for lv in range(spec.num_levels):
        lo, hi = spec.offsets[lv], spec.offsets[lv + 1]
        emb = params[lo:hi]
        total = total + 0.5 * jnp.sum(emb * emb) / (hi - lo)
    return total


def total_variation_loss(params, spec: HashGridSpec, key, n_samples: int = 65536):
    """Stochastic total-variation penalty on the grid features, evaluated at
    random points (the reference samples B=1e6 random points,
    grid.py:178-198). Penalizes squared feature differences between the two
    corners along each axis of the cell containing each sample."""
    params = params.reshape(spec.n_params, spec.level_dim)
    D = spec.input_dim
    x01 = jax.random.uniform(key, (n_samples, D))
    total = 0.0
    for lv in range(spec.num_levels):
        res = spec.resolutions[lv]
        pos = jnp.clip(x01 * res - 0.5, 0.0, res - 1)
        grid = jnp.floor(pos).astype(jnp.int32)
        base_idx = _level_indices(spec, lv, grid[:, None, :])[:, 0]
        base = params[base_idx.astype(jnp.int32)]
        for d in range(D):
            nb = grid.at[:, d].add(1)
            nb = jnp.minimum(nb, res - 1)
            nb_idx = _level_indices(spec, lv, nb[:, None, :])[:, 0]
            diff = params[nb_idx.astype(jnp.int32)] - base
            total = total + jnp.sum(diff * diff)
    return total / n_samples
