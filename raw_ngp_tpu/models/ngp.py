"""The NGP radiance field: hash grid + tiny MLPs + SH view/light encoding.

TPU-native redesign of the reference NeRFNetwork (nerf/network.py:37-156):

  * ``init_field`` builds the params pytree (hash table, grid MLP, view MLP,
    optional proposal nets, optional per-camera se(3) refinements).
  * ``field_density`` / ``field_forward`` are pure functions of
    (params, positions[, dirs, light_dirs], anneal state).
  * BARF / BAA-NGP coarse-to-fine annealing (network.py:74-109) is
    reformulated with static shapes: the reference's boolean-mask feature
    selection (``f[..., weights > 0]``, network.py:88) is a dynamic-shape
    op; here the highest active level is selected with a one-hot contraction
    so the whole thing stays inside one jit program.

Precision policy: hash table and MLP params in fp32; matmuls run in a
configurable compute dtype (bf16 on TPU) with fp32 accumulation.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from raw_ngp_tpu.config import Config
from raw_ngp_tpu.models.mlp import apply_mlp, init_mlp
from raw_ngp_tpu.ops.activation import color_activation, density_activation
from raw_ngp_tpu.ops.hashgrid import (
    HashGridSpec,
    hash_encode,
    init_hashgrid_params,
)
from raw_ngp_tpu.ops.sh import sh_encode, sh_output_dim


@dataclass(frozen=True)
class FieldSpec:
    """Static (hashable) companion of the params pytree."""

    cfg: Config
    grid_spec: HashGridSpec
    prop_specs: tuple  # tuple[HashGridSpec, ...]
    # tensor parallelism over the hash table's CHANNEL axis (parallel/tp.py):
    # set only inside the tp train step's shard_map, where `tp_axis` is a
    # bound mesh axis. Row indexing is channel-independent, so every device
    # runs the identical SPMD encode on its [n_params, C/tp] shard and one
    # all_gather on the channel axis reassembles the exact global features.
    tp_axis: Optional[str] = None
    tp_devices: int = 1

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.cfg.train.fp16 else jnp.float32

    @property
    def needs_input_grads(self) -> bool:
        """Whether d(features)/d(position) must flow (pose refinement,
        orientation loss, analytic normals)."""
        cfg = self.cfg
        return (cfg.pose_opt.mode != "none"
                or cfg.train.lambda_orientation > 0
                or cfg.render.compute_normals)


def make_field_spec(cfg: Config) -> FieldSpec:
    m = cfg.model
    grid_spec = HashGridSpec.create(
        input_dim=3, num_levels=m.num_levels, level_dim=m.level_dim,
        log2_hashmap_size=m.log2_hashmap_size,
        desired_resolution=cfg.desired_resolution,
        gridtype=m.gridtype, interpolation=m.interpolation,
        align_corners=m.align_corners, hash_variant=m.hash_variant)
    prop_specs = tuple(
        HashGridSpec.create(
            input_dim=3, num_levels=m.prop_num_levels,
            level_dim=m.prop_level_dim,
            log2_hashmap_size=m.prop_log2_hashmap_size,
            desired_resolution=res)
        for res in m.prop_resolutions) if not cfg.render.occupancy else ()
    return FieldSpec(cfg=cfg, grid_spec=grid_spec, prop_specs=prop_specs)


def init_field(key, spec: FieldSpec) -> Dict[str, Any]:
    """Build the parameter pytree (reference network.py:37-72)."""
    cfg = spec.cfg
    m = cfg.model
    keys = jax.random.split(key, 8)

    sh_dim = sh_output_dim(m.sh_degree)
    ldir_dim = sh_dim if m.rfield else 0
    view_in = (m.grid_mlp_out - 1) + sh_dim + ldir_dim
    params: Dict[str, Any] = {
        "grid": init_hashgrid_params(keys[0], spec.grid_spec),
        "grid_mlp": init_mlp(keys[1], spec.grid_spec.output_dim,
                             m.grid_mlp_out, m.grid_mlp_hidden,
                             m.grid_mlp_layers, bias=False),
        # view MLP widens by ldir_dim in rfield mode (network.py:55-56)
        "view_mlp": init_mlp(keys[2], view_in, 3,
                             m.view_mlp_hidden + ldir_dim,
                             m.view_mlp_layers, bias=False),
    }
    if spec.prop_specs:
        params["prop_grids"] = [init_hashgrid_params(keys[3 + i], ps)
                                for i, ps in enumerate(spec.prop_specs)]
        params["prop_mlps"] = [
            init_mlp(keys[5 + i], ps.output_dim, 1, m.prop_mlp_hidden,
                     m.prop_mlp_layers, bias=False)
            for i, ps in enumerate(spec.prop_specs)]
    return params


# ---------------------------------------------------------------------------
# coarse-to-fine annealing (network.py:74-109), static-shape reformulation
# ---------------------------------------------------------------------------

def _anneal_alpha(cfg: Config, annealing, L: int):
    start, end = cfg.pose_opt.start_annealing, cfg.pose_opt.end_annealing
    if end == 0:
        end = 1e-12
    return (annealing - start) / (end - start) * L


def barf_level_weights(cfg: Config, annealing):
    """BARF cosine level mask over the 32 grid features
    (network.py:99-109). Returns [L * level_dim]."""
    m = cfg.model
    # the reference anneals over grid_mlp.dim_out levels (network.py:100),
    # which equals num_levels only at the default config; we key off the
    # actual level count so non-default models stay consistent
    L = m.num_levels
    k = jnp.arange(L, dtype=jnp.float32)
    alpha = _anneal_alpha(cfg, annealing, L)
    w = (1.0 - jnp.cos(jnp.clip(alpha - k, 0.0, 1.0) * jnp.pi)) / 2.0
    w = jnp.repeat(w, m.level_dim)
    return w.at[: m.level_dim].set(1.0)      # first level always on


def baangp_blend(cfg: Config, annealing, feats):
    """BAA-NGP: blend masked-out fine levels with the finest *active*
    level's features (network.py:77-97).

    feats: [N, L*C]. The reference selects the last active level with a
    dynamic boolean mask; we use one_hot(ceil(alpha) clipped) instead.
    """
    m = cfg.model
    C = m.level_dim
    L_levels = m.num_levels                  # total feature levels
    L = m.num_levels - 1                     # annealed levels (reference
    #                                          uses dim_out-1, network.py:78)
    k = jnp.arange(L, dtype=jnp.float32)
    alpha = _anneal_alpha(cfg, annealing, L)
    w = (1.0 - jnp.cos(jnp.clip(alpha - k, 0.0, 1.0) * jnp.pi)) / 2.0
    weights = jnp.concatenate([jnp.ones(C), jnp.repeat(w, C)])
    weights = weights.at[:2].set(1.0)        # network.py:96

    # index of the finest level with weight > 0 (level 0 always active)
    j_star = jnp.clip(jnp.ceil(alpha).astype(jnp.int32), 0, L_levels - 1)
    onehot = jax.nn.one_hot(j_star, L_levels, dtype=feats.dtype)  # [L_levels]
    by_level = feats.reshape(*feats.shape[:-1], L_levels, C)
    coarse = jnp.einsum("...lc,l->...c", by_level, onehot)        # [N, C]
    coarse_f = jnp.tile(coarse, (1,) * (feats.ndim - 1) + (L_levels,))
    return feats * weights + coarse_f * (1.0 - weights)


# ---------------------------------------------------------------------------
# field evaluation
# ---------------------------------------------------------------------------

def _encode(params_table, x, grid_spec, spec: FieldSpec):
    """Dispatch plain vs fused hash encoder; optionally channel-TP."""
    cfg = spec.cfg
    tp = spec.tp_devices
    if (spec.tp_axis is not None and tp > 1
            and grid_spec is spec.grid_spec):
        # channel-sharded tensor parallelism (parallel/tp.py): the local
        # shard is [n_params, C/tp]; hash row math is identical on every
        # device, so encode with a level_dim=C/tp spec and all_gather the
        # channel axis — the result is bit-equal to the single-device
        # encode (device d holds channels [d*C/tp, (d+1)*C/tp)).
        import dataclasses as _dc
        C = grid_spec.level_dim
        assert C % tp == 0, "level_dim must divide tp_devices"
        local_spec = _dc.replace(grid_spec, level_dim=C // tp)
        f = _encode(params_table, x,  local_spec,
                    _dc.replace(spec, tp_axis=None, grid_spec=local_spec))
        L = grid_spec.num_levels
        fl = f.reshape(*f.shape[:-1], L, C // tp)
        fg = jax.lax.all_gather(fl, spec.tp_axis, axis=fl.ndim - 1,
                                tiled=False)        # [..., L, tp, C/tp]
        return fg.reshape(*f.shape[:-1], L * C)
    if cfg.model.fused_encoder:
        from raw_ngp_tpu.kernels.hash_fused import hash_encode_fast
        return hash_encode_fast(params_table, x, grid_spec,
                                bound=cfg.grid_bound,
                                need_input_grads=spec.needs_input_grads,
                                compute_dtype=spec.compute_dtype)
    return hash_encode(params_table, x, grid_spec, bound=cfg.grid_bound)


def _common_forward(params, spec: FieldSpec, x, annealing):
    """hash encode -> anneal -> grid MLP -> (sigma, feat)
    (network.py:74-117)."""
    cfg = spec.cfg
    m = cfg.model
    f = _encode(params["grid"], x, spec.grid_spec, spec)
    if cfg.pose_opt.mode == "baangp":
        f = baangp_blend(cfg, annealing, f)
    elif cfg.pose_opt.mode == "barf":
        f = f * barf_level_weights(cfg, annealing)
    h = apply_mlp(params["grid_mlp"], f, m.internal_activation, m.beta,
                  spec.compute_dtype)
    sigma = density_activation(h[..., 0], m.density_activation, m.beta)
    return sigma, h[..., 1:]


def field_density(params, spec: FieldSpec, x, annealing=1.0, proposal=-1):
    """Density-only query; proposal >= 0 selects a proposal net
    (network.py:145-156)."""
    cfg = spec.cfg
    if 0 <= proposal < len(spec.prop_specs):
        f = _encode(params["prop_grids"][proposal], x,
                    spec.prop_specs[proposal], spec)
        h = apply_mlp(params["prop_mlps"][proposal], f,
                      cfg.model.internal_activation, cfg.model.beta,
                      spec.compute_dtype)
        from raw_ngp_tpu.ops.activation import trunc_exp
        return trunc_exp(h[..., 0])
    sigma, _ = _common_forward(params, spec, x, annealing)
    return sigma


def field_forward(params, spec: FieldSpec, x, d, ld=None, annealing=1.0):
    """Full radiance query -> (sigma, color) (network.py:119-143).

    Args:
      x: [N, 3] positions in [-grid_bound, grid_bound]
      d: [N, 3] view directions (normalized)
      ld: optional [N, 3] light directions (rfield mode)
    """
    cfg = spec.cfg
    m = cfg.model
    sigma, feat = _common_forward(params, spec, x, annealing)
    d_enc = sh_encode(d, m.sh_degree)
    if m.rfield:
        if ld is None:
            raise ValueError("rfield mode requires light directions")
        ld_enc = sh_encode(ld, m.sh_degree)
        h = jnp.concatenate([feat, d_enc, ld_enc], axis=-1)
    else:
        h = jnp.concatenate([feat, d_enc], axis=-1)
    c = apply_mlp(params["view_mlp"], h, m.internal_activation, m.beta,
                  spec.compute_dtype)
    color = color_activation(c, m.color_activation)
    return sigma, color


def field_normals(params, spec: FieldSpec, x, annealing=1.0):
    """Analytic normals: -normalize(grad sigma) mapped to [0, 1]
    (reference renderer.py:558-567)."""
    def sigma_sum(pts):
        return field_density(params, spec, pts, annealing).sum()

    g = jax.grad(sigma_sum)(x)
    n = -g / (jnp.linalg.norm(g, axis=-1, keepdims=True) + 1e-9)
    return (n + 1.0) / 2.0


def num_params(params) -> int:
    return sum(int(np.prod(p.shape))
               for p in jax.tree_util.tree_leaves(params))
