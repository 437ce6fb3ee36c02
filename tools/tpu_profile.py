"""TPU cost profiling: train-step stage breakdown + primitive microbenches.

Usage (on the real TPU chip):
  python tools/tpu_profile.py micro   # gather/scatter/sort primitive costs
  python tools/tpu_profile.py step    # stage breakdown of the train step

All timing follows the axon-tunnel rules (CLAUDE.md): everything jitted,
N async dispatches chained, one jax.device_get at the end (plain
block_until_ready returns early on the tunnel backend).
"""

import argparse
import time

import numpy as np


def timeit(fn, *args, n=20, warmup=2, **kw):
    """Median-of-one wall time per call over n chained dispatches."""
    import jax
    out = None
    for _ in range(warmup):
        out = fn(*args, **kw)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.time()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.time() - t0) / n


def micro():
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    M = 1 << 24            # 16.7M, the per-step corner count at 2^18 pts
    Mp = M // 2            # pair count
    R = 1 << 19            # one level's table rows

    print(f"== gather: [{R}x8] f32 table, varying slice shape ==")
    table8 = jax.random.normal(key, (R, 8), jnp.float32)
    for name, midx, slice_rows, slice_cols, m in [
        ("slice (1,4) x 16.7M  [current: 1 corner/gather]", None, 1, 4, M),
        ("slice (1,8) x 8.4M   [pair, relayout]", None, 1, 8, Mp),
        ("slice (2,4) x 8.4M   [pair, no relayout]", None, 2, 4, Mp),
        ("slice (2,8) x 8.4M   [quad?]", None, 2, 8, Mp),
        ("slice (1,8) x 16.7M  [wide per-corner]", None, 1, 8, M),
    ]:
        idx = jax.random.randint(jax.random.fold_in(key, m + slice_rows),
                                 (m, 1), 0, R - 2, jnp.int32)

        def g(t, i, sr=slice_rows, sc=slice_cols):
            dn = jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2), collapsed_slice_dims=(),
                start_index_map=(0,))
            out = jax.lax.gather(t, i, dn, (sr, sc),
                                 mode=jax.lax.GatherScatterMode.CLIP)
            return out.sum()

        gj = jax.jit(g)
        dt = timeit(gj, table8, idx, n=10)
        print(f"  {name}: {dt*1e3:8.2f} ms  ({dt/m*1e9:6.2f} ns/slice)")

    print("== sort: variadic u32 vs packed u64 ==")
    for name, nkeys, nops, m, dtype in [
        ("u32 key + 2x u32 payload, 16.7M [current bwd]", 1, 3, M, jnp.uint32),
        ("u32 key + 2x u32 payload, 8.4M", 1, 3, Mp, jnp.uint32),
        ("u32 key + 4x u32 payload, 8.4M [pair bwd]", 1, 5, Mp, jnp.uint32),
        ("u32 key + 1x u32 payload, 8.4M", 1, 2, Mp, jnp.uint32),
        ("u64 single operand, 8.4M", 1, 1, Mp, jnp.uint64),
    ]:
        ops = [jax.random.randint(jax.random.fold_in(key, 77 + i), (m,),
                                  0, 1 << 20, jnp.int32).astype(jnp.uint32)
               for i in range(nops)]
        if dtype == jnp.uint64:
            try:
                ops = [o.astype(jnp.uint64) for o in ops]
            except Exception:
                print(f"  {name}: u64 unavailable (x64 disabled)")
                continue

        def s(*os):
            r = jax.lax.sort(list(os), num_keys=nkeys)
            return r[0]

        sj = jax.jit(s)
        try:
            dt = timeit(sj, *ops, n=5)
            print(f"  {name}: {dt*1e3:8.2f} ms  ({dt/m*1e9:6.2f} ns/elem)")
        except Exception as e:
            print(f"  {name}: FAILED {type(e).__name__}")

    print("== scatter-SET monotone sorted unique: scalar vs wide ==")
    rows = 3 * (1 << 21)
    for name, width, m, dt_ in [
        ("scalar f32, 16.7M x1ch", 0, M, jnp.float32),
        ("width-4 f32, 8.4M", 4, Mp, jnp.float32),
        ("width-8 f32, 8.4M", 8, Mp, jnp.float32),
        ("width-8 fp16, 8.4M", 8, Mp, jnp.float16),
        ("scalar f32, 8.4M", 0, Mp, jnp.float32),
    ]:
        base = np.sort(np.random.randint(0, rows - 8, size=m).astype(
            np.int32))
        dest = jnp.asarray(base)[:, None]
        if width == 0:
            upd = jax.random.normal(key, (m,), dt_)
            dnums = jax.lax.ScatterDimensionNumbers(
                update_window_dims=(), inserted_window_dims=(0,),
                scatter_dims_to_operand_dims=(0,))
            z = jnp.zeros((rows,), dt_)
        else:
            upd = jax.random.normal(key, (m, width), dt_)
            dnums = jax.lax.ScatterDimensionNumbers(
                update_window_dims=(1,), inserted_window_dims=(0,),
                scatter_dims_to_operand_dims=(0,))
            z = jnp.zeros((rows, width), dt_)

        def sc(zz, d, u):
            return jax.lax.scatter(zz, d, u, dnums,
                                   indices_are_sorted=True,
                                   unique_indices=True,
                                   mode=jax.lax.GatherScatterMode.CLIP).sum()

        scj = jax.jit(sc)
        try:
            dt = timeit(scj, z, dest, upd, n=5)
            print(f"  {name}: {dt*1e3:8.2f} ms  ({dt/m*1e9:6.2f} ns/slice)")
        except Exception as e:
            print(f"  {name}: FAILED {type(e).__name__}: {e}")

    print("== 2-D .at[rows,slot].set (march compaction pattern) ==")
    N, S, K = 8192, 512, 64
    occ = jax.random.uniform(key, (N, S)) < 0.15
    tc = jax.random.normal(key, (N, S))

    def march_scatter_2d(occ, t_cand):
        slot = jnp.cumsum(occ.astype(jnp.int32), axis=-1) - 1
        keep = occ & (slot < K)
        slot = jnp.where(keep, slot, K)
        rows_ = jnp.broadcast_to(jnp.arange(N)[:, None], (N, S))
        ts = jnp.zeros((N, K + 1), jnp.float32).at[rows_, slot].set(
            t_cand, mode="drop")[:, :K]
        return ts.sum()

    def march_scatter_flat(occ, t_cand):
        # strided monotone scheme: kept c-th (1-based) -> row*(2K+2)+2c,
        # dropped -> odd slots (duplicates land on discarded slots)
        c = jnp.cumsum(occ.astype(jnp.int32), axis=-1)
        kept = occ & (c <= K)
        dest = jnp.where(kept, 2 * c, jnp.minimum(2 * c + 1, 2 * K + 1))
        dest = dest + (2 * K + 2) * jnp.arange(N)[:, None]
        dnums = jax.lax.ScatterDimensionNumbers(
            update_window_dims=(), inserted_window_dims=(0,),
            scatter_dims_to_operand_dims=(0,))
        z = jnp.zeros((N * (2 * K + 2),), jnp.float32)
        buf = jax.lax.scatter(z, dest.reshape(-1, 1), t_cand.reshape(-1),
                              dnums, indices_are_sorted=True,
                              unique_indices=True)
        ts = buf.reshape(N, 2 * K + 2)[:, 2:2 * K + 2:2]
        return ts.sum()

    for name, fn in [("2-D .at[].set", march_scatter_2d),
                     ("flat strided monotone", march_scatter_flat)]:
        dt = timeit(jax.jit(fn), occ, tc, n=10)
        print(f"  {name}: {dt*1e3:8.2f} ms")

    print("== cumsum 1-D ==")
    v = jax.random.normal(key, (M,), jnp.float32)
    dt = timeit(jax.jit(lambda x: jnp.cumsum(x).sum()), v, n=10)
    print(f"  cumsum 16.7M f32: {dt*1e3:8.2f} ms ({dt/M*1e9:5.2f} ns/elem)")

    print("== sort restructure: payload-sort vs iota-sort + 1-D gathers ==")
    # table-grad backward carries 4 packed payloads through the sort;
    # the alternative sorts (key, iota) and gathers payloads afterwards
    keys = jax.random.randint(key, (Mp,), 0, 1 << 21, jnp.int32)
    pls = [jax.random.randint(jax.random.fold_in(key, 900 + i), (Mp,),
                              0, 1 << 30, jnp.int32).astype(jnp.uint32)
           for i in range(4)]

    def sort5(k, *ps):
        return jax.lax.sort([k] + list(ps), num_keys=1)[0]

    def sort2_gather(k, *ps):
        k_s, perm = jax.lax.sort([k, jax.lax.iota(jnp.int32, Mp)],
                                 num_keys=1)
        tot = k_s.astype(jnp.uint32)
        for p in ps:
            tot = tot + p[perm]
        return tot

    for name, fn in [("sort key+4 payloads 8.4M", sort5),
                     ("sort key+iota, 4x 1-D gather 8.4M", sort2_gather)]:
        dt = timeit(jax.jit(fn), keys, *pls, n=5)
        print(f"  {name}: {dt*1e3:8.2f} ms")

    print("== expand gather: [1,4] from padded [R,4] vs 128-lane vrow ==")
    Mx, Rr = 1 << 19, (1 << 18) + 1
    packedv = jax.random.normal(key, (Rr, 4), jnp.float32)
    invv = jax.random.randint(key, (Mx,), 0, Rr, jnp.int32)

    def narrow(p, i):
        return p[i].sum()

    def vrow(p, i):
        from raw_ngp_tpu.render.occupancy import _vrow_expand
        return _vrow_expand(p, i).sum()

    for name, fn in [("narrow packed[inv] x 524k", narrow),
                     ("vrow expand x 524k", vrow)]:
        dt = timeit(jax.jit(fn), packedv, invv, n=10)
        print(f"  {name}: {dt*1e3:8.2f} ms ({dt/Mx*1e9:6.2f} ns/slice)")


def step(num_rays: int = 8192, point_budget: int = 0, hdr: bool = False):
    import jax
    import jax.numpy as jnp
    from dataclasses import replace

    from raw_ngp_tpu.config import Config
    from raw_ngp_tpu.data import make_synthetic_scene
    from raw_ngp_tpu.train import Trainer
    from raw_ngp_tpu.train.trainer import make_loss_fn

    cfg = Config().with_preset_O().with_tpu_profile()
    cfg = replace(cfg, train=replace(cfg.train, fp16=True,
                                     num_rays=num_rays))
    if point_budget:
        # the SETTLED trainer runs grown rays at the BASE-anchored point
        # budget (render_occupancy m_pad anchors to cfg.train.num_rays,
        # which adaptive growth leaves at 8192 → 262144); without this a
        # --rays 16384 profile silently measures a 2x-budget step
        cfg = replace(cfg, render=replace(cfg.render,
                                          point_budget=point_budget))
    if hdr:
        # VERDICT r4 weak #3: what the HDR path (RawNeRF clipped-residual
        # loss + clamped_exp color + per-ray lossmult/exposure) costs per
        # step relative to the LDR flagship, same march/batch shape
        # (quality_run.py --hdr measures the same config's 5k curve)
        cfg = replace(cfg, data=replace(cfg.data, image_mode="HDR"),
                      model=replace(cfg.model,
                                    color_activation="clamped_exp"))
    cfg = cfg.validate()
    train_scene, val_scene = make_synthetic_scene(n_train=36, n_val=2,
                                                  H=128, W=128, hdr=hdr)
    tr = Trainer(cfg, train_scene, val_scene, workspace="/tmp/prof_ws")
    tr.train(iters=40, log_every=10 ** 9)   # warmup: compiles + grid state

    # _train_step donates its state argument — chain it rather than
    # re-feeding the consumed buffers
    def chained_step(_state, scene, aabb):
        tr.state, metrics = tr._train_step(tr.state, scene, aabb)
        return metrics

    t_step = timeit(chained_step, tr.state, tr.scene_arrays, tr.aabb,
                    n=10, warmup=1)
    print(f"full train step:       {t_step*1e3:8.1f} ms")

    # loss fwd and fwd+bwd
    loss_fn = make_loss_fn(cfg, tr.spec, cfg.train.num_rays)
    st = tr.state
    key = jax.random.PRNGKey(3)

    def fwd(params):
        l, _ = loss_fn(params, None, st, tr.scene_arrays, tr.aabb,
                       key, key, 1.0, True)
        return l

    fwd_j = jax.jit(fwd)
    t_fwd = timeit(fwd_j, st.params, n=10)
    print(f"loss forward:          {t_fwd*1e3:8.1f} ms")

    def _val_and_grad_sum(p):
        # returning only the value lets XLA DCE the whole backward —
        # reduce every grad leaf into the result to keep it live
        l, gr = jax.value_and_grad(fwd)(p)
        return l + sum(x.sum().astype(jnp.float32)
                       for x in jax.tree_util.tree_leaves(gr))

    grad_j = jax.jit(_val_and_grad_sum)
    t_fb = timeit(grad_j, st.params, n=10)
    print(f"loss fwd+bwd:          {t_fb*1e3:8.1f} ms "
          f"(bwd ~{(t_fb-t_fwd)*1e3:.1f}, opt+ema ~{(t_step-t_fb)*1e3:.1f})")

    # march alone
    from raw_ngp_tpu.render.occupancy import march_rays
    from raw_ngp_tpu.ops.rays import near_far_from_aabb
    N = cfg.train.num_rays
    ro = jax.random.uniform(key, (N, 3), minval=-1.5, maxval=1.5)
    rd = jax.random.normal(jax.random.fold_in(key, 1), (N, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    nears, fars = near_far_from_aabb(ro, rd, tr.aabb, cfg.render.min_near)

    def march(bf):
        m = march_rays(ro, rd, bf, nears, fars, cfg.render.bound,
                       cfg.render.contract, cfg.render.grid_size,
                       cfg.cascades, cfg.render.march_candidates,
                       cfg.render.samples_per_ray, key=key)
        return m["ts"].sum() + m["mask"].sum()

    t_march = timeit(jax.jit(march), tr.state.density_bitfield, n=10)
    print(f"march_rays:            {t_march*1e3:8.1f} ms")

    # march interior: probe/CDF block alone (the candidate generator)
    from raw_ngp_tpu.render.occupancy import (
        cdf_candidates, coarse_occupancy, _coarse_dilate_radius)
    P_n = cfg.render.coarse_probes
    if P_n > 0:
        def probe_cdf(bf):
            cl = coarse_occupancy(
                bf, cfg.render.grid_size, cfg.cascades,
                _coarse_dilate_radius(cfg.render.bound,
                                      cfg.render.grid_size, P_n),
                bound=cfg.render.bound)
            tc, dt = cdf_candidates(
                ro, rd, cl, nears, fars, cfg.render.bound,
                cfg.render.contract, cfg.render.grid_size, cfg.cascades,
                P_n, cfg.render.march_candidates, 0.5,
                dt_gamma=cfg.render.dt_gamma)
            return tc.sum() + dt.sum()
        t_pc = timeit(jax.jit(probe_cdf), tr.state.density_bitfield, n=10)
        print(f"probe+cdf block:       {t_pc*1e3:8.1f} ms")

    # compact pipeline alone: mask -> compact_positions -> the gathers
    from raw_ngp_tpu.render.occupancy import (
        compact_positions, gather_flat_sorted, gather_ray_rows)
    K_ = cfg.render.samples_per_ray
    m_pad = (max(cfg.render.point_budget // 128 * 128, 128)
             if cfg.render.point_budget else
             max(int(N * cfg.render.samples_per_ray
                     * cfg.render.compact_ratio) // 128 * 128, 128))
    mask0 = jax.random.uniform(jax.random.fold_in(key, 20),
                               (N, K_)) < cfg.render.compact_ratio
    ts0 = jnp.abs(jax.random.normal(jax.random.fold_in(key, 21), (N, K_)))

    def compact_block(mask_in, ts_in):
        kept, inv, pos = compact_positions(mask_in, m_pad)
        t_c = gather_flat_sorted(ts_in.reshape(-1), pos)
        filled = pos < N * K_
        rid = jnp.where(filled, jnp.minimum(pos, N * K_ - 1) // K_, N)
        odl = gather_ray_rows(
            jnp.concatenate([jnp.concatenate([ro, jnp.zeros((1, 3))]),
                             jnp.concatenate([rd, jnp.zeros((1, 3))])],
                            axis=1), rid)
        return t_c.sum() + odl.sum() + kept.sum()

    t_cp = timeit(jax.jit(compact_block), mask0, ts0, n=10)
    print(f"compact+gathers:       {t_cp*1e3:8.1f} ms")

    # the fused Pallas streaming compaction (kernels/compact_pallas.py)
    # doing the same work: positions + t + dt in one pass + the ray-row
    # gathers (what render_occupancy actually runs on TPU backends)
    from raw_ngp_tpu.render.occupancy import compact_positions_attrs
    dts0 = jnp.full((N, K_), 0.01, jnp.float32)

    def compact_block_fused(mask_in, ts_in, dt_in):
        kept, inv, pos, (t_c, dt_c) = compact_positions_attrs(
            mask_in, m_pad, [ts_in.reshape(-1), dt_in.reshape(-1)])
        filled = pos < N * K_
        rid = jnp.where(filled, jnp.minimum(pos, N * K_ - 1) // K_, N)
        odl = gather_ray_rows(
            jnp.concatenate([jnp.concatenate([ro, jnp.zeros((1, 3))]),
                             jnp.concatenate([rd, jnp.zeros((1, 3))])],
                            axis=1), rid)
        return t_c.sum() + dt_c.sum() + odl.sum() + kept.sum()

    t_cpf = timeit(jax.jit(compact_block_fused), mask0, ts0, dts0, n=10)
    print(f"compact fused pallas:  {t_cpf*1e3:8.1f} ms")

    # compacted composite alone at the m_pad stream
    from raw_ngp_tpu.ops.compositing import composite_rays_compacted
    kept0, inv0, pos0 = jax.jit(
        lambda m: compact_positions(m, m_pad))(mask0)
    filled0 = pos0 < N * K_
    rid0 = jnp.where(filled0, jnp.minimum(pos0, N * K_ - 1) // K_, N)
    counts0 = kept0.sum(axis=-1)
    sig0 = jnp.abs(jax.random.normal(jax.random.fold_in(key, 22), (m_pad,)))
    rgb0 = jax.random.uniform(jax.random.fold_in(key, 23), (m_pad, 3))
    tc0 = gather_flat_sorted(ts0.reshape(-1), pos0)
    dt0 = jnp.full((m_pad,), 0.01, jnp.float32)

    def comp(sig, rgb):
        o = composite_rays_compacted(sig, rgb, tc0, dt0, rid0, filled0,
                                     counts0, N)
        return o["image"].sum() + o["depth"].sum()

    t_cc = timeit(jax.jit(comp), sig0, rgb0, n=10)
    print(f"compacted composite:   {t_cc*1e3:8.1f} ms")

    # hash encode fwd / fwd+bwd at the compacted point budget
    from raw_ngp_tpu.kernels.hash_fused import hash_encode_fused
    P = 1 << 18
    x01 = jax.random.uniform(key, (P, 3))
    gspec = tr.spec.grid_spec
    gp = tr.state.params["grid"]

    enc_f = jax.jit(lambda p, x: hash_encode_fused(p, x, gspec, False).sum())
    t_ef = timeit(enc_f, gp, x01, n=10)
    print(f"hash encode fwd  2^18: {t_ef*1e3:8.1f} ms")
    enc_g = jax.jit(lambda p, x: jax.grad(
        lambda q: hash_encode_fused(q, x, gspec, False).sum())(p).sum())
    t_eg = timeit(enc_g, gp, x01, n=10)
    print(f"hash encode f+b  2^18: {t_eg*1e3:8.1f} ms")

    # field (encode+MLPs) fwd / fwd+bwd on the SAME m_pad compact batch
    # as the compact/composite blocks above
    from raw_ngp_tpu.models.ngp import field_forward
    xc = jax.random.uniform(jax.random.fold_in(key, 9), (m_pad, 3),
                            minval=-1, maxval=1)
    dc = jax.random.normal(jax.random.fold_in(key, 10), (m_pad, 3))
    dc = dc / jnp.linalg.norm(dc, axis=-1, keepdims=True)

    def ff(params):
        sig, rgb = field_forward(params, tr.spec, xc, dc, None, 1.0)
        return sig.sum() + rgb.sum()

    t_ff = timeit(jax.jit(ff), st.params, n=10)
    print(f"field fwd   [{m_pad}]: {t_ff*1e3:8.1f} ms")
    t_fg = timeit(jax.jit(lambda p: sum(
        x.sum().astype(jnp.float32)
        for x in jax.tree_util.tree_leaves(jax.grad(ff)(p)))),
                  st.params, n=10)
    print(f"field f+b   [{m_pad}]: {t_fg*1e3:8.1f} ms")

    # grid refresh (partial branch)
    t_gr = timeit(tr._grid_update, tr.state, 100, n=5, warmup=1)
    print(f"grid refresh (partial):{t_gr*1e3:8.1f} ms "
          f"(/{cfg.render.update_extra_interval} steps = "
          f"{t_gr*1e3/cfg.render.update_extra_interval:.1f} ms/step)")


def bisect():
    """In-situ decomposition of the train-step BACKWARD: re-jit the REAL
    step with pieces of the encoder table gradient faked (the
    TABLE_GRAD_MODE knob in kernels/hash_fused.py). Isolated micro-times
    are fusion/DCE-polluted; this keeps the whole surrounding graph."""
    import jax
    from dataclasses import replace

    from raw_ngp_tpu.config import Config
    from raw_ngp_tpu.data import make_synthetic_scene
    from raw_ngp_tpu.train import Trainer
    from raw_ngp_tpu.kernels import hash_fused

    cfg = Config().with_preset_O().with_tpu_profile()
    cfg = replace(cfg, train=replace(cfg.train, fp16=True, num_rays=8192))
    cfg = cfg.validate()
    train_scene, val_scene = make_synthetic_scene(n_train=36, n_val=2,
                                                  H=128, W=128)
    tr = Trainer(cfg, train_scene, val_scene, workspace="/tmp/prof_ws")
    tr.train(iters=40, log_every=10 ** 9)

    results = {}
    for mode in ("full", "sort", "zero"):
        hash_fused.TABLE_GRAD_MODE = mode
        step = tr._make_step(tr.num_rays, None)

        # the step donates state; time a non-donating wrapper by chaining
        def chained(_s, scene, aabb, _step=step):
            tr.state, metrics = _step(tr.state, scene, aabb)
            return metrics

        t = timeit(chained, tr.state, tr.scene_arrays, tr.aabb,
                   n=10, warmup=2)
        results[mode] = t
        print(f"step [table_grad={mode:5s}]: {t*1e3:8.1f} ms")
    hash_fused.TABLE_GRAD_MODE = "full"
    seg = (results["full"] - results["sort"]) * 1e3
    rec = (results["sort"] - results["zero"]) * 1e3
    rest = results["zero"] * 1e3
    print(f"-> segsum placement: {seg:.1f} ms; record build+sort: "
          f"{rec:.1f} ms; everything else: {rest:.1f} ms")


def loop():
    """Bench-style dispatch loop vs chained-step time: isolates host/tunnel
    per-dispatch overhead + grid-refresh amortization from pure step time."""
    import jax
    from dataclasses import replace

    from raw_ngp_tpu.config import Config
    from raw_ngp_tpu.data import make_synthetic_scene
    from raw_ngp_tpu.train import Trainer

    cfg = Config().with_preset_O().with_tpu_profile()
    cfg = replace(cfg, train=replace(cfg.train, fp16=True, num_rays=8192))
    cfg = cfg.validate()
    train_scene, val_scene = make_synthetic_scene(n_train=36, n_val=2,
                                                  H=128, W=128)
    tr = Trainer(cfg, train_scene, val_scene, workspace="/tmp/prof_ws")
    tr.train(iters=40, log_every=10 ** 9)   # warmup: compiles + grid state

    def chained_step(_state, scene, aabb):
        tr.state, metrics = tr._train_step(tr.state, scene, aabb)
        return metrics

    t_step = timeit(chained_step, tr.state, tr.scene_arrays, tr.aabb,
                    n=10, warmup=1)
    print(f"chained step:          {t_step*1e3:8.1f} ms")
    for iters in (64, 128):
        r = tr.train(iters=iters, log_every=10 ** 9)
        ms = r["wall_time"] / iters * 1e3
        print(f"train loop n={iters}:     {ms:8.1f} ms/step "
              f"(overhead vs chained: {ms - t_step*1e3:+.1f})")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["micro", "step", "loop", "bisect"])
    ap.add_argument("--rays", type=int, default=8192,
                    help="num_rays for step mode (bench runs 16384 after "
                         "adaptive growth)")
    ap.add_argument("--budget", type=int, default=0,
                    help="compacted point budget override (the settled "
                         "trainer runs 16384 rays at the base-anchored "
                         "262144, not rays*K*ratio)")
    ap.add_argument("--hdr", action="store_true",
                    help="HDR/RawNeRF config: clipped loss + clamped_exp "
                         "+ exposure bracketing (perf row, VERDICT r4 "
                         "weak #3)")
    a = ap.parse_args()
    if a.mode == "step":
        step(a.rays, a.budget, hdr=a.hdr)
    else:
        {"micro": micro, "loop": loop, "bisect": bisect}[a.mode]()
