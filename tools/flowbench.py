"""Flow pipeline stage breakdown on the real TPU (VERDICT r1 item 5).

Times each fSGM stage per pyramid level (census+cost, aggregation,
extraction) plus fb_check and the end-to-end pass, with the relay-safe
discipline (salted inputs, in-jit K-iteration loops, scalar-fetch sync).

    python tools/flowbench.py                  # bench flow config
    python tools/flowbench.py --shape 184x616 --levels 3
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _timeit(fn, args, iters, repeats=3):
    float(fn(np.uint8(251), *args))
    times = []
    for rep in range(repeats):
        t0 = time.perf_counter()
        float(fn(np.uint8(rep), *args))
        times.append(time.perf_counter() - t0)
    return 1e3 * float(np.median(times)) / iters


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="368x1232")
    ap.add_argument("--levels", type=int, default=4)
    ap.add_argument("--radius", type=int, default=4)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--backend", default="pallas")
    ap.add_argument("--skip-e2e", action="store_true")
    ap.add_argument("--skip-levels", action="store_true")
    ap.add_argument("--compose", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from fsgm_tpu.params import FlowParams, DIRS_8
    from fsgm_tpu.io.synthetic import constant_flow_pair
    from fsgm_tpu.ops.census import census_transform
    from fsgm_tpu.ops.cost import (cost_volume_flow,
                                   cost_volume_flow_major)
    from fsgm_tpu.ops import aggregate as agg
    from fsgm_tpu.ops import extract as ext
    from fsgm_tpu.models import flow as mflow

    h, w = (int(x) for x in args.shape.split("x"))
    params = FlowParams(search_radius=args.radius, levels=args.levels,
                        p1=7, p2=100)
    extw = params.window_extent
    nl = extw * extw
    from fsgm_tpu.models.stereo import resolve_backend
    be = resolve_backend(args.backend)   # 'pallas' -> pallas_tr (default)
    iters = args.iters
    major = be == "pallas_tr"            # the label-major model path

    i1np, i2np, _ = constant_flow_pair(h, w, 3, -2, seed=0)
    i1, i2 = jnp.asarray(i1np), jnp.asarray(i2np)

    def loop(body, *static):
        @jax.jit
        def run(salt, *arrs):
            def it(i, acc):
                s8 = (salt + i).astype(jnp.uint8)
                return acc + body(s8, *arrs)
            return jax.lax.fori_loop(0, iters, it, jnp.float32(0))
        return run

    print(f"# platform={jax.devices()[0].platform} shape={args.shape} "
          f"levels={args.levels} labels={nl} backend={be} iters={iters}",
          file=sys.stderr)

    # ---- end-to-end first (fwd+bwd, fwd-only) ----
    import dataclasses
    from fsgm_tpu.models.flow import flow_fsgm

    if not args.skip_e2e:
        def e2e(s8, a, b):
            f, v = flow_fsgm(a + s8, b + s8, params, be)
            return jnp.sum(f) + jnp.sum(v)
        ms = _timeit(loop(e2e), (i1, i2), iters)
        print(f"{'e2e fwd+bwd':28s} {ms:8.2f} ms")

        p_nofb = dataclasses.replace(params, fb_check=False)

        def fwd(s8, a, b):
            f, v = flow_fsgm(a + s8, b + s8, p_nofb, be)
            return jnp.sum(f) + jnp.sum(v)
        ms_f = _timeit(loop(fwd), (i1, i2), iters)
        print(f"{'e2e fwd only':28s} {ms_f:8.2f} ms")

    # ---- per-level stages ----
    lvl_imgs = [(i1, i2)]
    for _ in range(args.levels - 1):
        a, b = lvl_imgs[-1]
        lvl_imgs.append((mflow.downsample2x(a), mflow.downsample2x(b)))
    if args.skip_levels:
        lvl_imgs = []

    for lvl, (a, b) in enumerate(lvl_imgs):
        hh, ww = a.shape
        zero_uv = jnp.zeros((hh, ww), jnp.int32)

        def cencost(s8, x, y):
            c1 = census_transform(x + s8, params.census_window)
            c2 = census_transform(y + s8, params.census_window)
            if be == "pallas_tr":
                c = cost_volume_flow_major(
                    c1, c2, zero_uv, zero_uv, params.search_radius,
                    params.invalid_cost, identity_base=True,
                    nd_pad=-(-nl // 8) * 8)
            else:
                c = cost_volume_flow(c1, c2, zero_uv, zero_uv,
                                     params.search_radius,
                                     params.invalid_cost,
                                     identity_base=True)
            return jnp.sum(c, dtype=jnp.float32)
        ms_cc = _timeit(loop(cencost), (a, b), iters)

        c1 = census_transform(a, params.census_window)
        c2 = census_transform(b, params.census_window)
        cost0 = cost_volume_flow(c1, c2, zero_uv, zero_uv,
                                 params.search_radius, params.invalid_cost,
                                 identity_base=True)

        if be == "pallas_tr":
            from fsgm_tpu.ops.pallas import aggregate_tr
            cost0m = cost_volume_flow_major(
                c1, c2, zero_uv, zero_uv, params.search_radius,
                params.invalid_cost, identity_base=True,
                nd_pad=-(-nl // 8) * 8)

            def aggf(s8, c, g):
                cv = jnp.clip(c + s8 % 3, 0, 255).astype(jnp.uint8)
                s = aggregate_tr.aggregate_paths_tr(
                    cv, g, DIRS_8, params.p1, params.p2,
                    params.adaptive_p2, label_ext=extw,
                    s_max=8 * (params.invalid_cost + params.p2),
                    major_out=True)
                return jnp.sum(s, dtype=jnp.float32)
            ms_ag = _timeit(loop(aggf), (cost0m, a), iters)
        elif be == "pallas":
            from fsgm_tpu.ops.pallas import aggregate_pallas as pagg

            def aggf(s8, c, g):
                cv = jnp.clip(c + s8 % 3, 0, 255).astype(jnp.uint8)
                s = pagg.aggregate_paths(
                    cv, g, DIRS_8, params.p1, params.p2,
                    params.adaptive_p2, label_ext=extw,
                    s_max=8 * (params.invalid_cost + params.p2))
                return jnp.sum(s, dtype=jnp.float32)
        else:
            nm = agg.make_neighbor_min_2d(params.search_radius)

            def aggf(s8, c, g):
                cv = jnp.clip(c + s8 % 3, 0, 255).astype(jnp.uint8)
                s = agg.aggregate_paths(cv, g, DIRS_8, params.p1,
                                        params.p2, params.adaptive_p2,
                                        neighbor_min=nm)
                return jnp.sum(s, dtype=jnp.float32)
        if be != "pallas_tr":
            ms_ag = _timeit(loop(aggf), (cost0, a), iters)

        if be == "pallas_tr":
            from fsgm_tpu.ops.pallas import aggregate_tr
            s0 = aggregate_tr.aggregate_paths_tr(
                cost0m, a, DIRS_8, params.p1, params.p2, params.adaptive_p2,
                label_ext=extw, s_max=8 * (params.invalid_cost + params.p2),
                major_out=True)[:, :nl, :]
        elif be == "pallas":
            from fsgm_tpu.ops.pallas import aggregate_pallas as pagg
            s0 = pagg.aggregate_paths(
                cost0, a, DIRS_8, params.p1, params.p2, params.adaptive_p2,
                label_ext=extw, s_max=8 * (params.invalid_cost + params.p2))
        else:
            s0 = agg.aggregate_paths(
                cost0, a, DIRS_8, params.p1, params.p2, params.adaptive_p2,
                neighbor_min=agg.make_neighbor_min_2d(params.search_radius))

        def extract(s8, s_v):
            sv = s_v + s8.astype(s_v.dtype)
            wta_fn = mflow.wta_flow_major if major else mflow.wta_flow
            sub_fn = (mflow.subpixel_flow_major if major
                      else mflow.subpixel_flow)
            du, dv, l_int = wta_fn(sv, params.search_radius)
            u = du.astype(jnp.float32)
            v = dv.astype(jnp.float32)
            du_o, dv_o = sub_fn(sv, l_int, params.search_radius)
            u, v = u + du_o, v + dv_o
            u = ext.median_filter_3x3(u)
            v = ext.median_filter_3x3(v)
            return jnp.sum(u) + jnp.sum(v)
        ms_ex = _timeit(loop(extract), (s0,), iters)

        print(f"level {lvl} ({hh}x{ww}):  cen+cost {ms_cc:7.2f}  "
              f"agg {ms_ag:7.2f}  extract {ms_ex:7.2f} ms")

    # ---- real-warp cost (the stage above uses identity_base=True; the
    # finer levels warp cen2 by the prior flow — a per-pixel gather) ----
    prior_u = jnp.full((h, w), 3, jnp.int32)
    prior_v = jnp.full((h, w), -2, jnp.int32)
    c1f = census_transform(i1, params.census_window)
    c2f = census_transform(i2, params.census_window)

    def warpcost(s8, cc1, cc2):
        c = cost_volume_flow(cc1 ^ s8.astype(jnp.uint32), cc2, prior_u,
                             prior_v, params.search_radius,
                             params.invalid_cost, identity_base=False)
        return jnp.sum(c, dtype=jnp.float32)
    ms_wc = _timeit(loop(warpcost), (c1f, c2f), iters)
    print(f"{'warp-cost (L0, real warp)':28s} {ms_wc:8.2f} ms")

    # ---- one full level at L0 (everything between pyramids) ----
    prior = jnp.stack([prior_u.astype(jnp.float32),
                       prior_v.astype(jnp.float32)], axis=-1)

    def level0(s8, a, b):
        f = mflow._flow_one_level(a + s8, b + s8, prior, params, be,
                                  major=major)
        return jnp.sum(f)
    ms_l0 = _timeit(loop(level0), (i1, i2), iters)
    print(f"{'level 0 full (real warp)':28s} {ms_l0:8.2f} ms")

    # ---- fb_check at full res ----
    f0 = jnp.zeros((h, w, 2), jnp.float32)

    def fb(s8, ff, fb_):
        v = mflow.fb_check(ff + s8.astype(jnp.float32), fb_,
                           params.fb_max_diff)
        return jnp.sum(v, dtype=jnp.float32)
    ms_fb = _timeit(loop(fb), (f0, f0), iters)
    print(f"{'fb_check (full res)':28s} {ms_fb:8.2f} ms")

    if args.compose:
        _compose(args, params, loop, iters, i1, i2, prior, be)


def _compose(args, params, loop, iters, i1, i2, prior, be):
    """Cumulative-prefix timings of the composed L0 pipeline (real warp,
    salted census so nothing hoists out of the in-jit loop).  Pinpoints
    where composition overhead lands vs. the isolated stage times.  For
    the pallas backend this follows the production path: label-major cost
    build -> butterfly transpose -> 128-lane sweeps -> sliced extraction."""
    import jax.numpy as jnp
    from fsgm_tpu.params import DIRS_8
    from fsgm_tpu.ops.census import census_transform
    from fsgm_tpu.ops.cost import cost_volume_flow, cost_volume_flow_major
    from fsgm_tpu.ops import aggregate as agg
    from fsgm_tpu.ops import extract as ext
    from fsgm_tpu.models import flow as mflow

    base_u = jnp.rint(prior[..., 0]).astype(jnp.int32)
    base_v = jnp.rint(prior[..., 1]).astype(jnp.int32)
    s_max = 8 * (params.invalid_cost + params.p2)
    extw = params.window_extent
    nd = extw * extw

    def upto(stage):
        def body(s8, a, b):
            c1 = census_transform(a + s8, params.census_window)
            c2 = census_transform(b + s8, params.census_window)
            if be == "pallas_tr":
                from fsgm_tpu.ops.pallas import aggregate_tr
                cm = cost_volume_flow_major(c1, c2, base_u, base_v,
                                            params.search_radius,
                                            params.invalid_cost,
                                            identity_base=False,
                                            nd_pad=-(-nd // 8) * 8)
                if stage in ("cost", "transpose"):
                    return jnp.sum(cm, dtype=jnp.float32)
                s = aggregate_tr.aggregate_paths_tr(
                    cm, a, DIRS_8, params.p1, params.p2,
                    params.adaptive_p2, label_ext=extw, s_max=s_max,
                    major_out=True)[:, :nd, :]
                if stage == "agg":
                    return jnp.sum(s, dtype=jnp.float32)
                du, dv, l_int = mflow.wta_flow_major(s,
                                                     params.search_radius)
                u = (base_u + du).astype(jnp.float32)
                v = (base_v + dv).astype(jnp.float32)
                if stage == "wta":
                    return jnp.sum(u) + jnp.sum(v)
                du_o, dv_o = mflow.subpixel_flow_major(
                    s, l_int, params.search_radius)
                u, v = u + du_o, v + dv_o
                if stage == "subpixel":
                    return jnp.sum(u) + jnp.sum(v)
                u = ext.median_filter_3x3(u)
                v = ext.median_filter_3x3(v)
                return jnp.sum(u) + jnp.sum(v)
            if be == "pallas":
                from fsgm_tpu.ops.pallas import (aggregate_pallas as pagg,
                                                 transpose_pallas as ptr)
                cm = cost_volume_flow_major(c1, c2, base_u, base_v,
                                            params.search_radius,
                                            params.invalid_cost,
                                            identity_base=False,
                                            nd_pad=ptr.T)
                if stage == "cost":
                    return jnp.sum(cm, dtype=jnp.float32)
                cost = ptr.label_minor_from_major(cm)
                if stage == "transpose":
                    return jnp.sum(cost, dtype=jnp.float32)
                wp = cost.shape[1]
                ap = a if wp == a.shape[1] else jnp.pad(
                    a, ((0, 0), (0, wp - a.shape[1])), mode="edge")
                s = pagg.aggregate_paths(cost, ap, DIRS_8, params.p1,
                                         params.p2, params.adaptive_p2,
                                         label_ext=extw, s_max=s_max)
                s = s[:, :a.shape[1], :nd]
            else:
                cost = cost_volume_flow(c1, c2, base_u, base_v,
                                        params.search_radius,
                                        params.invalid_cost,
                                        identity_base=False)
                if stage in ("cost", "transpose"):
                    return jnp.sum(cost, dtype=jnp.float32)
                nm = agg.make_neighbor_min_2d(params.search_radius)
                s = agg.aggregate_paths(cost, a, DIRS_8, params.p1,
                                        params.p2, params.adaptive_p2,
                                        neighbor_min=nm)
            if stage == "agg":
                return jnp.sum(s, dtype=jnp.float32)
            du, dv, l_int = mflow.wta_flow(s, params.search_radius)
            u = (base_u + du).astype(jnp.float32)
            v = (base_v + dv).astype(jnp.float32)
            if stage == "wta":
                return jnp.sum(u) + jnp.sum(v)
            du_o, dv_o = mflow.subpixel_flow(s, l_int, params.search_radius)
            u, v = u + du_o, v + dv_o
            if stage == "subpixel":
                return jnp.sum(u) + jnp.sum(v)
            u = ext.median_filter_3x3(u)
            v = ext.median_filter_3x3(v)
            return jnp.sum(u) + jnp.sum(v)
        return body

    prev = 0.0
    for stage in ("cost", "transpose", "agg", "wta", "subpixel", "median"):
        ms = _timeit(loop(upto(stage)), (i1, i2), iters)
        print(f"compose upto {stage:10s} {ms:8.2f} ms  (+{ms - prev:6.2f})")
        prev = ms


if __name__ == "__main__":
    main()
