"""Kernel-variant microbench on the real TPU (axon relay).

Times the fused aggregation sweeps under the env-tunable kernel knobs
(aggregate_pallas.py) and the end-to-end pipeline, so perf experiments are
one command instead of ad-hoc snippets:

    python tools/microbench.py                # default grid of variants
    python tools/microbench.py --stage down   # just the down-family sweep
    FSGM_XCHUNK=128 python tools/microbench.py --stage e2e --no-grid

Knobs exercised by the default grid:
    FSGM_XCHUNK  row-sweep x chunk (sublane) size
    FSGM_TREE    w3 (share window-3 with neighbor min) | flat
    FSGM_CDT     int32 | int16 (Mosaic legalization retest)
    FSGM_COLHB   column-sweep row-chunk limit

Relay measurement discipline (memory: axon-relay-benchmarking): the relay
MEMOIZES identical executions and block_until_ready does not reliably
block, so every timed call is salted and synced by fetching an in-jit
scalar reduction; K iterations run inside one jit (fori_loop) so per-call
relay overhead (~29 ms) amortizes out.  Knobs are read at TRACE time, so
each variant builds a fresh closure (new function identity -> new jit
cache entry).
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _build_inputs(h, w, d):
    import jax.numpy as jnp
    from fsgm_tpu.io.synthetic import random_dot_stereo
    from fsgm_tpu.ops.census import census_transform
    from fsgm_tpu.ops.cost import cost_volume_stereo

    il, ir, _ = random_dot_stereo(h, w, d, seed=0)
    il, ir = jnp.asarray(il), jnp.asarray(ir)
    cen_l = census_transform(il, (5, 5))
    cen_r = census_transform(ir, (5, 5))
    cost = cost_volume_stereo(cen_l, cen_r, d, 255)
    return il, ir, cost


def _time_fn(fn, args, iters, repeats=3):
    """fn(salt, *args) -> scalar; returns median ms per inner iteration."""
    t0 = time.perf_counter()
    float(fn(np.uint8(251), *args))
    compile_s = time.perf_counter() - t0
    times = []
    for rep in range(repeats):
        t0 = time.perf_counter()
        float(fn(np.uint8(rep), *args))
        times.append(time.perf_counter() - t0)
    return 1e3 * float(np.median(times)) / iters, compile_s


def _lower_with_knobs(fn, knobs, example_args):
    """jit + LOWER (trace) `fn` while the env knobs are applied.

    The kernel knobs are read at TRACE time; jit traces lazily on first
    call, so the env must be set around an explicit .lower() — merely
    defining the jitted function under the env would trace it AFTER the
    env is restored (measured: all variants identical)."""
    import jax
    saved = {k: os.environ.get(k) for k in knobs}
    os.environ.update(knobs)
    try:
        lowered = jax.jit(fn).lower(np.uint8(0), *example_args)
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    compiled = lowered.compile()
    return lambda salt, *a: compiled(salt, *a)


def _make_stage(stage, params, img, cost, iters, knobs):
    """Fresh-closure jitted K-iteration loop for one sweep stage."""
    import jax
    import jax.numpy as jnp
    from fsgm_tpu.ops.pallas import aggregate_pallas as pagg

    down = [r for r in params.dirs if r[0] > 0]
    up = [r for r in params.dirs if r[0] < 0]

    def body(salt, cost_v, img_v):
        costp, imgp = pagg.pad_inputs(cost_v, img_v)
        s_dtype, _ = pagg.plan_dtypes(params.p2, params.s_invalid)
        s = jnp.zeros(costp.shape, s_dtype)
        if stage == "down":
            s = pagg.row_family_sweep(costp, imgp, down, params.p1,
                                      params.p2, params.adaptive_p2, s)
        elif stage == "up":
            s = pagg.row_family_sweep(costp, imgp, up, params.p1,
                                      params.p2, params.adaptive_p2, s)
        elif stage == "cols":
            s = pagg.col_dir_sweep(costp, imgp, (0, 1), params.p1,
                                   params.p2, params.adaptive_p2, s)
            s = pagg.col_dir_sweep(costp, imgp, (0, -1), params.p1,
                                   params.p2, params.adaptive_p2, s)
        elif stage == "agg":
            s = pagg.aggregate_paths(cost_v, img_v, params.dirs, params.p1,
                                     params.p2, params.adaptive_p2,
                                     s_max=params.s_invalid)
        else:
            raise ValueError(stage)
        return jnp.sum(s.astype(jnp.int32))

    def run(salt, cost_v, img_v):
        def it(i, acc):
            # salt the cost so no two iterations are identical work
            cv = jnp.clip(cost_v + (salt + i).astype(jnp.uint8) % 3,
                          0, 255).astype(jnp.uint8)
            return acc + body(salt, cv, img_v)
        return jax.lax.fori_loop(0, iters, it, jnp.int32(0))

    return _lower_with_knobs(run, knobs, (cost, img))


def _make_e2e(params, il, ir, iters, knobs, backend):
    import jax.numpy as jnp
    from fsgm_tpu.models.stereo import stereo_sgm

    def run(salt, il_v, ir_v):
        def it(i, acc):
            s8 = (salt + i).astype(jnp.uint8)
            out = stereo_sgm(il_v + s8, ir_v + s8, params, backend)
            return acc + jnp.sum(out)
        return jax.lax.fori_loop(0, iters, it, jnp.float32(0))

    return _lower_with_knobs(run, knobs, (il, ir))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="agg",
                    choices=["down", "up", "cols", "agg", "e2e"])
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--shape", default="375x1242x128")
    ap.add_argument("--no-grid", action="store_true",
                    help="single run with the ambient env knobs")
    ap.add_argument("--grid", default=None,
                    help="semicolon-separated K=V[,K=V] variant list, e.g. "
                         "'FSGM_XCHUNK=128;FSGM_XCHUNK=256,FSGM_TREE=flat'")
    args = ap.parse_args()

    from fsgm_tpu.params import SGMParams
    h, w, d = (int(x) for x in args.shape.split("x"))
    params = SGMParams(max_disp=d, p1=7, p2=100, num_paths=8)
    il, ir, cost = _build_inputs(h, w, d)

    if args.no_grid:
        variants = [{}]
    elif args.grid is not None:
        variants = []
        for spec in args.grid.split(";"):
            variants.append(dict(kv.split("=") for kv in spec.split(",")
                                 if kv))
    else:
        variants = [
            {},
            {"FSGM_TREE": "flat"},
            {"FSGM_XCHUNK": "128"},
            {"FSGM_XCHUNK": "512"},
            {"FSGM_XCHUNK": "1280"},
            {"FSGM_COLHB": "256"},
            {"FSGM_CDT": "int16"},
        ]

    import jax
    print(f"# platform={jax.devices()[0].platform} stage={args.stage} "
          f"shape={args.shape} iters={args.iters}", file=sys.stderr)
    for knobs in variants:
        label = ",".join(f"{k}={v}" for k, v in knobs.items()) or "default"
        try:
            if args.stage == "e2e":
                fn = _make_e2e(params, il, ir, args.iters, knobs, "pallas")
                ms, cs = _time_fn(fn, (il, ir), args.iters)
            else:
                fn = _make_stage(args.stage, params, il, cost, args.iters,
                                 knobs)
                ms, cs = _time_fn(fn, (cost, il), args.iters)
            print(f"{label:40s} {ms:8.3f} ms/iter  (compile {cs:.0f}s)")
        except Exception as e:  # int16 legalization failures etc.
            print(f"{label:40s} FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}")


if __name__ == "__main__":
    main()
