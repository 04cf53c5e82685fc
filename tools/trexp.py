"""EXPERIMENT: transposed-layout (D-on-sublanes) row-family sweep.

Hypothesis (NOTES-PERF "why aggregation is the floor"): the lane
rotate-min tree is ~14 of ~28 full-array vector ops per direction-row.
With the volume laid out (H, D, W) — labels on SUBLANES, width on LANES —
the global min over D becomes a shrinking slice-halving over the sublane
axis (total traffic ~2x one array instead of 14x), and the d±1 neighbor
min becomes sublane shifts (same cost as before).  The x-shift moves to
the lane axis (roll + edge mask).  If Mosaic lowers sublane slices well,
the sweep drops to ~19 full-array-op equivalents => ~1.5x.

This tool:
  * implements a minimal down-family transposed sweep (no knights, no
    carry I/O — enough to measure),
  * checks bit-exactness vs ops.pallas.aggregate_pallas.row_family_sweep
    (both interpret-mode on CPU, real Mosaic on TPU),
  * times both at the KITTI shape with the relay measurement discipline.

Run:  python tools/trexp.py [--shape 375x1242x128] [--iters 8]
      (on CPU it only parity-checks; timing needs the TPU)
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF32 = 1 << 24


def _interpret() -> bool:
    return os.environ.get("FSGM_PALLAS_INTERPRET", "0") == "1"


def _sub_min(v: jnp.ndarray) -> jnp.ndarray:
    """(D, W) -> (1, W) min over the sublane (label) axis by shrinking
    halvings; exact for any power-of-two D (pad labels to pow2 with INF)."""
    n = v.shape[0]
    while n > 1:
        h = n // 2
        v = jnp.minimum(v[:h], v[h:n])
        n = h
    return v


def _lane_shift(v: jnp.ndarray, dx: int, lane_iota, inf) -> jnp.ndarray:
    """shifted[..., x] = v[..., x - dx]; INF where x - dx < 0 or >= W."""
    if dx == 0:
        return v
    w = v.shape[-1]
    r = pltpu.roll(v, dx % w, v.ndim - 1)  # circular; mask the wrap below
    if dx > 0:
        return jnp.where(lane_iota < dx, inf, r)
    return jnp.where(lane_iota >= w + dx, inf, r)


def _make_tr_kernel(dirs, nd, w, p1: int, s_dtype):
    def kernel(c_ref, p2e_ref, s_ref, s_out_ref, carry_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            carry_ref[...] = jnp.zeros(carry_ref.shape, carry_ref.dtype)

        acc = s_ref[0].astype(jnp.int32)                  # (D, W)
        cost = c_ref[0].astype(jnp.int32)                 # (D, W)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
        for k, (ady, dx) in enumerate(dirs):
            prev = carry_ref[k]                           # (D, W) int32
            m = _sub_min(prev)                            # (1, W)
            f = jnp.full((1, w), INF32, jnp.int32)
            lo = jnp.concatenate([f, prev[:-1]], axis=0)
            hi = jnp.concatenate([prev[1:], f], axis=0)
            nm = jnp.minimum(lo, hi) + p1                 # (D, W)
            if dx != 0:
                prev = _lane_shift(prev, dx, lane, INF32)
                nm = _lane_shift(nm, dx, lane, INF32)
                m = _lane_shift(m, dx, lane, INF32)
            mp = m + p2e_ref[0, k][None, :]               # (1, W)
            best = jnp.minimum(jnp.minimum(prev, nm), mp)
            l = cost + best - m
            carry_ref[k] = l
            acc = acc + l
        s_out_ref[0] = acc.astype(s_dtype)

    return kernel


def tr_row_family_sweep(cost_t: jnp.ndarray, img: jnp.ndarray, family,
                        p1: int, p2: int, adaptive_p2: bool,
                        s_t: jnp.ndarray):
    """Transposed down-family sweep.  cost_t, s_t: (H, D, W)."""
    from fsgm_tpu.ops.pallas.aggregate_pallas import _p2_effective
    h, nd, w = cost_t.shape
    assert all(dy == 1 for dy, _ in family)
    p2e = jnp.stack([_p2_effective(img, dy, dx, p1, p2, adaptive_p2)
                     for dy, dx in family], axis=1)       # (H, n, W)
    kernel = _make_tr_kernel(family, nd, w, p1, s_t.dtype)
    return pl.pallas_call(
        kernel,
        grid=(h,),
        in_specs=[
            pl.BlockSpec((1, nd, w), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, len(family), w), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, nd, w), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, nd, w), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((h, nd, w), s_t.dtype),
        scratch_shapes=[pltpu.VMEM((len(family), nd, w), jnp.int32)],
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=_interpret(),
    )(cost_t, p2e, s_t)


def _parity(h=37, w=180, d=32):
    from fsgm_tpu.io.synthetic import random_dot_stereo
    from fsgm_tpu.ops.census import census_transform
    from fsgm_tpu.ops.cost import cost_volume_stereo
    from fsgm_tpu.ops.pallas import aggregate_pallas as pagg

    il, ir, _ = random_dot_stereo(h, w, d, seed=3)
    il, ir = jnp.asarray(il), jnp.asarray(ir)
    cost = cost_volume_stereo(census_transform(il, (5, 5)),
                              census_transform(ir, (5, 5)), d, 255)
    fam = [(1, -1), (1, 0), (1, 1)]
    for adaptive in (False, True):
        costp, imgp = pagg.pad_inputs(cost, il)
        wp = imgp.shape[1]
        s0 = jnp.zeros((h, wp, d), jnp.int32)
        ref = pagg.row_family_sweep(costp, imgp, fam, 7, 100, adaptive, s0)
        ref = np.asarray(ref[:, :w])
        got = tr_row_family_sweep(costp.transpose(0, 2, 1), imgp, fam,
                                  7, 100, adaptive,
                                  jnp.zeros((h, d, wp), jnp.int32))
        got = np.asarray(got.transpose(0, 2, 1)[:, :w])
        assert (ref == got).all(), (adaptive,
                                    np.argwhere(ref != got)[:5])
    print("parity: EXACT (adaptive both ways)")


def _timeit(args):
    from fsgm_tpu.io.synthetic import random_dot_stereo
    from fsgm_tpu.ops.census import census_transform
    from fsgm_tpu.ops.cost import cost_volume_stereo
    from fsgm_tpu.ops.pallas import aggregate_pallas as pagg

    h, w, d = (int(x) for x in args.shape.split("x"))
    il, ir, _ = random_dot_stereo(h, w, d, seed=0)
    il, ir = jnp.asarray(il), jnp.asarray(ir)
    cost = cost_volume_stereo(census_transform(il, (5, 5)),
                              census_transform(ir, (5, 5)), d, 255)
    fam = [(1, -1), (1, 0), (1, 1)]
    iters = args.iters

    def run_cur(salt, cost_v, img_v):
        def it(i, acc):
            cv = jnp.clip(cost_v + (salt + i).astype(jnp.uint8) % 3,
                          0, 255).astype(jnp.uint8)
            costp, imgp = pagg.pad_inputs(cv, img_v)
            s = jnp.zeros(costp.shape, jnp.int16)
            s = pagg.row_family_sweep(costp, imgp, fam, 7, 100, False, s)
            return acc + jnp.sum(s.astype(jnp.int32))
        return jax.lax.fori_loop(0, iters, it, jnp.int32(0))

    def run_tr(salt, cost_v, img_v):
        def it(i, acc):
            cv = jnp.clip(cost_v + (salt + i).astype(jnp.uint8) % 3,
                          0, 255).astype(jnp.uint8)
            costp, imgp = pagg.pad_inputs(cv, img_v)
            ct = costp.transpose(0, 2, 1)
            s = jnp.zeros(ct.shape, jnp.int16)
            s = tr_row_family_sweep(ct, imgp, fam, 7, 100, False, s)
            return acc + jnp.sum(s.astype(jnp.int32))
        return jax.lax.fori_loop(0, iters, it, jnp.int32(0))

    for name, fn in (("current (D on lanes)", run_cur),
                     ("transposed (D on sublanes)", run_tr)):
        f = jax.jit(fn)
        t0 = time.perf_counter()
        float(f(np.uint8(251), cost, il))
        cs = time.perf_counter() - t0
        ts = []
        for rep in range(3):
            t0 = time.perf_counter()
            float(f(np.uint8(rep), cost, il))
            ts.append(time.perf_counter() - t0)
        print(f"{name:30s} {1e3 * float(np.median(ts)) / iters:8.3f} "
              f"ms/iter (compile {cs:.0f}s)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="375x1242x128")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--parity-only", action="store_true")
    args = ap.parse_args()
    if jax.devices()[0].platform != "tpu":
        os.environ["FSGM_PALLAS_INTERPRET"] = "1"
        _parity()
        return
    _parity()
    if not args.parity_only:
        _timeit(args)


if __name__ == "__main__":
    main()
