"""EXPERIMENT part 2: costs of the transposed-layout aggregation plan.

Measures, on the real TPU at the KITTI shape:
  1. kernel-only transposed row sweep (cost pre-transposed, salted as-is)
  2. transposed "column" sweep = the same kernel on (W, D, H) cost with
     dx=0 (a horizontal path on I is a vertical path on I^T)
  3. XLA layout transposes the integration would need:
       u8  (H,W,D) -> (H,D,W)   row-sweep cost feed
       u8  (H,W,D) -> (W,D,H)   col-sweep cost feed
       i16 (H,D,W) -> (H,W,D)   S back to extraction layout
       i16 (W,D,H) -> (H,W,D)   col S back to extraction layout
       i16 add of two (H,W,D) volumes (the S merge)

Run: python tools/trexp2.py  (TPU; ~2 min of compiles)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from tools.trexp import tr_row_family_sweep

H, W, D = 375, 1242, 128
ITERS = 8


def _time(name, fn, *args):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    float(f(np.uint8(251), *args))
    cs = time.perf_counter() - t0
    ts = []
    for rep in range(3):
        t0 = time.perf_counter()
        float(f(np.uint8(rep), *args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:44s} {1e3 * float(np.median(ts)) / ITERS:8.3f} ms/iter"
          f" (compile {cs:.0f}s)")


def main():
    from fsgm_tpu.io.synthetic import random_dot_stereo
    from fsgm_tpu.ops.census import census_transform
    from fsgm_tpu.ops.cost import cost_volume_stereo
    from fsgm_tpu.ops.pallas import aggregate_pallas as pagg

    il, ir, _ = random_dot_stereo(H, W, D, seed=0)
    il, ir = jnp.asarray(il), jnp.asarray(ir)
    cost = cost_volume_stereo(census_transform(il, (5, 5)),
                              census_transform(ir, (5, 5)), D, 255)
    costp, imgp = pagg.pad_inputs(cost, il)
    wp = imgp.shape[1]
    ct_rows = jnp.asarray(np.asarray(costp).transpose(0, 2, 1))  # (H,D,Wp)
    hp = -(-H // 8) * 8
    costh = jnp.asarray(np.pad(np.asarray(cost), ((0, hp - H), (0, 0),
                                                  (0, 0))))
    ct_cols = jnp.asarray(np.asarray(costh).transpose(1, 2, 0))  # (W,D,Hp)
    imgt = jnp.asarray(np.pad(np.asarray(il), ((0, hp - H), (0, 0)),
                              mode="edge").T)
    fam = [(1, -1), (1, 0), (1, 1)]

    def k_rows(salt, ct, img_v):
        def it(i, acc):
            cv = jnp.clip(ct + (salt + i).astype(jnp.uint8) % 3,
                          0, 255).astype(jnp.uint8)
            s = tr_row_family_sweep(cv, img_v, fam, 7, 100, False,
                                    jnp.zeros(ct.shape, jnp.int16))
            return acc + jnp.sum(s.astype(jnp.int32))
        return jax.lax.fori_loop(0, ITERS, it, jnp.int32(0))

    def k_cols(salt, ct, img_v):
        def it(i, acc):
            cv = jnp.clip(ct + (salt + i).astype(jnp.uint8) % 3,
                          0, 255).astype(jnp.uint8)
            s = tr_row_family_sweep(cv, img_v, [(1, 0)], 7, 100, False,
                                    jnp.zeros(ct.shape, jnp.int16))
            return acc + jnp.sum(s.astype(jnp.int32))
        return jax.lax.fori_loop(0, ITERS, it, jnp.int32(0))

    _time("tr row sweep kernel-only (3 dirs)", k_rows, ct_rows, imgp)
    _time("tr col sweep ((1,0) on I^T, 1 dir)", k_cols, ct_cols, imgt)

    s_hdw = jnp.zeros((H, D, wp), jnp.int16)
    s_wdh = jnp.zeros((wp, D, hp), jnp.int16)
    s_hwd = jnp.zeros((H, wp, D), jnp.int16)

    def t_u8_hdw(salt, c):
        def it(i, acc):
            cv = (c + (salt + i).astype(jnp.uint8)).astype(jnp.uint8)
            return acc + jnp.sum(cv.transpose(0, 2, 1).astype(jnp.int32))
        return jax.lax.fori_loop(0, ITERS, it, jnp.int32(0))

    def t_u8_wdh(salt, c):
        def it(i, acc):
            cv = (c + (salt + i).astype(jnp.uint8)).astype(jnp.uint8)
            return acc + jnp.sum(cv.transpose(1, 2, 0).astype(jnp.int32))
        return jax.lax.fori_loop(0, ITERS, it, jnp.int32(0))

    def t_i16_hdw_hwd(salt, s):
        def it(i, acc):
            sv = (s + (salt + i).astype(jnp.int16))
            return acc + jnp.sum(sv.transpose(0, 2, 1).astype(jnp.int32))
        return jax.lax.fori_loop(0, ITERS, it, jnp.int32(0))

    def t_i16_wdh_hwd(salt, s):
        def it(i, acc):
            sv = (s + (salt + i).astype(jnp.int16))
            return acc + jnp.sum(sv.transpose(2, 0, 1).astype(jnp.int32))
        return jax.lax.fori_loop(0, ITERS, it, jnp.int32(0))

    def t_add(salt, a, b):
        def it(i, acc):
            av = a + (salt + i).astype(jnp.int16)
            return acc + jnp.sum((av + b).astype(jnp.int32))
        return jax.lax.fori_loop(0, ITERS, it, jnp.int32(0))

    _time("XLA u8 (H,W,D)->(H,D,W) + sum", t_u8_hdw, costp)
    _time("XLA u8 (H,W,D)->(W,D,H) + sum", t_u8_wdh, costh)
    _time("XLA i16 (H,D,W)->(H,W,D) + sum", t_i16_hdw_hwd, s_hdw)
    _time("XLA i16 (W,D,H)->(H,W,D) + sum", t_i16_wdh_hwd, s_wdh)
    _time("XLA i16 add (H,W,D)+(H,W,D) + sum", t_add, s_hwd, s_hwd + 1)

    # baseline for the same reduction overhead
    def t_sum(salt, s):
        def it(i, acc):
            sv = (s + (salt + i).astype(jnp.int16))
            return acc + jnp.sum(sv.astype(jnp.int32))
        return jax.lax.fori_loop(0, ITERS, it, jnp.int32(0))

    _time("XLA i16 sum only (overhead baseline)", t_sum, s_hdw)


if __name__ == "__main__":
    main()
