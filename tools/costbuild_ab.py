"""A/B the label-MAJOR stereo cost-volume builders on the real TPU.

Round-4 trace finding (tools/traceview.py on /tmp/trace_kitti): the
current cost_volume_stereo_major (stack of 128 shifted planes) lowers to
a 128-way concatenate running at 134 GB/s (14.2 ms/16 frames) plus a
full relayout copy (4.25 ms) plus the horizontal pad (3.0 ms) — ~2.2
ms/frame, more than half of one family sweep.  Candidates:

  stack   — current: jnp.stack of D shifted-plane hammings
  shear   — reshape-shear: B[d, x] = cenRext[x-d] via the classic
            (D, K) -> flat -> (D, K-1) skew, one fused XLA expression,
            no concat
  gather  — one gather with (D, W) indices along the x axis

Usage: python tools/costbuild_ab.py [H W D iters]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from fsgm_tpu.io.synthetic import random_dot_stereo
from fsgm_tpu.ops.census import census_transform, hamming
from fsgm_tpu.ops import cost as costmod


def shear_major(cen_l, cen_r, max_disp, invalid_cost=255):
    """(H, D, W) u8 left-reference cost volume, concat-free."""
    h, w, nw = cen_l.shape
    d = max_disp
    k = w + d
    ext = jnp.concatenate(
        [cen_r, jnp.zeros((h, d, nw), cen_r.dtype)], axis=1)   # (H, K, nw)
    bc = jnp.broadcast_to(ext[:, None], (h, d, k, nw))
    sheared = bc.reshape(h, d * k, nw)[:, :d * (k - 1)]
    sheared = sheared.reshape(h, d, k - 1, nw)[:, :, :w]       # (H,D,W,nw)
    ham = hamming(cen_l[:, None], sheared)                     # (H, D, W)
    xs = jnp.arange(w, dtype=jnp.int32)[None, None, :]
    ds = jnp.arange(d, dtype=jnp.int32)[None, :, None]
    return jnp.where(xs >= ds, ham, invalid_cost).astype(jnp.uint8)


def gather_major(cen_l, cen_r, max_disp, invalid_cost=255):
    h, w, nw = cen_l.shape
    ds = jnp.arange(max_disp, dtype=jnp.int32)[:, None]
    xs = jnp.arange(w, dtype=jnp.int32)[None, :]
    src = xs - ds                                              # (D, W)
    ok = src >= 0
    g = cen_r[:, jnp.clip(src, 0, w - 1), :]                   # (H,D,W,nw)
    ham = hamming(cen_l[:, None], g)
    return jnp.where(ok[None], ham, invalid_cost).astype(jnp.uint8)


def main():
    # positional overrides: any PREFIX of [H W D iters] is accepted
    vals = [375, 1242, 128, 16]
    for i, arg in enumerate(sys.argv[1:5]):
        vals[i] = int(arg)
    h, w, d, iters = vals
    il, ir, _ = random_dot_stereo(h, w, d, seed=0)
    il, ir = jnp.asarray(il), jnp.asarray(ir)
    cl = census_transform(il, (5, 5))
    cr = census_transform(ir, (5, 5))

    ref = np.asarray(costmod.cost_volume_stereo_major(cl, cr, d))
    for name, fn in [("shear", shear_major), ("gather", gather_major)]:
        got = np.asarray(fn(cl, cr, d))
        exact = (got == ref).all()
        print(f"{name:8s} exact={exact}")
        if not exact:
            bad = np.argwhere(got != ref)
            print("  first mismatches:", bad[:4],
                  got[tuple(bad[0])], ref[tuple(bad[0])])

    def loop(fn):
        @jax.jit
        def run(salt, a, b):
            def it(i, acc):
                s8 = (salt + i).astype(jnp.uint8)
                vol = fn(census_transform(a + s8, (5, 5)),
                         census_transform(b + s8, (5, 5)), d)
                return acc + jnp.sum(vol, dtype=jnp.float32)
            return jax.lax.fori_loop(0, iters, it, jnp.float32(0))
        return run

    for name, fn in [
            ("stack", lambda a, b, dd: costmod.cost_volume_stereo_major(
                a, b, dd)),
            ("shear", shear_major),
            ("gather", gather_major)]:
        run = loop(fn)
        float(run(np.uint8(255), il, ir))      # compile
        t0 = time.perf_counter()
        float(run(np.uint8(1), il, ir))
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name:8s} {dt:8.3f} ms/build")

    # the (W, D, H) horizontal feed: shear, then derive by transpose
    def shear_cols(a, b, dd):
        return jnp.transpose(shear_major(a, b, dd), (2, 1, 0))

    for name, fn in [
            ("stack_cols", lambda a, b, dd:
                costmod.cost_volume_stereo_major_cols(a, b, dd)),
            ("shear_T", shear_cols)]:
        run = loop(fn)
        float(run(np.uint8(255), il, ir))
        t0 = time.perf_counter()
        float(run(np.uint8(1), il, ir))
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name:10s} {dt:8.3f} ms/build")


if __name__ == "__main__":
    main()
