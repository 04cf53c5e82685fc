"""Extraction sub-stage microbench (TPU): where do the ~4 ms go?

Times each extraction component as a K-iteration in-jit loop (salted,
scalar-synced — the relay memoizes identical executions) on a KITTI-size
S volume, for both layouts:

  minor: wta / subpixel / right-WTA (S-trick gather) / lr_check / median
  major: wta_major / subpixel_major / right-WTA (pad+reshape skew)

Usage: python tools/extbench.py [iters]
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from fsgm_tpu.params import SGMParams
from fsgm_tpu.io.synthetic import random_dot_stereo
from fsgm_tpu.models.stereo import compute_s_volume
from fsgm_tpu.ops import extract as ext
from fsgm_tpu.ops.pallas.extract_tr import wta_right_major as _rwta_pallas

H, W, D = 375, 1242, 128
ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 32


def loop(body, *args):
    # arrays ride as jit ARGUMENTS — a closed-over 119 MB volume would be
    # embedded as an mlir constant, which aborts the TPU backend
    @jax.jit
    def run(salt, *a):
        def it(i, acc):
            return acc + body((salt + i).astype(jnp.int16), *a)
        return jax.lax.fori_loop(0, ITERS, it, jnp.float32(0))
    float(run(np.int16(123), *args))     # compile + warm
    t0 = time.perf_counter()
    float(run(np.int16(1), *args))
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    p = SGMParams(max_disp=D, p1=7, p2=100)
    il, ir, _ = random_dot_stereo(H, W, D, seed=0)
    il, ir = jnp.asarray(il), jnp.asarray(ir)
    s = jax.jit(lambda a, b: compute_s_volume(a, b, p, "pallas_tr"))(il, ir)
    s.block_until_ready()
    d0 = ext.wta(s)
    disp0 = d0.astype(jnp.float32)
    dr0 = ext.wta_right_from_s(s, p.s_invalid)
    sm = jnp.transpose(s, (0, 2, 1))          # (H, L, W) major

    rows = {
        "wta":        (lambda s8, sv: jnp.sum(
            ext.wta(sv + s8).astype(jnp.float32)), (s,)),
        "subpixel":   (lambda s8, sv, dv: jnp.sum(
            ext.subpixel_refine(sv + s8, dv)), (s, d0)),
        "right_wta":  (lambda s8, sv: jnp.sum(
            ext.wta_right_from_s(sv + s8, p.s_invalid)
            .astype(jnp.float32)), (s,)),
        "lr_check":   (lambda s8, dv, rv: jnp.sum(ext.lr_check(
            dv + s8.astype(jnp.float32), rv, p.lr_max_diff, D)),
            (disp0, dr0)),
        "median":     (lambda s8, dv: jnp.sum(ext.median_filter_3x3(
            dv + s8.astype(jnp.float32))), (disp0,)),
        "transpose2": (lambda s8, sv: jnp.sum((
            jnp.transpose(sv + s8, (0, 2, 1))
            + jnp.transpose(sv + s8 + 1, (0, 2, 1))).astype(jnp.float32)),
            (sm,)),
        "wta_major":  (lambda s8, sv: jnp.sum(
            ext.wta_major(sv + s8).astype(jnp.float32)), (sm,)),
        "subpix_maj": (lambda s8, sv, dv: jnp.sum(
            ext.subpixel_refine_major(sv + s8, dv)), (sm, d0)),
        "rwta_major": (lambda s8, sv: jnp.sum(ext.wta_right_from_s_major(
            sv + s8, p.s_invalid).astype(jnp.float32)), (sm,)),
        "rwta_palls": (lambda s8, sv: jnp.sum(_rwta_pallas(
            sv + s8, p.s_invalid).astype(jnp.float32)), (sm,)),
    }
    for name, (body, args) in rows.items():
        print(f"{name:11s} {loop(body, *args):7.3f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
