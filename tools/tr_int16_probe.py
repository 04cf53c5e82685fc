#!/usr/bin/env python
"""Probe: does FSGM_CDT=int16 legalize for the transposed-layout sweeps?

The lane-major kernels' int16 blockers were the lane-rotate min tree
("Rotate with non-32-bit data") and 16-bit `minsi` legalization.  The tr
layout replaced the tree with sublane slice-halvings; the only remaining
rotate is the dx lane shift (pltpu.roll), exercised separately below.

Run ON TPU:  FSGM_CDT=int16 python tools/tr_int16_probe.py

2026-08-21 addition: a minimal legalization matrix over the three i16
min formulations, run first (no env var needed), so one command shows
WHERE the blocker sits on the current toolchain:
  minsi   jnp.minimum on i16            — blocked (arith.minsi)
  select  jnp.where(a < b, a, b) on i16 — blocked too (2026-08-21):
          the failure is i16 vector ALU legalization generally, not
          the minsi op specifically
  widen   i32 minimum between i16 VMEM refs — compiles + exact, but
          is NOT the lever: the sweeps' VMEM traffic is already
          u8 cost / i16 S, so int16's win would be packed-VREG ALU
          throughput, which widening gives back
"""
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402

from fsgm_tpu.params import SGMParams, DIRS_8  # noqa: E402
from fsgm_tpu.io.synthetic import random_dot_stereo  # noqa: E402
from fsgm_tpu.ops.pallas import aggregate_tr as ptr  # noqa: E402
import golden.sgm as g  # noqa: E402


def _min_matrix() -> None:
    """Try each i16 min formulation in a standalone kernel."""
    def mk(kind):
        def kernel(a_ref, b_ref, o_ref):
            a, b = a_ref[...], b_ref[...]
            if kind == "minsi":
                o_ref[...] = jnp.minimum(a, b)
            elif kind == "select":
                o_ref[...] = jnp.where(a < b, a, b)
            else:  # widen
                o_ref[...] = jnp.minimum(
                    a.astype(jnp.int32),
                    b.astype(jnp.int32)).astype(jnp.int16)
        return kernel

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-999, 999, (64, 256)).astype(np.int16))
    y = jnp.asarray(rng.integers(-999, 999, (64, 256)).astype(np.int16))
    ref = np.minimum(np.asarray(x), np.asarray(y))
    for kind in ("minsi", "select", "widen"):
        try:
            out = pl.pallas_call(
                mk(kind),
                out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int16))(x, y)
            ok = (np.asarray(out) == ref).all()
            print(f"i16 min [{kind}]: compile OK, exact={ok}")
        except Exception as e:
            msg = str(e).split("\n")[0][:120]
            print(f"i16 min [{kind}]: BLOCKED {type(e).__name__}: {msg}")


def main() -> None:
    print(f"FSGM_CDT={os.environ.get('FSGM_CDT', 'int32')}",
          file=sys.stderr)
    _min_matrix()
    img_l, img_r, _ = random_dot_stereo(64, 136, 32, seed=3)
    p = SGMParams(max_disp=32, p1=7, p2=80)
    cen_l = g.census_transform(img_l, p.census_window)
    cen_r = g.census_transform(img_r, p.census_window)
    cost = g.cost_volume_stereo(cen_l, cen_r, p.max_disp, p.invalid_cost)
    cost_hlw = jnp.asarray(cost.transpose(0, 2, 1), dtype=jnp.uint8)

    for name, dirs in (("vertical only (no rolls)", [(1, 0), (-1, 0)]),
                       ("full 8-path (rolls + transposed)", list(DIRS_8))):
        gold = np.zeros_like(cost)
        for r in dirs:
            gold += g.aggregate_one_path(cost, img_l, r, p.p1, p.p2, False)
        s = np.asarray(ptr.aggregate_paths_tr(
            cost_hlw, jnp.asarray(img_l), dirs, p.p1, p.p2, False,
            s_max=len(dirs) * (255 + p.p2)))
        ok = (s.astype(np.int64) == gold).all()
        print(f"{name}: compile OK, exact={ok}")
        if not ok:
            diff = np.abs(s.astype(np.int64) - gold)
            print(f"  max abs diff {diff.max()}, "
                  f"mismatch frac {(diff > 0).mean():.4f}")


if __name__ == "__main__":
    main()
