#!/usr/bin/env python
"""Probe: does FSGM_CDT=int16 legalize for the transposed-layout sweeps?

The lane-major kernels' int16 blockers were the lane-rotate min tree
("Rotate with non-32-bit data") and 16-bit `minsi` legalization.  The tr
layout replaced the tree with sublane slice-halvings; the only remaining
rotate is the dx lane shift (pltpu.roll), exercised separately below.

Run ON TPU:  FSGM_CDT=int16 python tools/tr_int16_probe.py
"""
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp  # noqa: E402

from fsgm_tpu.params import SGMParams, DIRS_8  # noqa: E402
from fsgm_tpu.io.synthetic import random_dot_stereo  # noqa: E402
from fsgm_tpu.ops.pallas import aggregate_tr as ptr  # noqa: E402
import golden.sgm as g  # noqa: E402


def main() -> None:
    print(f"FSGM_CDT={os.environ.get('FSGM_CDT', 'int32')}",
          file=sys.stderr)
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
