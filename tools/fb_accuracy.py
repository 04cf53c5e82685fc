"""Fl-all / validity-rate comparison of the fb_backward modes (CPU).

Decides whether the cheaper backward-pass variants are accuracy-safe
enough to be the benchmark default: runs each mode on synthetic
warped-texture pairs with known ground truth and reports Fl-all over the
pixels each mode keeps, plus the kept-valid fraction.

    python tools/fb_accuracy.py [--shape 96x192] [--levels 3]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="96x192")
    ap.add_argument("--levels", type=int, default=3)
    ap.add_argument("--radius", type=int, default=4)
    ap.add_argument("--pairs", type=int, default=3)
    args = ap.parse_args()

    import os
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax.numpy as jnp
    from fsgm_tpu.params import FlowParams
    from fsgm_tpu.models.flow import flow_fsgm
    from fsgm_tpu.io.synthetic import constant_flow_pair
    from fsgm_tpu.eval.metrics import fl_all

    h, w = (int(x) for x in args.shape.split("x"))
    motions = [(3, -2), (-5, 1), (7, 4)]
    pairs = []
    for i in range(args.pairs):
        u, v = motions[i % len(motions)]
        pairs.append(constant_flow_pair(h, w, u, v, seed=i) + ((u, v),))

    for mode, grid in (("full", "full"), ("cheap", "full"),
                       ("half", "full"), ("single", "full"),
                       ("half", "half"), ("full", "half")):
        p = FlowParams(search_radius=args.radius, levels=args.levels,
                       p1=7, p2=100, fb_backward=mode, fb_grid=grid)
        fls, dens = [], []
        for img1, img2, gt, _ in pairs:
            flo, valid = flow_fsgm(jnp.asarray(img1), jnp.asarray(img2), p)
            flo, valid = np.asarray(flo), np.asarray(valid)
            gt_valid = np.ones(gt.shape[:2], dtype=bool)
            m = fl_all(flo.astype(np.float64), gt.astype(np.float64),
                       gt_valid, pred_valid=valid)
            fls.append(m["fl_all"])
            dens.append(valid.mean())
        print(f"{mode:7s} grid={grid:4s} "
              f"Fl-all {100 * float(np.mean(fls)):6.2f}%  "
              f"valid-kept {100 * float(np.mean(dens)):6.2f}%")


if __name__ == "__main__":
    main()
