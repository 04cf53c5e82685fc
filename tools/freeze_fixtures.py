"""Freeze golden-oracle outputs as committed .npz fixtures (SURVEY.md §4
"Freeze its outputs as .npz fixtures").

The parity tests otherwise REGENERATE goldens every run, so a silent
regression in the golden model itself would be invisible: both sides would
drift together.  The frozen fixtures pin the oracle — one test regenerates
and compares (catches oracle drift), the rest of the suite keeps using the
live oracle (catches pipeline drift).  Regenerate deliberately with:

    python tools/freeze_fixtures.py            # writes tests/fixtures/*.npz

and commit the diff with a note on WHY the oracle changed.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fsgm_tpu.params import SGMParams, FlowParams  # noqa: E402
from fsgm_tpu.io.synthetic import (random_dot_stereo,  # noqa: E402
                                   constant_flow_pair,
                                   constant_flow_sequence)
import golden.sgm as gs  # noqa: E402
import golden.flow as gf  # noqa: E402

FIXDIR = Path(__file__).resolve().parent.parent / "tests" / "fixtures"

# Pinned fixture configs — keep in sync with tests/unit/test_fixtures.py.
STEREO_CASES = {
    # name: (h, w, d, seed, params kwargs)
    "stereo_8path": (96, 128, 64, 42, dict(max_disp=64, p1=7, p2=100)),
    "stereo_16path_adaptive": (64, 96, 32, 7, dict(
        max_disp=32, p1=7, p2=60, num_paths=16, adaptive_p2=True)),
    "stereo_reagg": (64, 96, 32, 11, dict(
        max_disp=32, p1=7, p2=60, lr_mode="reagg")),
}
FLOW_CASES = {
    # name: (h, w, u, v, seed, params kwargs)
    "flow_2lvl": (48, 64, 2, -1, 6, dict(search_radius=3, levels=2)),
}
SEQ_CASES = {
    # name: (h, w, u, v, n_frames, seed, params kwargs) — pins the
    # temporal-prior plumbing (downsample chain, negated backward seed,
    # FB-validated masking between pairs)
    "flow_seq_3frame": (40, 56, 2, -1, 3, 13,
                        dict(search_radius=2, levels=2)),
}


def freeze_stereo(name, h, w, d, seed, kw) -> Path:
    img_l, img_r, gt = random_dot_stereo(h, w, d, seed=seed)
    params = SGMParams(**kw)
    disp, inter = gs.sgm_stereo(img_l, img_r, params,
                                return_intermediates=True)
    path = FIXDIR / f"{name}.npz"
    np.savez_compressed(
        path, img_l=img_l, img_r=img_r, disp_gt=gt,
        cost=inter["cost"].astype(np.uint8), S=inter["S"].astype(np.int32),
        d_int=inter["d_int"].astype(np.int32),
        disp=disp.astype(np.float64))
    return path


def freeze_flow(name, h, w, u, v, seed, kw) -> Path:
    i1, i2, gt = constant_flow_pair(h, w, u, v, seed=seed)
    params = FlowParams(**kw)
    flow, valid = gf.fsgm_flow(i1, i2, params)
    path = FIXDIR / f"{name}.npz"
    np.savez_compressed(path, img1=i1, img2=i2, flow_gt=gt,
                        flow=flow.astype(np.float64), valid=valid)
    return path


def freeze_seq(name, h, w, u, v, n, seed, kw) -> Path:
    frames, gt = constant_flow_sequence(h, w, u, v, n, seed=seed)
    params = FlowParams(**kw)
    flows, valids = gf.flow_sequence(frames, params)
    path = FIXDIR / f"{name}.npz"
    np.savez_compressed(path, frames=frames, flow_gt=gt,
                        flows=flows.astype(np.float64), valids=valids)
    return path


def main() -> None:
    FIXDIR.mkdir(parents=True, exist_ok=True)
    for name, (h, w, d, seed, kw) in STEREO_CASES.items():
        print("wrote", freeze_stereo(name, h, w, d, seed, kw))
    for name, (h, w, u, v, seed, kw) in FLOW_CASES.items():
        print("wrote", freeze_flow(name, h, w, u, v, seed, kw))
    for name, (h, w, u, v, n, seed, kw) in SEQ_CASES.items():
        print("wrote", freeze_seq(name, h, w, u, v, n, seed, kw))


if __name__ == "__main__":
    main()
