#!/usr/bin/env python
"""TPU-hardware parity smoke: real Mosaic-lowered kernels vs the golden
oracle (the CPU test suite runs Pallas in interpret mode, which could in
principle diverge from the actual lowering — this check closes that gap).

Run on a machine with a TPU attached:  python tools/tpu_smoke.py
"""
import numpy as np
import jax.numpy as jnp

import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from fsgm_tpu.params import SGMParams, FlowParams
from fsgm_tpu.models.stereo import stereo_sgm, compute_s_volume
from fsgm_tpu.models.flow import flow_fsgm
from fsgm_tpu.io.synthetic import random_dot_stereo, constant_flow_pair
import golden.sgm as g
import golden.flow as gf


def main() -> None:
    img_l, img_r, _ = random_dot_stereo(64, 136, 32, seed=21)  # W % 8 != 0
    for num_paths, adaptive in ((8, False), (16, True)):
        p = SGMParams(max_disp=32, p1=7, p2=80, num_paths=num_paths,
                      adaptive_p2=adaptive)
        _, inter = g.sgm_stereo(img_l, img_r, p, return_intermediates=True)
        s_tpu = np.asarray(compute_s_volume(
            jnp.asarray(img_l), jnp.asarray(img_r), p, "pallas"))
        assert (s_tpu.astype(np.int64) == inter["S"]).all(), \
            f"S mismatch ({num_paths}-path, adaptive={adaptive})"
        d_tpu = np.asarray(stereo_sgm(jnp.asarray(img_l),
                                      jnp.asarray(img_r), p, "pallas"))
        gold_d = g.sgm_stereo(img_l, img_r, p)
        assert ((d_tpu < 0) == (gold_d < 0)).all()
        both = gold_d >= 0
        assert np.allclose(d_tpu[both], gold_d[both], atol=1e-3)
        print(f"stereo {num_paths}-path adaptive={adaptive}: exact")

    # batched lane-fold on real Mosaic: the single-frame checks above
    # never run the folded shapes (64-high frames fold to 3x64 lanes)
    from fsgm_tpu.models.stereo import stereo_sgm_batch
    ls, rs = [], []
    for s in range(3):
        a, b, _ = random_dot_stereo(64, 136, 32, seed=30 + s)
        ls.append(a)
        rs.append(b)
    p8 = SGMParams(max_disp=32, p1=7, p2=80)
    got = np.asarray(stereo_sgm_batch(jnp.asarray(np.stack(ls)),
                                      jnp.asarray(np.stack(rs)),
                                      p8, "pallas"))
    want = np.stack([np.asarray(stereo_sgm(jnp.asarray(a), jnp.asarray(b),
                                           p8, "pallas"))
                     for a, b in zip(ls, rs)])
    assert np.array_equal(got, want), "batched lane-fold mismatch"
    print("stereo batched lane-fold: exact")

    i1, i2, _ = constant_flow_pair(48, 64, 2, -1, seed=6)
    fp = FlowParams(search_radius=3, levels=2, p1=7, p2=60)
    f_tpu, v_tpu = flow_fsgm(jnp.asarray(i1), jnp.asarray(i2), fp, "pallas")
    f_tpu, v_tpu = np.asarray(f_tpu), np.asarray(v_tpu)
    f_gold, v_gold = gf.fsgm_flow(i1, i2, fp)
    assert (v_tpu == v_gold).all()
    assert np.allclose(f_tpu[v_gold], f_gold[v_gold], atol=1e-3)
    print("flow: exact")
    print("TPU-hardware parity smoke: ALL EXACT")


if __name__ == "__main__":
    main()
