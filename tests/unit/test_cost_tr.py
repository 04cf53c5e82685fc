"""Parity for the Pallas label-major cost builders (ops/pallas/cost_tr).

Round 4: the trace-derived replacement for the XLA cost build (128-way
concatenate + hamming fusions + transpose + pad, ~29% of device time at
KITTI batch 16).  Exactness contract:

  * cost_volume_hlw rows [0, H) == ops/cost.py::cost_volume_stereo_major
    (the golden-verified XLA builder), pad rows [H, H') all zero;
  * cost_volume_wlh == transpose of the same, zero-padded to (W', D, H');
  * both for left AND right reference, 1-word (5x5) and 2-word (9x7)
    census descriptors, and odd (non-multiple-of-8) H.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from fsgm_tpu.io.synthetic import random_dot_stereo
from fsgm_tpu.ops.census import census_transform
from fsgm_tpu.ops import cost as costmod
from fsgm_tpu.ops.pallas import cost_tr


def _pad8(n):
    return -(-n // 8) * 8


CASES = [(40, 56, 16, (5, 5)), (37, 53, 16, (5, 5)), (24, 40, 8, (9, 7))]


@pytest.mark.parametrize("h,w,d,win", CASES)
@pytest.mark.parametrize("rr", [False, True])
def test_cost_kernels_exact(h, w, d, win, rr):
    il, ir, _ = random_dot_stereo(h, w, d, seed=1)
    cl = census_transform(jnp.asarray(il), win)
    cr = census_transform(jnp.asarray(ir), win)
    ref = np.asarray(costmod.cost_volume_stereo_major(
        cl, cr, d, right_reference=rr))

    got_hlw = np.asarray(cost_tr.cost_volume_hlw(cl, cr, d, 255, rr))
    hp, wp = _pad8(h), _pad8(w)
    assert got_hlw.shape == (hp, d, w)
    assert (got_hlw[:h] == ref).all()
    assert (got_hlw[h:] == 0).all()

    got_wlh = np.asarray(cost_tr.cost_volume_wlh(cl, cr, d, 255, rr))
    want = np.zeros((wp, d, hp), np.uint8)
    want[:w, :, :h] = np.transpose(ref, (2, 1, 0))
    assert got_wlh.shape == (wp, d, hp)
    assert (got_wlh == want).all()


def test_pipeline_kernel_cost_matches_xla_cost(monkeypatch):
    """stereo_sgm with FSGM_COST_KERNEL on == off, bit-exact (the
    row-padded vertical pipeline is exact by the neutral-zero pad
    argument; this pins it end-to-end incl. subpixel/LR/median)."""
    import jax
    from fsgm_tpu.params import SGMParams
    from fsgm_tpu.models.stereo import stereo_sgm

    params = SGMParams(max_disp=16, p1=7, p2=100, num_paths=8,
                       subpixel=True, lr_check=True, median_filter=True)
    il, ir, _ = random_dot_stereo(37, 53, 16, seed=3)
    il, ir = jnp.asarray(il), jnp.asarray(ir)
    monkeypatch.setenv("FSGM_COST_KERNEL", "1")
    d_k = np.asarray(stereo_sgm(il, ir, params, "pallas_tr"))
    jax.clear_caches()   # env is read at trace time
    monkeypatch.setenv("FSGM_COST_KERNEL", "0")
    d_x = np.asarray(stereo_sgm(il, ir, params, "pallas_tr"))
    jax.clear_caches()
    assert (d_k == d_x).all()


@pytest.mark.parametrize("h,w,d", [(40, 56, 16), (37, 53, 16)])
def test_cost_wlh_batch_folded_exact(h, w, d):
    """The batch lane-folded wlh volume == per-frame volumes side by
    side (frame b at lanes [b*Hp, (b+1)*Hp))."""
    import jax
    b = 3
    cls, crs = [], []
    for s in range(b):
        il, ir, _ = random_dot_stereo(h, w, d, seed=s)
        cls.append(census_transform(jnp.asarray(il), (5, 5)))
        crs.append(census_transform(jnp.asarray(ir), (5, 5)))
    cl = jnp.stack(cls)
    cr = jnp.stack(crs)
    got = np.asarray(cost_tr.cost_volume_wlh_batch(cl, cr, d))
    hp, wp = _pad8(h), _pad8(w)
    assert got.shape == (wp, d, b * hp)
    per = jax.vmap(lambda a, c: cost_tr.cost_volume_wlh(a, c, d))(cl, cr)
    want = np.transpose(np.asarray(per), (1, 2, 0, 3)).reshape(
        wp, d, b * hp)
    assert (got == want).all()
