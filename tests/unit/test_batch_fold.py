"""stereo_sgm_batch (lane-folded horizontal family) == stacked stereo_sgm.

The batched entry folds the frame batch into the horizontal-family lane
axis (ops/pallas/aggregate_tr.py::aggregate_paths_tr_batch).  That family
has no cross-lane operations, so the fold must be BIT-exact vs running
each frame alone — float-exact through the whole pipeline (identical ops
on identical S), checked here on the interpret-mode Pallas backend and
the XLA fallback, both path sets, odd sizes, and the reagg LR mode.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fsgm_tpu.params import SGMParams
from fsgm_tpu.io.synthetic import random_dot_stereo
from fsgm_tpu.models.stereo import stereo_sgm, stereo_sgm_batch


def _pairs(b=3, h=37, w=53, d=16):
    ls, rs = [], []
    for s in range(b):
        il, ir, _ = random_dot_stereo(h, w, d, seed=10 + s)
        ls.append(il)
        rs.append(ir)
    return jnp.asarray(np.stack(ls)), jnp.asarray(np.stack(rs))


@pytest.mark.parametrize("backend", ["xla", "pallas_tr"])
@pytest.mark.parametrize("num_paths,adaptive", [(8, False), (16, True)])
def test_batch_matches_stacked(backend, num_paths, adaptive):
    d = 16
    params = SGMParams(max_disp=d, p1=7, p2=60, num_paths=num_paths,
                       adaptive_p2=adaptive)
    il, ir = _pairs(d=d)
    got = np.asarray(stereo_sgm_batch(il, ir, params, backend))
    want = np.stack([np.asarray(stereo_sgm(il[i], ir[i], params, backend))
                     for i in range(il.shape[0])])
    np.testing.assert_array_equal(got, want)


def test_batch_matches_stacked_reagg():
    params = SGMParams(max_disp=16, p1=7, p2=60, lr_mode="reagg")
    il, ir = _pairs(b=2)
    got = np.asarray(stereo_sgm_batch(il, ir, params, "pallas_tr"))
    want = np.stack([np.asarray(stereo_sgm(il[i], ir[i], params,
                                           "pallas_tr"))
                     for i in range(il.shape[0])])
    np.testing.assert_array_equal(got, want)


def test_batch_single_frame_matches():
    params = SGMParams(max_disp=16, p1=7, p2=60)
    il, ir = _pairs(b=1)
    got = np.asarray(stereo_sgm_batch(il, ir, params, "pallas_tr"))[0]
    want = np.asarray(stereo_sgm(il[0], ir[0], params, "pallas_tr"))
    np.testing.assert_array_equal(got, want)


def test_flow_vmap_matches_stacked():
    """An OUTER frame vmap over flow_fsgm (the bench's dispatch shape,
    nesting over the internal fwd/bwd lockstep vmap) must match per-frame
    runs exactly — this exercises the custom_vmap lane-fold rule on the
    horizontal-family sweeps, including recursive (nested-vmap) folding."""
    from fsgm_tpu.params import FlowParams
    from fsgm_tpu.models.flow import flow_fsgm

    from fsgm_tpu.io.synthetic import constant_flow_pair
    params = FlowParams(search_radius=2, levels=2, p1=7, p2=60,
                        fb_backward="half")
    pairs = [constant_flow_pair(24, 32, 1, -1, seed=s) for s in range(2)]
    a = jnp.asarray(np.stack([p[0] for p in pairs]))
    b = jnp.asarray(np.stack([p[1] for p in pairs]))
    fb, vb = jax.vmap(
        lambda x, y: flow_fsgm(x, y, params, "pallas_tr"))(a, b)
    for i in range(a.shape[0]):
        f, v = flow_fsgm(a[i], b[i], params, "pallas_tr")
        np.testing.assert_array_equal(np.asarray(fb[i]), np.asarray(f))
        np.testing.assert_array_equal(np.asarray(vb[i]), np.asarray(v))


def test_fold_threshold_serialized_matches(monkeypatch):
    """With FSGM_FOLD_MAXH below the frame height, both fold paths must
    serialize (the cv rule's wide-lane fallback) and still match."""
    monkeypatch.setenv("FSGM_FOLD_MAXH", "8")
    params = SGMParams(max_disp=16, p1=7, p2=60)
    il, ir = _pairs(b=2)
    got = np.asarray(stereo_sgm_batch(il, ir, params, "pallas_tr"))
    want = np.stack([np.asarray(stereo_sgm(il[i], ir[i], params,
                                           "pallas_tr"))
                     for i in range(il.shape[0])])
    np.testing.assert_array_equal(got, want)
