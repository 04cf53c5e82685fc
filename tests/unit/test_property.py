"""Property tests (SURVEY.md §4): random small images, random penalties,
all backends agree bit-exactly with the golden oracle.

hypothesis drives the shapes/penalties; the XLA path, the Pallas kernels
(interpret mode), and the C++ oracle are each checked against golden in a
single derandomized sweep (CI-stable).
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st, HealthCheck

import jax.numpy as jnp

from fsgm_tpu.params import DIRS_16
from fsgm_tpu.ops import aggregate as jagg
from fsgm_tpu.ops.pallas import aggregate_pallas as pagg

import golden.sgm as g

SET = settings(max_examples=12, deadline=None, derandomize=True,
               suppress_health_check=[HealthCheck.too_slow])


@st.composite
def problem(draw):
    h = draw(st.integers(6, 24))
    w = draw(st.integers(6, 28))
    d = draw(st.sampled_from([4, 8, 16]))
    p1 = draw(st.integers(1, 20))
    p2 = draw(st.integers(0, 200))
    adaptive = draw(st.booleans())
    seed = draw(st.integers(0, 2 ** 16))
    return h, w, d, p1, p2, adaptive, seed


def _fixture(h, w, d, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    cost = rng.integers(0, 64, (h, w, d)).astype(np.int64)
    return img, cost


@given(problem(), st.sampled_from(range(len(DIRS_16))))
@SET
def test_xla_one_path_matches_golden(prob, dir_idx):
    h, w, d, p1, p2, adaptive, seed = prob
    img, cost = _fixture(h, w, d, seed)
    r = DIRS_16[dir_idx]
    gold = g.aggregate_one_path(cost, img, r, p1, p2, adaptive)
    ours = jagg.aggregate_one_path(
        jnp.asarray(cost, jnp.int32), jnp.asarray(img), r, p1, p2, adaptive)
    np.testing.assert_array_equal(np.asarray(ours).astype(np.int64), gold)


@given(problem())
@SET
def test_pallas_all_dirs_match_golden(prob):
    h, w, d, p1, p2, adaptive, seed = prob
    img, cost = _fixture(h, w, d, seed)
    gold = np.zeros_like(cost)
    for r in DIRS_16:
        gold += g.aggregate_one_path(cost, img, r, p1, p2, adaptive)
    ours = pagg.aggregate_paths(
        jnp.asarray(cost, jnp.uint8), jnp.asarray(img), DIRS_16, p1, p2,
        adaptive)
    np.testing.assert_array_equal(np.asarray(ours).astype(np.int64), gold)


@given(problem())
@SET
def test_cpp_matches_golden(prob):
    cpp = pytest.importorskip("golden.cpp_binding")
    try:
        cpp._load()
    except Exception:
        pytest.skip("g++ unavailable")
    h, w, d, p1, p2, adaptive, seed = prob
    img, cost = _fixture(h, w, d, seed)
    gold = np.zeros_like(cost)
    for r in DIRS_16:
        gold += g.aggregate_one_path(cost, img, r, p1, p2, adaptive)
    ours = cpp.aggregate_paths(cost, img, DIRS_16, p1, p2, adaptive)
    np.testing.assert_array_equal(ours, gold)


@given(st.integers(2, 30), st.integers(2, 30), st.integers(0, 2 ** 16))
@SET
def test_median_matches_golden(h, w, seed):
    rng = np.random.default_rng(seed)
    f = rng.normal(size=(h, w)).astype(np.float32)
    from fsgm_tpu.ops import extract as ext
    np.testing.assert_array_equal(
        np.asarray(ext.median_filter_3x3(jnp.asarray(f))),
        g.median_filter_3x3(f))


@given(st.integers(6, 40), st.integers(6, 40),
       st.sampled_from([4, 8, 16]), st.booleans(),
       st.integers(0, 2 ** 16))
@SET
def test_cost_tr_kernels_match_xla_builder(h, w, d, rr, seed):
    """Pallas cost builders (ops/pallas/cost_tr) == the golden-verified
    XLA builder for random shapes, both references (round 4)."""
    from fsgm_tpu.io.synthetic import random_dot_stereo
    from fsgm_tpu.ops.census import census_transform
    from fsgm_tpu.ops import cost as costmod
    from fsgm_tpu.ops.pallas import cost_tr

    il, ir, _ = random_dot_stereo(h, w, d, seed=seed)
    cl = census_transform(jnp.asarray(il), (5, 5))
    cr = census_transform(jnp.asarray(ir), (5, 5))
    ref = np.asarray(costmod.cost_volume_stereo_major(
        cl, cr, d, right_reference=rr))
    hp, wp = -(-h // 8) * 8, -(-w // 8) * 8
    got_h = np.asarray(cost_tr.cost_volume_hlw(cl, cr, d, 255, rr))
    assert (got_h[:h] == ref).all() and (got_h[h:] == 0).all()
    got_w = np.asarray(cost_tr.cost_volume_wlh(cl, cr, d, 255, rr))
    want = np.zeros((wp, d, hp), np.uint8)
    want[:w, :, :h] = ref.transpose(2, 1, 0)
    assert (got_w == want).all()


@given(st.integers(8, 40), st.sampled_from([3, 8, 16, 24, 32, 40]),
       st.integers(0, 2 ** 16))
@SET
def test_diag_min_matches_reference_shear(w, nl, seed):
    """extract_tr.diag_min_packed (the fused shear+min tree) == the
    plain sheared-argmin reference for random volumes incl. ties
    (round 4; the wrap-kill argument in its docstring, verified)."""
    import jax
    from jax.experimental import pallas as pl
    from fsgm_tpu.ops.pallas import extract_tr

    rng = np.random.default_rng(seed)
    v = rng.integers(0, 2 ** 20, (nl, w)).astype(np.int32)
    packed = (v << 8) | np.arange(nl, dtype=np.int32)[:, None]

    def kernel(p_ref, o_ref):
        o_ref[...] = extract_tr.diag_min_packed(p_ref[...], w)

    got = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, w), jnp.int32),
        interpret=True,
    )(jnp.asarray(packed))
    # reference: explicit shear with out-of-range -> KILL
    ref = np.full(w, extract_tr.KILL, np.int64)
    for x in range(w):
        for dd in range(nl):
            if x + dd < w:
                ref[x] = min(ref[x], packed[dd, x + dd])
    assert (np.asarray(got)[0] == ref).all()
