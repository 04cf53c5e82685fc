"""C++ native oracle == NumPy oracle, bit-exact (SURVEY.md §4 golden tier).

Two independent implementations in different languages agreeing exactly is
the strongest correctness anchor available with the reference absent.
"""

import numpy as np
import pytest

from fsgm_tpu.params import SGMParams, DIRS_16, DIRS_8
from fsgm_tpu.io.synthetic import random_dot_stereo

import golden.sgm as g

cpp = pytest.importorskip("golden.cpp_binding")

try:
    cpp._load()
    HAVE_CPP = True
except Exception as e:  # toolchain missing
    HAVE_CPP = False

pytestmark = pytest.mark.skipif(not HAVE_CPP, reason="g++ build failed")


@pytest.fixture(scope="module")
def pair():
    return random_dot_stereo(40, 56, 16, seed=7)


@pytest.mark.parametrize("window", [(5, 5), (9, 7), (3, 3)])
def test_census_exact(pair, window):
    img_l, _, _ = pair
    np.testing.assert_array_equal(cpp.census_transform(img_l, window),
                                  g.census_transform(img_l, window))


def test_cost_volume_exact(pair):
    img_l, img_r, _ = pair
    cl, cr = g.census_transform(img_l), g.census_transform(img_r)
    np.testing.assert_array_equal(cpp.cost_volume_stereo(cl, cr, 16),
                                  g.cost_volume_stereo(cl, cr, 16))


@pytest.mark.parametrize("direction", DIRS_16)
@pytest.mark.parametrize("adaptive", [False, True])
def test_one_path_exact(pair, direction, adaptive):
    img_l, img_r, _ = pair
    cl, cr = g.census_transform(img_l), g.census_transform(img_r)
    cost = g.cost_volume_stereo(cl, cr, 16)
    np.testing.assert_array_equal(
        cpp.aggregate_one_path(cost, img_l, direction, 7, 60, adaptive),
        g.aggregate_one_path(cost, img_l, direction, 7, 60, adaptive),
        err_msg=f"dir={direction}")


def test_full_s_and_wta_exact(pair):
    img_l, img_r, _ = pair
    p = SGMParams(max_disp=16, p1=7, p2=60)
    cl, cr = g.census_transform(img_l), g.census_transform(img_r)
    cost = g.cost_volume_stereo(cl, cr, 16)
    s_cpp = cpp.aggregate_paths(cost, img_l, DIRS_8, 7, 60)
    s_np = g.aggregate_paths(cost, img_l, p)
    np.testing.assert_array_equal(s_cpp, s_np)
    np.testing.assert_array_equal(cpp.wta(s_cpp).astype(np.int64),
                                  g.wta(s_np))


def test_flow_cost_and_aggregation_exact(pair):
    """C++ flow primitives (warp cost + 2D-label aggregation) == NumPy."""
    import golden.flow as gf
    from fsgm_tpu.params import FlowParams
    img1, img2, _ = pair
    r = 3
    rng = np.random.default_rng(5)
    bu = rng.integers(-2, 3, img1.shape)
    bv = rng.integers(-2, 3, img1.shape)
    cen1 = g.census_transform(img1)
    cen2 = g.census_transform(img2)
    gold_c = gf.cost_volume_flow(cen1, cen2, bu, bv, r)
    cpp_c = cpp.cost_volume_flow(cen1, cen2, bu, bv, r)
    np.testing.assert_array_equal(cpp_c, gold_c)

    p = FlowParams(search_radius=r, p1=7, p2=60)
    gold_s = gf.aggregate_paths_flow(gold_c, img1, p)
    cpp_s = cpp.aggregate_paths_2d(gold_c, img1, r, DIRS_8, 7, 60)
    np.testing.assert_array_equal(cpp_s, gold_s)
