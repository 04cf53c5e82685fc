"""Transposed-layout (labels-on-sublanes) kernel parity vs golden.

SURVEY.md §4 unit tier, applied to the second-generation aggregation
backend (ops/pallas/aggregate_tr.py): bit-identical S for every direction
family, both path sets, adaptive P2, odd sizes, the row-blocked grid, and
the 2D flow label space with sublane pad planes.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fsgm_tpu.params import SGMParams, DIRS_8, DIRS_16
from fsgm_tpu.io.synthetic import random_dot_stereo
from fsgm_tpu.ops.pallas import aggregate_tr as ptr
from fsgm_tpu.ops import cost as jcost

import golden.sgm as g


def _volume(h=40, w=56, d=16, seed=7):
    img_l, img_r, _ = random_dot_stereo(h, w, d, seed=seed)
    p = SGMParams(max_disp=d, p1=7, p2=60)
    cen_l = g.census_transform(img_l, p.census_window)
    cen_r = g.census_transform(img_r, p.census_window)
    cost = g.cost_volume_stereo(cen_l, cen_r, p.max_disp, p.invalid_cost)
    return img_l, img_r, cost


@pytest.fixture(scope="module")
def volume():
    return _volume()


@pytest.mark.parametrize("n", [1, 3, 8, 16, 24, 81, 88, 128])
def test_sub_min_exact(n):
    rng = np.random.default_rng(n)
    v = rng.integers(0, 1 << 20, size=(n, 13), dtype=np.int32)
    got = np.asarray(ptr.sub_min(jnp.asarray(v)))
    np.testing.assert_array_equal(got[0], v.min(axis=0))


@pytest.mark.parametrize("right_ref", [False, True])
def test_major_cost_builders_match_minor(volume, right_ref):
    img_l, img_r, _ = volume
    d = 16
    from fsgm_tpu.ops.census import census_transform
    cl = census_transform(jnp.asarray(img_l), (5, 5))
    cr = census_transform(jnp.asarray(img_r), (5, 5))
    if right_ref:
        ref = jcost.cost_volume_stereo_right(cl, cr, d, 255)
    else:
        ref = jcost.cost_volume_stereo(cl, cr, d, 255)
    ref = np.asarray(ref)
    hlw = np.asarray(jcost.cost_volume_stereo_major(cl, cr, d, 255,
                                                    right_ref))
    wlh = np.asarray(jcost.cost_volume_stereo_major_cols(cl, cr, d, 255,
                                                         right_ref))
    np.testing.assert_array_equal(hlw.transpose(0, 2, 1), ref)
    np.testing.assert_array_equal(wlh.transpose(2, 0, 1), ref)


@pytest.mark.parametrize("dirs", [
    [(1, 0)], [(1, 1)], [(1, -1)], [(-1, 0)], [(-1, 1)], [(-1, -1)],
    [(0, 1)], [(0, -1)],
    [(1, 2)], [(1, -2)], [(2, 1)], [(2, -1)],
    [(-1, 2)], [(-2, -1)],
])
@pytest.mark.parametrize("adaptive", [False, True])
def test_single_direction_exact(volume, dirs, adaptive):
    img, _, cost = volume
    p1, p2 = 7, 60
    gold = np.zeros_like(cost)
    for r in dirs:
        gold += g.aggregate_one_path(cost, img, r, p1, p2, adaptive)
    cost_hlw = jnp.asarray(cost.transpose(0, 2, 1), dtype=jnp.uint8)
    ours = ptr.aggregate_paths_tr(cost_hlw, jnp.asarray(img), dirs,
                                  p1, p2, adaptive)
    np.testing.assert_array_equal(np.asarray(ours).astype(np.int64), gold,
                                  err_msg=f"dirs={dirs}")


@pytest.mark.parametrize("dirset", [DIRS_8, DIRS_16])
@pytest.mark.parametrize("adaptive", [False, True])
def test_full_pathset_exact(volume, dirset, adaptive):
    img, _, cost = volume
    p1, p2 = 7, 60
    gold = np.zeros_like(cost)
    for r in dirset:
        gold += g.aggregate_one_path(cost, img, r, p1, p2, adaptive)
    s_max = len(dirset) * (255 + p2)
    cost_hlw = jnp.asarray(cost.transpose(0, 2, 1), dtype=jnp.uint8)
    ours = ptr.aggregate_paths_tr(cost_hlw, jnp.asarray(img), dirset,
                                  p1, p2, adaptive, s_max=s_max)
    np.testing.assert_array_equal(np.asarray(ours).astype(np.int64), gold)


@pytest.mark.parametrize("h,w,d", [
    (40, 56, 16),     # h % 8 == 0: the row-blocked (rb=8) vertical grid
    (37, 53, 16),     # odd everything: rb falls back to 1, lane pads
    (33, 41, 8),
])
def test_odd_and_blocked_shapes_exact(h, w, d):
    img, _, cost = _volume(h, w, d, seed=h * w)
    p1, p2 = 7, 100
    gold = np.zeros_like(cost)
    for r in DIRS_8:
        gold += g.aggregate_one_path(cost, img, r, p1, p2, True)
    cost_hlw = jnp.asarray(cost.transpose(0, 2, 1), dtype=jnp.uint8)
    ours = ptr.aggregate_paths_tr(cost_hlw, jnp.asarray(img), DIRS_8,
                                  p1, p2, True,
                                  s_max=8 * (255 + p2))
    np.testing.assert_array_equal(np.asarray(ours).astype(np.int64), gold)


def test_flow_labels_2d_with_pad_planes_exact():
    """2D label grid on sublanes, label count padded to a multiple of 8
    (81 -> 88 pad planes of invalid cost): bit-exact vs golden flow
    aggregation over the real 81 labels."""
    import golden.flow as gf
    from fsgm_tpu.params import FlowParams

    rng = np.random.default_rng(11)
    img1 = rng.integers(0, 256, size=(24, 40), dtype=np.uint8)
    img2 = np.roll(img1, (1, -2), axis=(0, 1))
    p = FlowParams(search_radius=2, levels=1, p1=7, p2=60)
    ext = 2 * p.search_radius + 1
    cen1 = g.census_transform(img1, p.census_window)
    cen2 = g.census_transform(img2, p.census_window)
    zero = np.zeros(img1.shape, dtype=np.int64)
    gold_cost = gf.cost_volume_flow(cen1, cen2, zero, zero, p.search_radius)
    gold_s = gf.aggregate_paths_flow(gold_cost, img1, p)

    from fsgm_tpu.ops.census import census_transform
    nd_pad = -(-ext * ext // 8) * 8
    cost_maj = jcost.cost_volume_flow_major(
        census_transform(jnp.asarray(img1), p.census_window),
        census_transform(jnp.asarray(img2), p.census_window),
        jnp.zeros(img1.shape, jnp.int32), jnp.zeros(img1.shape, jnp.int32),
        p.search_radius, p.invalid_cost, nd_pad=nd_pad)
    s = ptr.aggregate_paths_tr(cost_maj, jnp.asarray(img1), DIRS_8,
                               p.p1, p.p2, p.adaptive_p2, label_ext=ext,
                               s_max=len(DIRS_8) * (255 + p.p2))
    np.testing.assert_array_equal(
        np.asarray(s)[:, :, :ext * ext].astype(np.int64), gold_s)


@pytest.mark.parametrize("lr_mode", ["s_trick", "reagg"])
def test_full_pipeline_tr_backend(volume, lr_mode):
    """stereo_sgm(backend='pallas_tr') end-to-end vs golden: invalid
    pattern exact, valid disparities within float tolerance."""
    from fsgm_tpu.models.stereo import stereo_sgm
    img_l, img_r, _ = volume
    p = SGMParams(max_disp=16, p1=7, p2=60, lr_mode=lr_mode)
    gold = g.sgm_stereo(img_l, img_r, p)
    ours = np.asarray(stereo_sgm(jnp.asarray(img_l), jnp.asarray(img_r),
                                 p, "pallas_tr"))
    np.testing.assert_array_equal(ours < 0, gold < 0)
    both = ours >= 0
    np.testing.assert_allclose(ours[both], gold[both], atol=1e-3)


@pytest.mark.parametrize("dirset,label_ext", [(DIRS_8, None), (DIRS_16, None)])
@pytest.mark.parametrize("adaptive", [False, True])
def test_dual_family_matches_single(volume, dirset, label_ext, adaptive):
    """The fused dual-family launch (down chain on block i, up chain on
    block n-1-i, one pallas_call) must be bit-identical to two sequential
    tr_family_sweep passes over the same volume."""
    img, _, cost = volume
    p1, p2 = 7, 60
    cost_hlw = jnp.asarray(cost.transpose(0, 2, 1), dtype=jnp.uint8)
    down = [r for r in dirset if r[0] > 0]
    up = [r for r in dirset if r[0] < 0]
    from fsgm_tpu.ops.pallas.aggregate_pallas import plan_dtypes
    s_dtype, _ = plan_dtypes(p2, len(dirset) * (255 + p2))
    dual = ptr.tr_dual_family_sweep(cost_hlw, jnp.asarray(img), down, up,
                                    p1, p2, adaptive, s_dtype, label_ext)
    single = jnp.zeros(cost_hlw.shape, s_dtype)
    single = ptr.tr_family_sweep(cost_hlw, jnp.asarray(img), down, p1, p2,
                                 adaptive, single, label_ext)
    single = ptr.tr_family_sweep(cost_hlw, jnp.asarray(img), up, p1, p2,
                                 adaptive, single, label_ext)
    np.testing.assert_array_equal(np.asarray(dual), np.asarray(single))


@pytest.mark.parametrize("family", [[(1, 0), (1, 1), (1, -1)],
                                    [(-1, 0), (-1, 2), (-2, 1)]])
def test_carry_seam_continuation_exact(family):
    """Split the image into two row bands; sweeping the second with the
    first's exported carry must equal the unsplit sweep (the tiled
    wavefront contract, transposed edition)."""
    img, _, cost = _volume(32, 40, 16, seed=5)
    p1, p2 = 7, 60
    gold = np.zeros_like(cost)
    for r in family:
        gold += g.aggregate_one_path(cost, img, r, p1, p2, False)

    cost_t = cost.transpose(0, 2, 1).astype(np.uint8)
    h = cost.shape[0]
    cut = 16
    reverse = family[0][0] < 0
    # canonical processing order: reverse families scan bottom-up, so the
    # "first" band is the bottom one
    if reverse:
        first = slice(cut, h)
        second = slice(0, cut)
    else:
        first = slice(0, cut)
        second = slice(cut, h)
    sa, carry = ptr.tr_family_sweep(
        jnp.asarray(cost_t[first]), jnp.asarray(img[first]), family,
        p1, p2, False, jnp.zeros_like(jnp.asarray(cost_t[first]),
                                      dtype=jnp.int32),
        return_carry=True)
    sb = ptr.tr_family_sweep(
        jnp.asarray(cost_t[second]), jnp.asarray(img[second]), family,
        p1, p2, False, jnp.zeros_like(jnp.asarray(cost_t[second]),
                                      dtype=jnp.int32),
        init_carry=carry)
    got = np.zeros(cost.shape, np.int64)
    got[first] = np.asarray(sa).transpose(0, 2, 1)
    got[second] = np.asarray(sb).transpose(0, 2, 1)
    np.testing.assert_array_equal(got, gold)


@pytest.mark.parametrize("dirs", [DIRS_8, DIRS_16])
def test_carry32_scratch_matches(volume, dirs, monkeypatch):
    """FSGM_TR_CARRY32=1 (i32 carry scratch, no i16<->i32 conversions)
    must be bit-identical to the default i16 scratch, including across a
    tile seam (the EXTERNAL carry interface stays carry_dt)."""
    img, _, cost = volume
    p1, p2 = 7, 60
    cost_hlw = jnp.asarray(cost.transpose(0, 2, 1), dtype=jnp.uint8)
    base = ptr.aggregate_paths_tr(cost_hlw, jnp.asarray(img), dirs, p1, p2,
                                  False)
    monkeypatch.setenv("FSGM_TR_CARRY32", "1")
    got = ptr.aggregate_paths_tr(cost_hlw, jnp.asarray(img), dirs, p1, p2,
                                 False)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(base))
    # seam continuation: carry crosses the i32-scratch -> i16-interface
    # boundary and back
    fam = [r for r in dirs if r[0] > 0]
    h = cost_hlw.shape[0]
    cut = h // 2
    sa, carry = ptr.tr_family_sweep(
        cost_hlw[:cut], jnp.asarray(img[:cut]), fam, p1, p2, False,
        jnp.zeros_like(cost_hlw[:cut], dtype=jnp.int32), return_carry=True)
    sb = ptr.tr_family_sweep(
        cost_hlw[cut:], jnp.asarray(img[cut:]), fam, p1, p2, False,
        jnp.zeros_like(cost_hlw[cut:], dtype=jnp.int32), init_carry=carry)
    whole = ptr.tr_family_sweep(
        cost_hlw, jnp.asarray(img), fam, p1, p2, False,
        jnp.zeros_like(cost_hlw, dtype=jnp.int32))
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(sa), np.asarray(sb)]), np.asarray(whole))


@pytest.mark.parametrize("dirs", [DIRS_8, DIRS_16])
@pytest.mark.parametrize("adaptive", [False, True])
def test_mask_free_pads_exact(volume, dirs, adaptive):
    """Round-5 mask-free shifted directions: with >= max|dx| zero-cost
    pad lanes and w_true passed, the roll-without-mask kernel must be
    bit-identical on the real lanes to the masked kernel on the unpadded
    volume — for both path sets (dx up to 2) and adaptive P2 (nonzero
    p2e on the pad lanes exercises the in-kernel p2e zeroing)."""
    img, _, cost = volume
    p1, p2 = 7, 60
    h, w, nd = cost.shape
    cost_hlw = jnp.asarray(cost.transpose(0, 2, 1), dtype=jnp.uint8)
    base = ptr.aggregate_paths_tr(cost_hlw, jnp.asarray(img), dirs, p1,
                                  p2, adaptive, major_out=True)
    pad = 8  # > max|dx| = 2
    cost_p = jnp.pad(cost_hlw, ((0, 0), (0, 0), (0, pad)))
    img_p = jnp.pad(jnp.asarray(img), ((0, 0), (0, pad)), mode="edge")
    got = ptr.aggregate_paths_tr(cost_p, img_p, dirs, p1, p2, adaptive,
                                 major_out=True, w_true=w)
    np.testing.assert_array_equal(np.asarray(got)[:, :, :w],
                                  np.asarray(base))
