"""Pallas kernel parity vs the golden oracle (interpret mode on CPU).

SURVEY.md §4 unit tier: the fused family-sweep kernels must be bit-identical
to golden aggregation — integer math makes any indexing/carry bug a hard
mismatch.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fsgm_tpu.params import SGMParams, DIRS_8, DIRS_16
from fsgm_tpu.io.synthetic import random_dot_stereo
from fsgm_tpu.ops.pallas import aggregate_pallas as pagg

import golden.sgm as g


@pytest.fixture(scope="module")
def volume():
    img_l, img_r, _ = random_dot_stereo(40, 56, 16, seed=7)
    p = SGMParams(max_disp=16, p1=7, p2=60)
    cen_l = g.census_transform(img_l, p.census_window)
    cen_r = g.census_transform(img_r, p.census_window)
    cost = g.cost_volume_stereo(cen_l, cen_r, p.max_disp, p.invalid_cost)
    return img_l, cost


@pytest.mark.parametrize("dirs", [
    [(1, 0)], [(1, 1)], [(1, -1)], [(-1, 0)], [(-1, 1)], [(-1, -1)],
    [(0, 1)], [(0, -1)],
    [(1, 2)], [(1, -2)], [(2, 1)], [(2, -1)],
    [(-1, 2)], [(-2, -1)],
])
@pytest.mark.parametrize("adaptive", [False, True])
def test_single_direction_exact(volume, dirs, adaptive):
    img, cost = volume
    p1, p2 = 7, 60
    gold = np.zeros_like(cost)
    for r in dirs:
        gold += g.aggregate_one_path(cost, img, r, p1, p2, adaptive)
    ours = pagg.aggregate_paths(
        jnp.asarray(cost, dtype=jnp.uint8), jnp.asarray(img), dirs,
        p1, p2, adaptive)
    np.testing.assert_array_equal(np.asarray(ours).astype(np.int64), gold,
                                  err_msg=f"dirs={dirs}")


@pytest.mark.parametrize("dirset", [DIRS_8, DIRS_16])
@pytest.mark.parametrize("adaptive", [False, True])
def test_full_pathset_exact(volume, dirset, adaptive):
    img, cost = volume
    p1, p2 = 7, 60
    gold = np.zeros_like(cost)
    for r in dirset:
        gold += g.aggregate_one_path(cost, img, r, p1, p2, adaptive)
    s_max = len(dirset) * (255 + p2)
    ours = pagg.aggregate_paths(
        jnp.asarray(cost, dtype=jnp.uint8), jnp.asarray(img), dirset,
        p1, p2, adaptive, s_max=s_max)
    if len(dirset) == 8:
        assert ours.dtype == jnp.int16
    np.testing.assert_array_equal(np.asarray(ours).astype(np.int64), gold)


@pytest.mark.parametrize("w", [57, 61])
def test_odd_width_padding_exact(w):
    """W not a multiple of COL_BLOCK exercises the neutral zero-pad path."""
    img_l, img_r, _ = random_dot_stereo(24, w, 12, seed=5)
    p1, p2 = 7, 60
    cen_l = g.census_transform(img_l, (5, 5))
    cen_r = g.census_transform(img_r, (5, 5))
    cost = g.cost_volume_stereo(cen_l, cen_r, 12)
    gold = np.zeros_like(cost)
    for r in DIRS_16:
        gold += g.aggregate_one_path(cost, img_l, r, p1, p2, True)
    ours = pagg.aggregate_paths(
        jnp.asarray(cost, dtype=jnp.uint8), jnp.asarray(img_l), DIRS_16,
        p1, p2, True)
    np.testing.assert_array_equal(np.asarray(ours).astype(np.int64), gold)


@pytest.mark.parametrize("w", [1544, 3080])
def test_wide_image_x_chunking_exact(w):
    """W > X_CHUNK exercises the in-kernel x-chunked row sweep (the 4K
    path) including the aligned border-block shifts in both directions."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (6, w), dtype=np.uint8)
    cost = rng.integers(0, 64, (6, w, 8)).astype(np.int64)
    p1, p2 = 7, 60
    dirs = [(1, -2), (1, 0), (1, 2), (-1, -1), (-1, 1), (2, 1), (-2, -1),
            (0, 1), (0, -1)]
    gold = np.zeros_like(cost)
    for r in dirs:
        gold += g.aggregate_one_path(cost, img, r, p1, p2, True)
    ours = pagg.aggregate_paths(
        jnp.asarray(cost, dtype=jnp.uint8), jnp.asarray(img), dirs,
        p1, p2, True)
    np.testing.assert_array_equal(np.asarray(ours).astype(np.int64), gold)


@pytest.mark.parametrize("family", [
    [(1, 0), (1, 1), (1, -1)],            # down, 8-path family
    [(-1, 0), (-1, 1), (-1, -1)],         # up
    [(1, 0), (1, 1), (1, -1), (1, 2), (1, -2), (2, 1), (2, -1)],  # 16-path
    [(-1, 0), (-1, 1), (-1, -1), (-1, 2), (-1, -2), (-2, 1), (-2, -1)],
])
@pytest.mark.parametrize("adaptive", [False, True])
def test_carry_capable_family_sweep_exact(volume, family, adaptive):
    """Two row tiles chained via init_carry/return_carry == one full sweep
    (the tiled-wavefront halo contract, SURVEY.md §3.5): the exported carry
    must seed the downstream tile bit-exactly, including knight-move
    2-deep carries and cross-seam adaptive P2."""
    img, cost = volume
    p1, p2 = 7, 60
    h = cost.shape[0]
    ht = h // 2
    gold = np.zeros_like(cost)
    for r in family:
        gold += g.aggregate_one_path(cost, img, r, p1, p2, adaptive)

    costp, imgp = pagg.pad_inputs(jnp.asarray(cost, dtype=jnp.uint8),
                                  jnp.asarray(img))
    wp, nd = imgp.shape[1], cost.shape[2]
    down = family[0][0] > 0
    s_dt, carry_dt = pagg.plan_dtypes(p2, len(family) * (255 + p2))
    units = pagg.carry_units(family)

    # reference: one full-height sweep (also exercises return_carry)
    s_full = jnp.zeros((h, wp, nd), s_dt)
    s_full, carry_full = pagg.row_family_sweep(
        costp, imgp, family, p1, p2, adaptive, s_full,
        return_carry=True)
    np.testing.assert_array_equal(
        np.asarray(s_full)[:, : cost.shape[1]].astype(np.int64), gold)
    assert carry_full.shape == (units, wp, nd)

    # tiled: upstream tile exports its carry, downstream imports it; the
    # upstream tile in the canonical frame is the TOP tile for the down
    # family and the BOTTOM tile for the up family.
    tiles = [(costp[:ht], imgp[:ht]), (costp[ht:], imgp[ht:])]
    order = (0, 1) if down else (1, 0)
    (c_a, i_a), (c_b, i_b) = tiles[order[0]], tiles[order[1]]
    s_a = jnp.zeros((ht, wp, nd), s_dt)
    s_a, carry = pagg.row_family_sweep(c_a, i_a, family, p1, p2, adaptive,
                                       s_a, return_carry=True)
    s_b = jnp.zeros((h - ht, wp, nd), s_dt)
    halo = (imgp[ht - 2: ht] if down else imgp[ht: ht + 2])
    s_b = pagg.row_family_sweep(
        c_b, i_b, family, p1, p2, adaptive, s_b, init_carry=carry,
        img_above2=halo if down else None,
        img_below2=None if down else halo)
    parts = (s_a, s_b) if down else (s_b, s_a)
    s_tiled = np.concatenate([np.asarray(parts[0]), np.asarray(parts[1])],
                             axis=0)
    np.testing.assert_array_equal(
        s_tiled[:, : cost.shape[1]].astype(np.int64), gold,
        err_msg=f"family={family} adaptive={adaptive}")


def test_full_pipeline_pallas_backend(volume):
    from fsgm_tpu.models.stereo import stereo_sgm
    img_l, img_r, _ = random_dot_stereo(40, 56, 16, seed=7)
    p = SGMParams(max_disp=16, p1=7, p2=60)
    gold = g.sgm_stereo(img_l, img_r, p)
    ours = np.asarray(stereo_sgm(jnp.asarray(img_l), jnp.asarray(img_r), p,
                                 "pallas"))
    np.testing.assert_array_equal(ours < 0, gold < 0)
    both = ours >= 0
    np.testing.assert_allclose(ours[both], gold[both], atol=1e-3)


@pytest.mark.parametrize("nd", [16, 128])
def test_wta_neighborhood_kernel_exact(nd):
    """Fused extraction kernel: argmin tie-break + neighbor selects match
    golden/XLA semantics exactly."""
    from fsgm_tpu.ops.pallas import extract_pallas
    rng = np.random.default_rng(11)
    s = rng.integers(0, 2840, (12, 40, nd)).astype(np.int16)
    s[3, 5, :] = 7  # force ties -> smallest d must win
    d_int, s_m, s_0, s_p = extract_pallas.wta_neighborhood(jnp.asarray(s))
    d_int = np.asarray(d_int)
    gold_d = np.argmin(s, axis=-1)
    np.testing.assert_array_equal(d_int, gold_d)
    s64 = s.astype(np.int64)
    yy, xx = np.meshgrid(np.arange(12), np.arange(40), indexing="ij")
    np.testing.assert_array_equal(np.asarray(s_0), s64[yy, xx, gold_d])
    interior = (gold_d > 0) & (gold_d < nd - 1)
    np.testing.assert_array_equal(
        np.asarray(s_m)[interior],
        s64[yy, xx, np.clip(gold_d - 1, 0, nd - 1)][interior])
    np.testing.assert_array_equal(
        np.asarray(s_p)[interior],
        s64[yy, xx, np.clip(gold_d + 1, 0, nd - 1)][interior])


@pytest.mark.parametrize("window", [(5, 5), (9, 7)])
def test_cost_kernel_exact(window):
    """Pallas shear-based cost builder == golden, incl. 2-word census."""
    from fsgm_tpu.ops.pallas import cost_pallas
    from fsgm_tpu.ops import census as jcensus
    img_l, img_r, _ = random_dot_stereo(24, 40, 16, seed=2)
    gold = g.cost_volume_stereo(g.census_transform(img_l, window),
                                g.census_transform(img_r, window), 16)
    ours = cost_pallas.cost_volume_stereo(
        jcensus.census_transform(jnp.asarray(img_l), window),
        jcensus.census_transform(jnp.asarray(img_r), window), 16)
    np.testing.assert_array_equal(np.asarray(ours).astype(np.int64), gold)


def test_full_pipeline_pallas_9x7_census():
    """9x7 census (62 bits, 2-word descriptors) through the whole Pallas
    stereo pipeline."""
    from fsgm_tpu.models.stereo import stereo_sgm
    img_l, img_r, _ = random_dot_stereo(40, 56, 16, seed=4)
    p = SGMParams(max_disp=16, p1=7, p2=60, census_window=(9, 7),
                  num_paths=16, adaptive_p2=True)
    gold = g.sgm_stereo(img_l, img_r, p)
    ours = np.asarray(stereo_sgm(jnp.asarray(img_l), jnp.asarray(img_r), p,
                                 "pallas"))
    np.testing.assert_array_equal(ours < 0, gold < 0)
    both = ours >= 0
    np.testing.assert_allclose(ours[both], gold[both], atol=1e-3)
