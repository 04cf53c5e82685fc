"""Label-MAJOR extraction parity (ops/extract.py *_major functions).

The transposed aggregation backend keeps S in (H, L, W); extraction must be
bit-identical to the minor-layout functions on the transposed volume
(SURVEY.md §2.1 rows "WTA + subpixel", "LR-consistency" — same capability,
second layout).  Pipeline-level: stereo_sgm(pallas_tr) with major extraction
(the default) must stay bit-exact vs the XLA backend and vs minor
extraction (FSGM_EXTRACT_MAJOR=0).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fsgm_tpu.params import SGMParams
from fsgm_tpu.io.synthetic import random_dot_stereo
from fsgm_tpu.ops import extract as ext


def _s_volume(h=30, w=47, nl=16, seed=3, dtype=np.int16):
    rng = np.random.default_rng(seed)
    hi = 20000 if dtype == np.int16 else 1 << 22
    return rng.integers(0, hi, size=(h, nl, w)).astype(dtype)


@pytest.mark.parametrize("dtype", [np.int16, np.int32])
def test_wta_major_matches_minor(dtype):
    s_major = jnp.asarray(_s_volume(dtype=dtype))
    s_minor = jnp.transpose(s_major, (0, 2, 1))
    np.testing.assert_array_equal(np.asarray(ext.wta_major(s_major)),
                                  np.asarray(ext.wta(s_minor)))


@pytest.mark.parametrize("nl", [8, 16, 81])
def test_subpixel_major_matches_minor(nl):
    s_major = jnp.asarray(_s_volume(nl=nl, dtype=np.int32))
    s_minor = jnp.transpose(s_major, (0, 2, 1))
    d = ext.wta(s_minor)
    np.testing.assert_array_equal(
        np.asarray(ext.subpixel_refine_major(s_major, d)),
        np.asarray(ext.subpixel_refine(s_minor, d)))


@pytest.mark.parametrize("nl,w", [(16, 47), (16, 16), (8, 130), (64, 40)])
def test_wta_right_major_matches_minor(nl, w):
    # nl > w exercises windows where every x+d is out of range for high d
    s_major = jnp.asarray(_s_volume(h=22, w=w, nl=nl, seed=nl + w,
                                    dtype=np.int32))
    s_minor = jnp.transpose(s_major, (0, 2, 1))
    s_invalid = 1 << 23
    np.testing.assert_array_equal(
        np.asarray(ext.wta_right_from_s_major(s_major, s_invalid)),
        np.asarray(ext.wta_right_from_s(s_minor, s_invalid)))


def test_flow_pipeline_major_extraction_exact(monkeypatch):
    """flow_fsgm(pallas_tr): major extraction (default) == minor == xla,
    through the fwd/bwd lockstep driver and fb_check."""
    from fsgm_tpu.params import FlowParams
    from fsgm_tpu.io.synthetic import constant_flow_pair
    from fsgm_tpu.models import flow as fl

    img1, img2, _ = constant_flow_pair(48, 64, u=2, v=-1, seed=5)
    p = FlowParams(levels=2, search_radius=2)
    i1, i2 = jnp.asarray(img1), jnp.asarray(img2)
    ref_f, ref_v = fl.flow_fsgm(i1, i2, p, backend="xla")
    monkeypatch.setenv("FSGM_EXTRACT_MAJOR", "1")
    got_f, got_v = fl.flow_fsgm(i1, i2, p, backend="pallas_tr")
    np.testing.assert_array_equal(np.asarray(got_f), np.asarray(ref_f))
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(ref_v))
    monkeypatch.setenv("FSGM_EXTRACT_MAJOR", "0")
    got_f0, got_v0 = fl.flow_fsgm(i1, i2, p, backend="pallas_tr")
    np.testing.assert_array_equal(np.asarray(got_f0), np.asarray(ref_f))
    np.testing.assert_array_equal(np.asarray(got_v0), np.asarray(ref_v))


@pytest.mark.parametrize("lr_mode", ["s_trick", "reagg"])
def test_stereo_pipeline_major_extraction_exact(monkeypatch, lr_mode):
    """stereo_sgm(pallas_tr): major extraction (default) == minor == xla."""
    img_l, img_r, _ = random_dot_stereo(40, 56, 16, seed=11)
    p = SGMParams(max_disp=16, p1=7, p2=60, lr_mode=lr_mode)
    il, ir = jnp.asarray(img_l), jnp.asarray(img_r)

    from fsgm_tpu.models import stereo as st
    ref = np.asarray(st.stereo_sgm(il, ir, p, backend="xla"))
    monkeypatch.setenv("FSGM_EXTRACT_MAJOR", "1")
    got_major = np.asarray(st.stereo_sgm(il, ir, p, backend="pallas_tr"))
    monkeypatch.setenv("FSGM_EXTRACT_MAJOR", "0")
    got_minor = np.asarray(st.stereo_sgm(il, ir, p, backend="pallas_tr"))
    np.testing.assert_array_equal(got_major, ref)
    np.testing.assert_array_equal(got_minor, ref)


@pytest.mark.parametrize("h,w,nl,wp", [(30, 47, 16, 47), (16, 40, 8, 48),
                                       (24, 56, 32, 64), (15, 33, 64, 40)])
def test_wta_right_major_pallas_matches_minor(h, w, nl, wp):
    """The Pallas shear right-WTA kernel (ops/pallas/extract_tr.py) must be
    bit-identical to the XLA S-trick gather, including lane-padded inputs
    and odd row counts (rb=1 fallback)."""
    from fsgm_tpu.ops.pallas.extract_tr import wta_right_major
    s_invalid = 30000
    rng = np.random.default_rng(h * w)
    s = rng.integers(0, 2900, size=(h, w, nl)).astype(np.int16)
    ref = ext.wta_right_from_s(jnp.asarray(s), s_invalid)
    s_major = jnp.transpose(jnp.asarray(s), (0, 2, 1))
    if wp > w:
        s_major = jnp.pad(s_major, ((0, 0), (0, 0), (0, wp - w)))
    got = wta_right_major(s_major, s_invalid, w_true=w)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("with_sub,with_rwta", [(True, True), (True, False),
                                                (False, True)])
def test_extract_stereo_major_kernel_parity(with_sub, with_rwta):
    """The fused extraction kernel's outputs (WTA, subpixel neighborhood,
    sheared right-WTA) must each be bit-identical to the XLA minor-layout
    functions they replace."""
    from fsgm_tpu.ops.pallas.extract_tr import extract_stereo_major
    s_invalid = 30000
    rng = np.random.default_rng(42)
    s = rng.integers(0, 2900, size=(30, 47, 16)).astype(np.int16)
    sj = jnp.asarray(s)
    s_major = jnp.transpose(sj, (0, 2, 1))
    d_int, s_m, s_0, s_p, d_r = extract_stereo_major(
        s_major, s_invalid, with_sub=with_sub, with_rwta=with_rwta)
    d_ref = ext.wta(sj)
    np.testing.assert_array_equal(np.asarray(d_int), np.asarray(d_ref))
    if with_sub:
        rm, r0, rp = ext.neighborhood_of_min(sj, d_ref)
        np.testing.assert_array_equal(np.asarray(s_m), np.asarray(rm))
        np.testing.assert_array_equal(np.asarray(s_0), np.asarray(r0))
        np.testing.assert_array_equal(np.asarray(s_p), np.asarray(rp))
    else:
        assert s_m is None and s_0 is None and s_p is None
    if with_rwta:
        np.testing.assert_array_equal(
            np.asarray(d_r),
            np.asarray(ext.wta_right_from_s(sj, s_invalid)))
    else:
        assert d_r is None


@pytest.mark.parametrize("with_sub,w", [(True, 64), (False, 64),
                                        (True, 128)])
def test_extract_in_kernel_lr_parity(with_sub, w):
    """with_lr: the in-kernel LR validity plane (strided-roll shear
    gather + the replicated rint(subpixel) rounding, round 5) must be
    bit-identical to the XLA chain it replaces:
    lr_check(subpixel_from_neighborhood(...), wta_right_from_s(...)).
    w=64 exercises the unaligned-width lane pad inside the kernel."""
    from fsgm_tpu.ops.pallas.extract_tr import extract_stereo_major
    s_invalid = 30000
    rng = np.random.default_rng(w + with_sub)
    h, nl = 24, 32
    s = rng.integers(0, 2900, size=(h, w, nl)).astype(np.int16)
    sj = jnp.asarray(s)
    s_major = jnp.transpose(sj, (0, 2, 1))
    d_int, s_m, s_0, s_p, lrv = extract_stereo_major(
        s_major, s_invalid, with_sub=with_sub, with_rwta=True, with_lr=1)
    d_ref = ext.wta(sj)
    disp = (ext.subpixel_refine(sj, d_ref) if with_sub
            else d_ref.astype(jnp.float32))
    d_right = ext.wta_right_from_s(sj, s_invalid)
    want_valid = np.asarray(ext.lr_check(disp, d_right, 1, nl)) != -1.0
    np.testing.assert_array_equal(np.asarray(lrv) != 0, want_valid)


def test_full_pipeline_in_kernel_lr(monkeypatch):
    """stereo_sgm end-to-end with the in-kernel LR (the round-5 default)
    vs the pinned XLA lr_check path — identical fields."""
    from fsgm_tpu.models.stereo import stereo_sgm
    img_l, img_r, _ = random_dot_stereo(40, 56, 16, seed=11)
    p = SGMParams(max_disp=16, p1=7, p2=60)
    monkeypatch.delenv("FSGM_EXTRACT_MAJOR", raising=False)
    monkeypatch.setenv("FSGM_EXTRACT", "kernel")
    monkeypatch.setenv("FSGM_LR", "kernel")
    ours = np.asarray(stereo_sgm(jnp.asarray(img_l), jnp.asarray(img_r),
                                 p, "pallas_tr"))
    monkeypatch.setenv("FSGM_LR", "xla")
    ref = np.asarray(stereo_sgm(jnp.asarray(img_l), jnp.asarray(img_r),
                                p, "pallas_tr"))
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("lr_mode", ["s_trick", "reagg"])
def test_full_pipeline_kernel_extraction(monkeypatch, lr_mode):
    """stereo_sgm with the fused-kernel extraction mode (the pallas_tr
    default) end-to-end vs golden and vs the minor-layout extraction."""
    import golden.sgm as g
    from fsgm_tpu.models.stereo import stereo_sgm
    img_l, img_r, _ = random_dot_stereo(40, 56, 16, seed=7)
    p = SGMParams(max_disp=16, p1=7, p2=60, lr_mode=lr_mode)
    gold = g.sgm_stereo(img_l, img_r, p)
    monkeypatch.delenv("FSGM_EXTRACT_MAJOR", raising=False)
    monkeypatch.setenv("FSGM_EXTRACT", "kernel")
    ours = np.asarray(stereo_sgm(jnp.asarray(img_l), jnp.asarray(img_r),
                                 p, "pallas_tr"))
    np.testing.assert_array_equal(ours < 0, gold < 0)
    both = ours >= 0
    np.testing.assert_allclose(ours[both], gold[both], atol=1e-3)
    monkeypatch.setenv("FSGM_EXTRACT", "minor")
    minor = np.asarray(stereo_sgm(jnp.asarray(img_l), jnp.asarray(img_r),
                                  p, "pallas_tr"))
    np.testing.assert_array_equal(ours, minor)
