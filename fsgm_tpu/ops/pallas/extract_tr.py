"""Pallas TPU kernel: right-view WTA from the label-major S volume.

The S-volume trick d_R(y,x) = argmin_d S(y, x+d, d) (SURVEY.md §2.1
"LR-consistency") reads a diagonal of S.  The XLA realizations are the
extraction stage's dominant cost (tools/extbench.py, KITTI size, 2026-08-19:
take-along-axis gather 3.5 ms, pad+reshape skew on major S 4.0 ms — vs
wta 1.1 / subpixel 1.6 / lr 1.1 / median 0.9).

This kernel reads the label-major (H, L, W) volume the transposed-layout
sweeps already produce and computes the whole thing in one streaming pass:

  * the diagonal shear is FUSED into the min tree (diag_min_packed):
    each slice-halving level rolls only the top half of the shrinking
    tile by its offset, ~log2(L)x less lane-shuffle traffic than
    shear-then-reduce (the round-4 trace showed full-tile rolls
    dominating extraction);
  * positions x+d outside the true image width get s_invalid (pad-lane
    pre-mask) or the KILL sentinel (roll wrap, provably only elements
    whose output column would be negative);
  * argmin with smallest-index tie-break rides packed (S << 8 | d) —
    bit-identical to np.argmin on the s_invalid-filled diagonal
    (ops/extract.py::wta_right_from_s).

Also here: the fused stereo extraction kernel (WTA + subpixel
neighborhood + right-WTA + the paired half-sum merge in one pass of
label-major S) and the opt-in fused flow extraction kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fsgm_tpu.ops.pallas.aggregate_pallas import _interpret
from fsgm_tpu.ops.pallas.aggregate_tr import sub_min


KILL = 1 << 30   # wrap-killed element sentinel in diag_min_packed: must
                 # exceed every real packed value ((s_invalid<<8)|255)


def diag_min_packed(packed: jnp.ndarray, w: int) -> jnp.ndarray:
    """min_d packed[d, x+d] as a FUSED shear+min slice-halving tree.

    Invariant: after combining at sublane count n -> n/2 with shift
    n/2, H[j][x] = min over the processed d-bits of packed[j+b, x+b].
    Each level rolls only the top HALF of the current tile by n/2, so
    total lane-shuffle traffic is W*(L-1) elements — ~log2(L)x less
    than the shear-then-reduce form (7 full-tile rolls at L=128, which
    the round-4 trace showed dominating the extraction kernel).

    Wrapped lanes [W-q, W) after each roll are killed with KILL: a
    wrapped element's final output column x = x' - d would be negative
    (its remaining shift exceeds its current lane), so no valid result
    is lost — and d=0 never rolls, so every real column keeps its
    golden tie-break witness.  Exactness vs the unfused shear is pinned
    by the parity tests (tests/unit/test_extract_major.py).

    Non-power-of-2 label counts use sub_min's OVERLAPPED halving
    (a = ceil(n/2), 8-aligned above vreg height): combining j with
    j + q at shift q = n - a preserves the invariant for any a >= q,
    and duplicate coverage is harmless for a min."""
    h = packed
    n = h.shape[0]
    while n > 1:
        if n > 8:
            a = -(-(-(-n // 2)) // 8) * 8
        else:
            a = -(-n // 2)
        q = n - a
        rolled = pltpu.roll(h[q:n], (-q) % w, 1)
        lane_h = jax.lax.broadcasted_iota(jnp.int32, rolled.shape, 1)
        rolled = jnp.where(lane_h >= w - q, KILL, rolled)
        h = jnp.minimum(h[:a], rolled)
        n = a
    return h                                   # (1, W)


def _rwta_row(v: jnp.ndarray, sub, lane, nl: int, w: int, w_true: int,
              s_invalid: int) -> jnp.ndarray:
    """(L, W) int32 S row -> (1, W) right-WTA disparity.  Source lanes
    past the true width carry s_invalid WITH their d (golden tie rule:
    an all-invalid column yields d=0)."""
    v = jnp.where(lane >= w_true, s_invalid, v)
    packed = (v << 8) | sub                    # tie -> smallest d
    return diag_min_packed(packed, w) & 255


def _make_rwta_kernel(nl: int, w: int, w_true: int, rb: int,
                      s_invalid: int):
    def kernel(s_ref, o_ref):
        sub = jax.lax.broadcasted_iota(jnp.int32, (nl, w), 0)   # d
        lane = jax.lax.broadcasted_iota(jnp.int32, (nl, w), 1)  # x
        for r in range(rb):
            v = s_ref[r].astype(jnp.int32)                      # (L, W)
            o_ref[r] = _rwta_row(v, sub, lane, nl, w, w_true,
                                 s_invalid)

    return kernel


BIG = 1 << 24   # out-of-range neighborhood sentinel (ops/extract.py::
                # neighborhood_of_min contract: callers gate on interior)


def _round_disp(d, s_m, s_0, s_p, nl: int, with_sub: bool):
    """rint(subpixel-refined d) — the index lr_check gathers at —
    replicated bit-exactly from ops/extract.py::subpixel_from_neighborhood
    + jnp.rint: every pre-division value is an exact integer in f32
    (|S| < 2^24), so div/clip/add/rint are deterministic regardless of
    fusion and the in-kernel result matches the XLA path bit-for-bit."""
    if not with_sub:
        return d
    fm, f0, fp = (x.astype(jnp.float32) for x in (s_m, s_0, s_p))
    denom = fm - 2.0 * f0 + fp
    ok = (d > 0) & (d < nl - 1) & (denom > 0.0)
    off = jnp.where(ok, (fm - fp) / jnp.maximum(2.0 * denom, 1e-12), 0.0)
    off = jnp.clip(off, -0.5, 0.5)
    disp = d.astype(jnp.float32) + jnp.where(ok, off, 0.0)
    return jax.lax.round(
        disp, jax.lax.RoundingMethod.TO_NEAREST_EVEN).astype(jnp.int32)


def _lr_valid_row(dr, rho, sub, lane, nl: int, w: int, max_diff: int):
    """(1, W) LR validity: |dr(x) - rho(x - dr(x))| <= max_diff, x >= dr.

    The gather rho(x - dr(x)) rides the STRIDED roll: broadcasting the
    right-WTA row over sublanes and rolling lane x of sublane l by l
    (stride=1 — per-vreg shift spread is 7, within Mosaic's limit; the
    roll needs a 128-aligned width, so the row is lane-padded in VMEM
    first) yields g[l, x] = rho[x - l]; a one-hot select at l = dr(x) is
    the gather.  Replaces the 128-iteration XLA shift-select loop
    (ops/extract.py::lr_check, ~0.33 ms/frame at KITTI — VERDICT r5 #3).
    Wrapped lanes (x < l) are discarded by the x >= dr mask."""
    wa = -(-w // 128) * 128
    if wa == w:
        g = pltpu.roll(jnp.broadcast_to(rho, (nl, w)), 0, 1,
                       stride=1, stride_axis=0)
        gsel = sub_min(jnp.where(sub == dr, g, KILL))
    else:
        # run the whole select at the aligned width and slice only the
        # (1, wa) result — slicing the (nl, wa) sheared plane itself
        # would be a full relayout copy per row
        rho_a = jnp.concatenate(
            [rho, jnp.zeros((1, wa - w), rho.dtype)], axis=1)
        dr_a = jnp.concatenate(
            [dr, jnp.full((1, wa - w), -1, dr.dtype)], axis=1)
        sub_a = jax.lax.broadcasted_iota(jnp.int32, (nl, wa), 0)
        g = pltpu.roll(jnp.broadcast_to(rho_a, (nl, wa)), 0, 1,
                       stride=1, stride_axis=0)
        gsel = sub_min(jnp.where(sub_a == dr_a, g, KILL))[:, :w]
    return ((jnp.abs(dr - gsel) <= max_diff)
            & (lane[:1] >= dr)).astype(jnp.int32)


def _make_extract_kernel(nl: int, w: int, w_true: int, rb: int,
                         s_invalid: int, with_sub: bool, with_rwta: bool,
                         paired: int | bool = False,
                         with_lr: int | None = None):
    """Fused stereo extraction on label-major S: per row, ONE read of the
    (L, W) block computes packed WTA (argmin + S[d*], smallest-index
    tie-break), the one-hot S[d*-1]/S[d*+1] neighborhood for subpixel, and
    the sheared right-WTA — everything the volume is needed for, so the
    pipeline never transposes S to the minor layout at all.

    paired: the volume arrives as TWO half-sums (vertical-family S and
    the transposed horizontal-family S) merged here with one in-VMEM add
    — the round-4 trace showed the materialized XLA merge (slice + add,
    two full-volume passes) costing ~0.9 ms/frame at KITTI size.  The
    second half may carry lane pad (paired = its block width w2 >= w;
    Mosaic requires whole-dim blocks, so the pad is sliced off IN VMEM
    after the load, never in HBM).

    with_lr (int max_diff, requires with_rwta): fold the LR-consistency
    check in too — the right-WTA row never leaves the kernel; the output
    is the (1, W) validity row instead (round-5; see _lr_valid_row)."""
    w2 = paired if paired else w

    def kernel(*refs):
        if paired:
            s_ref, s2_ref, *o_refs = refs
        else:
            s_ref, *o_refs = refs
        it = iter(o_refs)
        d_ref = next(it)
        if with_sub:
            sm_ref, s0_ref, sp_ref = next(it), next(it), next(it)
        if with_rwta:
            r_ref = next(it)
        sub = jax.lax.broadcasted_iota(jnp.int32, (nl, w), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (nl, w), 1)
        for r in range(rb):
            # NOTE: lane-pad columns [w_true, w) need no masking for the
            # column-local outputs (wta/neighborhood) — their results are
            # sliced off; the shear (the only cross-column op) masks its
            # own out-of-range sources below
            v = s_ref[r].astype(jnp.int32)                   # (L, W)
            if paired:
                v2 = s2_ref[r]
                if w2 != w:
                    v2 = v2[:, :w]
                v = v + v2.astype(jnp.int32)
            packed = (v << 8) | sub
            pm = sub_min(packed)                             # (1, W)
            d = pm & 255
            d_ref[r] = d
            s_m = s_0 = s_p = None
            if with_sub:
                s_0 = pm >> 8
                s_m = sub_min(jnp.where(sub == d - 1, v, BIG))
                s_p = sub_min(jnp.where(sub == d + 1, v, BIG))
                s0_ref[r], sm_ref[r], sp_ref[r] = s_0, s_m, s_p
            if with_rwta:
                rho = _rwta_row(v, sub, lane, nl, w, w_true, s_invalid)
                if with_lr is None:
                    r_ref[r] = rho
                else:
                    dr = _round_disp(d, s_m, s_0, s_p, nl, with_sub)
                    r_ref[r] = _lr_valid_row(dr, rho, sub, lane, nl, w,
                                             with_lr)

    return kernel


def extract_stereo_major(s_major: jnp.ndarray, s_invalid: int,
                         w_true: int | None = None,
                         with_sub: bool = True, with_rwta: bool = True,
                         row_block: int = 8,
                         s_major2: jnp.ndarray | None = None,
                         h_true: int | None = None,
                         with_lr: int | None = None):
    """(H, L, W) S -> (d_int, s_m, s_0, s_p, d_right), each
    (h_true, w_true) int32 (s_m/s_0/s_p None without with_sub; d_right
    None without with_rwta).  Bit-identical to ext.wta /
    ext.neighborhood_of_min / ext.wta_right_from_s on the transposed
    volume.  h_true: true row count when S carries the round-4 row pad
    (cost_tr row-padded pipeline); pad rows are computed (they ride the
    same grid) and sliced off with the lane pad.

    with_lr (int lr_max_diff; requires with_rwta): the LR check runs
    in-kernel on the strided-roll shear and the d_right slot of the
    return holds the (h_true, w_true) int32 VALIDITY plane instead
    (1 = keep, 0 = invalidate) — bit-identical to
    ext.lr_check(subpixel_from_neighborhood(...), wta_right_from_s(...))
    != INVALID on the same volume (the rint(subpixel) rounding is
    replicated exactly; see _round_disp).

    s_major2: optional second half-sum (the transposed horizontal-family
    S from aggregate_paths_tr(pair_out=True)) — may be LARGER than
    s_major (pad rows/lanes).  Mosaic only accepts whole-dim (or
    128-multiple) trailing blocks, so its BlockSpec covers the padded
    width and the kernel slices the pad off in VMEM before the add
    (see _make_extract_kernel); pad ROWS are simply never visited by
    the grid."""
    h, nl, w = s_major.shape
    if w_true is None:
        w_true = w
    if h_true is None:
        h_true = h
    assert ((s_invalid << 8) | 255) < KILL, s_invalid
    assert with_lr is None or with_rwta, "with_lr needs the right-WTA"
    rb = row_block if h % row_block == 0 else 1
    paired = s_major2.shape[2] if s_major2 is not None else False
    kernel = _make_extract_kernel(nl, w, w_true, rb, s_invalid,
                                  with_sub, with_rwta, paired, with_lr)
    n_out = 1 + (3 if with_sub else 0) + (1 if with_rwta else 0)
    spec = pl.BlockSpec((rb, 1, w), lambda i: (i, 0, 0))
    shape = jax.ShapeDtypeStruct((h, 1, w), jnp.int32)
    # the default 16 MB scoped-vmem limit OOMs at 4K (the double-buffered
    # (8, 128, 3840) i16 input block alone is 2x7.9 MB); same 96 MB limit
    # as the aggregation sweeps
    cp = pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)
    in_specs = [pl.BlockSpec((rb, nl, w), lambda i: (i, 0, 0))]
    args = (s_major,)
    if paired:
        h2, nl2, w2 = s_major2.shape
        assert h2 >= h and nl2 == nl and w2 >= w, (s_major2.shape,
                                                  s_major.shape)
        assert h2 == h or rb == 1, (h, h2, rb)
        in_specs.append(pl.BlockSpec((rb, nl, w2), lambda i: (i, 0, 0)))
        args = (s_major, s_major2)
    outs = pl.pallas_call(
        kernel, grid=(h // rb,),
        in_specs=in_specs,
        out_specs=[spec] * n_out, out_shape=[shape] * n_out,
        compiler_params=cp, interpret=_interpret(),
    )(*args)
    outs = [o[:h_true, 0, :w_true] for o in outs]
    it = iter(outs)
    d_int = next(it)
    s_m, s_0, s_p = ((next(it), next(it), next(it)) if with_sub
                     else (None, None, None))
    d_right = next(it) if with_rwta else None
    return d_int, s_m, s_0, s_p, d_right


def wta_right_major(s_major: jnp.ndarray, s_invalid: int,
                    w_true: int | None = None,
                    row_block: int = 8) -> jnp.ndarray:
    """(H, L, W) S (label-major, lane pad allowed past w_true) -> (H, W)
    int32 right-view disparity.  Bit-identical to
    ops/extract.py::wta_right_from_s on the transposed volume
    (tests/unit/test_extract_major.py)."""
    h, nl, w = s_major.shape
    if w_true is None:
        w_true = w
    assert ((s_invalid << 8) | 255) < KILL, s_invalid
    rb = row_block if h % row_block == 0 else 1
    kernel = _make_rwta_kernel(nl, w, w_true, rb, s_invalid)
    # the output rides a (h, 1, w) carrier: a bare (rb, w) block would
    # violate Mosaic's (8, 128)-divisible block rule whenever rb == 1
    out = pl.pallas_call(
        kernel, grid=(h // rb,),
        in_specs=[pl.BlockSpec((rb, nl, w), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((rb, 1, w), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((h, 1, w), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=_interpret(),
    )(s_major)
    return out[:, 0, :w_true]


# --------------------------------------------------------------------------
# Fused FLOW extraction: WTA + the six subpixel neighbor selections over
# the 2D label grid in ONE pass of label-major S (round 4)
# --------------------------------------------------------------------------

def _div_magic(e: int, max_l: int) -> tuple[int, int]:
    """(m, s) with (l*m)>>s == l//e for all l in [0, max_l] — vector
    integer division by the window extent without relying on Mosaic
    legalizing a non-power-of-2 divide."""
    for s in range(10, 28):
        m = -(-(1 << s) // e)            # ceil(2^s / e)
        if all((l * m) >> s == l // e for l in range(max_l + 1)):
            return m, s
    raise AssertionError(e)


def _make_flow_extract_kernel(nl: int, w: int, rb: int, extw: int,
                              with_sub: bool):
    """Per row, one read of the (L, W) block yields packed WTA (argmin
    label + value, smallest-label tie-break == jnp.argmin) and, with
    with_sub, value selections at the six CLIPPED neighbor labels the
    separable-parabola subpixel uses (models/flow.py::
    subpixel_flow_major's sel(base±1)/sel(base±extw) with iuc/ivc
    clipping reproduced bit-exactly).  No lane ops at all — the label
    axis rides sublanes, so everything is slice-halving trees and
    sublane masks."""
    m, sh = _div_magic(extw, nl - 1)

    def kernel(s_ref, *o_refs):
        it = iter(o_refs)
        l_ref = next(it)
        if with_sub:
            um_ref, u0_ref, up_ref = next(it), next(it), next(it)
            vm_ref, v0_ref, vp_ref = next(it), next(it), next(it)
        sub = jax.lax.broadcasted_iota(jnp.int32, (nl, w), 0)
        for r in range(rb):
            v = s_ref[r].astype(jnp.int32)                   # (L, W)
            packed = (v << 8) | sub
            pm = sub_min(packed)                             # (1, W)
            lab = pm & 255
            l_ref[r] = lab
            if with_sub:
                iv = (lab * m) >> sh
                iu = lab - iv * extw
                iuc = jnp.clip(iu, 1, extw - 2)
                ivc = jnp.clip(iv, 1, extw - 2)
                base_u = iv * extw + iuc
                base_v = ivc * extw + iu

                def sel(target, o_ref):
                    o_ref[r] = sub_min(jnp.where(sub == target, v, BIG))
                sel(base_u - 1, um_ref)
                sel(base_u, u0_ref)
                sel(base_u + 1, up_ref)
                sel(base_v - extw, vm_ref)
                sel(base_v, v0_ref)
                sel(base_v + extw, vp_ref)

    return kernel


def extract_flow_major(s_major: jnp.ndarray, extw: int,
                       with_sub: bool = True, row_block: int = 8):
    """(H, L, W) label-major flow S -> (l_int, (u_m, u_0, u_p),
    (v_m, v_0, v_p)), each (H, W) int32 (neighbor triples None without
    with_sub).  l_int bit-identical to jnp.argmin(s, axis=1); the
    triples bit-identical to subpixel_flow_major's six sel() label
    reductions — the XLA parabola/median stages consume them unchanged.
    Pad label planes (nl > extw^2) are never minimal by the cost-pad
    contract, same as the XLA argmin."""
    h, nl, w = s_major.shape
    assert nl <= 255, (nl, "labels must fit the 8-bit pack; use the "
                           "XLA reductions for larger label grids")
    rb = row_block if h % row_block == 0 else 1
    kernel = _make_flow_extract_kernel(nl, w, rb, extw, with_sub)
    n_out = 1 + (6 if with_sub else 0)
    spec = pl.BlockSpec((rb, 1, w), lambda i: (i, 0, 0))
    shape = jax.ShapeDtypeStruct((h, 1, w), jnp.int32)
    cp = pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)
    outs = pl.pallas_call(
        kernel, grid=(h // rb,),
        in_specs=[pl.BlockSpec((rb, nl, w), lambda i: (i, 0, 0))],
        out_specs=[spec] * n_out, out_shape=[shape] * n_out,
        compiler_params=cp, interpret=_interpret(),
    )(s_major)
    outs = [o[:, 0, :] for o in outs]
    if with_sub:
        return outs[0], tuple(outs[1:4]), tuple(outs[4:7])
    return outs[0], None, None
