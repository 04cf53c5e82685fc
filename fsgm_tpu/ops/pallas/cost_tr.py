"""Pallas builders for the label-major stereo cost volumes (round 4).

The round-4 trace (tools/traceview.py, KITTI batch 16) showed the XLA
cost build is ~29% of device time: the 128-way concatenate runs at
134 GB/s (14.2 ms/dispatch), its 15 feeding hamming fusions at ~45% of
HBM peak (14.2 ms), plus the transpose to the column layout (4.2 ms)
and its pad (3.0 ms) — ~9x byte amplification to produce two 0.95 GB
volumes.  These kernels read the two census planes (~2 MB each) and
write each volume once.

Two very different shear structures (SURVEY.md §2.1 "Matching cost";
same values as ops/cost.py::cost_volume_stereo_major[_cols]):

* `cost_volume_wlh` — the column-scan (W', L, H') layout.  Scanning
  canonical rows x in order, the sheared census tile T[d, y] =
  cenR^T[x-d, y] obeys T_{x+1}[d] = T_x[d-1]: ONE sublane shift-down
  plus inserting row x+1 at sublane 0 per row — O(1) vector ops/row,
  no rolls at all.  The right-reference variant scans x in reverse
  (T[d] = cenL^T[x+d] shifts the same way under a reversed scan).
  Output is written PRE-PADDED with the neutral zero cost the family
  sweeps require (aggregate_tr.py "Both pads are NEUTRAL zero-cost
  regions"), so the XLA pad pass disappears too.

* `cost_volume_hlw` — the row-scan (H, L, W) layout.  Rows are
  independent; the Toeplitz access cenR[y, x-d] is a lane shear:
  log2(L) masked pltpu.roll passes (sublane bit k set -> roll lanes by
  2^k), the same binary-shear the fused extraction kernel uses for the
  right-WTA diagonal.  A/B'd against deriving this layout by one XLA
  transpose of the wlh volume (FSGM_COST_HLW).

Census descriptors are (H, W, words) u32; the 5x5 default is one word.
Multi-word windows loop words with a per-word shear state.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return os.environ.get("FSGM_PALLAS_INTERPRET", "0") == "1"


def _pad8(n: int) -> int:
    return -(-n // 8) * 8


# --------------------------------------------------------------------------
# (W', L, H') column-scan volume: incremental sublane shear
# --------------------------------------------------------------------------

def _make_wlh_kernel(nd: int, hp: int, h_true: int, w_true: int, rb: int,
                     words: int, invalid_cost: int, reverse: bool,
                     hp_frame: int | None = None):
    """Grid step i processes rb canonical rows.  t_ref (words*nd, hp)
    scratch carries the sheared match-census window across steps (the
    grid is sequential on TPU).  Garbage sublanes are exactly the ones
    the d<=x (resp. x+d<w) validity mask overwrites, so no scratch
    init is needed.  hp_frame: per-frame lane stride when the lane axis
    is a BATCH fold (B*Hp) — the h_true mask then applies per frame
    (the shear itself has no cross-lane ops, so folding is exact)."""
    if hp_frame is None:
        hp_frame = hp

    def kernel(n_steps: int):
        def body(cl_ref, cr_ref, out_ref, t_ref):
            i = pl.program_id(0)
            lane = jax.lax.broadcasted_iota(jnp.int32, (nd, hp), 1)
            if hp_frame != hp:
                lane = lane % hp_frame
            sub = jax.lax.broadcasted_iota(jnp.int32, (nd, hp), 0)
            rows = range(rb - 1, -1, -1) if reverse else range(rb)
            for r in rows:
                x = (n_steps - 1 - i) * rb + r if reverse else i * rb + r
                acc = None
                for wd in range(words):
                    o = wd * nd
                    t = jnp.concatenate(
                        [cr_ref[wd, r:r + 1, :],
                         t_ref[o:o + nd - 1]], axis=0)
                    t_ref[o:o + nd] = t
                    x_or = jax.lax.population_count(
                        cl_ref[wd, r:r + 1, :] ^ t)
                    acc = x_or if acc is None else acc + x_or
                if reverse:
                    valid = sub + x < w_true      # x+d inside the image
                else:
                    valid = sub <= x              # x-d >= 0
                c = jnp.where(valid, acc, invalid_cost)
                # neutral ZERO cost on the pad rows/lanes (the sweeps
                # scan across them; zero keeps the recurrence exact)
                c = jnp.where((lane < h_true) & (x < w_true), c, 0)
                out_ref[r] = c.astype(jnp.uint8)
        return body

    return kernel


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def cost_volume_wlh(cen_l: jnp.ndarray, cen_r: jnp.ndarray,
                    max_disp: int, invalid_cost: int = 255,
                    right_reference: bool = False,
                    row_block: int = 8,
                    pad_w: int | None = None) -> jnp.ndarray:
    """(H, W, words) u32 census pair -> (W', D, H') u8 PRE-PADDED
    column-scan cost volume (W'/H' = 8-multiples, pad region zero).
    Equal to jnp.transpose(cost_volume_stereo_major[...], (2, 1, 0))
    padded with zeros.  reference semantics: left unless
    right_reference (then C[y,d,x] matches at x+d).

    pad_w: emit W' = pad_w scan rows (>= the 8-multiple) — the extra
    rows are neutral zero via the kernel's own x < w_true mask, so the
    mask-free lane pad costs one grid step here instead of a
    full-volume XLA pad pass downstream (the round-5 4K trace showed
    that pad at 3.2 ms/frame)."""
    h, w, words = cen_l.shape
    hp, wp = _pad8(h), _pad8(w)
    if pad_w is not None:
        assert pad_w >= wp and pad_w % row_block == 0, (pad_w, wp)
        wp = pad_w
    nd = max_disp
    rb = row_block
    n_steps = wp // rb
    # transposed, padded, words-leading census planes: (words, W', H')
    def tpad(c):
        c = jnp.transpose(c, (2, 1, 0))
        return jnp.pad(c, ((0, 0), (0, wp - w), (0, hp - h)))
    cen_ref, cen_match = ((cen_r, cen_l) if right_reference
                          else (cen_l, cen_r))
    clt, crt = tpad(cen_ref), tpad(cen_match)
    reverse = bool(right_reference)
    blk = (lambda i: (0, n_steps - 1 - i, 0)) if reverse \
        else (lambda i: (0, i, 0))
    kernel = _make_wlh_kernel(nd, hp, h, w, rb, words, invalid_cost,
                              reverse)(n_steps)
    out_spec = pl.BlockSpec((rb, nd, hp),
                            (lambda i: (n_steps - 1 - i, 0, 0)) if reverse
                            else (lambda i: (i, 0, 0)))
    return pl.pallas_call(
        kernel, grid=(n_steps,),
        in_specs=[pl.BlockSpec((words, rb, hp), blk)] * 2,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((wp, nd, hp), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((words * nd, hp), jnp.uint32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=_interpret(),
    )(clt, crt)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def cost_volume_wlh_batch(cen_l: jnp.ndarray, cen_r: jnp.ndarray,
                          max_disp: int, invalid_cost: int = 255,
                          right_reference: bool = False,
                          row_block: int = 8) -> jnp.ndarray:
    """(B, H, W, words) u32 census pair -> (W', D, B*H') u8 batch
    LANE-FOLDED column-scan volume: frame b's (W', D, H') volume sits at
    lanes [b*H', (b+1)*H'), pad lanes zero.  The incremental sublane
    shear has no cross-lane ops, so the fold is bit-exact per frame —
    this feeds aggregate_paths_tr_batch's folded horizontal sweeps
    directly, replacing the XLA pad+transpose fold of the row-scan
    volume (r4 trace: 4.2 ms + 3.0 ms per 16-frame dispatch)."""
    b, h, w, words = cen_l.shape
    hp, wp = _pad8(h), _pad8(w)
    nd = max_disp
    rb = row_block
    n_steps = wp // rb

    def tpad(c):
        c = jnp.pad(c, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
        return jnp.transpose(c, (3, 2, 0, 1)).reshape(words, wp, b * hp)
    cen_ref, cen_match = ((cen_r, cen_l) if right_reference
                          else (cen_l, cen_r))
    clt, crt = tpad(cen_ref), tpad(cen_match)
    reverse = bool(right_reference)
    blk = (lambda i: (0, n_steps - 1 - i, 0)) if reverse \
        else (lambda i: (0, i, 0))
    kernel = _make_wlh_kernel(nd, b * hp, h, w, rb, words, invalid_cost,
                              reverse, hp_frame=hp)(n_steps)
    out_spec = pl.BlockSpec((rb, nd, b * hp),
                            (lambda i: (n_steps - 1 - i, 0, 0)) if reverse
                            else (lambda i: (i, 0, 0)))
    return pl.pallas_call(
        kernel, grid=(n_steps,),
        in_specs=[pl.BlockSpec((words, rb, b * hp), blk)] * 2,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((wp, nd, b * hp), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((words * nd, b * hp), jnp.uint32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=_interpret(),
    )(clt, crt)


# --------------------------------------------------------------------------
# (H, L, W) row-scan volume: binary lane shear
# --------------------------------------------------------------------------

def _make_hlw_kernel(nd: int, w: int, w_true: int, h_true: int, rb: int,
                     words: int, invalid_cost: int,
                     right_reference: bool, strided: bool = False):
    wa = -(-w // 128) * 128     # strided roll needs a 128-aligned width

    def shear(row):             # (1, w) -> (nd, w): t[d, x] = row[x - d]
        if not strided:
            t = jnp.broadcast_to(row, (nd, w))
            sub = jax.lax.broadcasted_iota(jnp.int32, (nd, w), 0)
            k = 1
            while k < nd:
                # sublane bit k set -> lane shift by 2^k: x-d needs
                # values from LOWER lanes (roll right); x+d (right
                # reference) from higher (roll left)
                shift = k if not right_reference else (-k) % w
                rolled = pltpu.roll(t, shift, 1)
                t = jnp.where((sub & k) != 0, rolled, t)
                k *= 2
            return t
        # round 5: the whole Toeplitz shear is ONE hardware op — a
        # per-sublane strided lane roll (shift of sublane d = d; the
        # per-vreg shift spread is 7, within Mosaic's limit).  Only the
        # forward (x - d) shear is expressible: stride=W-1 for x + d is
        # rejected ("max shift in a vreg larger than the vreg's width"),
        # so right_reference keeps the binary shear above.
        assert not right_reference
        if wa != w:
            row = jnp.concatenate(
                [row, jnp.zeros((1, wa - w), row.dtype)], axis=1)
        t = pltpu.roll(jnp.broadcast_to(row, (nd, wa)), 0, 1,
                       stride=1, stride_axis=0)
        return t[:, :w] if wa != w else t

    def kernel(cl_ref, cr_ref, out_ref):
        i = pl.program_id(0)
        sub = jax.lax.broadcasted_iota(jnp.int32, (nd, w), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (nd, w), 1)
        for r in range(rb):
            acc = None
            for wd in range(words):
                t = shear(cr_ref[wd, r:r + 1, :])
                x_or = jax.lax.population_count(
                    jnp.broadcast_to(cl_ref[wd, r:r + 1, :], (nd, w)) ^ t)
                acc = x_or if acc is None else acc + x_or
            valid = (lane + sub < w_true) if right_reference \
                else (sub <= lane)
            c = jnp.where(valid, acc, invalid_cost)
            # neutral ZERO cost on the pad rows [h_true, H') and pad
            # lanes [w_true, pad_w): the vertical sweeps scan across pad
            # rows exactly (start-of-image semantics up-family;
            # discarded output down-family); pad-lane content is
            # overridden in-sweep when mask-free pads are active
            c = jnp.where((i * rb + r < h_true) & (lane < w_true), c, 0)
            out_ref[r] = c.astype(jnp.uint8)

    return kernel


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7))
def cost_volume_hlw(cen_l: jnp.ndarray, cen_r: jnp.ndarray,
                    max_disp: int, invalid_cost: int = 255,
                    right_reference: bool = False,
                    row_block: int = 8,
                    strided: bool = False,
                    pad_w: int | None = None) -> jnp.ndarray:
    """(H, W, words) u32 census pair -> (H', D, W) u8 row-scan cost
    volume, H' the 8-multiple row pad; rows [0, H) bit-identical to
    ops/cost.py::cost_volume_stereo_major, pad rows neutral zero (the
    round-4 row-padded vertical pipeline: pad rows let the sweeps run
    rb=8 row blocks — 47 grid steps at KITTI instead of 375 — and are
    exact by the same neutral-zero argument as the horizontal pads).

    strided (round 5, left reference only): the Toeplitz lane shear as
    ONE strided roll per row instead of log2(D) masked rolls — the form
    that lost to the XLA transpose in round 4 (26 ms/dispatch) was the
    binary shear; see _make_hlw_kernel.

    pad_w: emit (H', D, pad_w) with zero-cost lanes [w, pad_w) — the
    >= max|dx| pad the mask-free sweeps need (aggregate_tr round 5)."""
    h, w, words = cen_l.shape
    hp = _pad8(h)
    wp = w if pad_w is None else pad_w
    assert wp >= w
    nd = max_disp
    rb = row_block
    cen_ref, cen_match = ((cen_r, cen_l) if right_reference
                          else (cen_l, cen_r))
    cl = jnp.transpose(cen_ref, (2, 0, 1))      # (words, H, W)
    cr = jnp.transpose(cen_match, (2, 0, 1))
    if hp != h or wp != w:
        cl = jnp.pad(cl, ((0, 0), (0, hp - h), (0, wp - w)))
        cr = jnp.pad(cr, ((0, 0), (0, hp - h), (0, wp - w)))
    kernel = _make_hlw_kernel(nd, wp, w, h, rb, words, invalid_cost,
                              bool(right_reference),
                              strided and not right_reference)
    return pl.pallas_call(
        kernel, grid=(hp // rb,),
        in_specs=[pl.BlockSpec((words, rb, wp),
                               lambda i: (0, i, 0))] * 2,
        out_specs=pl.BlockSpec((rb, nd, wp), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((hp, nd, wp), jnp.uint8),
        interpret=_interpret(),
    )(cl, cr)
