"""Pallas TPU kernels: fused multi-direction SGM path aggregation.

This is the speed-of-light replacement for the reference's native C++/MEX
hot loop (SURVEY.md §2.1 "SGM path aggregation"; §3.3 kernel structure).
TPU-first design, NOT a translation:

  * ONE row-sweep kernel aggregates ALL directions of a vertical family
    (e.g. the 3 downward paths (1,-1),(1,0),(1,1) — 7 with knight moves)
    in a single pass over rows: the cost row is read from HBM once and the
    family's contributions are summed into S in-place (input/output
    aliasing), so HBM traffic per family is read-C + RMW-S instead of the
    per-direction re-read/spill a naive port would do (SURVEY.md §7.4).
  * The sequential DP axis is the Pallas grid (TPU grid steps execute in
    order on the core); per-direction path state (the last two L rows) lives
    in VMEM scratch and persists across grid steps.  Disparity is the lane
    axis (D=128 = native lane width), image width the sublane axis —
    ~W*D int32 lanes of VPU work per step, no MXU needed (SGM is min-plus,
    not matmul).
  * Upward/right-to-left families reuse the same kernel with a reversed
    grid index map — no data flipping, no extra copies.
  * Horizontal paths use a column-sweep variant (grid over x, (H, D)
    blocks); knight-move paths (|dy|=2 or |dx|=2) fall out of the row sweep
    via carry depth 2 and sublane shift 2, so 16-path costs the same number
    of HBM passes as 8-path.
  * Integer discipline (SURVEY.md §7.3 item 5): u8 cost in, int32 compute,
    int16 S accumulator when the parameter preset guarantees it fits
    (max S = num_paths * (invalid_cost + P2) checked by the caller).

Exactness contract: bit-identical to golden/sgm.py::aggregate_paths and
ops/aggregate.py (the XLA lax.scan fallback) — enforced by
tests/unit/test_pallas_parity.py.
"""

from __future__ import annotations

import functools
import os
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF32 = 1 << 24  # python int: safe headroom, and capturable by kernels
                 # (a jnp scalar here would be a closed-over constant,
                 # which pallas_call rejects)


def _interpret() -> bool:
    return os.environ.get("FSGM_PALLAS_INTERPRET", "0") == "1"


# --------------------------------------------------------------------------
# Label-space neighbor minima (operate on (N, L) int32 inside the kernel)
# --------------------------------------------------------------------------

def make_nmin_1d(p1: int, inf: int = INF32) -> Callable:
    """min(L[d-1], L[d+1]) + P1 over the 1D disparity axis (lanes).

    Dtype-generic: `+ p1` with a python int keeps the operand dtype, so the
    same closure serves the int32 and int16 compute paths."""
    def nmin(prev: jnp.ndarray) -> jnp.ndarray:
        f = jnp.full(prev.shape[:-1] + (1,), inf, prev.dtype)
        lo = jnp.concatenate([f, prev[..., :-1]], axis=-1)
        hi = jnp.concatenate([prev[..., 1:], f], axis=-1)
        return jnp.minimum(lo, hi) + p1
    return nmin


def make_nmin_2d(p1: int, ext: int, inf: int = INF32) -> Callable:
    """4-neighbor min over the flattened (ext x ext) flow-label grid + P1.

    Labels l = (dv+w)*ext + (du+w) live on the lane axis; u-neighbors are
    lane shifts by 1 masked at the u-row wrap, v-neighbors lane shifts by
    ext (always valid within bounds).
    """
    def nmin(prev: jnp.ndarray) -> jnp.ndarray:
        nl = prev.shape[-1]
        lane = jax.lax.broadcasted_iota(jnp.int32, prev.shape,
                                        prev.ndim - 1)
        f1 = jnp.full(prev.shape[:-1] + (1,), inf, prev.dtype)
        fe = jnp.full(prev.shape[:-1] + (ext,), inf, prev.dtype)
        left = jnp.concatenate([f1, prev[..., :-1]], axis=-1)
        right = jnp.concatenate([prev[..., 1:], f1], axis=-1)
        left = jnp.where(lane % ext == 0, jnp.asarray(inf, prev.dtype), left)
        right = jnp.where(lane % ext == ext - 1, jnp.asarray(inf, prev.dtype), right)
        up = jnp.concatenate([fe, prev[..., :-ext]], axis=-1)
        down = jnp.concatenate([prev[..., ext:], fe], axis=-1)
        m = jnp.minimum(jnp.minimum(left, right), jnp.minimum(up, down))
        del nl
        return m + p1
    return nmin


# --------------------------------------------------------------------------
# Row sweep: one vertical direction family in one pass over rows
# --------------------------------------------------------------------------

def _shift_sublanes(a: jnp.ndarray, dx: int, fill) -> jnp.ndarray:
    """shifted[x] = a[x - dx] along the leading (sublane) axis, `fill` where
    x - dx is out of range."""
    if dx == 0:
        return a
    f = jnp.full((abs(dx),) + a.shape[1:], fill, a.dtype)
    if dx > 0:
        return jnp.concatenate([f, a[:-dx]], axis=0)
    return jnp.concatenate([a[-dx:], f], axis=0)



def _lane_min(v: jnp.ndarray, cdt) -> jnp.ndarray:
    """Per-row min over the lane (label) axis, broadcastable result.

    The native jnp.min lane reduction is the single most expensive op in
    the sweep kernels (~2.3 ms per direction per KITTI frame as lowered by
    this Mosaic); a log2 rotate-min tree using the hardware lane rotate is
    ~10x cheaper.  Wrap-around mixing is harmless for a global min, and for
    lane-aligned widths the result is exact in every lane.  Non-128-aligned
    label counts (2D flow windows) use an overlapped slice-halving tree
    instead: physical-lane wrap behavior is not trusted there.
    """
    n = v.shape[-1]
    if cdt == jnp.int32 and n % 128 == 0:
        s = 1
        while s < n:
            v = jnp.minimum(v, pltpu.roll(v, s, v.ndim - 1))
            s *= 2
        return v  # every lane holds the global min
    while n > 1:  # overlapped halving handles odd widths exactly
        h = -(-n // 2)
        v = jnp.minimum(v[..., :h], v[..., n - h: n])
        n = h
    return v


def _make_row_sweep_kernel(dirs: Sequence[Tuple[int, int]], w: int, nd: int,
                           nmin: Callable, s_dtype, cdt, inf: int,
                           carry_dt):
    """dirs: canonical (ady, dx) with ady in {1, 2} (reversal is in the
    index maps, not here).  Carry scratch is packed per direction with
    depth 1, or 2 for knight-move dirs (ady == 2), and stored int16 when
    the penalty preset bounds L below 2^15 — both matter for staying under
    the 16 MB VMEM limit at 4K widths."""
    offs, off = [], 0
    for ady, _ in dirs:
        offs.append(off)
        off += 2 if ady == 2 else 1
    n_units = off

    # x is chunked so per-chunk temporaries fit the 16 MB VMEM scoped
    # limit at 4K widths; every op is per-x except the static sublane
    # shift, which reads the carry at [s-dx, e-dx) — processing chunks
    # AGAINST the shift direction keeps those reads on not-yet-overwritten
    # previous-row state.
    X_CHUNK = 1536
    n_chunks = -(-w // X_CHUNK)
    bounds = [(c * X_CHUNK, min((c + 1) * X_CHUNK, w))
              for c in range(n_chunks)]

    def kernel(c_ref, p2e_ref, s_ref, s_out_ref, carry_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            carry_ref[...] = jnp.zeros(carry_ref.shape, carry_ref.dtype)

        for (s0, e0) in bounds:  # S accumulator: start from the aliased in
            s_out_ref[0, s0:e0] = s_ref[0, s0:e0]
        for k, (ady, dx) in enumerate(dirs):
            o = offs[k]
            order = reversed(bounds) if dx > 0 else bounds
            for (s0, e0) in order:
                n_rows = e0 - s0
                # Mosaic restriction: lane rotates and concats require
                # operands at register offset 0, so the lane-wise ops
                # (min tree, neighbor min) run on the ALIGNED carry chunk
                # and the +-dx sublane shift is applied to their results
                # (shift commutes with per-x lane ops); the shift itself
                # uses an aligned 8-row border block + a value slice.
                chunk = carry_ref[o + ady - 1, s0:e0].astype(cdt)
                mch = _lane_min(chunk, cdt)
                nmch = nmin(chunk)
                if dx == 0:
                    prev, m, nm = chunk, mch, nmch
                else:
                    if dx > 0:
                        if s0 > 0:
                            bord = carry_ref[o + ady - 1,
                                             s0 - 8:s0].astype(cdt)
                        else:
                            bord = jnp.full((8, nd), inf, cdt)
                        def sh(a, b, dx=dx, n=n_rows):
                            return jnp.concatenate(
                                [b, a], axis=0)[8 - dx: 8 - dx + n]
                    else:
                        if e0 < w:
                            bord = carry_ref[o + ady - 1,
                                             e0:e0 + 8].astype(cdt)
                        else:
                            bord = jnp.full((8, nd), inf, cdt)
                        def sh(a, b, dx=dx, n=n_rows):
                            return jnp.concatenate(
                                [a, b], axis=0)[-dx: -dx + n]
                    prev = sh(chunk, bord)
                    m = sh(mch, _lane_min(bord, cdt))
                    nm = sh(nmch, nmin(bord))
                p2e = p2e_ref[0, k, s0:e0][:, None].astype(cdt)
                best = jnp.minimum(jnp.minimum(prev, nm), m + p2e)
                # No x-edge mask: where the predecessor is outside the
                # image the whole shifted sublane is INF, so m = best = INF
                # and l = cost + INF - INF = cost — golden edge rule, free.
                l = c_ref[0, s0:e0].astype(cdt) + best - m
                if ady == 2:  # only knight-move dirs read two rows back
                    carry_ref[o + 1, s0:e0] = carry_ref[o, s0:e0]
                carry_ref[o, s0:e0] = l.astype(carry_dt)
                s_out_ref[0, s0:e0] = (s_out_ref[0, s0:e0].astype(cdt)
                                       + l).astype(s_dtype)

    return kernel, n_units


def _row_sweep(cost_u8, p2e, s, dirs, reverse: bool, nmin: Callable,
               cdt=jnp.int32, inf: int = INF32, carry_dt=jnp.int32):
    """One vertical family pass.  cost_u8 (H,W,D) u8, p2e (H,n_dirs,W) i32
    (row-leading so the per-row block (1,n_dirs,W) satisfies Mosaic's
    last-two-dims-match-array rule), s (H,W,D) accumulator (aliased)."""
    h, w, nd = cost_u8.shape
    n_dirs = len(dirs)
    row = (lambda i: h - 1 - i) if reverse else (lambda i: i)
    kernel, n_units = _make_row_sweep_kernel(dirs, w, nd, nmin, s.dtype,
                                             cdt, inf, carry_dt)
    return pl.pallas_call(
        kernel,
        grid=(h,),
        in_specs=[
            pl.BlockSpec((1, w, nd), lambda i: (row(i), 0, 0)),
            pl.BlockSpec((1, n_dirs, w), lambda i: (row(i), 0, 0)),
            pl.BlockSpec((1, w, nd), lambda i: (row(i), 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, w, nd), lambda i: (row(i), 0, 0)),
        out_shape=jax.ShapeDtypeStruct((h, w, nd), s.dtype),
        scratch_shapes=[pltpu.VMEM((n_units, w, nd), carry_dt)],
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=_interpret(),
    )(cost_u8, p2e, s)


# --------------------------------------------------------------------------
# Column sweep: one horizontal direction per pass over columns
# --------------------------------------------------------------------------

COL_BLOCK = 8  # columns per column-sweep grid step (sublane-aligned DMA)


def _make_col_sweep_kernel(reverse: bool, nmin: Callable, s_dtype, cdt,
                           carry_dt, hb: int):
    def kernel(c_ref, p2e_ref, s_ref, s_out_ref, carry_ref):
        j = pl.program_id(0)
        i = pl.program_id(1)

        @pl.when((j == 0) & (i == 0))
        def _():
            carry_ref[...] = jnp.zeros(carry_ref.shape, carry_ref.dtype)

        rows = pl.ds(pl.multiple_of(i * hb, 8), hb)
        cols = range(COL_BLOCK - 1, -1, -1) if reverse else range(COL_BLOCK)
        for c in cols:
            cost = c_ref[:, c, :].astype(cdt)                # (HB, D)
            prev = carry_ref[0, rows].astype(cdt)
            m = _lane_min(prev, cdt)
            p2e = p2e_ref[0, 0, :, c][:, None].astype(cdt)   # (HB, 1)
            best = jnp.minimum(jnp.minimum(prev, nmin(prev)), m + p2e)
            l = cost + best - m
            carry_ref[0, rows] = l.astype(carry_dt)
            s_out_ref[:, c, :] = (s_ref[:, c, :].astype(cdt)
                                  + l).astype(s_dtype)

    return kernel


def _row_chunk(h: int, limit: int = 512) -> int:
    """Largest sublane-aligned (x8) divisor of h <= limit (full h if
    none — the dynamic carry slice must be provably 8-aligned)."""
    if h <= limit:
        return h
    for hb in range(limit - limit % 8, 0, -8):
        if h % hb == 0:
            return hb
    return h


def _col_sweep(cost_u8, p2e, s, reverse: bool, nmin: Callable,
               cdt=jnp.int32, carry_dt=jnp.int32):
    """One horizontal pass ((0,1) forward / (0,-1) reverse) over COL_BLOCK-
    column blocks.  The predecessor is in the same row, so no sublane
    shift/mask is needed; the zero init carry gives L=C on the first column
    (golden first-pixel semantics).  Requires W % COL_BLOCK == 0 — the
    caller zero-pads (zero cost columns are neutral: they propagate a zero
    carry, reproducing golden edge behavior at the real/pad boundary).
    Rows are chunked (grid dim 1) so 4K-height blocks fit VMEM; each row's
    scan is independent, so chunking cannot change results — the carry
    lives in a full-height scratch sliced per chunk."""
    h, w, nd = cost_u8.shape
    assert w % COL_BLOCK == 0, "caller must pad W"
    nb = w // COL_BLOCK
    hb = _row_chunk(h)
    nh = h // hb
    blk = (lambda j: nb - 1 - j) if reverse else (lambda j: j)
    kernel = _make_col_sweep_kernel(reverse, nmin, s.dtype, cdt, carry_dt,
                                    hb)
    return pl.pallas_call(
        kernel,
        grid=(nb, nh),
        in_specs=[
            pl.BlockSpec((hb, COL_BLOCK, nd), lambda j, i: (i, blk(j), 0)),
            # p2e arrives as (nb, nh, HB, CB): the (1, 1, HB, CB) block has
            # its last two dims equal to the array's, satisfying Mosaic's
            # rules for any HB, and puts rows on sublanes so the per-column
            # (HB, 1) broadcast needs no lane->sublane transpose
            pl.BlockSpec((1, 1, hb, COL_BLOCK),
                         lambda j, i: (blk(j), i, 0, 0)),
            pl.BlockSpec((hb, COL_BLOCK, nd), lambda j, i: (i, blk(j), 0)),
        ],
        out_specs=pl.BlockSpec((hb, COL_BLOCK, nd),
                               lambda j, i: (i, blk(j), 0)),
        out_shape=jax.ShapeDtypeStruct((h, w, nd), s.dtype),
        scratch_shapes=[pltpu.VMEM((1, h, nd), carry_dt)],
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=_interpret(),
    )(cost_u8, p2e, s)


# --------------------------------------------------------------------------
# P2' precompute (XLA; tiny vs the volume traffic) and the public entry
# --------------------------------------------------------------------------

def _p2_effective(img: jnp.ndarray, dy: int, dx: int, p1: int, p2: int,
                  adaptive: bool) -> jnp.ndarray:
    """(H, W) int32 P2' for direction (dy, dx): max(P1+1, P2 // max(1,
    |I(p) - I(p - r)|)); value where the predecessor is outside the image is
    irrelevant (the kernel's zero carry / x-mask bypasses it)."""
    if not adaptive:
        return jnp.full(img.shape, p2, dtype=jnp.int32)
    img = img.astype(jnp.int32)
    pred = jnp.roll(jnp.roll(img, dy, axis=0), dx, axis=1)
    diff = jnp.maximum(jnp.abs(img - pred), 1)
    return jnp.maximum(jnp.int32(p1 + 1), jnp.int32(p2) // diff)


INF16 = 20000  # int16 compute-path sentinel: INF16 + P2 + Cmax < 2^15
                # requires P2 <= 12000 (checked before picking int16)


def aggregate_paths(cost: jnp.ndarray, img: jnp.ndarray,
                    dirs: Sequence[Tuple[int, int]], p1: int, p2: int,
                    adaptive_p2: bool = False,
                    label_ext: int | None = None,
                    s_max: int | None = None) -> jnp.ndarray:
    """S = sum_r L_r via fused family sweeps.  Returns (H, W, D) int16 when
    the guaranteed max S fits (pass s_max = num_paths*(invalid_cost+P2)),
    else int32.  Exact-integer match to the golden model.

    The width is zero-padded to a COL_BLOCK multiple: zero-cost columns are
    a NEUTRAL region for the recurrence (all-zero prev row -> best=0, m=0,
    L=C=0), so carries crossing the pad/real boundary reproduce the golden
    image-edge semantics exactly, and the pad slice of S is discarded."""
    h, w, nd = cost.shape
    cost = cost.astype(jnp.uint8)
    s_dtype = jnp.int16 if (s_max is not None and s_max < (1 << 15)) \
        else jnp.int32
    # int16 in-kernel arithmetic would halve VPU pressure, but the current
    # Mosaic toolchain cannot legalize 16-bit min/rotate/reduce ops
    # ("failed to legalize arith.minsi"), so compute stays int32; S storage
    # is still int16 when the preset's bound fits (halved HBM traffic), and
    # so is the carry scratch (L <= Cmax + P2 < 2^15) — VMEM headroom that
    # 4K widths and 16-path carry sets need.
    cdt, inf = jnp.int32, INF32
    carry_dt = jnp.int16 if 255 + p2 < (1 << 15) else jnp.int32
    if label_ext is None:
        nmin = make_nmin_1d(p1, inf)
    else:
        nmin = make_nmin_2d(p1, label_ext, inf)

    wp = -(-w // COL_BLOCK) * COL_BLOCK
    if wp != w:
        cost = jnp.pad(cost, ((0, 0), (0, wp - w), (0, 0)))
        img = jnp.pad(img, ((0, 0), (0, wp - w)), mode="edge")
    s = jnp.zeros((h, wp, nd), dtype=s_dtype)

    down = [r for r in dirs if r[0] > 0]
    up = [r for r in dirs if r[0] < 0]
    horiz = [r for r in dirs if r[0] == 0]

    if down:
        canon = [(dy, dx) for dy, dx in down]
        p2e = jnp.stack([_p2_effective(img, dy, dx, p1, p2, adaptive_p2)
                         for dy, dx in down], axis=1)       # (H, n, Wp)
        s = _row_sweep(cost, p2e, s, canon, False, nmin, cdt, inf,
                       carry_dt)
    if up:
        canon = [(-dy, dx) for dy, dx in up]
        p2e = jnp.stack([_p2_effective(img, dy, dx, p1, p2, adaptive_p2)
                         for dy, dx in up], axis=1)
        s = _row_sweep(cost, p2e, s, canon, True, nmin, cdt, inf,
                       carry_dt)
    hb = _row_chunk(h)
    for dy, dx in horiz:
        p2e_h = _p2_effective(img, dy, dx, p1, p2, adaptive_p2)
        # (H, Wp) -> (nb, nh, HB, CB): entry (j, i, r, c) = p2e[i*HB+r, j*CB+c]
        p2e_h = p2e_h.reshape(h // hb, hb, wp // COL_BLOCK, COL_BLOCK)
        p2e_h = p2e_h.transpose(2, 0, 1, 3)
        s = _col_sweep(cost, p2e_h, s, reverse=(dx < 0), nmin=nmin,
                       cdt=cdt, carry_dt=carry_dt)
    return s[:, :w] if wp != w else s
