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

import os

from fsgm_tpu.utils.envcfg import env_int
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
    same closure serves the int32 and int16 compute paths.

    The attached `.fused(prev) -> (nm, w3)` additionally returns the
    window-3 running min w3[d] = min(prev[d-1..d+1]) for tree sharing: the
    global-min rotate tree can seed from w3 and skip one level
    (FSGM_TREE=w3; NOTES-PERF lead 2)."""
    def _shifts(prev):
        f = jnp.full(prev.shape[:-1] + (1,), inf, prev.dtype)
        lo = jnp.concatenate([f, prev[..., :-1]], axis=-1)
        hi = jnp.concatenate([prev[..., 1:], f], axis=-1)
        return lo, hi

    def nmin(prev: jnp.ndarray) -> jnp.ndarray:
        lo, hi = _shifts(prev)
        return jnp.minimum(lo, hi) + p1

    def fused(prev: jnp.ndarray):
        lo, hi = _shifts(prev)
        nm_raw = jnp.minimum(lo, hi)
        return nm_raw + p1, jnp.minimum(prev, nm_raw)

    nmin.fused = fused
    return nmin


def make_nmin_2d(p1: int, ext: int, inf: int = INF32) -> Callable:
    """4-neighbor min over the flattened (ext x ext) flow-label grid + P1.

    Labels l = (dv+w)*ext + (du+w) live on the lane axis; u-neighbors are
    lane shifts by 1 masked at the u-row wrap, v-neighbors lane shifts by
    ext (always valid within bounds).
    """
    def nmin(prev: jnp.ndarray) -> jnp.ndarray:
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
    if n % 128 == 0:
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


def _lane_min_from_w3(w3: jnp.ndarray) -> jnp.ndarray:
    """Global lane min seeded from the window-3 running min (shared with
    the neighbor-min computation): coverage starts at 3 so the rotate tree
    needs one fewer level than from scratch.  Requires 128-aligned width
    (wrap-around mixing is harmless for a global min)."""
    n = w3.shape[-1]
    cover = 3
    while cover < n:
        w3 = jnp.minimum(w3, pltpu.roll(w3, cover, w3.ndim - 1))
        cover *= 2
    return w3


def carry_units(dirs: Sequence[Tuple[int, int]]) -> int:
    """Packed carry rows for a canonical direction family: 1 per direction,
    2 for knight-move (|dy| == 2) directions."""
    return sum(2 if abs(dy) == 2 else 1 for dy, _ in dirs)


def _make_row_sweep_kernel(dirs: Sequence[Tuple[int, int]], w: int, nd: int,
                           nmin: Callable, s_dtype, cdt, inf: int,
                           carry_dt, h: int, with_carry: bool):
    """dirs: canonical (ady, dx) with ady in {1, 2} (reversal is in the
    index maps, not here).  Carry scratch is packed per direction with
    depth 1, or 2 for knight-move dirs (ady == 2), and stored int16 when
    the penalty preset bounds L below 2^15 — both matter for staying under
    the 16 MB VMEM limit at 4K widths.

    with_carry adds a carry_in input (seeds the scan state at grid step 0;
    zeros = start-of-image semantics) and a carry_out output (the final
    scan state, i.e. the last one/two L rows in the canonical frame) — the
    halo message for cross-tile wavefront execution (SURVEY.md §3.5)."""
    offs, off = [], 0
    for ady, _ in dirs:
        offs.append(off)
        off += 2 if ady == 2 else 1
    n_units = off

    # x is chunked so per-chunk temporaries fit the 16 MB VMEM scoped
    # limit at 4K widths; every op is per-x except the static sublane
    # shift, which reads the carry at [s-dx, e-dx) — processing chunks
    # AGAINST the shift direction keeps those reads on not-yet-overwritten
    # previous-row state.  FSGM_XCHUNK tunes the chunk (sublane) size:
    # measured on v5e (NOTES-PERF round 2) BIGGER is strictly better down
    # to the VMEM ceiling (32->73.6, 64->46, 128->28.9, 256->18.9,
    # 512->18.7 ms for the 4-family KITTI sweep) — Mosaic materializes
    # every op's result in VMEM regardless, so small chunks only add
    # per-op overhead.  512 keeps 4K widths inside the scoped VMEM limit.
    X_CHUNK = env_int("FSGM_XCHUNK", 512)
    n_chunks = -(-w // X_CHUNK)
    bounds = [(c * X_CHUNK, min((c + 1) * X_CHUNK, w))
              for c in range(n_chunks)]
    # window-3 tree sharing (NOTES-PERF lead 2): seed the global-min rotate
    # tree from the neighbor-min's window-3 running min, saving one level.
    # OPT-IN (FSGM_TREE=w3): the non-power-of-2 rotate amounts blow Mosaic
    # compile time up ~10x (20+ min for the Tsukuba entry) — measured
    # round 2; keep flat until the toolchain handles odd rotates
    share_w3 = (os.environ.get("FSGM_TREE", "flat") == "w3"
                and hasattr(nmin, "fused") and cdt == jnp.int32
                and nd % 128 == 0)

    def min_and_nmin(chunk):
        if share_w3:
            nm, w3 = nmin.fused(chunk)
            return _lane_min_from_w3(w3), nm
        return _lane_min(chunk, cdt), nmin(chunk)

    def kernel(*refs):
        if with_carry:
            (c_ref, p2e_ref, s_ref, cin_ref,
             s_out_ref, cout_ref, carry_ref) = refs
        else:
            c_ref, p2e_ref, s_ref, s_out_ref, carry_ref = refs
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            if with_carry:
                carry_ref[...] = cin_ref[...]
            else:
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
                mch, nmch = min_and_nmin(chunk)
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
                    mb, nmb = min_and_nmin(bord)
                    prev = sh(chunk, bord)
                    m = sh(mch, mb)
                    nm = sh(nmch, nmb)
                # cast BEFORE the minor-dim insertion: Mosaic only
                # reshapes 32-bit vectors into a new minor dim (the
                # round-5 i16 p2e tables trip it otherwise)
                p2e = p2e_ref[0, k, s0:e0].astype(cdt)[:, None]
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

        if with_carry:
            @pl.when(i == h - 1)
            def _():
                cout_ref[...] = carry_ref[...]

    return kernel, n_units


def _row_sweep(cost_u8, p2e, s, dirs, reverse: bool, nmin: Callable,
               cdt=jnp.int32, inf: int = INF32, carry_dt=jnp.int32,
               init_carry=None, return_carry: bool = False):
    """One vertical family pass.  cost_u8 (H,W,D) u8, p2e (H,n_dirs,W) i32
    (row-leading so the per-row block (1,n_dirs,W) satisfies Mosaic's
    last-two-dims-match-array rule), s (H,W,D) accumulator (aliased).

    init_carry / return_carry expose the scan boundary state for tiled
    wavefront execution: the carry is (carry_units(dirs), W, D) in the
    CANONICAL frame (rows processed in index-map order), unit [o] = most
    recent L row, [o+1] = previous (knight dirs only).  Zeros = neutral
    start-of-image state; a real carry continues the scan across a tile
    seam."""
    h, w, nd = cost_u8.shape
    n_dirs = len(dirs)
    row = (lambda i: h - 1 - i) if reverse else (lambda i: i)
    with_carry = init_carry is not None or return_carry
    kernel, n_units = _make_row_sweep_kernel(dirs, w, nd, nmin, s.dtype,
                                             cdt, inf, carry_dt, h,
                                             with_carry)
    if not with_carry:
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

    if init_carry is None:
        init_carry = jnp.zeros((n_units, w, nd), carry_dt)
    else:
        assert init_carry.shape == (n_units, w, nd), (
            init_carry.shape, (n_units, w, nd))
        init_carry = init_carry.astype(carry_dt)
    whole = pl.BlockSpec((n_units, w, nd), lambda i: (0, 0, 0))
    s_out, carry_out = pl.pallas_call(
        kernel,
        grid=(h,),
        in_specs=[
            pl.BlockSpec((1, w, nd), lambda i: (row(i), 0, 0)),
            pl.BlockSpec((1, n_dirs, w), lambda i: (row(i), 0, 0)),
            pl.BlockSpec((1, w, nd), lambda i: (row(i), 0, 0)),
            whole,
        ],
        out_specs=[pl.BlockSpec((1, w, nd), lambda i: (row(i), 0, 0)),
                   whole],
        out_shape=[jax.ShapeDtypeStruct((h, w, nd), s.dtype),
                   jax.ShapeDtypeStruct((n_units, w, nd), carry_dt)],
        scratch_shapes=[pltpu.VMEM((n_units, w, nd), carry_dt)],
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=_interpret(),
    )(cost_u8, p2e, s, init_carry)
    if return_carry:
        return s_out, carry_out
    return s_out


# --------------------------------------------------------------------------
# Column sweep: one horizontal direction per pass over columns
# --------------------------------------------------------------------------

COL_BLOCK = 8  # columns per column-sweep grid step (sublane-aligned DMA)


def _make_col_sweep_kernel(reverse: bool, nmin: Callable, s_dtype, cdt,
                           carry_dt, hb: int, nd: int):
    share_w3 = (os.environ.get("FSGM_TREE", "flat") == "w3"
                and hasattr(nmin, "fused") and cdt == jnp.int32
                and nd % 128 == 0)

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
            if share_w3:
                nm, w3 = nmin.fused(prev)
                m = _lane_min_from_w3(w3)
            else:
                m, nm = _lane_min(prev, cdt), nmin(prev)
            p2e = p2e_ref[0, 0, :, c].astype(cdt)[:, None]   # (HB, 1)
            best = jnp.minimum(jnp.minimum(prev, nm), m + p2e)
            l = cost + best - m
            carry_ref[0, rows] = l.astype(carry_dt)
            s_out_ref[:, c, :] = (s_ref[:, c, :].astype(cdt)
                                  + l).astype(s_dtype)

    return kernel


def _row_chunk(h: int, limit: int | None = None) -> int:
    """Largest sublane-aligned (x8) divisor of h <= limit (full h if
    none — the dynamic carry slice must be provably 8-aligned)."""
    if limit is None:
        limit = env_int("FSGM_COLHB", 512)
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
                                    hb, nd)
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
                  adaptive: bool,
                  img_above2: jnp.ndarray | None = None,
                  img_below2: jnp.ndarray | None = None) -> jnp.ndarray:
    """(H, W) int32 P2' for direction (dy, dx): max(P1+1, P2 // max(1,
    |I(p) - I(p - r)|)); value where the predecessor is outside the image is
    irrelevant (the kernel's zero carry / x-mask bypasses it) UNLESS a real
    tile carry continues the scan there — then img_above2/img_below2 (the
    (2, W) image rows just outside the tile) supply the true cross-seam
    gradient, matching ops.aggregate._p2_effective."""
    dt = jnp.int16 if p2 < (1 << 15) else jnp.int32
    if not adaptive:
        return jnp.full(img.shape, p2, dtype=dt)
    img = img.astype(jnp.int32)
    h, w = img.shape
    if img_above2 is None and img_below2 is None:
        pred = jnp.roll(img, dy, axis=0)
    else:
        above = (jnp.zeros((2, w), jnp.int32) if img_above2 is None
                 else img_above2.astype(jnp.int32))
        below = (jnp.zeros((2, w), jnp.int32) if img_below2 is None
                 else img_below2.astype(jnp.int32))
        ext = jnp.concatenate([above, img, below], axis=0)
        pred = jax.lax.dynamic_slice_in_dim(ext, 2 - dy, h, axis=0)
    pred = jnp.roll(pred, dx, axis=1)
    diff = jnp.maximum(jnp.abs(img - pred), 1)
    # p2 // diff as an exact f32 floor-division (round 5: the 16-path
    # trace showed the per-direction P2' fusions at ~140 GB/s — integer
    # division is the compute bottleneck).  Exact because f32 division
    # is correctly rounded and quotient*divisor <= p2 < 2^24: a nonexact
    # quotient sits >= 1/diff from any integer while the rounding error
    # is < quotient/2^24 <= 1/diff.  Output i16 when p2 fits (halves
    # the stack's HBM/VMEM traffic; the sweeps upcast per (1, W) row).
    assert p2 < (1 << 24), p2
    q = jnp.floor(jnp.float32(p2) / diff.astype(jnp.float32))
    return jnp.maximum(jnp.asarray(p1 + 1, dt), q.astype(dt))


def plan_dtypes(p2: int, s_max: int | None):
    """(s_dtype, carry_dt): int16 storage where the preset's bounds fit
    (halved HBM/VMEM traffic), else int32.  In-kernel COMPUTE stays int32:
    the current Mosaic toolchain cannot legalize 16-bit min/rotate/reduce
    ("failed to legalize arith.minsi")."""
    s_dtype = jnp.int16 if (s_max is not None and s_max < (1 << 15)) \
        else jnp.int32
    carry_dt = jnp.int16 if 255 + p2 < (1 << 15) else jnp.int32
    return s_dtype, carry_dt


def padded_width(w: int) -> int:
    return -(-w // COL_BLOCK) * COL_BLOCK


def pad_inputs(cost: jnp.ndarray, img: jnp.ndarray):
    """Zero-pad the width to a COL_BLOCK multiple.  Zero-cost columns are a
    NEUTRAL region for the recurrence (all-zero prev row -> best=0, m=0,
    L=C=0), so carries crossing the pad/real boundary reproduce the golden
    image-edge semantics exactly; callers discard the pad slice of S."""
    h, w = img.shape
    wp = padded_width(w)
    cost = cost.astype(jnp.uint8)
    if wp != w:
        cost = jnp.pad(cost, ((0, 0), (0, wp - w), (0, 0)))
        img = jnp.pad(img, ((0, 0), (0, wp - w)), mode="edge")
    return cost, img


def _compute_dtype():
    """In-kernel compute dtype.  int32 by default; FSGM_CDT=int16 re-tests
    16-bit vector arithmetic on the current Mosaic toolchain (halves op
    width and VMEM traffic IF it legalizes — it did not as of round 1:
    "failed to legalize arith.minsi").  INF must keep INF + P2 + Cmax
    within the dtype."""
    if os.environ.get("FSGM_CDT", "int32") == "int16":
        return jnp.int16, 20000
    return jnp.int32, INF32


def _nmin_for(p1: int, label_ext: int | None, inf: int = INF32):
    return make_nmin_1d(p1, inf) if label_ext is None \
        else make_nmin_2d(p1, label_ext, inf)


def row_family_sweep(cost: jnp.ndarray, img: jnp.ndarray,
                     family: Sequence[Tuple[int, int]], p1: int, p2: int,
                     adaptive_p2: bool, s: jnp.ndarray,
                     label_ext: int | None = None,
                     init_carry: jnp.ndarray | None = None,
                     return_carry: bool = False,
                     img_above2: jnp.ndarray | None = None,
                     img_below2: jnp.ndarray | None = None):
    """Fused sweep of one VERTICAL direction family (all dy>0, or all dy<0),
    accumulating into s in place.  Inputs must be pre-padded (pad_inputs).

    For tiled wavefront execution (SURVEY.md §3.5): `init_carry` seeds the
    scan with the upstream tile's exported state and `return_carry` exports
    this tile's; shape (carry_units(family), Wp, D), dtype from
    plan_dtypes.  img_above2/img_below2 are the (2, Wp) image halo rows for
    cross-seam adaptive P2 (down family uses above, up family below)."""
    assert all(dy > 0 for dy, _ in family) or \
        all(dy < 0 for dy, _ in family), family
    reverse = family[0][0] < 0
    cdt, inf = _compute_dtype()
    nmin = _nmin_for(p1, label_ext, inf)
    _, carry_dt = plan_dtypes(p2, None)
    p2e = jnp.stack([_p2_effective(img, dy, dx, p1, p2, adaptive_p2,
                                   img_above2, img_below2)
                     for dy, dx in family], axis=1)        # (H, n, Wp)
    canon = [(abs(dy), dx) for dy, dx in family]
    return _row_sweep(cost, p2e, s, canon, reverse, nmin, cdt,
                      inf, carry_dt, init_carry=init_carry,
                      return_carry=return_carry)


def col_dir_sweep(cost: jnp.ndarray, img: jnp.ndarray,
                  direction: Tuple[int, int], p1: int, p2: int,
                  adaptive_p2: bool, s: jnp.ndarray,
                  label_ext: int | None = None):
    """One HORIZONTAL direction ((0, 1) or (0, -1)) column sweep,
    accumulating into s in place.  Inputs pre-padded (pad_inputs)."""
    dy, dx = direction
    assert dy == 0 and dx in (1, -1), direction
    h, wp, _ = cost.shape
    cdt, inf = _compute_dtype()
    nmin = _nmin_for(p1, label_ext, inf)
    _, carry_dt = plan_dtypes(p2, None)
    hb = _row_chunk(h)
    p2e_h = _p2_effective(img, dy, dx, p1, p2, adaptive_p2)
    # (H, Wp) -> (nb, nh, HB, CB): entry (j, i, r, c) = p2e[i*HB+r, j*CB+c]
    p2e_h = p2e_h.reshape(h // hb, hb, wp // COL_BLOCK, COL_BLOCK)
    p2e_h = p2e_h.transpose(2, 0, 1, 3)
    return _col_sweep(cost, p2e_h, s, reverse=(dx < 0), nmin=nmin,
                      cdt=cdt, carry_dt=carry_dt)


def aggregate_paths(cost: jnp.ndarray, img: jnp.ndarray,
                    dirs: Sequence[Tuple[int, int]], p1: int, p2: int,
                    adaptive_p2: bool = False,
                    label_ext: int | None = None,
                    s_max: int | None = None) -> jnp.ndarray:
    """S = sum_r L_r via fused family sweeps.  Returns (H, W, D) int16 when
    the guaranteed max S fits (pass s_max = num_paths*(invalid_cost+P2)),
    else int32.  Exact-integer match to the golden model."""
    h, w, nd = cost.shape
    s_dtype, _ = plan_dtypes(p2, s_max)
    cost, img = pad_inputs(cost, img)
    wp = img.shape[1]
    s = jnp.zeros((h, wp, nd), dtype=s_dtype)

    down = [r for r in dirs if r[0] > 0]
    up = [r for r in dirs if r[0] < 0]
    horiz = [r for r in dirs if r[0] == 0]

    if down:
        s = row_family_sweep(cost, img, down, p1, p2, adaptive_p2, s,
                             label_ext)
    if up:
        s = row_family_sweep(cost, img, up, p1, p2, adaptive_p2, s,
                             label_ext)
    for r in horiz:
        s = col_dir_sweep(cost, img, r, p1, p2, adaptive_p2, s, label_ext)
    return s[:, :w] if wp != w else s
