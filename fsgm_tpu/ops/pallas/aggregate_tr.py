"""Pallas TPU kernels: TRANSPOSED-layout (labels-on-sublanes) SGM sweeps.

Second-generation aggregation backend (round 2).  The original kernels
(aggregate_pallas.py) put the label axis on the 128-wide LANE dimension,
which makes the per-pixel global min over labels a 14-op lane-rotate
tree — measured as ~half of all vector ops in the sweep, on a kernel that
is VMEM-round-trip bound per op (NOTES-PERF "why aggregation is the
floor").  This module lays the volume out (ROW, LABEL, X') instead:

  * labels ride the SUBLANE axis, the image's scan-perpendicular axis
    rides the lanes;
  * the global min over labels becomes a shrinking 8-aligned overlapped
    slice-halving over sublanes — total traffic ~2 array passes instead
    of 14 (measured 1.67x on the down family: tools/trexp.py);
  * the label-neighbor min (d±1 / 2D grid) becomes sublane shifts (same
    cost as the lane shifts it replaces);
  * the spatial predecessor shift (dx) becomes a lane roll + edge mask;
  * HORIZONTAL paths are vertical paths on the transposed image: the
    (0,±1) column scans reuse this same kernel on a (W, L, H) volume —
    one kernel body serves all four canonical families (row-blocked so
    the W-step grid amortizes per-step overhead);
  * label counts only need to be multiples of 8 (sublane granularity),
    not 128: the 81-label flow window pads to 88 instead of 128 — 1.45x
    less arithmetic than the lane-major kernels.

Layouts: vertical families consume cost (H, L, Wp) and accumulate
S_v (H, L, Wp); horizontal families consume cost (Wp, L, Hp) and
accumulate S_h (Wp, L, Hp).  The merge back to the extraction layout
(H, W, L) is two XLA transposes + an add (~1 ms total at KITTI size —
measured, tools/trexp2.py).

Exactness contract: bit-identical to golden/sgm.py::aggregate_paths,
ops/aggregate.py, and ops/pallas/aggregate_pallas.py (enforced by
tests/unit/test_tr_parity.py).  Same reference capability as
aggregate_pallas.py: SURVEY.md §2.1 "SGM path aggregation".
"""

from __future__ import annotations

import functools as _ft
import os
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fsgm_tpu.utils.envcfg import env_int
from fsgm_tpu.ops.pallas.aggregate_pallas import (
    INF32, _interpret, _p2_effective, plan_dtypes, _compute_dtype)


def sub_min(v: jnp.ndarray) -> jnp.ndarray:
    """(L, X) -> (1, X): min over the sublane (label) axis.

    Shrinking overlapped halvings: each step mins v[:a] with v[n-a:n]
    where a = ceil(n/2) rounded up to sublane granularity (8), so both
    slice offsets stay 8-aligned all the way down to vreg height (below
    8 the sub-vreg slices lower as cheap sublane shifts on a tiny
    array).  Overlap is harmless for a min; exact for any n."""
    n = v.shape[0]
    while n > 8:
        a = -(-(-(-n // 2)) // 8) * 8
        v = jnp.minimum(v[:a], v[n - a:n])
        n = a
    while n > 1:
        a = -(-n // 2)
        v = jnp.minimum(v[:a], v[n - a:n])
        n = a
    return v


def make_tr_nmin_1d(p1: int, inf: int = INF32) -> Callable:
    """min(L[d-1], L[d+1]) + P1 along the sublane (label) axis of (L, X)."""
    def nmin(prev: jnp.ndarray) -> jnp.ndarray:
        f = jnp.full((1,) + prev.shape[1:], inf, prev.dtype)
        lo = jnp.concatenate([f, prev[:-1]], axis=0)
        hi = jnp.concatenate([prev[1:], f], axis=0)
        return jnp.minimum(lo, hi) + p1
    return nmin


def make_tr_nmin_2d(p1: int, ext: int, inf: int = INF32) -> Callable:
    """4-neighbor min over the flattened (ext x ext) flow-label grid, +P1,
    labels on the SUBLANE axis (label l at sublane l; rows beyond ext^2
    are pad planes — never minimal, same semantics as the lane-major
    kernel's 128-pad).  u-neighbors are sublane shifts by 1 masked at the
    u-row wrap, v-neighbors sublane shifts by ext."""
    def nmin(prev: jnp.ndarray) -> jnp.ndarray:
        sub = jax.lax.broadcasted_iota(jnp.int32, prev.shape, 0)
        f1 = jnp.full((1,) + prev.shape[1:], inf, prev.dtype)
        fe = jnp.full((ext,) + prev.shape[1:], inf, prev.dtype)
        left = jnp.concatenate([f1, prev[:-1]], axis=0)
        right = jnp.concatenate([prev[1:], f1], axis=0)
        left = jnp.where(sub % ext == 0, jnp.asarray(inf, prev.dtype), left)
        right = jnp.where(sub % ext == ext - 1,
                          jnp.asarray(inf, prev.dtype), right)
        up = jnp.concatenate([fe, prev[:-ext]], axis=0)
        down = jnp.concatenate([prev[ext:], fe], axis=0)
        return jnp.minimum(jnp.minimum(left, right),
                           jnp.minimum(up, down)) + p1
    return nmin


def _lane_shift(v: jnp.ndarray, dx: int, lane_iota, inf) -> jnp.ndarray:
    """shifted[..., x] = v[..., x - dx]; inf where x - dx is out of range.
    pltpu.roll is circular; the mask kills the wrapped lanes."""
    if dx == 0:
        return v
    w = v.shape[-1]
    r = pltpu.roll(v, dx % w, v.ndim - 1)
    if dx > 0:
        return jnp.where(lane_iota < dx, inf, r)
    return jnp.where(lane_iota >= w + dx, inf, r)


def tr_carry_units(dirs: Sequence[Tuple[int, int]]) -> int:
    return sum(2 if abs(dy) == 2 else 1 for dy, _ in dirs)


# Mask-free pad INF (round 5): small enough to fit the i16 carry, far
# above any real path cost (<= 255 + P2).  See _make_tr_kernel.
INF_PAD = 1 << 14


def _make_tr_kernel(dirs, nd: int, w: int, rb: int, reverse: bool,
                    nmin: Callable, s_dtype, cdt, inf: int, carry_dt,
                    n_steps: int, with_carry: bool, fresh: bool = False,
                    w_true: int | None = None):
    """dirs: canonical (ady, dx), ady in {1, 2}.  Each grid step processes
    `rb` rows of the canonicalized volume (row blocking amortizes per-step
    overhead on the W-long horizontal scans); `reverse` flips both the
    grid index map (in the caller) and the intra-block row order (here).

    Per direction per row, ops on (nd, w) arrays: sublane-halving min
    (~2 array-equivalents), neighbor min (4), lane roll + mask for dx (2
    per shifted operand), best/l (6), carry store (1) — ~60% of the
    lane-major kernel's op count; the win measured 1.67x (trexp.py)."""
    offs, off = [], 0
    for ady, _ in dirs:
        offs.append(off)
        off += 2 if ady == 2 else 1
    n_units = off

    def kernel(*refs):
        s_ref = None
        if with_carry and fresh:
            (c_ref, p2e_ref, cin_ref,
             s_out_ref, cout_ref, carry_ref) = refs
        elif with_carry:
            (c_ref, p2e_ref, s_ref, cin_ref,
             s_out_ref, cout_ref, carry_ref) = refs
        elif fresh:
            c_ref, p2e_ref, s_out_ref, carry_ref = refs
        else:
            c_ref, p2e_ref, s_ref, s_out_ref, carry_ref = refs
        i = pl.program_id(0)

        # ady=2 (knight) carries: PARITY slots instead of a per-row
        # shift-down copy (round 4) — row g's 2-back predecessor L(g-2)
        # (L(g+2) reversed) shares g's parity, so slot o + (g & 1) is
        # read-then-overwritten in place, deleting one (nd, w) VMEM
        # copy per knight direction per row on the throughput-bound
        # sweeps.  Needs rb even so g & 1 == r & 1 is static; the
        # EXTERNAL carry format stays (latest, previous) — forward
        # scans swap at the edges (L(-1) has parity 1), reverse scans
        # map straight (L(H') has parity 0 for even H').
        parity = rb % 2 == 0

        @pl.when(i == 0)
        def _():
            if with_carry:
                if parity and not reverse:
                    for k, (ady, _dx) in enumerate(dirs):
                        o = offs[k]
                        if ady == 2:
                            carry_ref[o] = cin_ref[o + 1].astype(
                                carry_ref.dtype)
                            carry_ref[o + 1] = cin_ref[o].astype(
                                carry_ref.dtype)
                        else:
                            carry_ref[o] = cin_ref[o].astype(
                                carry_ref.dtype)
                else:
                    carry_ref[...] = cin_ref[...].astype(carry_ref.dtype)
            else:
                carry_ref[...] = jnp.zeros(carry_ref.shape, carry_ref.dtype)

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
        # Mask-free shifted directions (round 5): when the lane axis
        # carries >= max|dx| PAD lanes past w_true, the post-roll
        # `where` masks are provably redundant — the kernel pins every
        # pad-lane carry to exactly INF_PAD each row by (a) forcing
        # cost = INF_PAD and p2e = 0 on pad lanes (two shared ops/row
        # replacing one (nd, w) mask per shifted direction), so
        # l_pad = INF_PAD + (best - m) = INF_PAD exactly: best = m
        # because cand >= m lane-wise and m + p2e_pad = m.  Rolled-in
        # pad values then reproduce the golden edge rule bit-exactly
        # (l_edge = cost + INF_PAD - INF_PAD = cost), and wrapped REAL
        # values only ever land in pad lanes, whose next carry is
        # re-pinned by the forced cost.  Row 0 from the zero carry
        # computes l = cost at edges either way (m = cand = 0).
        mask_free = (w_true is not None and w_true < w
                     and all(abs(dx) <= w - w_true for _, dx in dirs))
        rows = range(rb - 1, -1, -1) if reverse else range(rb)
        for r in rows:
            # fresh mode (round-4 trace finding): the FIRST family of a
            # volume accumulates from zero, so reading an aliased
            # all-zero S block (plus XLA materializing the zero
            # broadcast in HBM, ~2.9 ms/16-frame dispatch each) is pure
            # waste — start the accumulator at the first direction's L
            acc = None if fresh else s_ref[r].astype(cdt)  # (nd, w)
            cost = c_ref[r].astype(cdt)
            p2e_row = p2e_ref[r]
            if mask_free:
                cost = jnp.where(lane >= w_true, INF_PAD, cost)
                p2e_row = jnp.where(lane >= w_true, 0,
                                    p2e_row.astype(jnp.int32))
            for k, (ady, dx) in enumerate(dirs):
                o = offs[k]
                slot = (o + (r & 1) if ady == 2 and parity
                        else o + ady - 1)
                prev = carry_ref[slot].astype(cdt)
                m = sub_min(prev)                         # (1, w)
                # min commutes with the masked shift (mask value INF is
                # absorbed), so pre-minimizing prev with its neighbor term
                # shifts ONE (nd, w) operand instead of two — the kernel
                # is VMEM-round-trip bound per op, so this is a direct
                # ~2-op/row saving on every dx != 0 direction
                cand = jnp.minimum(prev, nmin(prev))      # (nd, w)
                if dx != 0 and mask_free:
                    cand = pltpu.roll(cand, dx % w, cand.ndim - 1)
                    m = pltpu.roll(m, dx % w, m.ndim - 1)
                elif dx != 0:
                    cand = _lane_shift(cand, dx, lane, inf)
                    m = _lane_shift(m, dx, lane, inf)
                mp = m + p2e_row[k][None, :].astype(cdt)
                best = jnp.minimum(cand, mp)
                # where x-dx is outside, cand=m=INF -> l = cost
                # (+INF-INF): the golden edge rule, mask-free
                l = cost + best - m
                if ady == 2 and parity:
                    carry_ref[o + (r & 1)] = l.astype(carry_dt)
                else:
                    if ady == 2:
                        carry_ref[o + 1] = carry_ref[o]
                    carry_ref[o] = l.astype(carry_dt)
                acc = l if acc is None else acc + l
            s_out_ref[r] = acc.astype(s_dtype)

        if with_carry:
            @pl.when(i == n_steps - 1)
            def _():
                if parity and not reverse:
                    # back to the external (latest, previous) layout:
                    # the last processed row H'-1 has parity 1
                    for k, (ady, _dx) in enumerate(dirs):
                        o = offs[k]
                        if ady == 2:
                            cout_ref[o] = carry_ref[o + 1].astype(
                                cout_ref.dtype)
                            cout_ref[o + 1] = carry_ref[o].astype(
                                cout_ref.dtype)
                        else:
                            cout_ref[o] = carry_ref[o].astype(
                                cout_ref.dtype)
                else:
                    cout_ref[...] = carry_ref[...].astype(cout_ref.dtype)

    return kernel, n_units


def _scratch_dt(cdt, carry_dt):
    """In-kernel carry scratch dtype.  Compute dtype (i32) by DEFAULT as
    of round 5: dropping the i16<->i32 conversion on every carry
    load/store (2 vector ops per direction per row) beat the halved
    carry VMEM traffic in all three A/B pairs on the round-5 graph
    (kitti16 7.74/8.13 vs 8.16/8.19, kitti 5.25 vs 5.41 ms/frame —
    NOTES-PERF round 5; the r3 'neutral' verdict predates the
    compute-bound regime).  FSGM_TR_CARRY32=0 restores the i16 scratch
    for A/B.  Exactness is unaffected either way (carry values are
    bounded by Cmax + P2; test_carry32_scratch_matches)."""
    if os.environ.get("FSGM_TR_CARRY32", "1") == "1":
        return cdt
    return carry_dt


def tr_family_sweep(cost_t: jnp.ndarray, img: jnp.ndarray,
                    family: Sequence[Tuple[int, int]], p1: int, p2: int,
                    adaptive_p2: bool, s_t: jnp.ndarray | None,
                    label_ext: int | None = None,
                    init_carry: jnp.ndarray | None = None,
                    return_carry: bool = False,
                    img_above2: jnp.ndarray | None = None,
                    img_below2: jnp.ndarray | None = None,
                    row_block: int | None = None,
                    out_dtype=None,
                    w_true: int | None = None):
    """One vertical-family pass in transposed layout.

    cost_t: (H', L, W') u8 — the CANONICALIZED volume (for horizontal
    image paths the caller passes the transposed-image volume (Wp, L, Hp)
    and directions mapped (0,dx) -> (dx,0)).  img: (H', W') matching the
    canonical frame (used for adaptive P2).  s_t: (H', L, W') accumulator,
    aliased in place — or None ("fresh" mode, round-4 trace finding): the
    kernel takes no S input at all and writes sum_r L_r directly in
    `out_dtype`, skipping the zero-broadcast materialization AND the
    all-zero S read of a first-family call.  family: all dy>0 or all dy<0.

    init_carry/return_carry expose the (tr_carry_units, L, W') boundary
    state exactly like aggregate_pallas.row_family_sweep (zeros = start
    of image; a real carry continues across a tile seam).

    w_true: true lane count when the lane axis carries >= max|dx| pad
    lanes — enables the mask-free shifted directions (see
    _make_tr_kernel; bit-exact, round 5).  Only valid with the zero
    initial carry (the single-chip paths): a tile-seam init_carry's pad
    lanes are not INF_PAD-pinned, so callers with carries pass None."""
    assert w_true is None or init_carry is None, \
        "mask-free pads require the zero initial carry"
    assert all(dy > 0 for dy, _ in family) or \
        all(dy < 0 for dy, _ in family), family
    reverse = family[0][0] < 0
    h, nd, w = cost_t.shape
    n_dirs = len(family)
    fresh = s_t is None
    s_dtype = jnp.dtype(out_dtype) if fresh else s_t.dtype
    cdt, inf = _compute_dtype()
    nmin = (make_tr_nmin_1d(p1, inf) if label_ext is None
            else make_tr_nmin_2d(p1, label_ext, inf))
    _, carry_dt = plan_dtypes(p2, None)
    scratch_dt = _scratch_dt(cdt, carry_dt)
    # NOTE: _p2_effective takes the SIGNED dy (the predecessor offset);
    # only the kernel's scan order is canonicalized.
    p2e = jnp.stack([_p2_effective(img, dy, dx, p1, p2, adaptive_p2,
                                   img_above2, img_below2)
                     for dy, dx in family], axis=1)       # (H', n, W')
    canon = [(abs(dy), dx) for dy, dx in family]

    if row_block is None:
        row_block = env_int("FSGM_TR_RB", 8)
    rb = row_block if h % row_block == 0 else 1
    n_steps = h // rb
    blk = (lambda i: n_steps - 1 - i) if reverse else (lambda i: i)

    with_carry = init_carry is not None or return_carry
    kernel, n_units = _make_tr_kernel(canon, nd, w, rb, reverse, nmin,
                                      s_dtype, cdt, inf, scratch_dt,
                                      n_steps, with_carry, fresh, w_true)
    blkmap = lambda i: (blk(i), 0, 0)                     # noqa: E731
    in_specs = [
        pl.BlockSpec((rb, nd, w), blkmap),
        pl.BlockSpec((rb, n_dirs, w), blkmap),
    ]
    s_args, aliases = (), {}
    if not fresh:
        in_specs.append(pl.BlockSpec((rb, nd, w), blkmap))
        s_args, aliases = (s_t,), {2: 0}
    out_spec = pl.BlockSpec((rb, nd, w), blkmap)
    scratch = [pltpu.VMEM((n_units, nd, w), scratch_dt)]
    cp = pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)

    if not with_carry:
        return pl.pallas_call(
            kernel, grid=(n_steps,), in_specs=in_specs, out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((h, nd, w), s_dtype),
            scratch_shapes=scratch, input_output_aliases=aliases,
            compiler_params=cp, interpret=_interpret(),
        )(cost_t, p2e, *s_args)

    if init_carry is None:
        init_carry = jnp.zeros((n_units, nd, w), carry_dt)
    else:
        assert init_carry.shape == (n_units, nd, w), (
            init_carry.shape, (n_units, nd, w))
        init_carry = init_carry.astype(carry_dt)
    whole = pl.BlockSpec((n_units, nd, w), lambda i: (0, 0, 0))
    s_out, carry_out = pl.pallas_call(
        kernel, grid=(n_steps,), in_specs=in_specs + [whole],
        out_specs=[out_spec, whole],
        out_shape=[jax.ShapeDtypeStruct((h, nd, w), s_dtype),
                   jax.ShapeDtypeStruct((n_units, nd, w), carry_dt)],
        scratch_shapes=scratch, input_output_aliases=aliases,
        compiler_params=cp, interpret=_interpret(),
    )(cost_t, p2e, *s_args, init_carry)
    if return_carry:
        return s_out, carry_out
    return s_out


def _make_tr_dual_kernel(dirs_d, dirs_u, nd: int, w: int, rb: int,
                         nmin: Callable, s_dtype, cdt, inf: int, carry_dt,
                         n_steps: int):
    """Both vertical families in ONE kernel: grid step i runs the down
    chains on row block i and the up chains on row block n_steps-1-i
    (separate carries, separate outputs — no cross-step aliasing hazards).
    Halves the pallas_call count per volume AND drops the aliased
    zero-accumulator read (each family writes its S blocks fresh)."""
    def offsets(dirs):
        offs, off = [], 0
        for ady, _ in dirs:
            offs.append(off)
            off += 2 if ady == 2 else 1
        return offs, off

    offs_d, units_d = offsets(dirs_d)
    offs_u, units_u = offsets(dirs_u)

    def kernel(cd_ref, cu_ref, p2d_ref, p2u_ref, sd_ref, su_ref,
               carry_d, carry_u):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            carry_d[...] = jnp.zeros(carry_d.shape, carry_d.dtype)
            carry_u[...] = jnp.zeros(carry_u.shape, carry_u.dtype)

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)

        def family(c_ref, p2e_ref, s_ref, carry_ref, dirs, offs,
                   reverse: bool):
            rows = range(rb - 1, -1, -1) if reverse else range(rb)
            for r in rows:
                cost = c_ref[r].astype(cdt)
                acc = None
                for k, (ady, dx) in enumerate(dirs):
                    o = offs[k]
                    prev = carry_ref[o + ady - 1].astype(cdt)
                    m = sub_min(prev)
                    # pre-min before the shift: see _make_tr_kernel
                    cand = jnp.minimum(prev, nmin(prev))
                    if dx != 0:
                        cand = _lane_shift(cand, dx, lane, inf)
                        m = _lane_shift(m, dx, lane, inf)
                    mp = m + p2e_ref[r, k][None, :].astype(cdt)
                    best = jnp.minimum(cand, mp)
                    l = cost + best - m
                    if ady == 2:
                        carry_ref[o + 1] = carry_ref[o]
                    carry_ref[o] = l.astype(carry_dt)
                    acc = l if acc is None else acc + l
                s_ref[r] = acc.astype(s_dtype)

        family(cd_ref, p2d_ref, sd_ref, carry_d, dirs_d, offs_d, False)
        family(cu_ref, p2u_ref, su_ref, carry_u, dirs_u, offs_u, True)

    return kernel, units_d, units_u


def tr_dual_family_sweep(cost_t: jnp.ndarray, img: jnp.ndarray,
                         fam_down: Sequence[Tuple[int, int]],
                         fam_up: Sequence[Tuple[int, int]],
                         p1: int, p2: int, adaptive_p2: bool,
                         s_dtype,
                         label_ext: int | None = None,
                         row_block: int | None = None) -> jnp.ndarray:
    """Both vertical families of a canonicalized volume in one launch.

    cost_t: (H', L, W') u8; fam_down all dy>0, fam_up all dy<0 (for the
    horizontal image families the caller maps (0,dx) -> (dx,0) / (-dx,0)
    on the transposed volume, exactly like tr_family_sweep).  Returns the
    FRESH (H', L, W') sum of both families' L in s_dtype — the single-chip
    fast path (tiled wavefronts need per-family carries and keep
    tr_family_sweep).  Bit-identical to two tr_family_sweep passes
    (tests/unit/test_tr_parity.py::test_dual_family_matches_single)."""
    assert all(dy > 0 for dy, _ in fam_down), fam_down
    assert all(dy < 0 for dy, _ in fam_up), fam_up
    h, nd, w = cost_t.shape
    cdt, inf = _compute_dtype()
    nmin = (make_tr_nmin_1d(p1, inf) if label_ext is None
            else make_tr_nmin_2d(p1, label_ext, inf))
    _, carry_dt = plan_dtypes(p2, None)
    carry_dt = _scratch_dt(cdt, carry_dt)

    def p2e_of(family):
        return jnp.stack([_p2_effective(img, dy, dx, p1, p2, adaptive_p2,
                                        None, None)
                          for dy, dx in family], axis=1)     # (H', n, W')

    p2e_d, p2e_u = p2e_of(fam_down), p2e_of(fam_up)
    canon_d = [(abs(dy), dx) for dy, dx in fam_down]
    canon_u = [(abs(dy), dx) for dy, dx in fam_up]

    if row_block is None:
        row_block = env_int("FSGM_TR_RB", 8)
    rb = row_block if h % row_block == 0 else 1
    n_steps = h // rb

    kernel, units_d, units_u = _make_tr_dual_kernel(
        canon_d, canon_u, nd, w, rb, nmin, s_dtype, cdt, inf, carry_dt,
        n_steps)

    fwd = lambda i: (i, 0, 0)                   # noqa: E731
    rev = lambda i: (n_steps - 1 - i, 0, 0)     # noqa: E731
    in_specs = [
        pl.BlockSpec((rb, nd, w), fwd),                  # cost (down blk)
        pl.BlockSpec((rb, nd, w), rev),                  # cost (up blk)
        pl.BlockSpec((rb, len(fam_down), w), fwd),       # p2e down
        pl.BlockSpec((rb, len(fam_up), w), rev),         # p2e up
    ]
    out_specs = [pl.BlockSpec((rb, nd, w), fwd),
                 pl.BlockSpec((rb, nd, w), rev)]
    scratch = [pltpu.VMEM((units_d, nd, w), carry_dt),
               pltpu.VMEM((units_u, nd, w), carry_dt)]
    cp = pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)
    s_d, s_u = pl.pallas_call(
        kernel, grid=(n_steps,), in_specs=in_specs, out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct((h, nd, w), s_dtype),
                   jax.ShapeDtypeStruct((h, nd, w), s_dtype)],
        scratch_shapes=scratch, compiler_params=cp, interpret=_interpret(),
    )(cost_t, cost_t, p2e_d, p2e_u)
    return s_d + s_u


def fold_max_lanes() -> int:
    """Per-frame lane-count ceiling for the batch lane-fold.  Measured
    2026-08-19 (NOTES-PERF "horizontal-family batch lane-fold"): folding
    WINS when the per-frame lane count (padded image height) is small —
    Tsukuba hp=288 2.73 -> 2.39 ms/frame, flow coarse levels — and LOSES
    at KITTI hp=376 (8-path 10.75 -> 10.88-11.16; 16-path 13.54 -> 15.6-
    17.8: the folded i16 S unfold transpose outweighs the short-lane
    saving once lanes are already multiple vregs wide).  Default gates at
    320; FSGM_FOLD_MAXH overrides (0 disables all folding).

    NOTE (A/B hazard): this env var is read at TRACE time inside jitted
    code and the jit cache is NOT keyed on it — flipping FSGM_FOLD_MAXH
    (or FSGM_HFOLD) after a shape has compiled silently reuses the
    previously compiled variant.  A/B runs need a fresh process per
    setting (stereo_sgm_batch threads its fold decision as a static jit
    arg, so the explicit batched entry is safe)."""
    return env_int("FSGM_FOLD_MAXH", 320)


def fold_max_total_lanes() -> int:
    """VMEM guard on the FOLDED lane count (batch * padded height): the
    folded sweep's per-grid-step blocks and carry scratch are (rb, L,
    B*Hp) i32, so an unbounded batch would grow them past the ~96 MB
    VMEM ceiling at compile time.  8192 lanes * 128 labels * 4 B = 4 MB
    per live array — comfortable headroom for Mosaic's working set while
    still letting Tsukuba fold at batch 16 (16*288 = 4608) and the flow
    pyramid's coarse levels fold at batch 8.  Batches past the ceiling
    serialize (plain vmap), which is also the measured-faster regime for
    wide lane counts.  FSGM_FOLD_MAXTOTAL overrides; same trace-time
    caching caveat as fold_max_lanes."""
    return env_int("FSGM_FOLD_MAXTOTAL", 8192)


def _fresh_enabled() -> bool:
    """Fresh-write first-family sweeps (no zero accumulator).  Default on;
    FSGM_TR_FRESH=0 pins the round-3 zero-accumulator graph for A/B.
    Read at trace time — same fresh-process caveat as fold_max_lanes."""
    return os.environ.get("FSGM_TR_FRESH", "1") != "0"


@_ft.lru_cache(maxsize=None)
def _hfamily_sweep_cv_fresh(family: Tuple[Tuple[int, int], ...], p1: int,
                            p2: int, adaptive_p2: bool,
                            label_ext: int | None, out_dtype_name: str,
                            row_block: int | None = None):
    """Fresh-mode counterpart of _hfamily_sweep_cv: (cost_t, img) -> S
    with no accumulator input.  Same lane-fold batching rule."""
    assert all(dx == 0 for _, dx in family), family
    out_dtype = jnp.dtype(out_dtype_name)

    def base(cost_t, img):
        return tr_family_sweep(cost_t, img, list(family), p1, p2,
                               adaptive_p2, None, label_ext,
                               out_dtype=out_dtype, row_block=row_block)

    cv = jax.custom_batching.custom_vmap(base)

    @cv.def_vmap
    def _rule(axis_size, in_batched, cost_t, img):
        b = axis_size
        if not in_batched[0]:
            cost_t = jnp.broadcast_to(cost_t, (b,) + cost_t.shape)
        if not in_batched[1]:
            img = jnp.broadcast_to(img, (b,) + img.shape)
        _, w, nd, hp = cost_t.shape
        if hp > fold_max_lanes() or b * hp > fold_max_total_lanes():
            plain = lambda c, g: tr_family_sweep(  # noqa: E731
                c, g, list(family), p1, p2, adaptive_p2, None, label_ext,
                out_dtype=out_dtype)
            return jax.vmap(plain)(cost_t, img), True
        fold = lambda x: jnp.transpose(x, (1, 2, 0, 3)).reshape(  # noqa
            w, nd, b * hp)
        out = base(fold(cost_t),
                   jnp.transpose(img, (1, 0, 2)).reshape(w, b * hp))
        out = out.reshape(w, nd, b, hp)
        return jnp.transpose(out, (2, 0, 1, 3)), True

    return cv


@_ft.lru_cache(maxsize=None)
def _hfamily_sweep_cv(family: Tuple[Tuple[int, int], ...], p1: int,
                      p2: int, adaptive_p2: bool, label_ext: int | None,
                      row_block: int | None = None):
    """custom_vmap'd horizontal-family sweep: under jax.vmap, FOLD the
    batch into the lane axis instead of serializing the Pallas grid.

    Valid because these canonical directions are all (ady, dx=0): the
    kernel has NO cross-lane operations (label mins ride sublanes, the
    scan rides the grid), so per-lane results are bit-exact per frame.
    Every vmapped consumer benefits transparently — the flow pyramid
    under the bench's frame vmap and the fwd/bwd lockstep vmap above all
    (the horizontal volume's lanes are the image HEIGHT, the short axis;
    see aggregate_paths_tr_batch for the measured rationale).  Nested
    vmaps fold recursively AS LONG AS each inner level folds (the folded
    call re-enters this cv with a wider lane axis); once a level takes
    the wide-lane serialized fallback, that fallback calls
    tr_family_sweep directly and every remaining outer vmap serializes
    too."""
    assert all(dx == 0 for _, dx in family), family

    def base(cost_t, img, s_t):
        return tr_family_sweep(cost_t, img, list(family), p1, p2,
                               adaptive_p2, s_t, label_ext,
                               row_block=row_block)

    cv = jax.custom_batching.custom_vmap(base)

    @cv.def_vmap
    def _rule(axis_size, in_batched, cost_t, img, s_t):
        b = axis_size
        if not in_batched[0]:
            cost_t = jnp.broadcast_to(cost_t, (b,) + cost_t.shape)
        if not in_batched[1]:
            img = jnp.broadcast_to(img, (b,) + img.shape)
        if not in_batched[2]:
            s_t = jnp.broadcast_to(s_t, (b,) + s_t.shape)
        _, w, nd, hp = cost_t.shape
        if hp > fold_max_lanes() or b * hp > fold_max_total_lanes():
            # lanes already wide (or total folded width past the VMEM
            # guard): folding measured slower / unsafe — serialize over
            # the leading grid dim like plain vmap would.  `plain` calls
            # tr_family_sweep directly, NOT the cv wrapper, so this
            # branch fully serializes: an enclosing vmap cannot re-fold
            # it (routing through cv here would recurse into this same
            # rule with unchanged hp, i.e. infinitely).
            plain = lambda c, g, s: tr_family_sweep(  # noqa: E731
                c, g, list(family), p1, p2, adaptive_p2, s, label_ext)
            return jax.vmap(plain)(cost_t, img, s_t), True
        fold = lambda x: jnp.transpose(x, (1, 2, 0, 3)).reshape(  # noqa
            w, nd, b * hp)
        out = base(fold(cost_t),
                   jnp.transpose(img, (1, 0, 2)).reshape(w, b * hp),
                   fold(s_t))
        out = out.reshape(w, nd, b, hp)
        return jnp.transpose(out, (2, 0, 1, 3)), True

    return cv


def aggregate_paths_tr_batch(cost_bhlw: jnp.ndarray, imgs: jnp.ndarray,
                             dirs: Sequence[Tuple[int, int]],
                             p1: int, p2: int, adaptive_p2: bool = False,
                             label_ext: int | None = None,
                             s_max: int | None = None,
                             major_out: bool = False,
                             pair_out: bool = False,
                             cost_bwlh: jnp.ndarray | None = None
                             ) -> jnp.ndarray:
    """Batched aggregate_paths_tr with the HORIZONTAL family lane-folded.

    The horizontal-family sweeps run on the transposed (W, L, H) volume,
    so their vector lanes are the IMAGE HEIGHT — short (375 at KITTI,
    288 at Tsukuba) compared to the vertical family's W lanes (1248).
    Measured per-direction cost is ~1.5x the row sweeps purely from that
    (NOTES-PERF stage roofline).  A vmapped batch serializes the Pallas
    grid (leading batch dimension), wasting the short lanes B times over.

    This entry folds the batch INTO the lane axis instead: per-frame
    (W, L, Hp) volumes concatenate to one (W, L, B*Hp) sweep.  The
    horizontal family has NO cross-lane operations (its canonical
    directions are (dx, 0) -> ady=1, dx=0: the label min/neighbor ops ride
    sublanes, the scan rides the grid), so per-lane results are bit-exact
    per frame by construction; the Hp pad between frames is the same
    neutral zero-cost region the unbatched path already uses.  The
    vertical family keeps the plain vmap (its lanes are already W-wide).

    cost_bhlw: (B, H, L, W) u8; imgs: (B, H, W).  Returns (B, H, W, L)
    int16/int32 — or (B, H, L, W) with major_out=True."""
    b, h, nd, w = cost_bhlw.shape
    s_dtype, _ = plan_dtypes(p2, s_max)

    down = [r for r in dirs if r[0] > 0]
    up = [r for r in dirs if r[0] < 0]
    horiz = [r for r in dirs if r[0] == 0]

    s = None
    if down or up:
        def vert(c, img):
            if down and up and _dual_enabled():
                return tr_dual_family_sweep(c, img, down, up, p1, p2,
                                            adaptive_p2, s_dtype, label_ext)
            first = down if down else up
            if _fresh_enabled():
                s_v = tr_family_sweep(c, img, first, p1, p2, adaptive_p2,
                                      None, label_ext, out_dtype=s_dtype)
            else:
                s_v = tr_family_sweep(c, img, first, p1, p2, adaptive_p2,
                                      jnp.zeros((h, nd, w), s_dtype),
                                      label_ext)
            if down and up:
                s_v = tr_family_sweep(c, img, up, p1, p2, adaptive_p2,
                                      s_v, label_ext)
            return s_v
        s = jax.vmap(vert)(cost_bhlw, imgs)

    if horiz:
        hp, wp = _pad8(h), _pad8(w)
        if cost_bwlh is not None:
            # pre-built folded volume (cost_tr.cost_volume_wlh_batch) —
            # no XLA pad+transpose fold pass at all
            assert cost_bwlh.shape == (wp, nd, b * hp), (cost_bwlh.shape,
                                                         (wp, nd, b * hp))
            cwlh = cost_bwlh
        else:
            # ONE u8 transpose pass: pad first so (3, 2, 0, 1) lands
            # directly on the folded (W, L, B*Hp) layout
            cb = jnp.pad(cost_bhlw,
                         ((0, 0), (0, hp - h), (0, 0), (0, wp - w)))
            cwlh = jnp.transpose(cb, (3, 2, 0, 1)).reshape(wp, nd, b * hp)
        imgt = jnp.pad(imgs, ((0, 0), (0, hp - h), (0, wp - w)),
                       mode="edge")
        imgt = jnp.transpose(imgt, (2, 0, 1)).reshape(wp, b * hp)
        fwd = [(dx, 0) for dy, dx in horiz if dx > 0]
        bwd = [(dx, 0) for dy, dx in horiz if dx < 0]
        if fwd and bwd and _dual_enabled():
            s_h = tr_dual_family_sweep(cwlh, imgt, fwd, bwd, p1, p2,
                                       adaptive_p2, s_dtype, label_ext)
        else:
            first = fwd if fwd else bwd
            if _fresh_enabled():
                s_h = tr_family_sweep(cwlh, imgt, first, p1, p2,
                                      adaptive_p2, None, label_ext,
                                      out_dtype=s_dtype)
            else:
                s_h = tr_family_sweep(cwlh, imgt, first, p1, p2,
                                      adaptive_p2,
                                      jnp.zeros((wp, nd, b * hp), s_dtype),
                                      label_ext)
            if fwd and bwd:
                s_h = tr_family_sweep(cwlh, imgt, bwd, p1, p2,
                                      adaptive_p2, s_h, label_ext)
        if pair_out:
            assert s is not None and not major_out
            s_h = jnp.transpose(s_h.reshape(wp, nd, b, hp), (2, 3, 1, 0))
            return s, s_h                      # (B,H,L,W), (B,Hp,L,Wp)
        s_h = s_h[:w].reshape(w, nd, b, hp)[..., :h]
        s_h = jnp.transpose(s_h, (2, 3, 1, 0))                 # (B,H,L,W)
        s = s + s_h if s is not None else s_h

    if major_out:
        return s
    return jnp.transpose(s, (0, 1, 3, 2))


def _dual_enabled() -> bool:
    """Fused dual-family launch — measured NEUTRAL on the real TPU
    (stereo batch-16: 13.87 vs 13.85 ms/frame; flow batch-1: 62.1 vs
    61.1 — 2026-08-19): the vmap/pyramid launch overhead it removes is
    already hidden by Mosaic's grid pipelining.  Kept as an opt-in
    experiment (FSGM_TR_DUAL=1) with a bit-exactness test."""
    return os.environ.get("FSGM_TR_DUAL", "0") == "1"


def _pad8(n: int) -> int:
    return -(-n // 8) * 8


def aggregate_paths_tr(cost_hlw: jnp.ndarray, img: jnp.ndarray,
                       dirs: Sequence[Tuple[int, int]], p1: int, p2: int,
                       adaptive_p2: bool = False,
                       label_ext: int | None = None,
                       s_max: int | None = None,
                       cost_wlh: jnp.ndarray | None = None,
                       major_out: bool = False,
                       pair_out: bool = False,
                       w_true: int | None = None) -> jnp.ndarray:
    """S = sum_r L_r via transposed-layout family sweeps.

    cost_hlw: (H, L, W) u8 label-MAJOR cost (L may exceed the true label
    count with invalid-cost pad planes — e.g. flow's 81 padded to 88).
    cost_wlh: the same values laid out (W, L, H) for the horizontal
    family (built directly by cost_volume_stereo_major_cols, or derived
    here by one XLA transpose if omitted).  Returns (H, W, L) int16/int32
    — same contract as aggregate_pallas.aggregate_paths — or, with
    major_out=True, the label-MAJOR (H, L, W) S (saves one transpose;
    consumers extract with ops/extract.py's *_major functions).

    pair_out=True (requires both family groups; stereo fused-kernel
    extraction path) returns the UNMERGED pair (s_v (H, L, W),
    s_h_t (Hp, L, Wp)) — still padded; the extraction kernel adds them
    in-kernel and its BlockSpec skips the pads, deleting two full-volume
    XLA passes (slice + add) that the round-4 trace showed costing
    ~0.9 ms/frame at KITTI size."""
    h, nd, w = cost_hlw.shape
    s_dtype, _ = plan_dtypes(p2, s_max)

    down = [r for r in dirs if r[0] > 0]
    up = [r for r in dirs if r[0] < 0]
    horiz = [r for r in dirs if r[0] == 0]

    # NOTE (measured 2026-08-19): padding the vertical scan axis to the
    # row-block multiple (so H=375 runs 47 rb=8 grid steps instead of 375
    # rb=1 steps; zero-cost pad rows reproduce the neutral carry exactly
    # in both scan orders) is NEUTRAL on the real TPU — stereo batch-16
    # 11.66 vs 11.59 ms/frame, flow batch-8 27.14 vs 27.26 — Mosaic's
    # grid pipelining already hides the per-step overhead at these block
    # sizes, so the rb=1 fallback costs nothing and the pad was reverted.
    s_v = None
    if down and up and _dual_enabled():
        s_v = tr_dual_family_sweep(cost_hlw, img, down, up, p1, p2,
                                   adaptive_p2, s_dtype, label_ext)
    elif down or up:
        first = down if down else up
        if _fresh_enabled():
            s_v = tr_family_sweep(cost_hlw, img, first, p1, p2,
                                  adaptive_p2, None, label_ext,
                                  out_dtype=s_dtype, w_true=w_true)
        else:
            s_v = tr_family_sweep(cost_hlw, img, first, p1, p2,
                                  adaptive_p2,
                                  jnp.zeros((h, nd, w), s_dtype),
                                  label_ext, w_true=w_true)
        if down and up:
            s_v = tr_family_sweep(cost_hlw, img, up, p1, p2, adaptive_p2,
                                  s_v, label_ext, w_true=w_true)

    s_h = None
    if horiz:
        # Horizontal paths on I are vertical paths on I^T.  Both pads are
        # NEUTRAL zero-cost regions (all-zero prev rows make the
        # recurrence degenerate to L = C = 0, the start-of-image
        # semantics), so scans crossing into/out of them are exact and
        # the pad slices of S are discarded:
        #   * axis 0 (the scan axis, length W) pads to the row-block
        #     multiple so the grid isn't W tiny steps;
        #   * axis 2 (lanes, length H) pads to sublane granularity.
        hp, wp = _pad8(h), _pad8(w)
        if cost_wlh is None:
            cost_wlh = jnp.transpose(cost_hlw, (2, 1, 0))
        pw = wp - cost_wlh.shape[0]
        ph = hp - cost_wlh.shape[2]
        if pw or ph:
            cost_wlh = jnp.pad(cost_wlh, ((0, pw), (0, 0), (0, ph)))
        imgt = jnp.pad(img, ((0, hp - h), (0, wp - w)), mode="edge").T
        fwd = [(dx, 0) for dy, dx in horiz if dx > 0]
        bwd = [(dx, 0) for dy, dx in horiz if dx < 0]
        # Horizontal scans run W grid steps (1248 at KITTI vs the
        # verticals' 376) — probe a taller row block to amortize
        # per-step overhead on the long chain: FSGM_TR_RBH (must divide
        # the padded W; falls back to the default rb otherwise).
        rbh = env_int("FSGM_TR_RBH", 0)
        rbh = rbh if rbh > 0 and wp % rbh == 0 else None
        if fwd and bwd and _dual_enabled():
            s_h = tr_dual_family_sweep(cost_wlh, imgt, fwd, bwd, p1, p2,
                                       adaptive_p2, s_dtype, label_ext)
        else:
            # via the custom_vmap wrapper: under jax.vmap these sweeps
            # lane-fold the batch (bit-exact; the family has no
            # cross-lane ops) instead of serializing the Pallas grid —
            # this is what batches the flow pyramid's column sweeps.
            # FSGM_HFOLD=0 pins the plain serialized sweep for A/B.
            if os.environ.get("FSGM_HFOLD", "1") == "0":
                sweep = lambda f: (lambda c, g, s: tr_family_sweep(  # noqa
                    c, g, list(f), p1, p2, adaptive_p2, s, label_ext,
                    row_block=rbh))
                fresh_sweep = lambda f: (lambda c, g: tr_family_sweep(  # noqa
                    c, g, list(f), p1, p2, adaptive_p2, None, label_ext,
                    out_dtype=s_dtype, row_block=rbh))
            else:
                sweep = lambda f: _hfamily_sweep_cv(  # noqa: E731
                    tuple(f), p1, p2, adaptive_p2, label_ext, rbh)
                fresh_sweep = lambda f: _hfamily_sweep_cv_fresh(  # noqa
                    tuple(f), p1, p2, adaptive_p2, label_ext,
                    jnp.dtype(s_dtype).name, rbh)
            first = fwd if fwd else bwd
            if _fresh_enabled():
                s_h = fresh_sweep(first)(cost_wlh, imgt)
            else:
                s_h = sweep(first)(cost_wlh, imgt,
                                   jnp.zeros((wp, nd, hp), s_dtype))
            if fwd and bwd:
                s_h = sweep(bwd)(cost_wlh, imgt, s_h)
        if pair_out:
            # round-4 trace finding: slicing the pads (a full S pass) and
            # the materialized s_v + s_h add (another) are deleted by
            # handing the extraction kernel the PAIR — the transpose back
            # to row-major is the only remaining XLA pass, and the
            # consumer's BlockSpec never touches the pad rows/lanes
            assert s_v is not None and not major_out
            return s_v, jnp.transpose(s_h, (2, 1, 0))
        s_h = s_h[:w]

    if major_out:
        # stay in (H, L, W): one transpose for the horizontal family only
        if s_h is not None:
            s_h = jnp.transpose(s_h, (2, 1, 0))[:h, :, :w]
        if s_v is not None and s_h is not None:
            return s_v + s_h
        return s_v if s_v is not None else s_h
    # merge to the (H, W, L) extraction layout (XLA transposes: ~0.5 ms
    # each at KITTI size — tools/trexp2.py)
    if s_v is not None and s_h is not None:
        return (jnp.transpose(s_v, (0, 2, 1))
                + jnp.transpose(s_h, (2, 0, 1))[:h])
    if s_v is not None:
        return jnp.transpose(s_v, (0, 2, 1))
    return jnp.transpose(s_h, (2, 0, 1))[:h]
