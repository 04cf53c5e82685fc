"""fSGM optical flow — hierarchical coarse-to-fine 2D-label SGM (L4/L5).

TPU-native realization of the reference's flow driver (SURVEY.md §3.2 call
stack; golden/flow.py is the exact-integer oracle):

  * Gaussian-free integer box pyramid (2x2 round-half-up, exact vs golden).
  * Per level: census -> 2D-offset cost volume over a (2w+1)^2 label window
    centered on the upsampled coarser flow -> SGM aggregation over the 2D
    label space (P1 on 4-neighbor labels, P2 otherwise) -> WTA -> separable
    2D parabola subpixel -> median.
  * The label axis is the lane axis: (2w+1)^2 labels (81 at w=4) ride the
    same fused Pallas family-sweep kernels as stereo, only the in-kernel
    neighbor-min closure changes (make_nmin_2d).
  * Pyramid levels have static per-level shapes; the level loop unrolls at
    trace time (no dynamic shapes under jit).
  * Forward-backward consistency at full resolution mirrors golden fb_check.
"""

from __future__ import annotations


import dataclasses
import functools

import jax
import jax.numpy as jnp

from fsgm_tpu.params import FlowParams, DIRS_8
from fsgm_tpu.ops.census import census_transform
from fsgm_tpu.ops.cost import cost_volume_flow, cost_volume_flow_major
from fsgm_tpu.ops import aggregate as agg
from fsgm_tpu.ops import extract as ext


# --------------------------------------------------------------------------
# Integer-exact pyramid (mirrors golden/flow.py)
# --------------------------------------------------------------------------

def downsample2x(img: jnp.ndarray) -> jnp.ndarray:
    """2x2 box downsample, round-half-up: (a+b+c+d+2)//4; floor dims.

    lax.reduce_window, NOT four stride-2 slices: the strided form lowers
    to four lane-relayout gathers and measured 13x slower on TPU (6.4 vs
    0.48 ms per 3-level KITTI pyramid, 2026-08-20 — the round-4 flow
    trace showed the pyramid build at ~2 ms/frame).  Integer sum + same
    rounding: bit-exact vs golden/flow.py::downsample2x."""
    h2, w2 = img.shape[0] // 2, img.shape[1] // 2
    s = jax.lax.reduce_window(
        img[: 2 * h2, : 2 * w2].astype(jnp.int32), 0, jax.lax.add,
        (2, 2), (2, 2), "VALID")
    return ((s + 2) // 4).astype(img.dtype)


def build_pyramid(img: jnp.ndarray, levels: int):
    pyr = [img]
    for _ in range(levels - 1):
        pyr.append(downsample2x(pyr[-1]))
    return pyr


def upsample_flow_2x(flow: jnp.ndarray, out_h: int, out_w: int
                     ) -> jnp.ndarray:
    """Nearest-neighbor 2x upsample of (H, W, 2), values x2, edge-extended
    to (out_h, out_w) for odd finer levels.  broadcast_to+reshape, not
    jnp.repeat (repeat lowers as concatenates; measured ~12% slower)."""
    hh, ww, ch = flow.shape
    up = jnp.broadcast_to(flow[:, None, :, None, :],
                          (hh, 2, ww, 2, ch)).reshape(2 * hh, 2 * ww,
                                                      ch) * 2.0
    h, w = up.shape[:2]
    if h < out_h:
        up = jnp.concatenate(
            [up, jnp.repeat(up[-1:], out_h - h, axis=0)], axis=0)
    if w < out_w:
        up = jnp.concatenate(
            [up, jnp.repeat(up[:, -1:], out_w - w, axis=1)], axis=1)
    return up[:out_h, :out_w]


def downsample_flow_2x(flow: jnp.ndarray) -> jnp.ndarray:
    """2x2 box mean of (H, W, 2), values /2 (flow scales with resolution);
    floor dims — the inverse of upsample_flow_2x for the temporal-prior
    pyramid seeding (golden/flow.py mirrors)."""
    h, w = flow.shape[:2]
    h2, w2 = h // 2, w // 2
    # 2x2 blocks via reshape (stride-2 slices relayout; see downsample2x)
    # but accumulated in golden's exact float order ((a+b)+c)+d — a
    # .sum(axis=(1,3)) reassociates to (a+b)+(c+d), which can differ in
    # the last ulp and flip a rint'd window center (bit-parity hazard)
    x = flow[: 2 * h2, : 2 * w2].reshape(h2, 2, w2, 2, flow.shape[2])
    a, b = x[:, 0, :, 0], x[:, 0, :, 1]
    c, d = x[:, 1, :, 0], x[:, 1, :, 1]
    return (a + b + c + d) * 0.125


# --------------------------------------------------------------------------
# 2D-label extraction
# --------------------------------------------------------------------------

def wta_flow(s: jnp.ndarray, radius: int):
    """argmin over labels -> integer (du, dv) offsets + label index."""
    extw = 2 * radius + 1
    l = jnp.argmin(s, axis=-1).astype(jnp.int32)
    du = l % extw - radius
    dv = l // extw - radius
    return du, dv, l


def _parabola(idx, v_m, v_0, v_p, size):
    """Offset from a 3-point parabola fit; golden gating (interior & denom>0)."""
    v_m, v_0, v_p = (x.astype(jnp.float32) for x in (v_m, v_0, v_p))
    interior = (idx > 0) & (idx < size - 1)
    denom = v_m - 2.0 * v_0 + v_p
    ok = interior & (denom > 0)
    off = jnp.where(ok, (v_m - v_p) / jnp.maximum(2.0 * denom, 1e-12), 0.0)
    return jnp.clip(off, -0.5, 0.5) * ok


def subpixel_flow(s: jnp.ndarray, l_int: jnp.ndarray, radius: int):
    """Separable parabola in u (at fixed dv) and v (at fixed du).

    One-hot lane reductions instead of gathers (same rationale as
    ext.neighborhood_of_min: take_along_axis over the label axis is slow)."""
    extw = 2 * radius + 1
    nl = extw * extw
    big = jnp.int32(1 << 24)
    lane = jnp.arange(nl, dtype=jnp.int32)
    sv = s.astype(jnp.int32)
    l = l_int[..., None]
    iu = l_int % extw
    iv = l_int // extw

    def sel(target):
        return jnp.min(jnp.where(lane == target, sv, big), axis=-1)

    # u neighbors: labels l +- 1 (clipped like golden's iuc indexing)
    iuc = jnp.clip(iu, 1, extw - 2)
    base_u = iv * extw + iuc
    du_off = _parabola(iu, sel(base_u[..., None] - 1),
                       sel(base_u[..., None]),
                       sel(base_u[..., None] + 1), extw)
    # v neighbors: labels l +- ext
    ivc = jnp.clip(iv, 1, extw - 2)
    base_v = ivc * extw + iu
    dv_off = _parabola(iv, sel(base_v[..., None] - extw),
                       sel(base_v[..., None]),
                       sel(base_v[..., None] + extw), extw)
    return du_off, dv_off


def wta_flow_major(s: jnp.ndarray, radius: int):
    """wta_flow on label-MAJOR (H, L, W) S (argmin over axis 1)."""
    extw = 2 * radius + 1
    l = jnp.argmin(s, axis=1).astype(jnp.int32)
    du = l % extw - radius
    dv = l // extw - radius
    return du, dv, l


def subpixel_flow_major(s: jnp.ndarray, l_int: jnp.ndarray, radius: int):
    """subpixel_flow on label-MAJOR (H, L, W) S: the one-hot label
    reductions run over the non-minor axis 1 (W-contiguous planes)."""
    extw = 2 * radius + 1
    nl = s.shape[1]
    big = jnp.int32(1 << 24)
    lab = jnp.arange(nl, dtype=jnp.int32)[None, :, None]
    sv = s.astype(jnp.int32)
    iu = l_int % extw
    iv = l_int // extw

    def sel(target):
        return jnp.min(jnp.where(lab == target[:, None, :], sv, big), axis=1)

    iuc = jnp.clip(iu, 1, extw - 2)
    base_u = iv * extw + iuc
    du_off = _parabola(iu, sel(base_u - 1), sel(base_u), sel(base_u + 1),
                       extw)
    ivc = jnp.clip(iv, 1, extw - 2)
    base_v = ivc * extw + iu
    dv_off = _parabola(iv, sel(base_v - extw), sel(base_v),
                       sel(base_v + extw), extw)
    return du_off, dv_off


def upsample_valid_2x(valid: jnp.ndarray, out_h: int, out_w: int
                      ) -> jnp.ndarray:
    """Nearest-neighbor 2x upsample of a (h2, w2) bool validity plane,
    edge-extended to (out_h, out_w) — the fb_grid='half' merge (each half-
    grid verdict covers its 2x2 full-res block).  golden/flow.py mirrors."""
    up = jnp.repeat(jnp.repeat(valid, 2, axis=0), 2, axis=1)
    h, w = up.shape
    if h < out_h:
        up = jnp.concatenate(
            [up, jnp.repeat(up[-1:], out_h - h, axis=0)], axis=0)
    if w < out_w:
        up = jnp.concatenate(
            [up, jnp.repeat(up[:, -1:], out_w - w, axis=1)], axis=1)
    return up[:out_h, :out_w]


def fb_check(flow_fwd: jnp.ndarray, flow_bwd: jnp.ndarray, max_diff: float
             ) -> jnp.ndarray:
    """(H, W) bool: |F(p) + B(p + round(F(p)))| <= max_diff.

    Returns an explicit validity plane instead of writing an in-range
    sentinel like (-1, -1) into the field (a real leftward flow of exactly
    (-1, -1) would be indistinguishable from an invalidated pixel)."""
    h, w = flow_fwd.shape[:2]
    yy = jnp.arange(h, dtype=jnp.int32)[:, None]
    xx = jnp.arange(w, dtype=jnp.int32)[None, :]
    tx = xx + jnp.rint(flow_fwd[..., 0]).astype(jnp.int32)
    ty = yy + jnp.rint(flow_fwd[..., 1]).astype(jnp.int32)
    inb = (tx >= 0) & (tx < w) & (ty >= 0) & (ty < h)
    txc = jnp.clip(tx, 0, w - 1)
    tyc = jnp.clip(ty, 0, h - 1)
    # flattened linear-index take: measured 4.2 ms vs 5.8 ms for the 2D
    # advanced-index lowering at KITTI size (tools/fbbench.py); values
    # are identical so golden/flow.py needs no mirror
    b = jnp.take(flow_bwd.reshape(h * w, 2), tyc * w + txc, axis=0)
    err = jnp.sqrt((flow_fwd[..., 0] + b[..., 0]) ** 2
                   + (flow_fwd[..., 1] + b[..., 1]) ** 2)
    return inb & (err <= max_diff)


# --------------------------------------------------------------------------
# Per-level core and pyramid driver
# --------------------------------------------------------------------------

def _level_s(img1, cen1, cen2, base_u, base_v, params: FlowParams,
             backend: str, is_coarsest: bool, major: bool = False,
             block_warp: bool = False):
    """Cost volume + 8-path 2D-label aggregation for one level: the batched
    core shared by the single-direction driver and the fwd/bwd lockstep
    pair (vmapping it folds both directions into one kernel-launch set).

    major=True (pallas_tr only) returns S label-MAJOR (H, L, W) for the
    transpose-free extraction path (wta_flow_major/subpixel_flow_major)."""
    extw = params.window_extent
    nd = extw * extw
    if backend == "pallas_tr":
        # Transposed-layout sweeps (labels on sublanes): consume the
        # label-MAJOR volume DIRECTLY — no butterfly transpose, and the
        # label axis pads to a sublane multiple (81 -> 88) instead of the
        # 128-lane pad (1.45x less sweep arithmetic).  The horizontal
        # family's (W, L, H) feed is one XLA u8 transpose inside
        # aggregate_paths_tr.
        from fsgm_tpu.ops.pallas import aggregate_tr
        cost_m = cost_volume_flow_major(
            cen1, cen2, base_u, base_v, params.search_radius,
            params.invalid_cost, identity_base=is_coarsest,
            nd_pad=-(-nd // 8) * 8, block_warp=block_warp)
        s_max = 8 * (params.invalid_cost + params.p2)
        s = aggregate_tr.aggregate_paths_tr(
            cost_m, img1, DIRS_8, params.p1, params.p2, params.adaptive_p2,
            label_ext=extw, s_max=s_max, major_out=major)
        if major:
            return s[:, :nd, :]   # (H, L, W): drop the sublane pad planes
        return s[:, :, :nd]
    if backend == "pallas":
        # Label-MAJOR build + in-kernel butterfly transpose: materializing
        # the label-minor volume from XLA costs ~32 ms/level at KITTI size
        # (scalarized fusion; see transpose_pallas.py), this path ~4 ms.
        # Pad labels to 128 with invalid_cost planes (never win a min) and
        # run the sweeps at the aligned lane count, slicing S afterwards.
        from fsgm_tpu.ops.pallas import aggregate_pallas, transpose_pallas
        cost_m = cost_volume_flow_major(
            cen1, cen2, base_u, base_v, params.search_radius,
            params.invalid_cost, identity_base=is_coarsest,
            nd_pad=transpose_pallas.T, block_warp=block_warp)
        cost = transpose_pallas.label_minor_from_major(cost_m)
        wp = cost.shape[1]
        img_p = img1 if wp == img1.shape[1] else jnp.pad(
            img1, ((0, 0), (0, wp - img1.shape[1])), mode="edge")
        s_max = 8 * (params.invalid_cost + params.p2)
        s = aggregate_pallas.aggregate_paths(
            cost, img_p, DIRS_8, params.p1, params.p2, params.adaptive_p2,
            label_ext=extw, s_max=s_max)
        s = s[:, :img1.shape[1], :nd]
    else:
        cost = cost_volume_flow(cen1, cen2, base_u, base_v,
                                params.search_radius, params.invalid_cost,
                                identity_base=is_coarsest,
                                block_warp=block_warp)
        nm = agg.make_neighbor_min_2d(params.search_radius)
        s = agg.aggregate_paths(cost, img1, DIRS_8, params.p1, params.p2,
                                params.adaptive_p2, neighbor_min=nm)
    return s


def _level_extract(s, base_u, base_v, params: FlowParams,
                   major: bool = False):
    """WTA + optional subpixel refinement / median on an aggregated S
    ((H, W, L) — or label-major (H, L, W) with major=True).

    FSGM_FLOW_EXTRACT=kernel (label-major path only; read at TRACE time,
    not a jit cache key — fresh process per A/B setting, see
    aggregate_tr.fold_max_lanes) runs the label-axis
    reductions (argmin + the six subpixel neighbor selections) in ONE
    fused Pallas pass over S (extract_tr.extract_flow_major) — a
    round-4 NEGATIVE result kept opt-in: 21.1 vs 18.6 ms/frame at the
    KITTI flow config (back-to-back, 2026-08-20).  XLA fuses the seven
    one-hot reductions over the short 88-label axis better than the
    per-row kernel loop at flow's narrow coarse-level widths — the
    opposite verdict from stereo's 128-label, 1248-lane extraction.
    Bit-exact either way (tests pin both)."""
    import os
    extw = params.window_extent
    radius = params.search_radius
    if major and os.environ.get("FSGM_FLOW_EXTRACT", "xla") == "kernel":
        from fsgm_tpu.ops.pallas import extract_tr
        l_int, ut, vt = extract_tr.extract_flow_major(
            s, extw, with_sub=params.subpixel)
        du = l_int % extw - radius
        dv = l_int // extw - radius
        u = (base_u + du).astype(jnp.float32)
        v = (base_v + dv).astype(jnp.float32)
        if params.subpixel:
            u = u + _parabola(l_int % extw, *ut, extw)
            v = v + _parabola(l_int // extw, *vt, extw)
        flow = jnp.stack([u, v], axis=-1)
        if params.median_filter:
            flow = jnp.stack([ext.median_filter_3x3(flow[..., 0]),
                              ext.median_filter_3x3(flow[..., 1])],
                             axis=-1)
        return flow
    _wta = wta_flow_major if major else wta_flow
    _sub = subpixel_flow_major if major else subpixel_flow
    du, dv, l_int = _wta(s, params.search_radius)
    u = (base_u + du).astype(jnp.float32)
    v = (base_v + dv).astype(jnp.float32)
    if params.subpixel:
        du_off, dv_off = _sub(s, l_int, params.search_radius)
        u = u + du_off
        v = v + dv_off
    flow = jnp.stack([u, v], axis=-1)
    if params.median_filter:
        flow = jnp.stack([ext.median_filter_3x3(flow[..., 0]),
                          ext.median_filter_3x3(flow[..., 1])], axis=-1)
    return flow


def _flow_one_level(img1, img2, prior_flow, params: FlowParams,
                    backend: str, is_coarsest: bool = False,
                    cen1=None, cen2=None, major: bool = False,
                    block_warp: bool = False):
    base_u = jnp.rint(prior_flow[..., 0]).astype(jnp.int32)
    base_v = jnp.rint(prior_flow[..., 1]).astype(jnp.int32)
    if cen1 is None:
        cen1 = census_transform(img1, params.census_window)
    if cen2 is None:
        cen2 = census_transform(img2, params.census_window)
    s = _level_s(img1, cen1, cen2, base_u, base_v, params, backend,
                 is_coarsest, major, block_warp)
    return _level_extract(s, base_u, base_v, params, major)


def _flow_level_pair(i1, i2, c1, c2, prior_f, prior_b,
                     params: FlowParams, bwd_params: FlowParams,
                     backend: str, is_coarsest: bool, major: bool = False,
                     block_warp: bool = False, pair_serial: bool = False):
    """One pyramid level of the forward AND backward passes as a single
    batch-2 vmap: the per-launch fixed cost of the cost-build / transpose /
    sweep kernels dominates the coarse levels (measured ~4 ms/level at
    1/64 area where the element work is negligible), so folding both
    directions into one launch set makes the backward pyramid nearly free
    above the finest level.  vmap adds a leading grid dimension to the
    Pallas kernels; per-slice arithmetic is identical, so bit-exactness
    vs the unbatched path (and golden) is preserved."""
    bu_f = jnp.rint(prior_f[..., 0]).astype(jnp.int32)
    bv_f = jnp.rint(prior_f[..., 1]).astype(jnp.int32)
    bu_b = jnp.rint(prior_b[..., 0]).astype(jnp.int32)
    bv_b = jnp.rint(prior_b[..., 1]).astype(jnp.int32)
    guide = jnp.stack([i1, i2])
    cen_a = jnp.stack([c1, c2])
    cen_b = jnp.stack([c2, c1])
    bu = jnp.stack([bu_f, bu_b])
    bv = jnp.stack([bv_f, bv_b])
    # big FRAMES run every level's pair SEQUENTIALLY (lax.map) instead
    # of batch-2 vmapped: identical math, but the two directions'
    # volumes are never live together — the 2026-08-20 TPU worker
    # crashes on 4K flow programs with ANY lockstep level (even the
    # tiny coarsest one — the trigger is program-structure/live-set,
    # not one level's size), and serialized 4K also measures FASTER
    # (382 vs 420 ms/frame).  Small frames keep the lockstep (worth
    # ~1 ms/frame at KITTI, 15.6 vs 16.8).  The gate is the FINEST
    # level's pixel count, threaded down as `pair_serial`; default
    # threshold 2M pixels (KITTI 0.45M < 2M < 4K 8.3M),
    # FSGM_FLOW_PAIR_SERIAL_PIX overrides.
    serial = pair_serial

    vmap2 = jax.lax.map if serial else (
        lambda f, xs: jax.vmap(lambda *a: f(a))(*xs))
    s2 = vmap2(
        lambda a: _level_s(a[0], a[1], a[2], a[3], a[4], params, backend,
                           is_coarsest, major, block_warp),
        (guide, cen_a, cen_b, bu, bv))
    if bwd_params == params:
        # identical extraction both ways (full/half modes): batch it too
        fl2 = vmap2(
            lambda a: _level_extract(a[0], a[1], a[2], params, major),
            (s2, bu, bv))
        return fl2[0], fl2[1]
    flow_f = _level_extract(s2[0], bu_f, bv_f, params, major)
    flow_b = _level_extract(s2[1], bu_b, bv_b, bwd_params, major)
    return flow_f, flow_b


def _fsgm_flow_oneway(pyr1, pyr2, cens1, cens2, params: FlowParams,
                      backend: str, init_flow=None, major: bool = False):
    """Coarse-to-fine pass over precomputed pyramids + census descriptors
    (shared between the forward and backward passes — the backward pass
    uses the same two pyramids with roles swapped, so pyramid/census work
    is computed once per image, not once per direction).

    `init_flow` (coarsest-level scale) seeds the pyramid instead of zeros
    (temporal prior for sequence tracking); the coarsest level then runs
    the real warp path instead of the identity-base fast path."""
    flow = (jnp.zeros(pyr1[-1].shape + (2,), dtype=jnp.float32)
            if init_flow is None else init_flow)
    for lvl in range(params.levels - 1, -1, -1):
        i1, i2 = pyr1[lvl], pyr2[lvl]
        below_top = lvl < params.levels - 1
        if below_top:
            flow = upsample_flow_2x(flow, i1.shape[0], i1.shape[1])
        is_c = lvl == params.levels - 1 and init_flow is None
        # below the top the prior is rint(upsample_flow_2x(...)) —
        # 2x2-block-constant, so the warp can use the blocked patch
        # gather (cost.warp_census_blocked, 4x fewer indices, exact)
        flow = _flow_one_level(i1, i2, flow, params, backend,
                               is_coarsest=is_c,
                               cen1=cens1[lvl], cen2=cens2[lvl],
                               major=major, block_warp=below_top)
    return flow


def _fsgm_flow_both(pyr1, pyr2, cens1, cens2, params: FlowParams,
                    bwd_final_params: FlowParams, backend: str,
                    bwd_stop: int, init_flow=None, major: bool = False):
    """Forward and backward coarse-to-fine passes in lockstep (see
    _flow_level_pair).  The backward pass runs only at pyramid levels
    >= bwd_stop (0 for full/cheap, 1 for half); below that the forward
    pass continues alone.

    Backward levels ABOVE the final one always extract with the full
    `params` (subpixel + median): their output is the next level's prior,
    and dropping either compounds through the 2x upsampling into
    window-edge outlier populations that wreck fb_check (measured: the
    round-1 "cheap" that skipped both at every backward level kept only
    ~50% of the pixels of a constant-motion pair; keeping them at prior
    levels restores full-mode validity).  Only the FINAL backward level
    (lvl == bwd_stop), whose output feeds nothing but fb_check's rounded
    1 px-tolerance lookup, uses `bwd_final_params`.

    Returns (flow_fwd at full resolution, flow_bwd at level-bwd_stop
    resolution).  `init_flow` (coarsest scale) seeds the forward pyramid
    and its negation the backward pyramid (temporal prior)."""
    shape_c = pyr1[-1].shape
    from fsgm_tpu.utils.envcfg import env_int
    pair_serial = (pyr1[0].shape[0] * pyr1[0].shape[1] >
                   env_int("FSGM_FLOW_PAIR_SERIAL_PIX", 2000000))
    if init_flow is None:
        flow_f = jnp.zeros(shape_c + (2,), dtype=jnp.float32)
        flow_b = jnp.zeros(shape_c + (2,), dtype=jnp.float32)
    else:
        flow_f, flow_b = init_flow, -init_flow
    for lvl in range(params.levels - 1, -1, -1):
        i1, i2 = pyr1[lvl], pyr2[lvl]
        below_top = lvl < params.levels - 1
        if below_top:
            flow_f = upsample_flow_2x(flow_f, i1.shape[0], i1.shape[1])
            if lvl >= bwd_stop:
                flow_b = upsample_flow_2x(flow_b, i1.shape[0], i1.shape[1])
        is_c = lvl == params.levels - 1 and init_flow is None
        if lvl >= bwd_stop:
            bp = bwd_final_params if lvl == bwd_stop else params
            flow_f, flow_b = _flow_level_pair(
                i1, i2, cens1[lvl], cens2[lvl], flow_f, flow_b,
                params, bp, backend, is_c, major, block_warp=below_top,
                pair_serial=pair_serial)
        else:
            flow_f = _flow_one_level(i1, i2, flow_f, params, backend,
                                     is_coarsest=is_c,
                                     cen1=cens1[lvl], cen2=cens2[lvl],
                                     major=major, block_warp=below_top)
    return flow_f, flow_b


@functools.partial(jax.jit, static_argnums=(2, 3, 5))
def _flow_fsgm_jit(img1: jnp.ndarray, img2: jnp.ndarray, params: FlowParams,
                   backend: str = "xla", prior_flow=None,
                   major: bool = False):
    """Full fSGM: (H, W) uint8 pair -> (flow (H, W, 2) float32, valid
    (H, W) bool).

    `valid` is False where the forward-backward check failed; flow values
    at invalid pixels are the unchecked forward estimates (callers mask).

    `prior_flow` (optional full-resolution (H, W, 2)) seeds the coarsest
    pyramid level — the temporal prior for frame sequences (flow between
    consecutive video frames is piecewise-smooth in time, so the previous
    pair's field lets a shallower pyramid track motion far beyond its own
    search range; see flow_sequence)."""
    pyr1 = build_pyramid(img1, params.levels)
    pyr2 = build_pyramid(img2, params.levels)
    cens1 = [census_transform(x, params.census_window) for x in pyr1]
    cens2 = [census_transform(x, params.census_window) for x in pyr2]
    init = None
    if prior_flow is not None:
        init = prior_flow
        for _ in range(params.levels - 1):
            init = downsample_flow_2x(init)
    if not params.fb_check:
        flow = _fsgm_flow_oneway(pyr1, pyr2, cens1, cens2, params, backend,
                                 init_flow=init, major=major)
        return flow, jnp.ones(flow.shape[:2], dtype=bool)
    if params.fb_backward == "single":
        # one backward SGM level at finest resolution: prior is the
        # negated forward flow, so the (2w+1)^2 window independently
        # re-verifies each pixel; no backward pyramid, no subpixel or
        # median (fb_check rounds and tolerates 1 px).  Golden mirrors.
        flow = _fsgm_flow_oneway(pyr1, pyr2, cens1, cens2, params, backend,
                                 init_flow=init, major=major)
        bwd_params = dataclasses.replace(
            params, subpixel=False, median_filter=False)
        flow_bwd = _flow_one_level(pyr2[0], pyr1[0], -flow, bwd_params,
                                   backend, cen1=cens2[0], cen2=cens1[0],
                                   major=major)
    elif params.fb_backward == "half":
        # backward pyramid stops at level 1 (half resolution): the
        # backward flow feeds only fb_check's rounded 1 px-tolerance
        # lookup, so computing it on the half grid (quarter the
        # aggregation work — the full-res backward level dominates the
        # fwd+bwd cost) and 2x-upsampling costs ~0.5 px of lookup
        # precision.  Subpixel/median are KEPT at every backward level:
        # without subpixel the upsampled backward field only takes even
        # integer values, a systematic ~1 px error sitting exactly at the
        # fb tolerance.  Golden mirrors exactly (same integer pyramid +
        # nearest upsample).
        flow, bwd_half = _fsgm_flow_both(pyr1, pyr2, cens1, cens2,
                                         params, params, backend,
                                         bwd_stop=1, init_flow=init,
                                         major=major)
        if params.fb_grid == "half":
            # check directly on the half grid: the backward field is
            # already there, the forward field box-downsamples; tolerance
            # halves with the pixel size.  Quarter the gather indices.
            valid_h = fb_check(downsample_flow_2x(flow), bwd_half,
                               params.fb_max_diff * 0.5)
            return flow, upsample_valid_2x(valid_h, flow.shape[0],
                                           flow.shape[1])
        flow_bwd = upsample_flow_2x(bwd_half, flow.shape[0], flow.shape[1])
    else:
        bwd_final = params
        if params.fb_backward == "cheap":
            # drop the sub-0.5 px subpixel refinement and median smoothing
            # from the FINAL backward level only (its output feeds nothing
            # but the rounded 1 px-tolerance fb_check); earlier backward
            # levels keep both — they feed priors (see _fsgm_flow_both)
            bwd_final = dataclasses.replace(
                params, subpixel=False, median_filter=False)
        flow, flow_bwd = _fsgm_flow_both(pyr1, pyr2, cens1, cens2,
                                         params, bwd_final, backend,
                                         bwd_stop=0, init_flow=init,
                                         major=major)
    if params.fb_grid == "half":
        valid_h = fb_check(downsample_flow_2x(flow),
                           downsample_flow_2x(flow_bwd),
                           params.fb_max_diff * 0.5)
        return flow, upsample_valid_2x(valid_h, flow.shape[0],
                                       flow.shape[1])
    valid = fb_check(flow, flow_bwd, params.fb_max_diff)
    return flow, valid


def flow_fsgm(img1: jnp.ndarray, img2: jnp.ndarray, params: FlowParams,
              backend: str = "xla", prior_flow=None):
    """Public fSGM entry; see _flow_fsgm_jit.  Backend resolution
    ('pallas' -> 'pallas_tr' unless FSGM_TR=0) happens outside the jit so
    the resolved name is the cache key (mirrors models/stereo.py)."""
    from fsgm_tpu.models.stereo import resolve_backend, _extract_major
    backend = resolve_backend(backend)
    return _flow_fsgm_jit(img1, img2, params, backend, prior_flow,
                          _extract_major(backend, default="1"))


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def _flow_fsgm_batch_jit(imgs1, imgs2, params: FlowParams, backend: str,
                         chunk: int, extract_major: bool):
    b, h, w = imgs1.shape
    if b == 1:
        # no vmap wrapper at all: a unit-batch vmap of the 4K pipeline
        # crashes the 2026-08-20 TPU worker where the plain call runs
        flo, valid = _flow_fsgm_jit(imgs1[0], imgs2[0], params, backend,
                                    None, extract_major)
        return flo[None], valid[None]
    # NOTE: chunk=1 keeps the unit vmap wrapper inside the lax.map — it
    # measured FASTER than mapping the plain per-frame function (18.6 vs
    # 20.2 ms/frame, 2026-08-20); only the b==1 whole-batch case above
    # must avoid it (4K vmap-of-1 crashes the current TPU worker).
    one = jax.vmap(lambda u, v: _flow_fsgm_jit(u, v, params, backend,
                                               None, extract_major))
    if chunk >= b:
        return one(imgs1, imgs2)
    xs = (imgs1.reshape(b // chunk, chunk, h, w),
          imgs2.reshape(b // chunk, chunk, h, w))
    flos, valids = jax.lax.map(lambda xy: one(xy[0], xy[1]), xs)
    return flos.reshape(b, h, w, 2), valids.reshape(b, h, w)


def flow_fsgm_batch(imgs1, imgs2, params: FlowParams,
                    backend: str = "xla", chunk: int | None = None):
    """Batched fSGM over (B, H, W) pairs in ONE dispatch.

    The batch is processed `chunk` frames at a time (vmap inside,
    lax.map over the chunks), which amortizes the per-dispatch relay
    floor across the whole batch while bounding the live intermediate
    set to `chunk` frames' pyramids.  An unchunked batch-8 KITTI-size
    flow program crashes the TPU worker process outright as of the
    2026-08-20 toolchain (any backend, incl. pure XLA — live-set
    correlated; batch<=2 is reliable, see NOTES-PERF "flow worker
    crash"), and chunking measures FASTER than the unchunked r3
    dispatch ever did (chunk=1 with the reduce_window pyramid: 18.6
    ms/frame vs 24.6) — the serial chunks lose no throughput.  Default
    chunk=1: by 2026-08-20 afternoon even the chunk=2 program crashed
    the worker (the regression's live-set threshold moved), and
    chunk=1 is the fastest measured anyway.  FSGM_FLOW_CHUNK
    overrides; a chunk that doesn't divide B is rounded down to one
    that does."""
    from fsgm_tpu.models.stereo import resolve_backend, _extract_major
    from fsgm_tpu.utils.envcfg import env_int
    backend = resolve_backend(backend)
    b = imgs1.shape[0]
    if chunk is None:
        chunk = env_int("FSGM_FLOW_CHUNK", 1)
    chunk = max(1, min(chunk, b))
    while b % chunk:
        chunk -= 1
    return _flow_fsgm_batch_jit(imgs1, imgs2, params, backend, chunk,
                                _extract_major(backend, default="1"))


def flow_sequence(frames, params: FlowParams, backend: str = "xla",
                  track_params: FlowParams | None = None):
    """fSGM over a frame sequence with temporal priors.

    frames: (N, H, W) uint8 -> (flows (N-1, H, W, 2) f32,
    valids (N-1, H, W) bool), flows[t] = motion frame t -> t+1.

    Pair 0 runs the full `params` pyramid from scratch; every later pair
    seeds its coarsest level with the previous pair's field (and its
    negation for the backward pass), so `track_params` can use a shallower
    pyramid (fewer levels) while tracking motion far beyond its own search
    range — the temporal analog of the coarse-to-fine trick, and the
    reason fSGM-style methods suit driver-assistance video.  Two jit
    signatures total (first pair, tracked pairs), regardless of N."""
    tp = track_params if track_params is not None else params
    flows, valids = [], []
    prev = None
    for t in range(frames.shape[0] - 1):
        if prev is None:
            f, v = flow_fsgm(frames[t], frames[t + 1], params, backend)
        else:
            f, v = flow_fsgm(frames[t], frames[t + 1], tp, backend,
                             prior_flow=prev)
        flows.append(f)
        valids.append(v)
        # seed the next pair with FB-validated flow only: at invalid
        # pixels the field holds the unchecked forward estimate, and
        # feeding those through the downsample chain poisons the next
        # pair's window centers (measured on constant-motion sequences:
        # unmasked seeding made the full-depth pass WORSE than scratch,
        # 1.68 vs 0.21 px mean error; masked seeding restores it)
        prev = jnp.where(v[..., None], f, 0.0)
    return jnp.stack(flows), jnp.stack(valids)
