"""Multi-device tiled stereo SGM — spatial row tiling + frame parallelism.

This is the framework's distribution layer (SURVEY.md §2.2/§3.5; the
reference is single-process with no distribution, so this subsystem is
TPU-native by design):

  * mesh axis "frame": data parallelism over independent stereo pairs
    (maps to DCN across hosts in production);
  * mesh axis "ty": the image rows are sharded across chips — the
    sequence/context-parallel analog.  Census uses a small row halo; the
    cost volume, horizontal aggregation paths, and all extraction ops are
    row-local; only the vertical/diagonal path families cross tiles.

Cross-tile SGM path state is the canonical scan carry of
`ops.aggregate.aggregate_one_path`: the last two L rows, shape (2, W, D)
int32, exchanged with `lax.ppermute` over ICI.  Two modes (SURVEY.md §7.3
item 1):

  * "exact"  — bit-true wavefront.  Downward and upward path families
    stream in OPPOSITE tile orders simultaneously (device k is active for
    the down path at step k and for the up path at step T-1-k), so the
    wavefront bubble of one family overlaps the other's.
  * "fast"   — two-pass margin re-injection.  Pass 1 aggregates every tile
    in parallel from the neutral (zero) carry; the resulting boundary carry
    is ppermuted one hop downstream and pass 2 re-aggregates only the first
    `margin` canonical rows of each tile.  Exact up to SGM's exponential
    forgetting length ~ (Cmax + P2) / P1 rows; near-linear scaling.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from fsgm_tpu.params import SGMParams, DistParams
from fsgm_tpu.ops.census import census_transform
from fsgm_tpu.ops.cost import cost_volume_stereo
from fsgm_tpu.ops import aggregate as agg
from fsgm_tpu.ops import extract as ext


# --------------------------------------------------------------------------
# Neighbor exchange helpers (non-wrapping shifts over the "ty" axis)
# --------------------------------------------------------------------------

def _send_down(x, axis: str, t: int):
    """Device k receives device k-1's value (device 0 receives zeros)."""
    return jax.lax.ppermute(x, axis, [(i, i + 1) for i in range(t - 1)])


def _send_up(x, axis: str, t: int):
    """Device k receives device k+1's value (device t-1 receives zeros)."""
    return jax.lax.ppermute(x, axis, [(i + 1, i) for i in range(t - 1)])


def _exchange_row_halo(field: jnp.ndarray, halo: int, axis: str, t: int):
    """Extend a row-tiled (Ht, ...) array with `halo` true neighbor rows on
    each side; global top/bottom use edge replication (matches the golden
    model's pad semantics)."""
    my = jax.lax.axis_index(axis)
    from_above = _send_down(field[-halo:], axis, t)
    from_below = _send_up(field[:halo], axis, t)
    top_rep = jnp.repeat(field[:1], halo, axis=0)
    bot_rep = jnp.repeat(field[-1:], halo, axis=0)
    above = jnp.where(my == 0, top_rep, from_above)
    below = jnp.where(my == t - 1, bot_rep, from_below)
    return jnp.concatenate([above, field, below], axis=0)


# --------------------------------------------------------------------------
# Tiled aggregation
# --------------------------------------------------------------------------

def _split_dirs(dirs: Sequence[Tuple[int, int]]):
    horiz = [r for r in dirs if r[0] == 0]
    down = [r for r in dirs if r[0] > 0]
    up = [r for r in dirs if r[0] < 0]
    assert len(down) == len(up), "direction set must be y-symmetric"
    return horiz, down, up


def _aggregate_tiled_exact(cost_t, img_t, above2, below2, dirs, p1, p2,
                           adaptive, axis: str, t: int,
                           neighbor_min=agg.neighbor_min_1d):
    """Bit-true wavefront aggregation of a row tile.  above2/below2 are the
    (2, W) image halos [y=-2, y=-1] and [y=Ht, y=Ht+1]."""
    my = jax.lax.axis_index(axis)
    horiz, down, up = _split_dirs(dirs)
    _, w, nd = cost_t.shape

    s = jnp.zeros(cost_t.shape, dtype=jnp.int32)
    for r in horiz:  # row-local
        s = s + agg.aggregate_one_path(cost_t, img_t, r, p1, p2, adaptive,
                                       neighbor_min).astype(jnp.int32)

    img_prev_up = below2[::-1]  # canonical (flipped) frame halo order
    for rd, ru in zip(down, up):
        carry_d = jnp.zeros((2, w, nd), dtype=jnp.int32)
        carry_u = jnp.zeros((2, w, nd), dtype=jnp.int32)
        for k in range(t):
            l_d, cout_d = agg.aggregate_one_path(
                cost_t, img_t, rd, p1, p2, adaptive, neighbor_min,
                init_carry=carry_d, img_prev2=above2, return_carry=True)
            l_u, cout_u = agg.aggregate_one_path(
                cost_t, img_t, ru, p1, p2, adaptive, neighbor_min,
                init_carry=carry_u, img_prev2=img_prev_up, return_carry=True)
            s = (s
                 + jnp.where(my == k, l_d.astype(jnp.int32), 0)
                 + jnp.where(my == t - 1 - k, l_u.astype(jnp.int32), 0))
            if k < t - 1:
                carry_d = _send_down(cout_d, axis, t)
                carry_u = _send_up(cout_u, axis, t)
    return s


def _aggregate_tiled_fast(cost_t, img_t, above2, below2, dirs, p1, p2,
                          adaptive, axis: str, t: int, margin: int,
                          neighbor_min=agg.neighbor_min_1d):
    """Two-pass margin re-injection (approximate across tile seams)."""
    my = jax.lax.axis_index(axis)
    horiz, down, up = _split_dirs(dirs)
    ht, w, nd = cost_t.shape
    m = min(margin, ht)
    img_prev_up = below2[::-1]

    s = jnp.zeros(cost_t.shape, dtype=jnp.int32)
    for r in horiz:
        s = s + agg.aggregate_one_path(cost_t, img_t, r, p1, p2, adaptive,
                                       neighbor_min).astype(jnp.int32)

    for r in down + up:
        is_down = r[0] > 0
        prev2 = above2 if is_down else img_prev_up
        l0, cout = agg.aggregate_one_path(
            cost_t, img_t, r, p1, p2, adaptive, neighbor_min,
            img_prev2=prev2, return_carry=True)
        send = _send_down if is_down else _send_up
        carry = send(cout, axis, t)
        if is_down:
            l_fix = agg.aggregate_one_path(
                cost_t[:m], img_t[:m], r, p1, p2, adaptive, neighbor_min,
                init_carry=carry, img_prev2=prev2)
            boundary = my > 0
            fixed = jnp.concatenate([l_fix, l0[m:]], axis=0)
        else:
            l_fix = agg.aggregate_one_path(
                cost_t[ht - m:], img_t[ht - m:], r, p1, p2, adaptive,
                neighbor_min, init_carry=carry, img_prev2=prev2)
            boundary = my < t - 1
            fixed = jnp.concatenate([l0[: ht - m], l_fix], axis=0)
        s = s + jnp.where(boundary, fixed, l0).astype(jnp.int32)
    return s


# --------------------------------------------------------------------------
# Full tiled pipeline (inside shard_map, one frame per call)
# --------------------------------------------------------------------------

def _stereo_tile(img_l_t, img_r_t, params: SGMParams, dist: DistParams,
                 axis: str, t: int):
    """Row-tile stereo pipeline body: (Ht, W) pair -> (Ht, W) disparity."""
    ch, _ = params.census_window
    halo = max(ch // 2, 2)

    il_ext = _exchange_row_halo(img_l_t, halo, axis, t)
    ir_ext = _exchange_row_halo(img_r_t, halo, axis, t)
    cen_l = census_transform(il_ext, params.census_window)[halo:-halo]
    cen_r = census_transform(ir_ext, params.census_window)[halo:-halo]
    cost = cost_volume_stereo(cen_l, cen_r, params.max_disp,
                              params.invalid_cost)

    above2 = il_ext[halo - 2: halo]
    below2 = il_ext[halo + img_l_t.shape[0]: halo + img_l_t.shape[0] + 2]
    if dist.tile_mode == "exact" and t > 1:
        s = _aggregate_tiled_exact(cost, img_l_t, above2, below2,
                                   params.dirs, params.p1, params.p2,
                                   params.adaptive_p2, axis, t)
    elif t > 1:
        s = _aggregate_tiled_fast(cost, img_l_t, above2, below2,
                                  params.dirs, params.p1, params.p2,
                                  params.adaptive_p2, axis, t, dist.margin)
    else:
        s = agg.aggregate_paths(cost, img_l_t, params.dirs, params.p1,
                                params.p2, params.adaptive_p2)

    d_int = ext.wta(s)
    disp = d_int.astype(jnp.float32)
    if params.subpixel:
        disp = ext.subpixel_refine(s, d_int)
    if params.lr_check:  # row-local (the S diagonal runs along x)
        d_right = ext.wta_right_from_s(s, params.s_invalid)
        disp = ext.lr_check(disp, d_right, params.lr_max_diff,
                            params.max_disp)
    if params.median_filter:  # needs one true neighbor row on each side
        disp_ext = _exchange_row_halo(disp, 1, axis, t)
        disp = ext.median_filter_3x3(disp_ext)[1:-1]
    return disp


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def stereo_sgm_sharded(img_l, img_r, params: SGMParams, dist: DistParams,
                       mesh: jax.sharding.Mesh):
    """Batched sharded stereo: (F, H, W) uint8 pairs -> (F, H, W) float32.

    F is sharded over mesh axis "frame" (DP), rows over "ty" (spatial).
    H must divide evenly by the "ty" axis size.
    """
    t = mesh.shape["ty"]

    def body(il, ir):  # local shards: (F_loc, Ht, W)
        run = functools.partial(_stereo_tile, params=params, dist=dist,
                                axis="ty", t=t)
        return jax.vmap(run)(il, ir)

    spec = P("frame", "ty", None)
    # check_vma=False: constants created inside the body (neutral scan
    # carries, INF pads) are unvarying-by-construction; the static varying-
    # axes checker would otherwise require pvary noise at every zeros().
    fn = jax.shard_map(body, mesh=mesh, in_specs=(spec, spec),
                       out_specs=spec, check_vma=False)
    return fn(img_l, img_r)
