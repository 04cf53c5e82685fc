"""Cost-volume builders (XLA path).

Stereo: C[y,x,d] = hamming(cenL[y,x], cenR[y,x-d]), x-d<0 -> invalid_cost.
Flow:   C[y,x,l] over a (2w+1)^2 label window centered on per-pixel rounded
        prior flow; out-of-bounds targets -> invalid_cost.

Reference capability: SURVEY.md §2.1 "Matching cost / cost volume" (C++/MEX
builder in the reference; here the builder is expressed as D shifted
XOR-popcounts that XLA fuses; the u8 HBM-resident layout is produced by
casting at the end, per SURVEY.md layer L1).
"""

from __future__ import annotations

import jax.numpy as jnp

from fsgm_tpu.ops.census import hamming


def cost_volume_stereo(cen_l: jnp.ndarray, cen_r: jnp.ndarray,
                       max_disp: int, invalid_cost: int = 255
                       ) -> jnp.ndarray:
    """Returns (H, W, D) uint8 cost volume.

    Built as ONE gather of the right descriptors at x-d plus a broadcast
    XOR/popcount — per-disparity Python loops would emit D separate
    (H, W, 1) temporaries that TPU tiling pads 128x (OOM at KITTI size).
    """
    h, w, n_words = cen_l.shape
    xs = jnp.arange(w, dtype=jnp.int32)[:, None]           # (W, 1)
    ds = jnp.arange(max_disp, dtype=jnp.int32)[None, :]    # (1, D)
    src = xs - ds                                          # (W, D)
    valid = src >= 0
    src_c = jnp.clip(src, 0, w - 1)
    # gather: (H, W, D, n_words)
    cen_r_g = cen_r[:, src_c, :]
    ham = hamming(cen_l[:, :, None, :], cen_r_g)           # (H, W, D) int32
    c = jnp.where(valid[None, :, :], ham, invalid_cost)
    return c.astype(jnp.uint8)


def cost_volume_flow(cen1: jnp.ndarray, cen2: jnp.ndarray,
                     base_u: jnp.ndarray, base_v: jnp.ndarray,
                     radius: int, invalid_cost: int = 255,
                     y_offset: int | jnp.ndarray = 0) -> jnp.ndarray:
    """(H, W, (2w+1)^2) uint8 flow cost volume.

    base_u/base_v: (H, W) int32 rounded prior flow.  Label order matches
    golden/flow.py::cost_volume_flow: l = (dv+w)*(2w+1) + (du+w).

    Tiled mode: cen1 may be a row tile of the first image while cen2 is
    the FULL second image (flow targets are unbounded vertically, so the
    gather needs global rows); y_offset is the tile's global starting row.
    """
    h, w = cen1.shape[:2]
    ext = 2 * radius + 1
    yy = jnp.arange(h, dtype=jnp.int32)[:, None, None] + y_offset
    xx = jnp.arange(w, dtype=jnp.int32)[None, :, None]
    offs = jnp.arange(ext * ext, dtype=jnp.int32)[None, None, :]
    dv = offs // ext - radius
    du = offs % ext - radius
    ty = yy + base_v[:, :, None] + dv                      # (H, W, L)
    tx = xx + base_u[:, :, None] + du
    h2 = cen2.shape[0]  # == h untiled; full image height in tiled mode
    ok = (ty >= 0) & (ty < h2) & (tx >= 0) & (tx < w)
    tyc = jnp.clip(ty, 0, h2 - 1)
    txc = jnp.clip(tx, 0, w - 1)
    cen2_g = cen2[tyc, txc]                                # (H, W, L, words)
    ham = hamming(cen1[:, :, None, :], cen2_g)
    c = jnp.where(ok, ham, invalid_cost)
    return c.astype(jnp.uint8)
