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
    """Returns (H, W, D) uint8 cost volume."""
    h, w, n_words = cen_l.shape
    planes = []
    inval = jnp.full((h, w), invalid_cost, dtype=jnp.int32)
    for d in range(max_disp):
        if d >= w:
            planes.append(inval)
            continue
        ham = hamming(cen_l[:, d:], cen_r[:, : w - d])
        if d > 0:
            ham = jnp.concatenate([inval[:, :d], ham], axis=1)
        planes.append(ham)
    c = jnp.stack(planes, axis=-1)
    return c.astype(jnp.uint8)


def cost_volume_flow(cen1: jnp.ndarray, cen2: jnp.ndarray,
                     base_u: jnp.ndarray, base_v: jnp.ndarray,
                     radius: int, invalid_cost: int = 255) -> jnp.ndarray:
    """(H, W, (2w+1)^2) uint8 flow cost volume.

    base_u/base_v: (H, W) int32 rounded prior flow.  Label order matches
    golden/flow.py::cost_volume_flow: l = (dv+w)*(2w+1) + (du+w).
    """
    h, w = cen1.shape[:2]
    ext = 2 * radius + 1
    yy = jnp.arange(h, dtype=jnp.int32)[:, None]
    xx = jnp.arange(w, dtype=jnp.int32)[None, :]
    planes = []
    for dv in range(-radius, radius + 1):
        for du in range(-radius, radius + 1):
            ty = yy + base_v + dv
            tx = xx + base_u + du
            ok = (ty >= 0) & (ty < h) & (tx >= 0) & (tx < w)
            tyc = jnp.clip(ty, 0, h - 1)
            txc = jnp.clip(tx, 0, w - 1)
            ham = hamming(cen1, cen2[tyc, txc])
            planes.append(jnp.where(ok, ham, invalid_cost))
    c = jnp.stack(planes, axis=-1)
    del ext
    return c.astype(jnp.uint8)
