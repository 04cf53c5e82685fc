"""Label-minor volume materialization via an in-kernel butterfly transpose.

Why this kernel exists (measured, round 2): the flow cost volume is built
as (2w+1)^2 = 81 shifted planes.  Materializing it LABEL-MINOR — the dense
(H, W, nd) layout the Pallas sweep kernels require for their lane-axis
label math — costs ~32 ms at KITTI size because each 128-lane output
vector needs values from 81 *different* shifted views, so XLA scalarizes
the producer fusion (and every external relayout route either pays the
same scalarized copy or crashes the toolchain: jnp.transpose inside a
Mosaic kernel and int32 XLA relayouts both hit tpu_compile_helper bugs).
Producing the volume label-MAJOR (H, nd, W) is vectorized along W and
costs ~7 ms; this kernel then performs the (nd, W) -> (W, nd) exchange
in VMEM with an Eklundh butterfly — log2(128) stages of cyclic
lane/sublane rolls + masked selects, primitives Mosaic legalizes — so the
label-minor buffer is written tile-linearly, never scalarized.

Reference capability: SURVEY.md §2.1 "Matching cost / cost volume"
(layout duty only; values are bit-identical to ops/cost.py).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 128  # butterfly tile edge == lane count; label axis is padded to T


def _interpret() -> bool:
    return os.environ.get("FSGM_PALLAS_INTERPRET", "0") == "1"


def _butterfly_transpose_tile(m: jnp.ndarray) -> jnp.ndarray:
    """Transpose a (T, T) tile with log2(T) stages of cyclic rolls.

    Stage k swaps the off-diagonal s x s blocks (s = 2^k) of every 2s x 2s
    block: element (r, c) with r-bit_k=0, c-bit_k=1 receives (r+s, c-s)
    and its mirror receives (r-s, c+s).  The per-bit swaps commute and
    compose to the full transpose (Eklundh).  Rolls are cyclic so no
    out-of-range lanes exist; masks pick only the valid positions.
    """
    rr = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    s = 1
    while s < T:
        q = ((rr & s) == 0) & ((cc & s) == s)      # upper-right block
        r_ = ((rr & s) == s) & ((cc & s) == 0)     # lower-left block
        dn = pltpu.roll(pltpu.roll(m, T - s, 0), s, 1)      # m[r+s, c-s]
        up = pltpu.roll(pltpu.roll(m, s, 0), T - s, 1)      # m[r-s, c+s]
        m = jnp.where(q, dn, jnp.where(r_, up, m))
        s <<= 1
    return m


def _tr_kernel(x_ref, o_ref, *, wp: int):
    x = x_ref[0]                                   # (T, wp): labels x W
    # Mosaic rotates are 32-bit only ("Rotate with non-32-bit data" is
    # not implemented), so the butterfly runs on i32.  Rather than
    # widening each u8 tile alone (wasting 3 of 4 bytes per vector op),
    # BYTE-PACK four consecutive W-tiles into one i32 tile: the butterfly
    # permutes positions independently of values, so all four tiles
    # transpose in parallel inside one roll/select cascade — ~3x fewer
    # vector ops on this VMEM-round-trip-bound kernel (measured 4.3 ms ->
    # see NOTES-PERF).
    ntiles = wp // T
    gsz = 4 if os.environ.get("FSGM_TR_PACK", "1") == "1" else 1
    for j0 in range(0, ntiles, gsz):
        group = range(j0, min(j0 + gsz, ntiles))
        pk = jnp.zeros((T, T), jnp.int32)
        for b, j in enumerate(group):
            pk = pk | (x[:, j * T:(j + 1) * T].astype(jnp.int32) << (8 * b))
        tr = _butterfly_transpose_tile(pk)
        for b, j in enumerate(group):
            o_ref[0, j * T:(j + 1) * T, :] = (
                (tr >> (8 * b)) & 0xFF).astype(x_ref.dtype)


def label_minor_from_major(vol: jnp.ndarray) -> jnp.ndarray:
    """(H, nd, W) uint8 label-major volume -> (H, W_pad, T) label-minor.

    nd must be <= T; the label axis is padded to T with `pad_value`
    already applied by the caller (the flow builder pads with
    invalid_cost so pad labels behave exactly like invalid pixels in the
    sweep kernels and never win a min).  W is padded to a multiple of T
    with zeros; callers slice [:, :w] (the sweep kernels re-pad width
    themselves with their own neutral-region invariant).
    """
    h, nd, w = vol.shape
    if nd != T:
        raise ValueError(f"label axis must be padded to {T}, got {nd}")
    wp = -(-w // T) * T
    if wp != w:
        vol = jnp.pad(vol, ((0, 0), (0, 0), (0, wp - w)))
    out = pl.pallas_call(
        functools.partial(_tr_kernel, wp=wp),
        grid=(h,),
        in_specs=[pl.BlockSpec((1, T, wp), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, wp, T), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((h, wp, T), vol.dtype),
        interpret=_interpret(),
    )(vol)
    return out
