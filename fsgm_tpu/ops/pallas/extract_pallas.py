"""Fused WTA + subpixel-neighborhood extraction kernel (EXPERIMENTAL).

Measured outcome on this toolchain: XLA fuses argmin + the one-hot
neighbor selects into ~0.9 ms/frame at KITTI size, while this kernel runs
~4 ms (the packed rotate-min tree plus per-row MXU dots lose to XLA's
fused reduction loop).  Kept, with its exactness test, as a documented
negative result; the pipelines use the XLA path.

Mechanics (one pass over S):

  * argmin with golden tie-break (smallest d) via a single packed
    rotate-min tree: packed = S*D + lane, so min(packed) = S0*D + d*;
  * S[d*-1], S[d*+1] via one-hot masks contracted on the MXU (a (W, D) x
    (D, 1) f32 dot — exact for values < 2^24) — two cheap dots instead of
    two more reduction trees.

Outputs a (H, 4, W) int32 map [d_int, S[d*-1], S[d*], S[d*+1]]; the
subpixel parabola, LR-check, and median stay in XLA on (H, W) fields.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1 << 24


def _interpret() -> bool:
    return os.environ.get("FSGM_PALLAS_INTERPRET", "0") == "1"


def _packed_lane_min(v: jnp.ndarray) -> jnp.ndarray:
    """Min over lanes, every lane holding the result (128-aligned rotate
    tree; overlapped slice-halving otherwise)."""
    n = v.shape[-1]
    if n % 128 == 0:
        s = 1
        while s < n:
            v = jnp.minimum(v, pltpu.roll(v, s, v.ndim - 1))
            s *= 2
        return v
    while n > 1:
        h = -(-n // 2)
        v = jnp.minimum(v[..., :h], v[..., n - h:n])
        n = h
    return v


def _make_kernel(w: int, nd: int):
    def kernel(s_ref, o_ref):
        sv = s_ref[0].astype(jnp.int32)                     # (W, D)
        lane = jax.lax.broadcasted_iota(jnp.int32, (w, nd), 1)
        packed = sv * nd + lane
        pmin = _packed_lane_min(packed)                     # (W, D) or (W,1)
        d_star = pmin % nd
        s_0 = pmin // nd
        if pmin.shape[-1] != 1:
            d_col = d_star[:, :1]
            s0_col = s_0[:, :1]
        else:
            d_col, s0_col = d_star, s_0
        ones = jnp.ones((nd, 1), jnp.float32)
        m_mask = lane == (d_col - 1)
        p_mask = lane == (d_col + 1)
        s_m = jnp.dot(jnp.where(m_mask, sv, 0).astype(jnp.float32), ones,
                      preferred_element_type=jnp.float32)
        s_p = jnp.dot(jnp.where(p_mask, sv, 0).astype(jnp.float32), ones,
                      preferred_element_type=jnp.float32)
        o_ref[0, 0] = d_col[:, 0]
        o_ref[0, 1] = s_m[:, 0].astype(jnp.int32)
        o_ref[0, 2] = s0_col[:, 0]
        o_ref[0, 3] = s_p[:, 0].astype(jnp.int32)

    return kernel


def wta_neighborhood(s: jnp.ndarray):
    """S (H, W, D) int -> (d_int, s_m, s_0, s_p) as (H, W) int32 maps.

    s_m/s_p are 0 where d* is at a label boundary — callers gate on the
    interior mask exactly like the golden model, so those values are
    unused there."""
    h, w, nd = s.shape
    out = pl.pallas_call(
        _make_kernel(w, nd),
        grid=(h,),
        in_specs=[pl.BlockSpec((1, w, nd), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, 4, w), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((h, 4, w), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=_interpret(),
    )(s)
    return out[:, 0], out[:, 1], out[:, 2], out[:, 3]
