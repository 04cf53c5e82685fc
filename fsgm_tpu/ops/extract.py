"""Disparity/flow extraction ops (XLA): WTA, subpixel, LR-check, median.

Reference capability: SURVEY.md §2.1 rows "WTA + subpixel",
"LR-consistency", "Median / post-filter" (MATLAB post-passes there; here
fused XLA elementwise/gather ops so the whole extraction stage compiles into
the same jit as aggregation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fsgm_tpu.params import INVALID


def wta(s: jnp.ndarray) -> jnp.ndarray:
    """argmin over the last (label) axis; ties -> smallest index (matches
    np.argmin)."""
    return jnp.argmin(s, axis=-1).astype(jnp.int32)


def wta_right_from_s(s: jnp.ndarray, s_invalid: int) -> jnp.ndarray:
    """Right-view disparity via the S-volume trick (SURVEY.md §2.1):
    d_R(y,x) = argmin_d S(y, x+d, d);  x+d >= W -> s_invalid.

    One gather along x (per-plane Python loops would emit D padded
    (H, W, 1) temporaries — 128x padding blowup on TPU)."""
    h, w, nd = s.shape
    xs = jnp.arange(w, dtype=jnp.int32)[:, None]           # (W, 1)
    ds = jnp.arange(nd, dtype=jnp.int32)[None, :]          # (1, D)
    src = xs + ds                                          # (W, D)
    valid = src < w
    src_c = jnp.clip(src, 0, w - 1)
    diag = jnp.take_along_axis(s, src_c[None, :, :], axis=1)  # S[y, x+d, d]
    diag = jnp.where(valid[None, :, :], diag, s_invalid)
    return jnp.argmin(diag, axis=-1).astype(jnp.int32)


def subpixel_refine(s: jnp.ndarray, d_int: jnp.ndarray) -> jnp.ndarray:
    """Quadratic refinement, formula and gating identical to golden:

        d + clip((S[d-1]-S[d+1]) / (2(S[d-1]-2S[d]+S[d+1])), -.5, .5)

    applied where 0 < d < D-1 and denom > 0.  float32.
    """
    nd = s.shape[-1]
    dc = jnp.clip(d_int, 1, nd - 2)
    s_m = jnp.take_along_axis(s, (dc - 1)[..., None], axis=-1)[..., 0]
    s_0 = jnp.take_along_axis(s, dc[..., None], axis=-1)[..., 0]
    s_p = jnp.take_along_axis(s, (dc + 1)[..., None], axis=-1)[..., 0]
    s_m, s_0, s_p = (x.astype(jnp.float32) for x in (s_m, s_0, s_p))
    denom = s_m - 2.0 * s_0 + s_p
    interior = (d_int > 0) & (d_int < nd - 1)
    ok = interior & (denom > 0)
    offset = jnp.where(ok, (s_m - s_p) / jnp.maximum(2.0 * denom, 1e-12), 0.0)
    offset = jnp.clip(offset, -0.5, 0.5)
    return d_int.astype(jnp.float32) + jnp.where(ok, offset, 0.0)


def lr_check(d_left: jnp.ndarray, d_right: jnp.ndarray, max_diff: int = 1
             ) -> jnp.ndarray:
    """Invalidate where |d_L(x) - d_R(x - round(d_L))| > max_diff -> INVALID."""
    h, w = d_left.shape
    d_round = jnp.rint(d_left).astype(jnp.int32)
    xs = jnp.arange(w, dtype=jnp.int32)[None, :] - d_round
    valid_idx = (xs >= 0) & (xs < w)
    xs_c = jnp.clip(xs, 0, w - 1)
    d_r = jnp.take_along_axis(d_right, xs_c, axis=1)
    ok = valid_idx & (jnp.abs(d_round - d_r) <= max_diff)
    return jnp.where(ok, d_left, jnp.float32(INVALID))


def median_filter_3x3(field: jnp.ndarray) -> jnp.ndarray:
    """3x3 median, edge-replicate padding; matches golden median exactly
    (median of 9 = 5th order statistic)."""
    h, w = field.shape
    padded = jnp.pad(field, 1, mode="edge")
    stack = jnp.stack([
        jax.lax.dynamic_slice(padded, (dy, dx), (h, w))
        for dy in range(3) for dx in range(3)
    ], axis=0)
    return jnp.sort(stack, axis=0)[4]
