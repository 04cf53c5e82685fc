"""Pallas stereo cost-volume builder (SURVEY.md §2.1 "Matching cost").

C[y, x, d] = popcount(cenL[y, x] ^ cenR[y, x - d]), x - d < 0 -> invalid.

The Toeplitz access cenR[x - d] (a different sublane shift per lane d) is
built with a BINARY SHEAR: for each bit k of the lane index, conditionally
shift the whole (W, D) tile down by 2^k sublanes where lane bit k is set —
log2(D) select+shift passes instead of the (H, W, D, words)-sized gather
XLA emits (which materializes a ~230 MB transposed copy at KITTI size).
Exact vs golden/sgm.py::cost_volume_stereo (tests/unit).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return os.environ.get("FSGM_PALLAS_INTERPRET", "0") == "1"


def _make_kernel(w: int, nd: int, n_words: int, invalid_cost: int):
    def kernel(cl_ref, cr_ref, out_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (w, nd), 1)
        xx = jax.lax.broadcasted_iota(jnp.int32, (w, nd), 0)
        total = jnp.zeros((w, nd), jnp.int32)
        for word in range(n_words):
            # broadcast this census word across lanes, then shear:
            # after the loop, sheared[x, d] = cenR[x - d] (garbage above
            # the diagonal — masked below)
            sheared = jnp.broadcast_to(cr_ref[0, :, word][:, None],
                                       (w, nd))
            k = 1
            while k < nd:
                shifted = jnp.concatenate(
                    [jnp.zeros((k, nd), sheared.dtype), sheared[:-k]],
                    axis=0)
                sheared = jnp.where(lane & k != 0, shifted, sheared)
                k *= 2
            cl = jnp.broadcast_to(cl_ref[0, :, word][:, None], (w, nd))
            total = total + jax.lax.population_count(
                cl ^ sheared).astype(jnp.int32)
        out_ref[0] = jnp.where(xx >= lane, total,
                               invalid_cost).astype(jnp.uint8)

    return kernel


@functools.partial(jax.jit, static_argnums=(2, 3))
def cost_volume_stereo(cen_l: jnp.ndarray, cen_r: jnp.ndarray,
                       max_disp: int, invalid_cost: int = 255
                       ) -> jnp.ndarray:
    """(H, W, words) u32 census pair -> (H, W, D) uint8 cost volume."""
    h, w, n_words = cen_l.shape
    return pl.pallas_call(
        _make_kernel(w, max_disp, n_words, invalid_cost),
        grid=(h,),
        in_specs=[
            pl.BlockSpec((1, w, n_words), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, w, n_words), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, w, max_disp), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((h, w, max_disp), jnp.uint8),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=_interpret(),
    )(cen_l.astype(jnp.uint32), cen_r.astype(jnp.uint32))
