"""Distributed tier (SURVEY.md §4): tiled == untiled, bit-exact.

Runs on the 8-virtual-device CPU mesh from conftest.  The integer pipeline
makes halo/wavefront bugs hard mismatches, not epsilons.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fsgm_tpu.params import SGMParams, DistParams
from fsgm_tpu.io.synthetic import random_dot_stereo
from fsgm_tpu.models.stereo import stereo_sgm
from fsgm_tpu.parallel.tiled import stereo_sgm_sharded


def _mesh(frame: int, ty: int):
    devs = jax.devices()[: frame * ty]
    return jax.make_mesh((frame, ty), ("frame", "ty"), devices=devs)


@pytest.fixture(scope="module")
def pair():
    return random_dot_stereo(48, 64, 16, seed=11)


@pytest.mark.parametrize("frame,ty", [(1, 4), (2, 4), (1, 8), (2, 2)])
@pytest.mark.parametrize("num_paths,adaptive", [(8, False), (16, True)])
def test_exact_tiled_matches_single(pair, frame, ty, num_paths, adaptive):
    img_l, img_r, _ = pair
    p = SGMParams(max_disp=16, p1=7, p2=60, num_paths=num_paths,
                  adaptive_p2=adaptive)
    ref = np.asarray(stereo_sgm(jnp.asarray(img_l), jnp.asarray(img_r), p))

    il = jnp.asarray(np.stack([img_l] * frame))
    ir = jnp.asarray(np.stack([img_r] * frame))
    dist = DistParams(tiles_y=ty, frame_shards=frame, tile_mode="exact")
    out = np.asarray(stereo_sgm_sharded(il, ir, p, dist, _mesh(frame, ty)))
    for f in range(frame):
        np.testing.assert_array_equal(out[f], ref)


def test_fast_tiled_close(pair):
    """'fast' margin re-injection: tiny fraction of pixels may differ."""
    img_l, img_r, _ = pair
    p = SGMParams(max_disp=16, p1=7, p2=60)
    ref = np.asarray(stereo_sgm(jnp.asarray(img_l), jnp.asarray(img_r), p))
    dist = DistParams(tiles_y=4, tile_mode="fast", margin=8)
    out = np.asarray(stereo_sgm_sharded(
        img_l[None], img_r[None], p, dist, _mesh(1, 4)))[0]
    mismatch = np.mean(np.abs(out - ref) > 0.5)
    assert mismatch < 0.05, f"fast-mode mismatch {mismatch:.3f}"


def test_fast_large_margin_is_exact(pair):
    """With margin >= tile height the fast mode degenerates to... not exact
    (carry itself is approximate) — but with margin = full tile and only 2
    tiles the single ppermute hop carries the true boundary state, so the
    result must be bit-exact."""
    img_l, img_r, _ = pair
    p = SGMParams(max_disp=16, p1=7, p2=60)
    ref = np.asarray(stereo_sgm(jnp.asarray(img_l), jnp.asarray(img_r), p))
    dist = DistParams(tiles_y=2, tile_mode="fast", margin=1000)
    out = np.asarray(stereo_sgm_sharded(
        img_l[None], img_r[None], p, dist, _mesh(1, 2)))[0]
    np.testing.assert_array_equal(out, ref)
