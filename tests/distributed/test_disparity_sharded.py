"""Disparity-axis sharding (TP analog) == single-chip, bit-exact.

The per-step pmin + lane-halo ppermute make this the most collective-
dense mode; integer math means any halo/merge bug is a hard mismatch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fsgm_tpu.params import SGMParams
from fsgm_tpu.io.synthetic import random_dot_stereo
from fsgm_tpu.models.stereo import stereo_sgm
from fsgm_tpu.parallel.disparity_sharded import stereo_sgm_dsharded


def _mesh(td):
    return jax.make_mesh((td,), ("td",), devices=jax.devices()[:td])


@pytest.mark.parametrize("td", [2, 4])
@pytest.mark.parametrize("adaptive", [False, True])
def test_dsharded_matches_single(td, adaptive):
    img_l, img_r, _ = random_dot_stereo(32, 48, 16, seed=13)
    p = SGMParams(max_disp=16, p1=7, p2=60, adaptive_p2=adaptive)
    ref = np.asarray(stereo_sgm(jnp.asarray(img_l), jnp.asarray(img_r), p))
    out = np.asarray(stereo_sgm_dsharded(jnp.asarray(img_l),
                                         jnp.asarray(img_r), p, _mesh(td)))
    np.testing.assert_array_equal(out, ref)


def test_dsharded_16path():
    img_l, img_r, _ = random_dot_stereo(24, 40, 8, seed=3)
    p = SGMParams(max_disp=8, p1=7, p2=40, num_paths=16)
    ref = np.asarray(stereo_sgm(jnp.asarray(img_l), jnp.asarray(img_r), p))
    out = np.asarray(stereo_sgm_dsharded(jnp.asarray(img_l),
                                         jnp.asarray(img_r), p, _mesh(4)))
    np.testing.assert_array_equal(out, ref)
