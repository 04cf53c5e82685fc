"""Butterfly transpose kernel: exact (nd, W) -> (W, nd) exchange.

Direct unit coverage for ops/pallas/transpose_pallas.py (previously only
exercised indirectly through the flow pallas parity tests); includes the
byte-packed 4-tile path and the non-multiple-of-4-tiles remainder.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fsgm_tpu.ops.pallas import transpose_pallas as tp


@pytest.mark.parametrize("h,w", [(3, 128), (2, 384), (5, 513), (1, 640)])
def test_label_minor_from_major_exact(h, w):
    rng = np.random.default_rng(42 + w)
    vol = rng.integers(0, 256, (h, tp.T, w), dtype=np.uint8)
    out = np.asarray(tp.label_minor_from_major(jnp.asarray(vol)))
    wp = -(-w // tp.T) * tp.T
    assert out.shape == (h, wp, tp.T)
    np.testing.assert_array_equal(out[:, :w, :],
                                  np.swapaxes(vol, 1, 2))
