"""A/B the butterfly transpose kernel: byte-packed 4-tile vs single-tile.

    FSGM_TR_PACK=1 python tools/trbench.py   # packed (default)
    FSGM_TR_PACK=0 python tools/trbench.py   # single-tile butterfly
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    import jax
    import jax.numpy as jnp
    from fsgm_tpu.ops.pallas import transpose_pallas as tp

    h, w, iters = 368, 1232, 16
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.integers(0, 256, (h, tp.T, w), dtype=np.uint8))

    @jax.jit
    def run(salt, v):
        def it(i, acc):
            out = tp.label_minor_from_major(v ^ (salt + i).astype(v.dtype))
            return acc + jnp.sum(out, dtype=jnp.float32)
        return jax.lax.fori_loop(0, iters, it, jnp.float32(0))

    float(run(np.uint8(251), vol))
    times = []
    for rep in range(5):
        t0 = time.perf_counter()
        float(run(np.uint8(rep), vol))
        times.append(time.perf_counter() - t0)
    ms = 1e3 * float(np.median(times)) / iters
    print(f"pack={os.environ.get('FSGM_TR_PACK', '1')} "
          f"platform={jax.devices()[0].platform} {ms:.2f} ms/iter")


if __name__ == "__main__":
    main()
