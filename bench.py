"""Benchmark harness — KITTI-resolution stereo SGM on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config: the BASELINE.json primary target — 1242x375, D=128, 8 paths,
LR-consistency + subpixel (config 2).  Metric is Mpixel*disp/s =
H*W*D*fps/1e6 (BASELINE.md).  `vs_baseline` is measured throughput over the
best prior-art per-chip anchor recorded in BASELINE.md (embedded-GPU SGM,
~1650 Mpixel*disp/s on Tegra X1; the reference itself is a single-threaded
MATLAB/MEX CPU pipeline, far slower, and publishes no numbers —
BASELINE.json `published: {}`).

Extra context (roofline vs the ~16,000 Mpd/s HBM speed-of-light derived in
SURVEY.md §7.4) goes to stderr so stdout stays one parseable line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# Anchor throughputs (Mpixel*disp/s); see BASELINE.md.
BASELINE_MPDS = 1650.0     # embedded-GPU SGM anchor (best prior art per chip)
SOL_MPDS = 16000.0         # derived HBM speed-of-light, SURVEY.md §7.4

H, W, D = 375, 1242, 128
BATCH = 8      # frames per dispatch: amortizes the ~25 ms axon relay
               # round-trip so the number reflects device time
REPEATS = 6


def main() -> None:
    import jax
    import jax.numpy as jnp
    from fsgm_tpu.params import SGMParams
    from fsgm_tpu.models.stereo import stereo_sgm
    from fsgm_tpu.io.synthetic import random_dot_stereo

    backend = os.environ.get("FSGM_BENCH_BACKEND")
    if backend is None:
        backend = "pallas" if jax.devices()[0].platform == "tpu" else "xla"
    batch = int(os.environ.get("FSGM_BENCH_BATCH", BATCH))

    params = SGMParams(max_disp=D, p1=7, p2=100, num_paths=8,
                       subpixel=True, lr_check=True, median_filter=True)
    il = np.stack([random_dot_stereo(H, W, D, seed=s)[0]
                   for s in range(batch)])
    ir = np.stack([random_dot_stereo(H, W, D, seed=s)[1]
                   for s in range(batch)])
    il, ir = jnp.asarray(il), jnp.asarray(ir)

    # The salt makes every timed execution distinct (uint8 wrap keeps a
    # valid image), defeating any transport-level result caching, while
    # keeping the per-call payload a single scalar.
    # Returning a scalar reduction computed INSIDE the jit and fetching it
    # is the only reliable sync through the axon relay:
    # block_until_ready() on device arrays returns before execution.
    @jax.jit
    def run(a, b, salt):
        out = jax.vmap(
            lambda x, y: stereo_sgm(x + salt, y + salt, params, backend)
        )(a, b)
        return jnp.sum(out)

    t0 = time.perf_counter()
    float(run(il, ir, jnp.uint8(255)))
    compile_s = time.perf_counter() - t0

    times = []
    for rep in range(REPEATS):
        t0 = time.perf_counter()
        float(run(il, ir, jnp.uint8(rep)))
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times)) / batch

    fps = 1.0 / dt
    mpds = H * W * D * fps / 1e6
    print(json.dumps({
        "metric": "kitti_stereo_sgm_throughput",
        "value": round(mpds, 1),
        "unit": "Mpixel*disp/s",
        "vs_baseline": round(mpds / BASELINE_MPDS, 3),
    }))
    print(f"# backend={backend} platform={jax.devices()[0].platform} "
          f"frame={dt*1e3:.2f}ms fps={fps:.1f} compile={compile_s:.1f}s "
          f"vs_SoL={mpds / SOL_MPDS:.1%}", file=sys.stderr)


if __name__ == "__main__":
    main()
