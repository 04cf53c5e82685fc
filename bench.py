"""Benchmark harness — one-line JSON for the driver + multi-config modes.

Default (driver) config: the BASELINE.json primary target — KITTI stereo
1242x375, D=128, 8 paths, LR-consistency + subpixel (config 2).  Metric is
Mpixel*disp/s = H*W*D*fps/1e6 (BASELINE.md).  `vs_baseline` is measured
throughput over the best prior-art per-chip anchor recorded in BASELINE.md
(embedded-GPU SGM, ~1650 Mpixel*disp/s on Tegra X1; the reference itself
is a single-threaded MATLAB/MEX CPU pipeline, far slower, and publishes no
numbers — BASELINE.json `published: {}`).

Env knobs:
  FSGM_BENCH_CONFIG  kitti (default) | tsukuba | kitti16 | flow | 4k
  FSGM_BENCH_BACKEND pallas | xla  (default: pallas on TPU)
  FSGM_BENCH_BATCH   frames per dispatch (default per config)

Measurement notes (axon relay): every timed call is salted so no two
executions are identical (the relay memoizes), and sync is a scalar
reduction fetched from inside the jit (block_until_ready does not reliably
block through the relay).  Stdout stays ONE parseable line; context goes
to stderr.
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

CONFIGS = {
    # name: (H, W, D_or_labels, batch, metric_name)
    "kitti":   (375, 1242, 128, 16, "kitti_stereo_sgm_throughput"),
    "tsukuba": (288, 384, 64, 16, "tsukuba_stereo_sgm_throughput"),
    "kitti16": (375, 1242, 128, 8, "kitti_16path_adaptive_throughput"),
    "4k":      (2160, 3840, 128, 1, "uhd_stereo_sgm_throughput"),
    "flow":    (368, 1232, 81, 2, "kitti_flow_fsgm_throughput"),
}


def _timed(run, args, batch, repeats, salt_dtype):
    t0 = time.perf_counter()
    float(run(*args, salt_dtype(255)))
    compile_s = time.perf_counter() - t0
    times = []
    for rep in range(repeats):
        t0 = time.perf_counter()
        float(run(*args, salt_dtype(rep)))
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / batch, compile_s


def main() -> None:
    import jax
    import jax.numpy as jnp
    from fsgm_tpu.params import SGMParams, FlowParams
    from fsgm_tpu.models.stereo import stereo_sgm
    from fsgm_tpu.models.flow import flow_fsgm
    from fsgm_tpu.io.synthetic import random_dot_stereo, constant_flow_pair

    cfg = os.environ.get("FSGM_BENCH_CONFIG", "kitti")
    h, w, d, batch_default, metric = CONFIGS[cfg]
    backend = os.environ.get("FSGM_BENCH_BACKEND")
    if backend is None:
        backend = "pallas" if jax.devices()[0].platform == "tpu" else "xla"
    batch = int(os.environ.get("FSGM_BENCH_BATCH", batch_default))
    repeats = 6

    if cfg == "flow":
        fparams = FlowParams(search_radius=4, levels=4, p1=7, p2=100)
        pairs = [constant_flow_pair(h, w, 3, -2, seed=s)
                 for s in range(batch)]
        a = jnp.asarray(np.stack([p[0] for p in pairs]))
        b = jnp.asarray(np.stack([p[1] for p in pairs]))

        @jax.jit
        def run(x, y, salt):
            out = jax.vmap(
                lambda i1, i2: flow_fsgm(i1 + salt, i2 + salt, fparams,
                                         backend))(x, y)
            return jnp.sum(out)

        # label count per pixel at the finest level
        d_eff = fparams.num_labels * 2  # fwd + bwd pass
    else:
        params = SGMParams(
            max_disp=d, p1=7, p2=100,
            num_paths=16 if cfg == "kitti16" else 8,
            adaptive_p2=(cfg == "kitti16"),
            subpixel=True, lr_check=True, median_filter=True)
        pairs = [random_dot_stereo(h, w, d, seed=s) for s in range(batch)]
        a = jnp.asarray(np.stack([p[0] for p in pairs]))
        b = jnp.asarray(np.stack([p[1] for p in pairs]))

        @jax.jit
        def run(x, y, salt):
            out = jax.vmap(
                lambda il, ir: stereo_sgm(il + salt, ir + salt, params,
                                          backend))(x, y)
            return jnp.sum(out)

        d_eff = d

    dt, compile_s = _timed(run, (a, b), batch, repeats, jnp.uint8)
    fps = 1.0 / dt
    mpds = h * w * d_eff * fps / 1e6
    rec = {"metric": metric, "value": round(mpds, 1),
           "unit": "Mpixel*disp/s",
           "vs_baseline": round(mpds / BASELINE_MPDS, 3)}
    print(json.dumps(rec))
    print(f"# cfg={cfg} backend={backend} "
          f"platform={jax.devices()[0].platform} batch={batch} "
          f"frame={dt*1e3:.2f}ms fps={fps:.1f} compile={compile_s:.1f}s "
          f"vs_SoL={mpds / SOL_MPDS:.1%}", file=sys.stderr)


if __name__ == "__main__":
    main()
