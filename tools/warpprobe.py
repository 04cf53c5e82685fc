"""Isolate the flow warp-gather cost on the real TPU.

flowbench.py's warp-cost stage salts only cen1, so the cen2 gather has
loop-invariant indices and XLA hoists it out of the in-jit loop — the
printed number excludes the gather entirely.  This probe measures it two
independent ways:

1. a raw jnp.take microbench with salted (loop-variant) indices, and
2. the full fwd+bwd pipeline with the warp monkeypatched to the identity
   path (measurement only — results are wrong) vs the real warp.

    python tools/warpprobe.py [--shape 368x1232 --levels 4 --iters 8]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _timeit(fn, args, iters, repeats=3):
    float(fn(np.uint8(251), *args))
    times = []
    for rep in range(repeats):
        t0 = time.perf_counter()
        float(fn(np.uint8(rep), *args))
        times.append(time.perf_counter() - t0)
    return 1e3 * float(np.median(times)) / iters


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="368x1232")
    ap.add_argument("--levels", type=int, default=4)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from fsgm_tpu.params import FlowParams
    from fsgm_tpu.io.synthetic import constant_flow_pair
    from fsgm_tpu.models.flow import flow_fsgm
    from fsgm_tpu.models.stereo import resolve_backend
    from fsgm_tpu.ops import cost as costmod

    h, w = (int(x) for x in args.shape.split("x"))
    iters = args.iters
    be = resolve_backend("pallas")
    params = FlowParams(search_radius=4, levels=args.levels, p1=7, p2=100,
                        fb_backward="half")

    def loop(body, *static):
        @jax.jit
        def run(salt, *arrs):
            def it(i, acc):
                s8 = (salt + i).astype(jnp.uint8)
                return acc + body(s8, *arrs)
            return jax.lax.fori_loop(0, iters, it, jnp.float32(0))
        return run

    print(f"# platform={jax.devices()[0].platform} shape={args.shape} "
          f"iters={iters}", file=sys.stderr)

    # ---- 1. raw gather microbench (salted indices: cannot hoist) ----
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(0, 1 << 24, h * w, dtype=np.int64)
                      .astype(np.uint32))
    idx0 = jnp.asarray(rng.integers(0, h * w, (h, w), dtype=np.int64)
                       .astype(np.int32))

    def gather(s8, s, ix):
        ixs = (ix + s8.astype(jnp.int32)) % (h * w)
        return jnp.sum(jnp.take(s, ixs, axis=0).astype(jnp.float32))
    ms = _timeit(loop(gather), (src, idx0), iters)
    print(f"{'raw u32 take (HxW idx)':28s} {ms:8.2f} ms "
          f"({h * w / ms / 1e3:.0f} M idx/s)")

    # same but gathering (H, W, 2) f32 rows like fb_check
    src2 = jnp.asarray(rng.normal(size=(h * w, 2)).astype(np.float32))

    def gather2(s8, s, ix):
        ixs = (ix + s8.astype(jnp.int32)) % (h * w)
        return jnp.sum(jnp.take(s, ixs, axis=0))
    ms = _timeit(loop(gather2), (src2, idx0), iters)
    print(f"{'f32x2 take (HxW idx)':28s} {ms:8.2f} ms")

    # ---- 2. e2e with identity-warp monkeypatch vs real ----
    i1np, i2np, _ = constant_flow_pair(h, w, 3, -2, seed=0)
    i1, i2 = jnp.asarray(i1np), jnp.asarray(i2np)

    def e2e(s8, a, b):
        f, v = flow_fsgm(a + s8, b + s8, params, be)
        return jnp.sum(f) + jnp.sum(v)

    ms_real = _timeit(loop(e2e), (i1, i2), iters)
    print(f"{'e2e fwd+bwd (real warp)':28s} {ms_real:8.2f} ms")

    orig = costmod._flow_cost_planes

    def idwarp(cen1, cen2, base_u, base_v, radius, invalid_cost,
               y_offset, identity_base, block_warp=False):
        return orig(cen1, cen2, base_u * 0, base_v * 0, radius,
                    invalid_cost, y_offset, True, block_warp)

    # a distinct STATIC arg forces a retrace (same-shape array args would
    # silently reuse the already-compiled real-warp executable)
    import dataclasses
    params_id = dataclasses.replace(params, fb_max_diff=1.0009765625)

    def e2e_id(s8, a, b):
        f, v = flow_fsgm(a + s8, b + s8, params_id, be)
        return jnp.sum(f) + jnp.sum(v)

    costmod._flow_cost_planes = idwarp
    try:
        ms_id = _timeit(loop(e2e_id), (i1, i2), iters)
    finally:
        costmod._flow_cost_planes = orig
    print(f"{'e2e fwd+bwd (identity warp)':28s} {ms_id:8.2f} ms")
    print(f"{'-> warp gather total':28s} {ms_real - ms_id:8.2f} ms")


if __name__ == "__main__":
    main()
