"""Environment-regression canary (round 5, VERDICT r4 weak #4).

Round 4 shipped three mitigations for 2026-08-20 environment regressions:
  1. flow batches run chunk=1 serial (FSGM_FLOW_CHUNK default) because
     chunk>=2 KITTI-size flow programs crashed the TPU worker;
  2. 4K flow level-pairs run serialized (FSGM_FLOW_PAIR_SERIAL_PIX gate)
     because ANY lockstep level in a 4K program crashed the worker;
  3. bench guard tolerances widened to the afternoon relay band (±15%).

Nothing re-probed them, so the mitigations would silently fossilize into
policy.  This ONE command re-tests each and prints one JSON line per
probe plus a PARITY-ready summary — run it once per round and append the
summary to PARITY.md next to the tpu_smoke row.

Each probe runs in a SUBPROCESS so a worker crash is an observation, not
a canary failure.  The 4K probe compiles ~5-7 min cold; skip it with
--fast when the relay cache is cold and time is short.
"""

import argparse
import json
import subprocess
import sys
import time

PROBES = {
    # chunk=2 KITTI-size flow: the r4 crasher.  If OK, FSGM_FLOW_CHUNK
    # default deserves a re-A/B (chunk=2 halves lax.map trips).
    "flow_chunk2": r"""
import os
os.environ["FSGM_FLOW_CHUNK"] = "2"
import numpy as np, jax, jax.numpy as jnp
from fsgm_tpu.models.flow import flow_fsgm_batch
from fsgm_tpu.io.synthetic import constant_flow_pair
from fsgm_tpu.params import FlowParams
import bench
fp = bench.bench_params("flow")
pairs = [constant_flow_pair(368, 1232, 3, -2, seed=s) for s in range(8)]
a = jnp.asarray(np.stack([p[0] for p in pairs]))
b = jnp.asarray(np.stack([p[1] for p in pairs]))
import time as _t
run = jax.jit(lambda x, y, s: sum(jnp.sum(v) for v in
                                  flow_fsgm_batch(x + s, y + s, fp, "pallas")))
float(run(a, b, jnp.uint8(255)))
t0 = _t.perf_counter(); float(run(a, b, jnp.uint8(1)))
print("MS_FRAME", (_t.perf_counter() - t0) / 8 * 1e3)
""",
    # unchunked batch-8: the original r4 crasher (worst case).
    "flow_unchunked": r"""
import os
os.environ["FSGM_FLOW_CHUNK"] = "8"
import numpy as np, jax, jax.numpy as jnp
from fsgm_tpu.models.flow import flow_fsgm_batch
from fsgm_tpu.io.synthetic import constant_flow_pair
import bench
fp = bench.bench_params("flow")
pairs = [constant_flow_pair(368, 1232, 3, -2, seed=s) for s in range(8)]
a = jnp.asarray(np.stack([p[0] for p in pairs]))
b = jnp.asarray(np.stack([p[1] for p in pairs]))
import time as _t
run = jax.jit(lambda x, y, s: sum(jnp.sum(v) for v in
                                  flow_fsgm_batch(x + s, y + s, fp, "pallas")))
float(run(a, b, jnp.uint8(255)))
t0 = _t.perf_counter(); float(run(a, b, jnp.uint8(1)))
print("MS_FRAME", (_t.perf_counter() - t0) / 8 * 1e3)
""",
    # 4K flow with lockstep level pairs re-enabled (the r4 crasher #2).
    "flow4k_lockstep": r"""
import os
os.environ["FSGM_FLOW_PAIR_SERIAL_PIX"] = "99999999"   # lockstep at 4K
import dataclasses, numpy as np, jax, jax.numpy as jnp
from fsgm_tpu.models.flow import flow_fsgm_batch
from fsgm_tpu.io.synthetic import constant_flow_pair
import bench
fp = dataclasses.replace(bench.bench_params("flow"), levels=5)
i1, i2, _ = constant_flow_pair(2160, 3840, 3, -2, seed=0)
a, b = jnp.asarray(i1)[None], jnp.asarray(i2)[None]
import time as _t
run = jax.jit(lambda x, y, s: sum(jnp.sum(v) for v in
                                  flow_fsgm_batch(x + s, y + s, fp, "pallas")))
float(run(a, b, jnp.uint8(255)))
t0 = _t.perf_counter(); float(run(a, b, jnp.uint8(1)))
print("MS_FRAME", (_t.perf_counter() - t0) * 1e3)
""",
    # relay band: KITTI stereo quick timing vs bench_history best — the
    # evidence for re-tightening the widened guard tolerances.
    "relay_band_kitti": r"""
import numpy as np, jax, jax.numpy as jnp
from fsgm_tpu.models.stereo import stereo_sgm_batch
from fsgm_tpu.io.synthetic import random_dot_stereo
import bench
p = bench.bench_params("kitti")
pairs = [random_dot_stereo(375, 1242, 128, seed=s) for s in range(16)]
a = jnp.asarray(np.stack([q[0] for q in pairs]))
b = jnp.asarray(np.stack([q[1] for q in pairs]))
import time as _t
run = jax.jit(lambda x, y, s: jnp.sum(stereo_sgm_batch(x + s, y + s, p,
                                                       "pallas")))
float(run(a, b, jnp.uint8(255)))
ts = []
for r in range(3):
    t0 = _t.perf_counter(); float(run(a, b, jnp.uint8(r)))
    ts.append((_t.perf_counter() - t0) / 16 * 1e3)
print("MS_FRAME", min(ts))
""",
}


def run_probe(name: str, code: str, timeout_s: int) -> dict:
    t0 = time.time()
    try:
        r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                           text=True, timeout=timeout_s, cwd=".")
    except subprocess.TimeoutExpired:
        return {"probe": name, "status": "TIMEOUT", "wall_s": timeout_s}
    out = r.stdout + r.stderr
    rec = {"probe": name, "wall_s": round(time.time() - t0, 1)}
    if "MS_FRAME" in r.stdout:
        ms = float(r.stdout.split("MS_FRAME")[1].split()[0])
        rec.update(status="OK", ms_frame=round(ms, 2))
    elif "worker process crashed" in out or "restarted" in out:
        rec["status"] = "CRASH"            # the r4 regression reproduces
    else:
        rec["status"] = f"FAIL(rc={r.returncode})"
        rec["tail"] = out.strip().splitlines()[-1][:200] if out.strip() else ""
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true",
                    help="skip the 4K probe (long cold compile)")
    ap.add_argument("--timeout", type=int, default=1800)
    args = ap.parse_args()
    results = []
    for name, code in PROBES.items():
        if args.fast and name == "flow4k_lockstep":
            continue
        rec = run_probe(name, code, args.timeout)
        results.append(rec)
        print(json.dumps(rec), flush=True)
    try:
        best = json.load(open("bench_history.json"))["configs"]["kitti"][
            "best_ms_frame"]
    except Exception:
        best = None
    kb = next((r for r in results if r["probe"] == "relay_band_kitti"), None)
    band = (f"{kb['ms_frame'] / best:.2f}x best" if kb and best
            and kb.get("ms_frame") else "n/a")
    crashes = [r["probe"] for r in results if r["status"] == "CRASH"]
    print(f"# PARITY line: canary {time.strftime('%Y-%m-%d')}: "
          f"crashes={crashes or 'none'}; relay band {band}; "
          + "; ".join(f"{r['probe']}={r.get('ms_frame', r['status'])}"
                      for r in results))


if __name__ == "__main__":
    main()
