"""Tracing / profiling harness (SURVEY.md §5 "Tracing / profiling").

Two tiers:
  * `trace(dir)` — jax.profiler context producing a Perfetto/XProf trace.
    Wired into the bench since round 4: `FSGM_BENCH_TRACE=<dir> python
    bench.py` (or `cli bench --trace <dir>`) profiles one salted
    dispatch; device events survive the axon relay intact (verified
    2026-08-20), and `tools/traceview.py <dir>` prints the per-kernel
    device-time / bytes / achieved-GB/s table.  This is the evidence
    chain behind every round-4 optimization (NOTES-PERF "Round 4").
  * `StageTimer` — wall-clock per-stage timing with the relay-safe sync
    (fetch a scalar reduction computed in-jit; see bench.py), plus
    roofline accounting: achieved bytes/s vs the chip's HBM peak.
"""

from __future__ import annotations

import contextlib
import json
import time


# HBM peak per chip; v5e ~819 GB/s (public spec).  Used for achieved-%.
HBM_PEAK_GBS = {"tpu v5 lite": 819.0, "tpu v5e": 819.0}
DEFAULT_PEAK_GBS = 819.0


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view with XProf / Perfetto)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulates per-stage wall times + modeled HBM bytes; prints a
    roofline table (achieved vs peak bandwidth)."""

    def __init__(self, peak_gbs: float | None = None):
        if peak_gbs is None:
            try:
                import jax
                kind = jax.devices()[0].device_kind.lower()
                peak_gbs = HBM_PEAK_GBS.get(kind, DEFAULT_PEAK_GBS)
            except Exception:
                peak_gbs = DEFAULT_PEAK_GBS
        self.peak_gbs = peak_gbs
        self.stages: dict[str, dict] = {}

    @contextlib.contextmanager
    def stage(self, name: str, bytes_moved: int = 0):
        t0 = time.perf_counter()
        yield
        self.record(name, time.perf_counter() - t0, bytes_moved)

    def record(self, name: str, seconds: float, bytes_moved: int = 0):
        """Externally measured time (e.g. an in-jit K-iteration loop whose
        wall clock was taken around the scalar fetch)."""
        rec = self.stages.setdefault(name, {"s": 0.0, "bytes": 0, "n": 0})
        rec["s"] += seconds
        rec["bytes"] += bytes_moved
        rec["n"] += 1

    def report(self) -> list[dict]:
        out = []
        for name, r in self.stages.items():
            gbs = r["bytes"] / r["s"] / 1e9 if r["s"] > 0 else 0.0
            out.append({
                "stage": name, "wall_s": round(r["s"], 4), "calls": r["n"],
                "bytes": r["bytes"], "achieved_GBps": round(gbs, 1),
                "pct_of_HBM_peak": round(100 * gbs / self.peak_gbs, 1),
            })
        return out

    def print_report(self, file=None):
        for rec in self.report():
            print(json.dumps(rec), file=file)


def sgm_bytes_model(h: int, w: int, d: int, num_paths: int,
                    s_itemsize: int = 2) -> dict:
    """Modeled HBM traffic of the fused-sweep pipeline (SURVEY.md §7.4,
    updated for the family-fused kernels): per family sweep the cost volume
    is read once (u8) and S is read-modified-written (s_itemsize)."""
    vol = h * w * d
    # 4 family sweeps (down/up/left/right) regardless of 8 vs 16 paths:
    # the knight-move dirs fuse into the same row passes (aggregate_pallas).
    n_sweeps = 4
    per_sweep = vol * (1 + 2 * s_itemsize)
    extract = vol * s_itemsize * 2          # wta + right-wta streaming reads
    cost_build = vol * 1 + 2 * h * w * 4    # write C + census reads
    return {"aggregate": n_sweeps * per_sweep, "extract": extract,
            "cost": cost_build,
            "total": n_sweeps * per_sweep + extract + cost_build}
