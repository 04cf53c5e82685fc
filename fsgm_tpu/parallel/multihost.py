"""Multi-host execution (SURVEY.md §2.3, layer L6 "Distribution").

The frame (DP) axis maps across hosts — DCN traffic is only the initial
frame scatter and final field gather; the chatty per-wavefront halo
exchange stays on the intra-host ("ty") mesh axis, i.e. ICI on a real pod
slice (SURVEY.md §2.3 "keep halo traffic strictly on ICI").

`init_distributed()` wraps jax.distributed.initialize; `global_mesh()`
builds the ("frame", "ty") mesh with frame spanning processes.  Works
identically on a TPU pod slice and on N localhost CPU processes (the
multi-host test tier, SURVEY.md §4).
"""

from __future__ import annotations

import jax
import numpy as np


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Initialize the multi-controller runtime (DCN analog: TCP)."""
    kwargs = {}
    if coordinator is not None:
        kwargs = dict(coordinator_address=coordinator,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def global_mesh(frame_per_process: int = 1):
    """("frame", "ty") mesh: frame axis spans processes (DCN), ty is the
    per-process spatial axis (ICI).  Requires every process to expose the
    same local device count."""
    n_proc = jax.process_count()
    local = jax.local_device_count()
    frame = n_proc * frame_per_process
    ty = local // frame_per_process
    devs = np.array(jax.devices()).reshape(frame, ty)
    return jax.sharding.Mesh(devs, ("frame", "ty"))


def weak_scaling_report(frames_per_s: float, n_hosts: int,
                        baseline_1host: float) -> dict:
    """BASELINE.json target: >=80% weak-scaling efficiency at N hosts."""
    eff = frames_per_s / (baseline_1host * n_hosts) if baseline_1host else 0.0
    return {"hosts": n_hosts, "frames_per_s": frames_per_s,
            "weak_scaling_efficiency": round(eff, 4)}


# --------------------------------------------------------------------------
# Analytic weak-scaling projection (round-4 verdict item 6)
# --------------------------------------------------------------------------

# Measured per-row Mosaic sweep times on 1x TPU v5e, from the round-4
# profiler trace (tools/traceview.py on the KITTI batch-16 dispatch,
# 2026-08-20): a 3-direction vertical family sweep ran 12.85 ms for
# 16 frames x 376 rows.  Seconds per swept row of a (L=128, W=1242)
# tile, one family:
MEASURED_T_ROW_S = 12.85e-3 / (16 * 376)
# v5e ICI: 2D torus, 4 links/chip; public per-link one-way bandwidth
# ~50 GB/s (1,600 Gbps aggregate).  Neighbor halo pushes ride ONE link.
ICI_GBPS = 45.0
ICI_LATENCY_S = 2e-6


def project_weak_scaling(h: int = 375, w: int = 1242, d: int = 128,
                         n_families: int = 4, units_per_family: int = 2,
                         carry_bytes: int = 2, batch: int = 16,
                         margin: int = 24,
                         t_row_s: float = MEASURED_T_ROW_S,
                         ici_gbps: float = ICI_GBPS) -> list[dict]:
    """Comm-vs-compute projection of ty-tiled SGM weak scaling on a v5e
    ICI mesh, for N chips = N row tiles (SURVEY.md §2.2 "SP/CP").

    Per family, per tile boundary, the halo message is the carry state
    (units, L, W) (aggregate_tr.tr_carry_units; i16 when bounds fit) —
    ppermute to the downstream neighbor.  Two schedules:

    * exact (wavefront): the ty DAG serializes tiles per family, but
      down- and up-going families stream in OPPOSITE orders, and with
      a batch of frames pipelined through, the bubble amortizes to
      (N-1)/(B+N-1).  Per-step comm overlaps the next tile's sweep
      unless transfer > tile sweep time.
    * fast (margin re-injection): no serialization — every tile sweeps
      margin extra rows (the SGM forgetting bound), one halo exchange,
      fully parallel: eff ~ H / (H + margin*N) minus comm.

    Returns one record per N with projected efficiency for both modes.
    The measured anchor t_row_s comes from the round-4 trace; halo
    bytes are exact; ICI numbers are public v5e figures — assumptions,
    not measurements, and recorded as such."""
    out = []
    # the measured row time is for W=1242 tiles; row work scales ~W
    t_row_s = t_row_s * (w / 1242.0)
    halo_bytes = units_per_family * d * w * carry_bytes
    t_halo = halo_bytes / (ici_gbps * 1e9) + ICI_LATENCY_S
    for n in (2, 4, 8, 16):
        rows = -(-h // n)
        t_tile = rows * t_row_s                  # one family, one tile
        # exact: per boundary, comm either hides under the next tile's
        # sweep or stalls the wave by (t_halo - t_tile)
        stall = max(0.0, t_halo - t_tile)
        # batch pipelining: B frames, chain depth N => occupancy
        occupancy = batch / (batch + n - 1)
        eff_exact = occupancy * t_tile / (t_tile + stall)
        # fast: parallel tiles, margin overhead + one exchange
        t_fast = (rows + margin) * t_row_s + t_halo
        eff_fast = (h * t_row_s / n) / t_fast
        out.append({
            "chips": n, "rows_per_tile": rows,
            "halo_KB_per_family_boundary": round(halo_bytes / 1024, 1),
            "t_tile_ms": round(t_tile * 1e3, 3),
            "t_halo_us": round(t_halo * 1e6, 1),
            "eff_exact_pct": round(100 * eff_exact, 1),
            "eff_fast_pct": round(100 * eff_fast, 1),
            "meets_80pct": bool(eff_fast >= 0.8),
        })
    return out
