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
