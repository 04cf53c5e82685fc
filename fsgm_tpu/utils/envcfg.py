"""Validated environment-variable overrides.

The perf knobs (FSGM_FLOW_CHUNK, FSGM_TR_RB, FSGM_FOLD_MAXH, ...) are
integer env overrides read near (sometimes inside) jitted code; a
malformed value used to surface as a bare ValueError deep in tracing
(ADVICE r4).  `env_int` names the variable and the bad value in the
error, at the read site.

NOTE (shared caveat, see aggregate_tr.fold_max_lanes): most of these
knobs are read at TRACE time and are NOT part of the jit cache key —
flipping one after a shape has compiled silently reuses the previously
compiled variant.  A/B runs need a fresh process per setting unless the
entry threads the value as a static jit argument.
"""

from __future__ import annotations

import os


def env_int(name: str, default: int) -> int:
    """int(os.environ[name]) with a clear configuration error."""
    raw = os.environ.get(name)
    if raw is None:
        return default
    try:
        return int(raw)
    except ValueError:
        raise ValueError(
            f"environment override {name}={raw!r} is not an integer "
            f"(default {default})") from None
