"""Structured logging with per-host prefixes (SURVEY.md §5 observability).

Multi-controller runs interleave stdout from every process; the prefix
`[host i/N]` makes merged logs attributable.  `log_record` emits JSONL
records (one machine-parseable line per event) alongside human messages.
"""

from __future__ import annotations

import json
import logging
import sys
import time


def host_prefix() -> str:
    try:
        import jax
        if jax.process_count() > 1:
            return f"[host {jax.process_index()}/{jax.process_count()}] "
    except Exception:
        pass
    return ""


def get_logger(name: str = "fsgm") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(logging.Formatter(
            host_prefix() + "%(asctime)s %(name)s %(levelname)s %(message)s",
            datefmt="%H:%M:%S"))
        logger.addHandler(h)
        logger.setLevel(logging.INFO)
    return logger


def log_record(stream, **fields) -> None:
    """One JSONL record (per-frame metrics etc.); stream = file object or
    path."""
    fields.setdefault("ts", round(time.time(), 3))
    pid = host_prefix().strip("[] ")
    if pid:
        fields.setdefault("host", pid)
    line = json.dumps(fields, sort_keys=True)
    if hasattr(stream, "write"):
        stream.write(line + "\n")
        stream.flush()
    else:
        with open(stream, "a") as f:
            f.write(line + "\n")
