"""Checkpoint/resume for batch runs (SURVEY.md §5 "Checkpoint / resume").

The workload is stateless per frame, so recovery = re-queue unfinished
frames: a JSONL manifest records completed frame IDs + output paths, and
an idempotent re-run skips them.  This deliberately replaces optimizer-
state checkpointing, which has no analog here (documented non-goal).
"""

from __future__ import annotations

import json
import os
from pathlib import Path


class RunManifest:
    """Append-only JSONL manifest; safe across crashes (O_APPEND lines)."""

    def __init__(self, path):
        self.path = Path(path)
        self._done: dict[str, dict] = {}
        if self.path.exists():
            for line in self.path.read_text().splitlines():
                line = line.strip()
                if not line:
                    continue
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue  # torn write from a crash — frame re-runs
                if rec.get("status") == "done":
                    self._done[rec["frame_id"]] = rec

    def is_done(self, frame_id: str) -> bool:
        rec = self._done.get(frame_id)
        if rec is None:
            return False
        out = rec.get("output")
        return out is None or Path(out).exists()

    def mark_done(self, frame_id: str, output: str | None = None,
                  **extra) -> None:
        rec = {"frame_id": frame_id, "status": "done", "output": output,
               **extra}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
            f.flush()
            os.fsync(f.fileno())
        self._done[frame_id] = rec

    def pending(self, frame_ids) -> list:
        return [f for f in frame_ids if not self.is_done(f)]
