"""Per-kernel device-time table from a jax.profiler trace directory.

Closes SURVEY.md §5's tracing tier end-to-end: capture with
`FSGM_BENCH_TRACE=<dir> python bench.py` (one profiled dispatch of the
exact benchmarked computation), then

    python tools/traceview.py <dir> [--group] [--min-ms 0.01]

parses the newest `*.trace.json.gz` under <dir> and prints, per XLA op
(or per name-group with --group: Mosaic kernels, fusions, copies...),
total device time, call count, bytes_accessed, and achieved HBM GB/s —
the trace-derived attribution that the round-3 verdict demanded instead
of wall-clock inference.  Works on the axon relay: verified 2026-08-20
that device events (XLA Ops thread, device_duration_ps, bytes_accessed,
hlo_category) come through intact.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys


def find_trace(log_dir: str) -> str:
    paths = sorted(glob.glob(os.path.join(
        log_dir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not paths:
        raise FileNotFoundError(f"no *.trace.json.gz under {log_dir}")
    return paths[-1]


def load_device_ops(trace_path: str) -> list[dict]:
    """X-phase events on the device pid's 'XLA Ops' thread."""
    with gzip.open(trace_path) as f:
        d = json.load(f)
    ev = d.get("traceEvents", [])
    dev_pids = {e["pid"] for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "device" in e["args"]["name"].lower()}
    op_tids = {(e["pid"], e["tid"]) for e in ev
               if e.get("ph") == "M" and e.get("name") == "thread_name"
               and e["pid"] in dev_pids and e["args"]["name"] == "XLA Ops"}
    mod_tids = {(e["pid"], e["tid"]) for e in ev
                if e.get("ph") == "M" and e.get("name") == "thread_name"
                and e["pid"] in dev_pids
                and e["args"]["name"] == "XLA Modules"}
    ops, mods = [], []
    for e in ev:
        if e.get("ph") != "X":
            continue
        key = (e.get("pid"), e.get("tid"))
        args = e.get("args", {})
        rec = {
            "name": e["name"],
            "dur_us": float(e.get("dur", 0.0)),
            "bytes": int(args.get("bytes_accessed", 0)),
            "category": args.get("hlo_category", ""),
            "source": args.get("source", ""),
        }
        if key in op_tids:
            ops.append(rec)
        elif key in mod_tids:
            mods.append(rec)
    if mods:
        total = sum(m["dur_us"] for m in mods)
        print(f"# XLA Modules: {len(mods)} executions, "
              f"{total / 1e3:.3f} ms total device time", file=sys.stderr)
    return ops


_GROUP_RES = [
    # Mosaic / pallas custom calls keep their kernel name; strip trailing
    # uniquifiers so repeated launches group together.
    (re.compile(r"^(.*?)[._-]?\d+$"), r"\1"),
]


def group_name(name: str) -> str:
    for rx, sub in _GROUP_RES:
        m = rx.match(name)
        if m and m.group(1):
            name = m.group(1)
            break
    return name


def table(ops: list[dict], group: bool, min_ms: float,
          peak_gbs: float = 819.0) -> list[dict]:
    agg: dict[str, dict] = collections.defaultdict(
        lambda: {"us": 0.0, "n": 0, "bytes": 0, "category": "",
                 "source": ""})
    for o in ops:
        key = group_name(o["name"]) if group else o["name"]
        a = agg[key]
        a["us"] += o["dur_us"]
        a["n"] += 1
        a["bytes"] += o["bytes"]
        a["category"] = a["category"] or o["category"]
        a["source"] = a["source"] or o["source"]
    rows = []
    total_us = sum(a["us"] for a in agg.values()) or 1.0
    for name, a in sorted(agg.items(), key=lambda kv: -kv[1]["us"]):
        ms = a["us"] / 1e3
        if ms < min_ms:
            continue
        gbs = a["bytes"] / (a["us"] * 1e-6) / 1e9 if a["us"] else 0.0
        rows.append({
            "op": name[:72], "ms": round(ms, 3), "calls": a["n"],
            "pct": round(100 * a["us"] / total_us, 1),
            "GB": round(a["bytes"] / 1e9, 3),
            "GBps": round(gbs, 1),
            "pct_HBM_peak": round(100 * gbs / peak_gbs, 1),
            "category": a["category"],
        })
    return rows


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("log_dir")
    ap.add_argument("--group", action="store_true",
                    help="merge ops sharing a name stem")
    ap.add_argument("--min-ms", type=float, default=0.01)
    ap.add_argument("--json", action="store_true",
                    help="JSONL rows instead of aligned table")
    args = ap.parse_args()
    path = find_trace(args.log_dir)
    print(f"# trace: {path}", file=sys.stderr)
    ops = load_device_ops(path)
    total = sum(o["dur_us"] for o in ops) / 1e3
    print(f"# device ops: {len(ops)}, total device time {total:.3f} ms",
          file=sys.stderr)
    rows = table(ops, args.group, args.min_ms)
    if args.json:
        for r in rows:
            print(json.dumps(r))
        return
    hdr = ["ms", "pct", "calls", "GB", "GBps", "pct_HBM_peak",
           "category", "op"]
    print(" ".join(f"{h:>8s}" for h in hdr[:-2]) + "  category | op")
    for r in rows:
        print(f"{r['ms']:8.3f} {r['pct']:8.1f} {r['calls']:8d} "
              f"{r['GB']:8.3f} {r['GBps']:8.1f} {r['pct_HBM_peak']:8.1f}  "
              f"{r['category']} | {r['op']}")


if __name__ == "__main__":
    main()
