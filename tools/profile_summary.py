"""Aggregate a jax-profiler trace by HLO category.

Companion to `-profile DIR` (mgtpu/pipelines/standard.py — the
tracing subsystem, SURVEY §5): summarizes device-side op time from the
captured trace so statements like "conv fusions 22.9 ms / BN backward
reductions 7.0 ms per step" (PARITY.md §"Training-throughput ceiling")
are reproducible from artifacts instead of session notes.

Usage:
  python tools/profile_summary.py <profile_dir> [--top N] [--steps K]

<profile_dir> is the directory passed to -profile (it contains
plugins/profile/<run>/<host>.trace.json.gz). Durations are summed over
the whole capture; pass --steps to also print per-step numbers (the
standard pipeline captures iterations 2..9, i.e. 8 steps).
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys


def find_trace(profile_dir: str) -> str:
    pats = [
        os.path.join(profile_dir, "plugins", "profile", "*", "*.trace.json.gz"),
        os.path.join(profile_dir, "**", "*.trace.json.gz"),
    ]
    for p in pats:
        hits = sorted(glob.glob(p, recursive=True))
        if hits:
            return hits[-1]  # newest capture
    raise FileNotFoundError(f"no *.trace.json.gz under {profile_dir}")


def device_events(trace: dict):
    """Yield complete events from device-side tracks (TensorFlow Name
    Scope / XLA Ops live under pids whose process name contains 'TPU'
    or 'Device'); host python threads are excluded."""
    names = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            names[ev["pid"]] = ev.get("args", {}).get("name", "")
    dev_pids = {
        pid
        for pid, name in names.items()
        if any(k in name for k in ("TPU", "Device", "/device:"))
    }
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "X" and ev.get("pid") in dev_pids:
            yield ev


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("profile_dir")
    ap.add_argument("--top", type=int, default=12)
    ap.add_argument("--steps", type=int, default=0,
                    help="divide totals by this step count for per-step ms")
    args = ap.parse_args()

    path = find_trace(args.profile_dir)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)

    by_cat = collections.Counter()
    by_op = collections.Counter()
    total = 0.0
    for ev in device_events(trace):
        # XLA Ops rows carry hlo_category; name-scope rows double-count
        cat = (ev.get("args") or {}).get("hlo_category")
        if cat is None:
            continue
        dur = float(ev.get("dur", 0.0))  # microseconds
        by_cat[cat] += dur
        by_op[ev.get("name", "?")] += dur
        total += dur

    div = args.steps if args.steps else 1
    unit = "ms/step" if args.steps else "ms total"
    print(f"trace: {path}")
    print(f"device op time: {total / 1000 / div:.2f} {unit}\n")
    print(f"{'category':40s} {unit:>10s}  share")
    for cat, dur in by_cat.most_common(args.top):
        print(f"{cat:40s} {dur / 1000 / div:10.2f}  {dur / total:6.1%}")
    print(f"\ntop individual ops ({unit}):")
    for op, dur in by_op.most_common(args.top):
        print(f"  {dur / 1000 / div:8.2f}  {op[:90]}")


if __name__ == "__main__":
    sys.exit(main())
