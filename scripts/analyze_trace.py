"""Offline per-op attribution from a jax.profiler perfetto trace.

Usage: python scripts/analyze_trace.py profiles/3j_Walker3DStepperEnv

Sums device-track slice durations by (sanitized) op name and prints the
top contributors — no TensorBoard/Perfetto UI needed (none in this
image). Written for the round-4 stepper train-step attribution (2.8
s/update vs the walker's 0.37 with an identical learner)."""

from __future__ import annotations

import collections
import glob
import gzip
import json
import re
import sys


def load_events(root: str):
    paths = sorted(glob.glob(root + "/**/*.trace.json.gz", recursive=True))
    if not paths:
        paths = sorted(glob.glob(root + "/**/trace.json.gz", recursive=True))
    if not paths:
        raise SystemExit(f"no trace.json.gz under {root}")
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    return data.get("traceEvents", []), paths[-1]


def sanitize(name: str) -> str:
    # strip uniquing suffixes: fusion.123 → fusion, %xla_args etc.
    name = re.sub(r"\.\d+$", "", name)
    return name


def main(root: str) -> None:
    events, path = load_events(root)
    print(f"# {path}: {len(events)} events")
    # identify process/thread names to find device tracks
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    device_pids = {
        p for p, n in pid_names.items()
        if any(k in n.lower() for k in ("tpu", "device", "xla", "axon"))
    }
    print("# processes:", {p: n for p, n in pid_names.items()})

    by_name = collections.Counter()
    count = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        dur = e.get("dur", 0)
        pid = e.get("pid")
        if device_pids and pid not in device_pids:
            continue
        n = sanitize(e.get("name", "?"))
        by_name[n] += dur
        count[n] += 1
        total += dur
    print(f"# summed device slice time: {total/1e6:.3f} s")
    for name, dur in by_name.most_common(40):
        print(f"{dur/1e6:9.4f} s  x{count[name]:<7d} {name[:110]}")


if __name__ == "__main__":
    main(sys.argv[1])
