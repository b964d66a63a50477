"""Aggregate a jax.profiler Chrome trace into a per-op device-time table.

Usage:
  python tools/trace_topops.py /tmp/prof [N]

Finds the newest `*.trace.json.gz` under the directory, sums complete
('X') events per op name on device lanes (process name containing 'TPU' /
'device', falling back to every lane), and prints the top N (default 30)
by total duration with counts and percentages.  This is the round-2/3
"where does the step time go" workflow (BASELINE.md) as a checked-in tool
instead of an ad-hoc snippet.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict


def load_trace(root: str) -> dict:
    paths = sorted(glob.glob(os.path.join(root, "**", "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {root}")
    with gzip.open(paths[-1], "rt") as f:
        return json.load(f)


def device_pids(events) -> set:
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    dev = {pid for pid, n in names.items()
           if "TPU" in n or "device" in n.lower() or "/gpu" in n.lower()}
    return dev or set(names)


def main():
    root = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    events = load_trace(root).get("traceEvents", [])
    pids = device_pids(events)
    total = defaultdict(float)
    count = defaultdict(int)
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in pids and "dur" in e:
            total[e["name"]] += e["dur"]
            count[e["name"]] += 1
    grand = sum(total.values())
    if not grand:
        raise SystemExit("no complete events on device lanes")
    print(f"{'op':<64} {'ms':>10} {'calls':>7} {'%':>6}")
    for name, dur in sorted(total.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"{name[:64]:<64} {dur / 1e3:>10.3f} {count[name]:>7} "
              f"{100 * dur / grand:>6.2f}")
    print(f"{'TOTAL (sum of op durations)':<64} {grand / 1e3:>10.3f}")


if __name__ == "__main__":
    main()
