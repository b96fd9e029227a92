"""Summarize a jax.profiler trace: top device ops by total time.

Parses the perfetto trace.json.gz that jax.profiler writes (no
tensorboard_plugin_profile in this image) and aggregates complete events on
the device tracks by name, printing the top-N with totals and counts —
enough to rank step-time levers without a UI.

Usage: python scripts/trace_summary.py /tmp/trace_dir [--top 40] [--iters N]
(--iters divides totals so numbers read as ms/step)
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys


def find_trace(root: str) -> str:
    hits = sorted(
        glob.glob(os.path.join(root, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime,
    )
    if not hits:
        raise SystemExit(f"no *.trace.json.gz under {root}")
    return hits[-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--iters", type=int, default=1)
    args = ap.parse_args()

    path = find_trace(args.trace_dir)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"] if isinstance(data, dict) else data

    # device tracks: process names containing 'TPU' / 'device' (jax labels
    # the device compute track via process_name metadata)
    proc_names = {}
    thread_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            thread_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")

    device_pids = {
        pid for pid, n in proc_names.items()
        if "TPU" in n or "device" in n.lower() or "Device" in n
    }
    if not device_pids:
        device_pids = set(proc_names)

    totals = collections.Counter()
    counts = collections.Counter()
    track_totals = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        tname = thread_names.get((e["pid"], e.get("tid")), "")
        if "step" in tname.lower() and "xla" not in tname.lower():
            continue  # host step markers
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = e.get("name", "?")
        totals[name] += dur
        counts[name] += 1
        track_totals[(proc_names.get(e["pid"], e["pid"]), tname)] += dur

    print(f"trace: {path}")
    print("\n== tracks (total ms / iters) ==")
    for (p, t), v in track_totals.most_common(12):
        print(f"{v / args.iters:10.2f} ms  {p} :: {t}")
    print(f"\n== top {args.top} device ops (ms per {args.iters} iter(s)) ==")
    for name, v in totals.most_common(args.top):
        print(f"{v / args.iters:10.3f} ms  x{counts[name]:<5d} {name[:110]}")

    # family rollup: strip trailing .N instance suffixes so the hundreds of
    # fusion.N / attn.N instances aggregate into rankable buckets — this is
    # the table that ranks step-time levers (a whole-step program has too
    # many instances for the per-op list to show structure)
    import re

    fam_totals = collections.Counter()
    fam_counts = collections.Counter()
    for name, v in totals.items():
        if name.startswith("jit_"):
            continue
        fam = re.sub(r"\.\d+$", "", name)
        fam_totals[fam] += v
        fam_counts[fam] += counts[name]
    print(f"\n== op families (ms per {args.iters} iter(s)) ==")
    for fam, v in fam_totals.most_common(30):
        print(f"{v / args.iters:10.3f} ms  x{fam_counts[fam]:<6d} {fam[:110]}")


if __name__ == "__main__":
    main()
