"""Aggregate a jax.profiler trace-viewer JSON by module / HLO category.

Usage: python tools/trace_report.py <trace.json.gz|tracedir> [--reps N] [--depth D]

For every device op event, reads args.tf_op (the jit module path),
args.model_flops and args.bytes_accessed, and prints per-group:
time, share, achieved TF/s, achieved GB/s. Low TF/s + low GB/s groups are
the optimization targets (neither compute- nor bandwidth-bound = overhead).
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict


def load_events(path: str):
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "**", "*.trace.json.gz"), recursive=True))
        if not files:
            raise SystemExit(f"no trace json under {path}")
        path = files[-1]
    with gzip.open(path, "rt") as fh:
        data = json.load(fh)
    return data.get("traceEvents", [])


def device_pids(events):
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    return {p for p, n in pid_names.items() if re.search(r"TPU|/device", n, re.I)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--depth", type=int, default=2, help="module path depth to group by")
    ap.add_argument("--by", choices=["module", "category", "op"], default="module")
    ap.add_argument("--filter", default=None, help="regex on tf_op")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    events = load_events(args.path)
    pids = device_pids(events)
    agg = defaultdict(lambda: [0.0, 0, 0.0, 0.0])  # ms, count, flops, bytes
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in pids:
            continue
        a = e.get("args") or {}
        tf_op = a.get("tf_op", "")
        if not tf_op:
            continue
        if args.filter and not re.search(args.filter, tf_op):
            continue
        dur = e.get("dur", 0) / 1e3
        flops = float(a.get("model_flops", 0) or 0)
        nbytes = float(a.get("bytes_accessed", 0) or 0)
        if args.by == "module":
            # tf_op like jit(fwd)/UNet3D/up_blocks_1/attentions_2/proj_out/dot_general:
            parts = tf_op.split("/")
            # drop jit(...)/ModelName prefix
            while parts and (parts[0].startswith("jit(") or parts[0] in ("UNet3D",)):
                parts.pop(0)
            key = "/".join(parts[: args.depth]) or tf_op
        elif args.by == "category":
            key = a.get("hlo_category", "?")
        else:
            key = tf_op.rstrip(":")
        agg[key][0] += dur
        agg[key][1] += 1
        agg[key][2] += flops
        agg[key][3] += nbytes
        total += dur
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
    r = args.reps
    print(f"device total: {total/r:.1f} ms/rep, {len(agg)} groups")
    print(f"{'ms/rep':>9} {'%':>5} {'count':>6} {'TF/s':>7} {'GB/s':>7}  group")
    for name, (dur, cnt, fl, by) in rows[: args.top]:
        tfs = fl / (dur / 1e3) / 1e12 if dur else 0
        gbs = by / (dur / 1e3) / 1e9 if dur else 0
        print(f"{dur/r:9.2f} {dur/total*100:5.1f} {cnt:6d} {tfs:7.1f} {gbs:7.0f}  {name[:120]}")


if __name__ == "__main__":
    main()
