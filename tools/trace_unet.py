"""Trace a full-size UNet forward on the TPU and print per-op device times.

Usage:
  python tools/trace_unet.py [base|tsr|vsr] [--reps N] [--top K]

Builds the stage's UNet at the reference's full sampling shape (half-CFG
batch), jits one forward, warms it up, runs `reps` applications under
jax.profiler.trace, and aggregates device-stream op durations from the
trace-viewer JSON. This is the measurement harness behind DESIGN.md's
trace-driven optimization record.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import sys
import tempfile
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.lavie_tpu_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def build(stage: str, dtype=jnp.bfloat16, frames: int = 0, quant: str = "none"):
    import dataclasses

    from lavie_tpu.core.config import UNetConfig
    from lavie_tpu.nn.unet import UNet3D

    if stage == "base":
        cfg = UNetConfig.base_t2v()
        b, f, h, w = 1, 16, 40, 64
        sample = jnp.zeros((b, f, h, w, cfg.in_channels), dtype)
        ctx = jnp.zeros((b, 77, 768), dtype)
        class_labels = None
    elif stage == "tsr":
        cfg = UNetConfig.interpolation()
        b, f, h, w = 2, 61, 40, 64
        sample = jnp.zeros((b, f, h, w, cfg.in_channels), dtype)
        ctx = jnp.zeros((b, 77, 768), dtype)
        class_labels = None
    elif stage == "vsr":
        cfg = UNetConfig.vsr()
        b, f, h, w = 1, frames or 8, 320, 512
        sample = jnp.zeros((b, f, h, w, cfg.in_channels), dtype)
        ctx = jnp.zeros((b, 77, 1024), dtype)
        class_labels = jnp.full((b,), 50, jnp.int32)
    else:
        raise SystemExit(f"unknown stage {stage}")

    if quant != "none":
        cfg = dataclasses.replace(cfg, conv_quant=quant)
    model = UNet3D(config=cfg, dtype=dtype)
    t = jnp.full((sample.shape[0],), 500, jnp.int32)

    # init at a TINY spatial size: params are spatial-shape-independent, and
    # the full-shape init program is what the axon remote compiler chokes on
    # (the r2 VSR model sat >35 min in init at 320x512)
    small = jnp.zeros(sample.shape[:2] + (32, 32, sample.shape[-1]), sample.dtype)

    def init_fn(rng):
        kwargs = {}
        if class_labels is not None:
            kwargs["class_labels"] = class_labels
        return model.init(rng, small, t, ctx, **kwargs)

    print("init...", file=sys.stderr, flush=True)
    params = jax.jit(init_fn)(jax.random.PRNGKey(0))

    def fwd(params, x, t, ctx):
        kwargs = {}
        if class_labels is not None:
            kwargs["class_labels"] = class_labels
        return model.apply(params, x, t, ctx, **kwargs)

    fn = jax.jit(fwd)
    flops = None
    try:
        lowered = jax.jit(fwd).lower(params, sample, t, ctx)
        flops = lowered.compile().cost_analysis()
        flops = flops.get("flops") if isinstance(flops, dict) else flops[0].get("flops")
    except Exception:
        pass
    return fn, (params, sample, t, ctx), flops


def collect_trace(tracedir: str):
    """Aggregate device-stream events from trace-viewer JSON."""
    files = glob.glob(os.path.join(tracedir, "**", "*.trace.json.gz"), recursive=True)
    if not files:
        raise SystemExit(f"no trace json under {tracedir}")
    with gzip.open(sorted(files)[-1], "rt") as fh:
        data = json.load(fh)
    events = data.get("traceEvents", [])
    # find device PIDs (TPU core streams)
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items() if re.search(r"TPU|/device|XLA Op", n, re.I)}
    agg = defaultdict(lambda: [0.0, 0])
    meta = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0) / 1e3  # us → ms
        # skip whole-program envelopes
        if name.startswith("jit_") or name in ("XLA Modules", "XLA Ops"):
            continue
        agg[name][0] += dur
        agg[name][1] += 1
        total += dur
        if name not in meta:
            a = e.get("args", {}) or {}
            # xprof puts the HLO op's source/framework attribution here
            tag = a.get("long_name") or a.get("tf_op") or a.get("source") or ""
            meta[name] = str(tag)[:160]
    return agg, total, pid_names, meta


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("stage", choices=["base", "tsr", "vsr"])
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--frames", type=int, default=0, help="override frame count (vsr)")
    ap.add_argument("--quant", default="none", help="conv_quant mode (int8 turbo)")
    ap.add_argument("--group", action="store_true", help="group by fusion root name")
    args = ap.parse_args()

    fn, fargs, flops = build(args.stage, frames=args.frames, quant=args.quant)
    print("warmup...", file=sys.stderr, flush=True)
    out = fn(*fargs)
    jax.block_until_ready(out)
    import time

    t0 = time.perf_counter()
    for _ in range(args.reps):
        out = fn(*fargs)
    jax.block_until_ready(out)
    wall = (time.perf_counter() - t0) / args.reps
    print(f"wall per fwd: {wall*1e3:.1f} ms", flush=True)
    if flops:
        print(f"XLA cost-model flops: {flops/1e12:.1f} TF → {flops/wall/1e12:.1f} TF/s "
              f"({flops/wall/197e12*100:.1f}% of v5e peak)")

    tracedir = tempfile.mkdtemp(prefix="lavie_trace_")
    with jax.profiler.trace(tracedir):
        for _ in range(args.reps):
            out = fn(*fargs)
        jax.block_until_ready(out)

    agg, total, pid_names, meta = collect_trace(tracedir)
    print(f"device total: {total/args.reps:.1f} ms/fwd over {len(agg)} distinct ops")
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
    if args.group:
        g = defaultdict(lambda: [0.0, 0])
        for name, (dur, cnt) in agg.items():
            key = re.sub(r"[.\d]+$", "", name.split("/")[-1])
            g[key][0] += dur
            g[key][1] += cnt
        rows = sorted(g.items(), key=lambda kv: -kv[1][0])
    print(f"{'ms/fwd':>9}  {'%':>5}  {'count':>6}  op")
    if not args.group:
        for name, (dur, cnt) in rows[: args.top]:
            tag = meta.get(name, "")
            print(f"{dur/args.reps:9.2f}  {dur/total*100:5.1f}  {cnt:6d}  {name}  {tag}")
        return
    for name, (dur, cnt) in rows[: args.top]:
        print(f"{dur/args.reps:9.2f}  {dur/total*100:5.1f}  {cnt:6d}  {name[:140]}")


if __name__ == "__main__":
    main()
