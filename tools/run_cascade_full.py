"""One-shot FULL-SIZE option-4 cascade on the real chip (VERDICT r3 #4).

Drives `pipelines/cascade.py` end-to-end — prompt → base 16f@320x512 →
TSR 61f → VSR 61f@1280x2048 → uint8 video — as ONE in-process program
chain, the way the reference's Cog server does it
(reference: predict.py:159-340). bench.py's option-4 headline is a
sum-of-independently-benched stages; this run measures the real thing
including every piece of interstage glue (TSR decode → host uint8 →
VSR re-ingest, window splitting, host round-trips) so the arithmetic
can be reconciled against a genuine wall clock.

Prints per-stage timestamps (instrumented via thin wrappers around the
stage pipelines — the cascade still drives) and a final JSON line:

  {"cold_s": ..., "warm_s": ..., "stages_warm": {...}}

Run: python tools/run_cascade_full.py [--frames 16] [--steps 50] [--no-warm]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("LAVIE_LOOP_MODE", "hybrid")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.lavie_tpu_jax_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, file=sys.stderr, flush=True)


class _TimedStage:
    """Wraps a stage pipeline's __call__ so the cascade's own driving code
    reports per-stage walls without being modified."""

    def __init__(self, inner, name, book):
        object.__setattr__(self, "_inner", inner)
        object.__setattr__(self, "_name", name)
        object.__setattr__(self, "_book", book)

    def __getattr__(self, k):
        return getattr(self._inner, k)

    def __setattr__(self, k, v):
        # forward writes too: cascade.set_mesh does `self.vsr.mesh = mesh` —
        # setting that on the wrapper while the inner pipeline reads its own
        # stale attribute would be silently wrong on the multi-chip path
        if k.startswith("_"):
            object.__setattr__(self, k, v)
        else:
            setattr(self._inner, k, v)

    def __call__(self, *a, **kw):
        log(f"stage {self._name}: start")
        t0 = time.time()
        out = self._inner(*a, **kw)
        # stage outputs are numpy already at the pipeline boundary; charge
        # any deferred device work to the stage that created it
        jax.block_until_ready(jax.tree.leaves(out.__dict__))
        dt = time.time() - t0
        self._book[self._name] = self._book.get(self._name, 0.0) + dt
        log(f"stage {self._name}: {dt:.1f}s")
        return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--no-warm", action="store_true",
                    help="skip the second (warm) run")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--save", metavar="PATH",
                    help="also write the final JSON record to PATH (e.g. "
                    "CASCADE_r05.json — read by tools/project_option4.py)")
    args = ap.parse_args()

    from lavie_tpu.pipelines.cascade import VideoCascadePipeline

    log(f"device: {jax.devices()[0]}")
    log("initializing full-size cascade (3 pipelines, jitted init)...")
    t0 = time.time()
    cascade = VideoCascadePipeline.init_random(
        jax.random.PRNGKey(0), tiny=args.tiny
    )
    for p in (cascade.base, cascade.interpolation, cascade.vsr):
        p.params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), p.params)
    log(f"init: {time.time() - t0:.1f}s")

    book = {}
    cascade.base = _TimedStage(cascade.base, "base", book)
    cascade.interpolation = _TimedStage(cascade.interpolation, "tsr", book)
    cascade.vsr = _TimedStage(cascade.vsr, "vsr", book)

    kw = dict(
        video_length=args.frames,
        num_inference_steps=args.steps,
        interp_steps=args.steps,
        vsr_steps=args.steps,
        seed=0,
    )
    if args.tiny:
        kw.update(video_length=4, height=64, width=64)

    log("COLD run (includes compile)...")
    t0 = time.time()
    out = cascade("a teddy bear walking on the street, 4k, high resolution",
                  **kw)
    cold = time.time() - t0
    cold_stages = dict(book)
    log(f"cold cascade: {cold:.1f}s; output {out.video.shape} {out.video.dtype}")

    warm = None
    warm_stages = None
    if not args.no_warm:
        book.clear()
        kw["seed"] = 1
        log("WARM run...")
        t0 = time.time()
        out = cascade("a teddy bear walking on the street, 4k, high resolution",
                      **kw)
        warm = time.time() - t0
        warm_stages = dict(book)
        log(f"warm cascade: {warm:.1f}s; output {out.video.shape}")

    glue = None
    if warm is not None:
        glue = warm - sum(warm_stages.values())
    record = {
        "cold_s": round(cold, 1),
        "cold_stages": {k: round(v, 1) for k, v in cold_stages.items()},
        "warm_s": round(warm, 1) if warm is not None else None,
        "stages_warm": {k: round(v, 1) for k, v in (warm_stages or {}).items()},
        "glue_outside_stages_s": round(glue, 2) if glue is not None else None,
        "output_shape": list(out.video.shape),
    }
    print(json.dumps(record), flush=True)
    if args.save:
        with open(args.save, "w") as f:
            json.dump(record, f, indent=2)
        log(f"record saved to {args.save}")


if __name__ == "__main__":
    main()
