"""Profiling/tracing hooks.

The reference's only profiling is cuda-synchronized wall-clock timers
(reference: vsr/sample.py:96-132) and an unused FLOP counter
(reference: base/models/utils.py:192-209). TPU-natively this is
`jax.profiler` traces viewable in XProf/TensorBoard plus a blocking timer.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace: `with trace("/tmp/xprof"): run()`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def device_timer(name: str = "block", results: Optional[dict] = None) -> Iterator[None]:
    """Wall-clock timer that blocks on all outstanding device work — the TPU
    analog of the reference's torch.cuda.synchronize() bracket."""
    (jax.device_put(0.0) + 0).block_until_ready()
    t0 = time.perf_counter()
    yield
    jax.effects_barrier()
    dt = time.perf_counter() - t0
    if results is not None:
        results[name] = dt
    else:
        print(f"[{name}] {dt:.3f}s")


def annotate(name: str):
    """Named trace region for XProf (jax.profiler.TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)
