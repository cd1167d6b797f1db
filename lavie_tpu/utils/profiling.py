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


def count_params(params) -> int:
    """Total parameter count (reference: count_params
    base/models/utils.py:211-215)."""
    import numpy as np

    return int(sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params)))


def count_flops_attention(batch: int, heads: int, seq_q: int, seq_k: int, head_dim: int) -> int:
    """Matmul FLOPs of one attention call — scores + weighted sum
    (reference: count_flops_attn base/models/utils.py:192-209, thop hook)."""
    return 2 * 2 * batch * heads * seq_q * seq_k * head_dim


def compiled_flops(fn, *args) -> float:
    """XLA's own cost model for a jitted call: total FLOPs of the compiled
    program (the honest replacement for the reference's thop hook)."""
    c = jax.jit(fn).lower(*args).compile()
    ca = c.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0] if ca else {}
    return float(ca.get("flops", float("nan")))
