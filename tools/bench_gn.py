"""Microbench: GroupNorm(+SiLU) at the hot VSR shapes, vs the HBM floor.

The r2 trace shows conv-epilogue+GN-stats fusions at the 320×512×512 level
taking 32 ms/fwd each — the two-pass stats + one apply pass should be
~3–5 ms at HBM bandwidth. Measures our GroupNorm standalone (chained,
varied inputs, host materialization) to separate inherent cost from
layout context.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.lavie_tpu_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from lavie_tpu.nn.layers import GroupNorm  # noqa: E402

CHAIN = 8
REPS = 3


def timed(fn, x, tag, nbytes):
    @jax.jit
    def chained(x):
        for i in range(CHAIN):
            x = fn(x + jnp.bfloat16(i * 1e-3))
        return jnp.sum(x.astype(jnp.float32))

    np.asarray(chained(x))
    times = []
    for r in range(REPS):
        t0 = time.perf_counter()
        np.asarray(chained(x + jnp.bfloat16(r * 1e-3)))
        times.append((time.perf_counter() - t0) / CHAIN)
    ms = min(times) * 1e3
    print(f"{tag:28s} {ms:7.2f} ms/app  ({nbytes/ms*1e3/1e9:6.0f} GB/s effective)")
    return ms


def main():
    shapes = [
        ("GN 8x320x512x512 g32", (8, 320, 512, 512), 32),
        ("GN 8x160x256x512 g32", (8, 160, 256, 512), 32),
        ("GN 8x320x512x256 g32", (8, 320, 512, 256), 32),
    ]
    for tag, shape, g in shapes:
        # generate ON DEVICE: a 2.7 GB host array through the axon tunnel
        # stalls for minutes
        x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.bfloat16)
        gn = GroupNorm(num_groups=g)
        params = gn.init(jax.random.PRNGKey(0), x)["params"]
        nbytes = x.size * 2 * 2  # read + write per pass (stats pass extra read)

        timed(lambda v: gn.apply({"params": params}, v), x, tag, nbytes)
        timed(lambda v: jax.nn.silu(gn.apply({"params": params}, v)), x,
              tag + " +silu", nbytes)


if __name__ == "__main__":
    main()
