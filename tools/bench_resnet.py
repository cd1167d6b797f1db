"""Microbench: the full-res VSR up-path resnet (skip-concat → ResnetBlock3D).

The r2 trace attributes ~96 ms/fwd to three fusions on bf16[8,320,512,512]
tensors (GN-stats + epilogues around the up-L0 resnets) — ~3× their
HBM floor. Measures the same computation standalone to separate inherent
cost from cross-block layout context. On-device inputs (host transfers
stall the axon tunnel).
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

from lavie_tpu.nn.resnet import ResnetBlock3D  # noqa: E402

CHAIN = 4
REPS = 3


def main():
    B, F, H, W = 1, 8, 320, 512
    CH_SKIP, CH_HID, TEMB = 256, 256, 1024
    dtype = jnp.bfloat16
    blk = ResnetBlock3D(in_channels=CH_SKIP + CH_HID, out_channels=CH_HID,
                        temb_channels=TEMB, dtype=dtype)
    hid = jax.random.normal(jax.random.PRNGKey(0), (B, F, H, W, CH_HID), dtype)
    skip = jax.random.normal(jax.random.PRNGKey(1), (B, F, H, W, CH_SKIP), dtype)
    temb = jax.random.normal(jax.random.PRNGKey(2), (B, TEMB), dtype)
    params = jax.jit(blk.init)(jax.random.PRNGKey(3),
                               jnp.concatenate([hid, skip], -1), temb)["params"]
    params = jax.tree.map(lambda x: x.astype(dtype), params)

    @jax.jit
    def chained(h, s, t):
        for i in range(CHAIN):
            x = jnp.concatenate([h + jnp.bfloat16(i * 1e-3), s], axis=-1)
            h = blk.apply({"params": params}, x, t)
        return jnp.sum(h.astype(jnp.float32))

    np.asarray(chained(hid, skip, temb))
    times = []
    for r in range(REPS):
        t0 = time.perf_counter()
        np.asarray(chained(hid + jnp.bfloat16(r * 1e-3), skip, temb))
        times.append((time.perf_counter() - t0) / CHAIN)
    ms = min(times) * 1e3
    # conv1 (512→256) + conv2 (256→256) 3x3 at 320×512×8
    gf = 2 * B * F * H * W * 9 * (512 * 256 + 256 * 256) / 1e9
    print(f"up-L0 resnet (concat+GN+convs): {ms:.2f} ms/app  {gf/ms:.1f} TF/s")


if __name__ == "__main__":
    main()
