"""Low-scale conditioning noise augmentation.

Rebuild of the SD x4-upscaler's `ImageConcatWithNoiseAugmentation`
(reference: vsr/models/upscaling.py:81-95): DDPM-noise the low-res
conditioning frames at a sampled (or given) noise level before they are
channel-concatenated onto the latents; the level feeds the UNet's learned
class embedding. The augmentation schedule is the x4-upscaler's
scaled-linear β (reference: vsr/models/upscaling.py:21-25).

Pure functions over a NoiseSchedule — jit/vmap-friendly, rng passed in.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from lavie_tpu.diffusion.schedule import NoiseSchedule
from lavie_tpu.diffusion.samplers import add_noise


def low_scale_schedule(
    num_train_timesteps: int = 1000,
    beta_start: float = 1e-4,
    beta_end: float = 2e-2,
) -> NoiseSchedule:
    """The upscaler's low-res augmentation schedule: squared-sqrt-linspace β
    (reference: vsr/models/upscaling.py:21-25)."""
    return NoiseSchedule.create("scaled_linear", num_train_timesteps, beta_start, beta_end)


def augment_conditioning(
    schedule: NoiseSchedule,
    x: jnp.ndarray,
    rng: jax.Array,
    noise_level: Optional[jnp.ndarray] = None,
    max_noise_level: int = 1000,
    noise: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """q-sample the conditioning at `noise_level` (sampled uniformly in
    [0, max_noise_level) when None) — returns (augmented, levels)
    (reference: vsr/models/upscaling.py:86-95). `noise` overrides the
    sampled gaussian (parity tests)."""
    b = x.shape[0]
    lvl_key, noise_key = jax.random.split(rng)
    if noise_level is None:
        noise_level = jax.random.randint(lvl_key, (b,), 0, max_noise_level)
    if noise is None:
        noise = jax.random.normal(noise_key, x.shape, dtype=jnp.float32)
    z = add_noise(schedule, x.astype(jnp.float32), noise, noise_level)
    return z.astype(x.dtype), noise_level
