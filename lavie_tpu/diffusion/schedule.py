"""Noise schedules as precomputed fp32 tables.

The reference uses three scheduler stacks with identical underlying math:
diffusers DDPM/DDIM/EulerDiscrete for the base stage
(reference: base/pipelines/sample.py:44-63), vendored OpenAI GaussianDiffusion
for interpolation (reference: interpolation/diffusion/gaussian_diffusion.py:144),
and a vendored v-prediction DDIM for VSR (reference: vsr/diffusion/scheduling_ddim.py:85).
Here there is one schedule table; the steppers in `samplers.py` index into it.

All tables are float64-accurate at construction (numpy) then stored as fp32,
matching diffusers' numerics.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


def make_beta_schedule(
    schedule: str = "linear",
    num_train_timesteps: int = 1000,
    beta_start: float = 1e-4,
    beta_end: float = 0.02,
) -> np.ndarray:
    """Beta table (reference: base/configs/sample.yaml:23-25 pins linear
    1e-4→0.02; diffusers also offers scaled_linear and squaredcos_cap_v2)."""
    if schedule == "linear":
        betas = np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float64)
    elif schedule == "scaled_linear":
        betas = (
            np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64)
            ** 2
        )
    elif schedule == "squaredcos_cap_v2":
        # cosine schedule (Nichol & Dhariwal)
        t = np.arange(num_train_timesteps, dtype=np.float64)
        f = lambda u: np.cos((u / num_train_timesteps + 0.008) / 1.008 * np.pi / 2) ** 2
        betas = np.minimum(1.0 - f(t + 1) / f(t), 0.999)
    else:
        raise ValueError(f"unknown beta schedule: {schedule}")
    return betas


@dataclasses.dataclass(frozen=True)
class NoiseSchedule:
    """Precomputed diffusion tables, length = num_train_timesteps."""

    betas: jnp.ndarray
    alphas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray

    @property
    def num_train_timesteps(self) -> int:
        return self.betas.shape[0]

    @classmethod
    def create(
        cls,
        schedule: str = "linear",
        num_train_timesteps: int = 1000,
        beta_start: float = 1e-4,
        beta_end: float = 0.02,
    ) -> "NoiseSchedule":
        betas = make_beta_schedule(schedule, num_train_timesteps, beta_start, beta_end)
        alphas = 1.0 - betas
        alphas_cumprod = np.cumprod(alphas)
        return cls(
            betas=jnp.asarray(betas, dtype=jnp.float32),
            alphas=jnp.asarray(alphas, dtype=jnp.float32),
            alphas_cumprod=jnp.asarray(alphas_cumprod, dtype=jnp.float32),
            sqrt_alphas_cumprod=jnp.asarray(np.sqrt(alphas_cumprod), dtype=jnp.float32),
            sqrt_one_minus_alphas_cumprod=jnp.asarray(
                np.sqrt(1.0 - alphas_cumprod), dtype=jnp.float32
            ),
        )

    def alpha_bar(self, t: jnp.ndarray) -> jnp.ndarray:
        """alphas_cumprod[t], with t == -1 (or any negative) mapping to 1.0
        (the 'previous step of t=0' boundary used by DDPM/DDIM steppers)."""
        safe_t = jnp.clip(t, 0, self.num_train_timesteps - 1)
        ab = self.alphas_cumprod[safe_t]
        return jnp.where(t < 0, jnp.ones_like(ab), ab)
