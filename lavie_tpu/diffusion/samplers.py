"""Diffusion steppers as pure functions, designed to be `lax.scan`-ed.

Each stepper takes integer timestep arrays and gathers from the precomputed
`NoiseSchedule` tables — no Python control flow on traced values, so the whole
denoising loop compiles to one XLA program (the reference instead runs a Python
loop calling `scheduler.step` per iteration,
reference: base/pipelines/pipeline_videogen.py:663-689).

Numerics mirror diffusers 0.16 exactly:
  - DDPM:  diffusers DDPMScheduler.step, variance_type="fixed_small"
  - DDIM:  diffusers DDIMScheduler.step (eta=0 default), with both epsilon and
           v-prediction parameterizations (the VSR stage's vendored scheduler,
           reference: vsr/diffusion/scheduling_ddim.py:293-447)
  - Euler: diffusers EulerDiscreteScheduler (sigma formulation)
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lavie_tpu.diffusion.schedule import NoiseSchedule


# ---------------------------------------------------------------------------
# timestep spacing
# ---------------------------------------------------------------------------


def ddpm_timesteps(num_inference_steps: int, num_train_timesteps: int = 1000) -> np.ndarray:
    """diffusers DDPMScheduler.set_timesteps: arange with integer stride,
    descending (e.g. 50 steps → [980, 960, ..., 0])."""
    step_ratio = num_train_timesteps // num_inference_steps
    return (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].astype(np.int32)


def ddim_timesteps(
    num_inference_steps: int,
    num_train_timesteps: int = 1000,
    steps_offset: int = 1,
) -> np.ndarray:
    """diffusers DDIMScheduler.set_timesteps with SD's steps_offset=1
    (e.g. 50 steps → [981, 961, ..., 1])."""
    step_ratio = num_train_timesteps // num_inference_steps
    ts = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].astype(np.int64)
    return (ts + steps_offset).astype(np.int32)


def vsr_ddim_timesteps(
    num_inference_steps: int,
    num_train_timesteps: int = 1000,
    steps_offset: int = 1,
) -> np.ndarray:
    """Linspace spacing of the VSR stage's VENDORED DDIM
    (reference: vsr/diffusion/scheduling_ddim.py:268-291). NOTE: this file is
    dead in the shipped path — both VSR entry points REPLACE the pipeline
    scheduler with stock diffusers DDIMScheduler.from_config(x4-upscaler
    config, beta_schedule→linear) (vsr/sample.py:49-53, predict.py:148-156),
    i.e. `ddim_timesteps` arange spacing with the config's steps_offset=1 and
    set_alpha_to_one=False. Kept as the documented vendored variant."""
    ts = (
        np.linspace(steps_offset, num_train_timesteps, num_inference_steps)
        .round()[::-1]
        .astype(np.int64)
        - 1
    )
    return ts.astype(np.int32)


def spaced_timesteps(
    num_inference_steps: int, num_train_timesteps: int = 1000
) -> Tuple[np.ndarray, np.ndarray]:
    """OpenAI `space_timesteps` fractional striding (single section), as used
    by the interpolation stage's SpacedDiffusion
    (reference: interpolation/diffusion/respace.py:65-116): kept steps are
    round(k·(T-1)/(n-1)). Returns (timesteps_desc, prev_timesteps_desc) where
    prev[i] is the next kept step below (−1 for the last).

    Because the spaced chain's alpha-bar table equals the original table at
    the kept steps, a stepper indexing the full schedule at these (t, prev)
    pairs is numerically identical to OpenAI's respaced DDIM.
    """
    if num_inference_steps <= 1:
        frac = 1.0
    else:
        frac = (num_train_timesteps - 1) / (num_inference_steps - 1)
    # replicate the reference's accumulation + python round() exactly
    kept_list = []
    cur = 0.0
    for _ in range(num_inference_steps):
        kept_list.append(int(round(cur)))
        cur += frac
    kept = np.array(sorted(set(kept_list)), dtype=np.int64)
    ts_desc = kept[::-1].astype(np.int32)
    prev_desc = np.concatenate([kept[:-1][::-1], [-1]]).astype(np.int32)
    return ts_desc, prev_desc


def prev_timesteps(timesteps: np.ndarray, num_train_timesteps: int = 1000) -> np.ndarray:
    """t_prev for each t: t - T/n; the final entry goes negative, which the
    steppers map to alpha_bar = 1 (x0)."""
    n = len(timesteps)
    step_ratio = num_train_timesteps // n
    return (timesteps - step_ratio).astype(np.int32)


def euler_sigmas(
    schedule_alphas_cumprod: np.ndarray,
    num_inference_steps: int,
    num_train_timesteps: int = 1000,
) -> Tuple[np.ndarray, np.ndarray, float]:
    """diffusers 0.16 EulerDiscreteScheduler.set_timesteps: float timesteps via
    linspace, sigmas interpolated from sqrt((1-ᾱ)/ᾱ), terminal sigma 0.
    Returns (timesteps_float, sigmas[n+1], init_noise_sigma)."""
    acp = np.asarray(schedule_alphas_cumprod, dtype=np.float64)
    full_sigmas = np.sqrt((1.0 - acp) / acp)
    timesteps = np.linspace(0, num_train_timesteps - 1, num_inference_steps, dtype=np.float64)[::-1].copy()
    sigmas = np.interp(timesteps, np.arange(0, len(full_sigmas)), full_sigmas)
    sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float32)
    init_noise_sigma = float(sigmas.max())
    return timesteps.astype(np.float32), sigmas, init_noise_sigma


# ---------------------------------------------------------------------------
# x0 / epsilon / v conversions
# ---------------------------------------------------------------------------


def predict_x0(
    sample: jnp.ndarray,
    model_output: jnp.ndarray,
    alpha_bar_t: jnp.ndarray,
    prediction_type: str,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Recover (x0, epsilon) from the model output under either
    parameterization (v-pred recovery mirrors
    reference: vsr/diffusion/scheduling_ddim.py:364-368)."""
    sqrt_ab = jnp.sqrt(alpha_bar_t)
    sqrt_1mab = jnp.sqrt(1.0 - alpha_bar_t)
    if prediction_type == "epsilon":
        eps = model_output
        x0 = (sample - sqrt_1mab * eps) / sqrt_ab
    elif prediction_type == "v_prediction":
        x0 = sqrt_ab * sample - sqrt_1mab * model_output
        eps = sqrt_ab * model_output + sqrt_1mab * sample
    else:
        raise ValueError(f"unknown prediction_type: {prediction_type}")
    return x0, eps


def add_noise(
    schedule: NoiseSchedule, x0: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray
) -> jnp.ndarray:
    """q(x_t | x_0) forward noising (training / interpolation conditioning;
    reference: interpolation/diffusion/gaussian_diffusion.py:215)."""
    shape = (-1,) + (1,) * (x0.ndim - 1)
    a = schedule.sqrt_alphas_cumprod[t].reshape(shape)
    s = schedule.sqrt_one_minus_alphas_cumprod[t].reshape(shape)
    return a * x0 + s * noise


def get_velocity(
    schedule: NoiseSchedule, x0: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray
) -> jnp.ndarray:
    """v-parameterization target (reference: vsr/diffusion/gaussian_diffusion.py:247)."""
    shape = (-1,) + (1,) * (x0.ndim - 1)
    a = schedule.sqrt_alphas_cumprod[t].reshape(shape)
    s = schedule.sqrt_one_minus_alphas_cumprod[t].reshape(shape)
    return a * noise - s * x0


# ---------------------------------------------------------------------------
# steppers
# ---------------------------------------------------------------------------


def ddpm_step(
    schedule: NoiseSchedule,
    sample: jnp.ndarray,
    model_output: jnp.ndarray,
    t: jnp.ndarray,
    prev_t: jnp.ndarray,
    noise: jnp.ndarray,
    *,
    prediction_type: str = "epsilon",
    clip_sample: bool = False,
    variance_type: str = "fixed_small",
) -> jnp.ndarray:
    """One ancestral DDPM step x_t → x_{t-Δ} (diffusers DDPMScheduler.step)."""
    ab_t = schedule.alpha_bar(t)
    ab_prev = schedule.alpha_bar(prev_t)
    beta_prod_t = 1.0 - ab_t
    beta_prod_prev = 1.0 - ab_prev
    current_alpha = ab_t / ab_prev
    current_beta = 1.0 - current_alpha

    x0, _ = predict_x0(sample, model_output, ab_t, prediction_type)
    if clip_sample:
        x0 = jnp.clip(x0, -1.0, 1.0)

    x0_coeff = (jnp.sqrt(ab_prev) * current_beta) / beta_prod_t
    xt_coeff = (jnp.sqrt(current_alpha) * beta_prod_prev) / beta_prod_t
    mean = x0_coeff * x0 + xt_coeff * sample

    if variance_type == "fixed_small":
        variance = beta_prod_prev / beta_prod_t * current_beta
    elif variance_type == "fixed_large":
        # OpenAI 'fixed_large' (interpolation stage default,
        # reference: interpolation/diffusion/__init__.py:10-47)
        variance = current_beta
    else:
        raise ValueError(f"unknown variance_type: {variance_type}")
    variance = jnp.clip(variance, min=1e-20)

    # noise only for t > 0
    add = jnp.where(t > 0, jnp.sqrt(variance), 0.0)
    return mean + add * noise


def ddim_step(
    schedule: NoiseSchedule,
    sample: jnp.ndarray,
    model_output: jnp.ndarray,
    t: jnp.ndarray,
    prev_t: jnp.ndarray,
    *,
    prediction_type: str = "epsilon",
    eta: float = 0.0,
    noise: jnp.ndarray | None = None,
    clip_sample: bool = False,
    final_alpha_bar: jnp.ndarray | float | None = None,
) -> jnp.ndarray:
    """One deterministic (eta=0) DDIM step (diffusers DDIMScheduler.step,
    eq. 12 of Song et al.).

    final_alpha_bar: ᾱ used when prev_t < 0 (the last step). None → 1.0
    (diffusers set_alpha_to_one=True); pass schedule.alphas_cumprod[0] for
    set_alpha_to_one=False checkpoints (the x4-upscaler's DDIM config)."""
    ab_t = schedule.alpha_bar(t)
    ab_prev = schedule.alpha_bar(prev_t)
    if final_alpha_bar is not None:
        ab_prev = jnp.where(prev_t < 0, final_alpha_bar, ab_prev)

    x0, eps = predict_x0(sample, model_output, ab_t, prediction_type)
    if clip_sample:
        x0 = jnp.clip(x0, -1.0, 1.0)

    if eta > 0.0:
        variance = (1.0 - ab_prev) / (1.0 - ab_t) * (1.0 - ab_t / ab_prev)
        std = eta * jnp.sqrt(variance)
    else:
        std = 0.0

    dir_xt = jnp.sqrt(1.0 - ab_prev - std**2) * eps
    prev = jnp.sqrt(ab_prev) * x0 + dir_xt
    if eta > 0.0:
        assert noise is not None, "eta > 0 requires noise"
        prev = prev + std * noise
    return prev


def euler_scale_model_input(sample: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """EulerDiscreteScheduler.scale_model_input: x / sqrt(sigma^2 + 1)."""
    return sample / jnp.sqrt(sigma**2 + 1.0)


def euler_step(
    sample: jnp.ndarray,
    model_output: jnp.ndarray,
    sigma: jnp.ndarray,
    sigma_next: jnp.ndarray,
    *,
    prediction_type: str = "epsilon",
) -> jnp.ndarray:
    """One Euler step in sigma space (diffusers EulerDiscreteScheduler.step
    with s_churn=0). `sample` here is the *unscaled* latent (x = x0 + sigma·n);
    the model is fed euler_scale_model_input(sample, sigma)."""
    if prediction_type == "epsilon":
        pred_x0 = sample - sigma * model_output
    elif prediction_type == "v_prediction":
        pred_x0 = sample * (1.0 / (sigma**2 + 1.0)) + model_output * (
            -sigma / jnp.sqrt(sigma**2 + 1.0)
        )
    else:
        raise ValueError(f"unknown prediction_type: {prediction_type}")
    derivative = (sample - pred_x0) / sigma
    return sample + derivative * (sigma_next - sigma)


# ---------------------------------------------------------------------------
# guidance
# ---------------------------------------------------------------------------


def classifier_free_guidance(
    noise_pred: jnp.ndarray, guidance_scale: float, axis: int = 0
) -> jnp.ndarray:
    """CFG over a doubled batch [uncond; cond] → single batch
    (reference: base/pipelines/pipeline_videogen.py:666, 678-680)."""
    uncond, cond = jnp.split(noise_pred, 2, axis=axis)
    return uncond + guidance_scale * (cond - uncond)
