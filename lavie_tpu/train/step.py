"""Diffusion training step as a pure jittable function.

The reference trains with HF Accelerate: per-step Python, DDP collectives via
NCCL (reference: base/pipelines/fine_tuning.py:464-709). Here the step —
noising, UNet, loss, optimizer update — is one XLA program; data/tensor/
sequence parallelism comes from jit sharding annotations over a Mesh, with
XLA emitting the gradient all-reduces over ICI.

Implements the fork's loss: epsilon- or v-target MSE with optional min-SNR-γ
weighting (reference: base/pipelines/fine_tuning.py:564-592, compute_snr
:183-206).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from lavie_tpu.diffusion import NoiseSchedule, add_noise, get_velocity


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params, optimizer: optax.GradientTransformation) -> "TrainState":
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=optimizer.init(params))


def min_snr_weight(
    schedule: NoiseSchedule, t: jnp.ndarray, gamma: float, prediction_type: str
) -> jnp.ndarray:
    """min-SNR-γ loss weighting (reference: fine_tuning.py:581-592)."""
    ab = schedule.alphas_cumprod[t]
    snr = ab / (1.0 - ab)
    w = jnp.minimum(snr, gamma)
    if prediction_type == "epsilon":
        return w / snr
    return w / (snr + 1.0)  # v-prediction


def diffusion_loss(
    apply_fn: Callable,
    params,
    schedule: NoiseSchedule,
    latents: jnp.ndarray,  # (B, F, h, w, C) clean latents
    text_states: jnp.ndarray,  # (B, L, D)
    rng: jax.Array,
    *,
    prediction_type: str = "epsilon",
    min_snr_gamma: Optional[float] = None,
    noise_offset: float = 0.0,
) -> jnp.ndarray:
    b = latents.shape[0]
    t_key, n_key, off_key = jax.random.split(rng, 3)
    t = jax.random.randint(t_key, (b,), 0, schedule.num_train_timesteps)
    noise = jax.random.normal(n_key, latents.shape, dtype=latents.dtype)
    if noise_offset:
        # per-(sample, frame, channel) DC offset on the training noise —
        # channels-last analog of the fork's (B, C, F, 1, 1) offset
        # (reference: base/pipelines/fine_tuning.py:493-497)
        noise = noise + noise_offset * jax.random.normal(
            off_key, latents.shape[:2] + (1, 1) + latents.shape[-1:],
            dtype=latents.dtype,
        )
    noisy = add_noise(schedule, latents, noise, t)
    target = noise if prediction_type == "epsilon" else get_velocity(schedule, latents, noise, t)
    pred = apply_fn({"params": params}, noisy, t, text_states).astype(jnp.float32)
    per_sample = jnp.mean(
        (pred - target.astype(jnp.float32)) ** 2, axis=tuple(range(1, pred.ndim))
    )
    if min_snr_gamma is not None:
        per_sample = per_sample * min_snr_weight(schedule, t, min_snr_gamma, prediction_type)
    return jnp.mean(per_sample)


def conditioned_diffusion_loss(
    apply_fn: Callable,
    params,
    schedule: NoiseSchedule,
    latents: jnp.ndarray,  # (B, F, h, w, 4) clean video latents
    cond: jnp.ndarray,  # (B, F, h, w, Cc) conditioning channels (copied video / low-res)
    text_states: jnp.ndarray,
    rng: jax.Array,
    *,
    mask: Optional[jnp.ndarray] = None,  # (B, F, h, w, 1); 1 = generate, 0 = known
    t: Optional[jnp.ndarray] = None,
    loss_weights: Optional[jnp.ndarray] = None,  # importance weights (timestep_sampler)
    noise_aug_schedule: Optional[NoiseSchedule] = None,
    max_aug_level: int = 200,
    prediction_type: str = "epsilon",
    model_kwargs: Optional[Dict[str, Any]] = None,
    noise: Optional[jnp.ndarray] = None,         # parity tests: fixed gaussians
    aug_level: Optional[jnp.ndarray] = None,     # (t_head in the reference)
    aug_noise: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Interpolation/VSR-style training loss with channel-concat conditioning.

    Mirrors the vendored OpenAI `training_losses`
    (reference: interpolation/diffusion/gaussian_diffusion.py:813-914):
    conditioning channels stay UN-noised in the model input (:831), optional
    known-frame mask blending (:835-836), optional noise augmentation of the
    conditioning at a random small t_head (:839-847), and the MSE is taken on
    the first 4 (latent) channels only (:905).

    Returns (scalar loss, aux) where aux carries per-sample (t, loss) for
    loss-aware timestep resampling (train/timestep_sampler.py).
    """
    b = latents.shape[0]
    t_key, n_key, aug_key = jax.random.split(rng, 3)
    if t is None:
        t = jax.random.randint(t_key, (b,), 0, schedule.num_train_timesteps)
    if noise is None:
        noise = jax.random.normal(n_key, latents.shape, dtype=latents.dtype)
    x_t = add_noise(schedule, latents, noise, t)
    if mask is not None:
        # model may see the known frames clean (reference :835-836)
        x_t = x_t * mask + latents * (1.0 - mask)
    if noise_aug_schedule is not None:
        from lavie_tpu.diffusion.noise_aug import augment_conditioning

        cond, _ = augment_conditioning(
            noise_aug_schedule, cond, aug_key, noise_level=aug_level,
            max_noise_level=max_aug_level, noise=aug_noise,
        )
        if mask is not None:
            # the augmented conditioning survives only on KNOWN slots — the
            # reference keeps it where the mask channel is 0 and zeroes it on
            # generate slots (gaussian_diffusion.py:845-846
            # `noise_aug * (x_start[:, 4] == 0)`; mask 1 = generate there
            # too, via the :836 blend). Round-2 parity fix: this previously
            # multiplied by `mask`, the exact inverse.
            cond = cond * (1.0 - mask)
    parts = [x_t] if mask is None else [x_t, mask.astype(x_t.dtype)]
    model_in = jnp.concatenate(parts + [cond.astype(x_t.dtype)], axis=-1)
    target = noise if prediction_type == "epsilon" else get_velocity(schedule, latents, noise, t)
    pred = apply_fn(
        {"params": params}, model_in, t, text_states, **(model_kwargs or {})
    ).astype(jnp.float32)
    per_sample = jnp.mean(
        (pred - target.astype(jnp.float32)) ** 2, axis=tuple(range(1, pred.ndim))
    )
    if loss_weights is not None:
        per_sample = per_sample * loss_weights
    return jnp.mean(per_sample), {"t": t, "per_sample_loss": per_sample}


def make_train_step(
    apply_fn: Callable,
    schedule: NoiseSchedule,
    optimizer: optax.GradientTransformation,
    *,
    prediction_type: str = "epsilon",
    min_snr_gamma: Optional[float] = None,
) -> Callable[[TrainState, Dict[str, jnp.ndarray], jax.Array], Tuple[TrainState, jnp.ndarray]]:
    """Returns step(state, batch, rng) → (state, loss). jit/shard outside."""

    def step(state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array):
        loss, grads = jax.value_and_grad(
            lambda p: diffusion_loss(
                apply_fn, p, schedule, batch["latents"], batch["text_states"], rng,
                prediction_type=prediction_type, min_snr_gamma=min_snr_gamma,
            )
        )(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=params, opt_state=opt_state), loss

    return step
