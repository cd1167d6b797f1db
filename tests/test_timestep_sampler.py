"""Timestep importance samplers + conditioned training losses
(reference: interpolation/diffusion/timestep_sampler.py,
gaussian_diffusion.py:813-914, vsr/models/upscaling.py:81-95)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lavie_tpu.diffusion import NoiseSchedule
from lavie_tpu.diffusion.noise_aug import augment_conditioning, low_scale_schedule
from lavie_tpu.train import (
    LossSecondMomentResampler,
    UniformSampler,
    conditioned_diffusion_loss,
    create_named_schedule_sampler,
)


def test_uniform_sampler_unbiased():
    s = UniformSampler(1000)
    rng = np.random.default_rng(0)
    t, w = s.sample(4096, rng)
    assert t.shape == (4096,) and w.shape == (4096,)
    assert t.min() >= 0 and t.max() < 1000
    # uniform sampler: all weights exactly 1
    np.testing.assert_allclose(w, 1.0)


def test_loss_second_moment_warmup_and_reweighting():
    s = LossSecondMomentResampler(10, history_per_term=2, uniform_prob=0.01)
    # before warmup: uniform
    np.testing.assert_allclose(s.weights(), 1.0)
    # feed a history where timestep 3 has much larger losses
    for _ in range(2):
        s.update_with_all_losses(np.arange(10), np.where(np.arange(10) == 3, 10.0, 0.1))
    w = s.weights()
    assert w[3] == w.max()
    assert w.min() > 0  # uniform floor keeps all positive
    # importance weights stay unbiased: E[1/(N p)] over p = 1
    rng = np.random.default_rng(1)
    t, iw = s.sample(200_000, rng)
    assert abs(iw.mean() - 1.0) < 0.02
    assert (t == 3).mean() > 0.3  # hard timestep drawn much more often


def test_create_named():
    assert isinstance(create_named_schedule_sampler("uniform", 50), UniformSampler)
    assert isinstance(
        create_named_schedule_sampler("loss-second-moment", 50), LossSecondMomentResampler
    )
    with pytest.raises(NotImplementedError):
        create_named_schedule_sampler("nope", 50)


def test_augment_conditioning_levels_and_strength():
    sched = low_scale_schedule()
    x = jnp.ones((2, 4, 4, 3))
    z0, lvl0 = augment_conditioning(sched, x, jax.random.PRNGKey(0), noise_level=jnp.array([0, 0]))
    # t=0: almost no noise
    assert float(jnp.abs(z0 - x).mean()) < 0.05
    z, lvl = augment_conditioning(sched, x, jax.random.PRNGKey(0), max_noise_level=350)
    assert lvl.shape == (2,) and int(lvl.max()) < 350
    zt, _ = augment_conditioning(sched, x, jax.random.PRNGKey(1), noise_level=jnp.array([999, 999]))
    # t=999: mostly noise, mean ~ 0
    assert float(jnp.abs(zt.mean())) < 0.3


def _toy_apply(variables, x, t, text_states):
    # "model" = returns the first 4 channels scaled by a param
    return variables["params"]["w"] * x[..., :4]


def test_conditioned_loss_shapes_and_mask():
    sched = NoiseSchedule.create("linear", 1000, 1e-4, 0.02)
    lat = jnp.ones((2, 4, 8, 8, 4)) * 0.3
    cond = jnp.ones((2, 4, 8, 8, 4)) * 0.7
    text = jnp.zeros((2, 7, 16))
    params = {"w": jnp.ones(())}
    loss, aux = conditioned_diffusion_loss(
        _toy_apply, params, sched, lat, cond, text, jax.random.PRNGKey(0)
    )
    assert loss.shape == () and float(loss) > 0
    assert aux["t"].shape == (2,) and aux["per_sample_loss"].shape == (2,)

    # mask path adds a channel: model sees 4 + 1 + 4
    seen = {}

    def spy_apply(variables, x, t, text_states):
        seen["c"] = x.shape[-1]
        return x[..., :4]

    mask = jnp.ones((2, 4, 8, 8, 1))
    conditioned_diffusion_loss(
        spy_apply, params, sched, lat, cond, text, jax.random.PRNGKey(0), mask=mask
    )
    assert seen["c"] == 9

    # importance weights scale the loss
    w2 = jnp.array([2.0, 2.0])
    l1, _ = conditioned_diffusion_loss(
        _toy_apply, params, sched, lat, cond, text, jax.random.PRNGKey(0)
    )
    l2, _ = conditioned_diffusion_loss(
        _toy_apply, params, sched, lat, cond, text, jax.random.PRNGKey(0), loss_weights=w2
    )
    np.testing.assert_allclose(float(l2), 2 * float(l1), rtol=1e-5)


def test_conditioned_loss_mask_keeps_known_frames_clean():
    sched = NoiseSchedule.create("linear", 1000, 1e-4, 0.02)
    lat = jnp.ones((1, 4, 4, 4, 4)) * 0.5
    cond = jnp.zeros((1, 4, 4, 4, 4))
    text = jnp.zeros((1, 7, 16))
    # mask=0 everywhere → model input latent channels must equal clean latents
    mask = jnp.zeros((1, 4, 4, 4, 1))
    captured = {}

    def spy_apply(variables, x, t, text_states):
        captured["x"] = x
        return x[..., :4]

    conditioned_diffusion_loss(
        spy_apply, {"w": jnp.ones(())}, sched, lat, cond, text,
        jax.random.PRNGKey(3), mask=mask, t=jnp.array([800]),
    )
    np.testing.assert_allclose(np.asarray(captured["x"][..., :4]), np.asarray(lat), atol=1e-6)


def test_conditioned_loss_noise_aug_on_cond():
    sched = NoiseSchedule.create("linear", 1000, 1e-4, 0.02)
    aug = low_scale_schedule()
    lat = jnp.ones((1, 4, 4, 4, 4)) * 0.5
    cond = jnp.ones((1, 4, 4, 4, 4))
    text = jnp.zeros((1, 7, 16))
    captured = {}

    def spy_apply(variables, x, t, text_states):
        captured["cond"] = x[..., 4:]
        return x[..., :4]

    conditioned_diffusion_loss(
        spy_apply, {"w": jnp.ones(())}, sched, lat, cond, text,
        jax.random.PRNGKey(4), noise_aug_schedule=aug, max_aug_level=999,
    )
    # conditioning must have been perturbed
    assert float(jnp.abs(captured["cond"] - cond).mean()) > 1e-3
