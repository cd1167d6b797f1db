"""Unit tests for noise schedules and steppers against closed-form math.

The reference has no tests; these validate our tables/steppers against the
published diffusers/DDPM equations directly.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lavie_tpu.diffusion import (
    NoiseSchedule,
    add_noise,
    classifier_free_guidance,
    ddim_step,
    ddim_timesteps,
    ddpm_step,
    ddpm_timesteps,
    euler_sigmas,
    euler_step,
    get_velocity,
    make_beta_schedule,
)
from lavie_tpu.diffusion.samplers import (
    euler_scale_model_input,
    predict_x0,
    prev_timesteps,
    vsr_ddim_timesteps,
)


def make_schedule():
    return NoiseSchedule.create("linear", 1000, 1e-4, 0.02)


class TestSchedule:
    def test_linear_betas_endpoints(self):
        betas = make_beta_schedule("linear", 1000, 1e-4, 0.02)
        assert betas[0] == pytest.approx(1e-4)
        assert betas[-1] == pytest.approx(0.02)
        assert len(betas) == 1000
        assert np.all(np.diff(betas) > 0)

    def test_scaled_linear(self):
        betas = make_beta_schedule("scaled_linear", 1000, 0.00085, 0.012)
        assert betas[0] == pytest.approx(0.00085)
        assert betas[-1] == pytest.approx(0.012)

    def test_alphas_cumprod_matches_numpy(self):
        s = make_schedule()
        betas = np.linspace(1e-4, 0.02, 1000)
        expected = np.cumprod(1 - betas)
        np.testing.assert_allclose(np.asarray(s.alphas_cumprod), expected, rtol=1e-6)

    def test_alpha_bar_negative_t_is_one(self):
        s = make_schedule()
        assert float(s.alpha_bar(jnp.array(-19))) == 1.0
        assert float(s.alpha_bar(jnp.array(0))) == pytest.approx(1 - 1e-4)


class TestTimesteps:
    def test_ddpm_spacing(self):
        ts = ddpm_timesteps(50)
        assert ts[0] == 980 and ts[-1] == 0 and len(ts) == 50
        assert np.all(np.diff(ts) == -20)

    def test_ddim_spacing_sd_offset(self):
        ts = ddim_timesteps(50, steps_offset=1)
        assert ts[0] == 981 and ts[-1] == 1 and len(ts) == 50

    def test_vsr_linspace_spacing(self):
        ts = vsr_ddim_timesteps(50)
        # linspace(1, 1000, 50).round() - 1 : ends pinned
        assert ts[0] == 999 and ts[-1] == 0 and len(ts) == 50

    def test_prev_timesteps(self):
        ts = ddim_timesteps(50)
        prev = prev_timesteps(ts)
        assert prev[0] == 961 and prev[-1] == -19


class TestConversions:
    def test_predict_x0_epsilon_roundtrip(self):
        s = make_schedule()
        rng = np.random.RandomState(0)
        x0 = jnp.asarray(rng.randn(2, 3), dtype=jnp.float32)
        noise = jnp.asarray(rng.randn(2, 3), dtype=jnp.float32)
        t = jnp.array([500, 500])
        xt = add_noise(s, x0, noise, t)
        x0_rec, eps_rec = predict_x0(xt, noise, s.alpha_bar(t[0]), "epsilon")
        np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-5)
        np.testing.assert_allclose(np.asarray(eps_rec), np.asarray(noise), atol=1e-5)

    def test_predict_x0_vpred_roundtrip(self):
        s = make_schedule()
        rng = np.random.RandomState(1)
        x0 = jnp.asarray(rng.randn(2, 3), dtype=jnp.float32)
        noise = jnp.asarray(rng.randn(2, 3), dtype=jnp.float32)
        t = jnp.array([300, 300])
        xt = add_noise(s, x0, noise, t)
        v = get_velocity(s, x0, noise, t)
        x0_rec, eps_rec = predict_x0(xt, v, s.alpha_bar(t[0]), "v_prediction")
        np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-5)
        np.testing.assert_allclose(np.asarray(eps_rec), np.asarray(noise), atol=1e-5)


class TestDDIM:
    def test_perfect_model_recovers_x0_at_last_step(self):
        """With the exact epsilon as model output, a single DDIM step from t
        with prev_t < 0 must land exactly on x0."""
        s = make_schedule()
        rng = np.random.RandomState(2)
        x0 = jnp.asarray(rng.randn(4, 8), dtype=jnp.float32)
        noise = jnp.asarray(rng.randn(4, 8), dtype=jnp.float32)
        t = jnp.array(21)
        xt = add_noise(s, x0, noise, jnp.full((4,), 21))
        prev = ddim_step(s, xt, noise, t, jnp.array(-19))
        np.testing.assert_allclose(np.asarray(prev), np.asarray(x0), atol=1e-5)

    def test_full_ddim_chain_with_oracle_epsilon(self):
        """Running the whole 50-step DDIM chain with an oracle epsilon model
        must recover x0 to fp32 accuracy (pure algebra check)."""
        s = make_schedule()
        rng = np.random.RandomState(3)
        x0 = rng.randn(2, 5).astype(np.float32)
        eps = rng.randn(2, 5).astype(np.float32)
        ts = ddim_timesteps(50)
        prev = prev_timesteps(ts)
        # start at x_T for the highest timestep in the chain
        x = add_noise(s, jnp.asarray(x0), jnp.asarray(eps), jnp.full((2,), int(ts[0])))
        for t, pt in zip(ts, prev):
            # oracle: the true epsilon mapping x_t to x0 at this t
            ab = float(s.alpha_bar(jnp.array(int(t))))
            oracle_eps = (np.asarray(x) - np.sqrt(ab) * x0) / np.sqrt(1 - ab)
            x = ddim_step(s, x, jnp.asarray(oracle_eps), jnp.array(int(t)), jnp.array(int(pt)))
        np.testing.assert_allclose(np.asarray(x), x0, atol=1e-4)


class TestDDPM:
    def test_posterior_mean_coefficients(self):
        """DDPM step with zero variance noise equals the posterior mean
        q(x_{t-1} | x_t, x0) — check against the closed form."""
        s = make_schedule()
        rng = np.random.RandomState(4)
        xt = rng.randn(2, 3).astype(np.float32)
        eps = rng.randn(2, 3).astype(np.float32)
        t, pt = 980, 960
        out = ddpm_step(
            s, jnp.asarray(xt), jnp.asarray(eps), jnp.array(t), jnp.array(pt),
            noise=jnp.zeros((2, 3)),
        )
        ab_t = float(s.alpha_bar(jnp.array(t)))
        ab_prev = float(s.alpha_bar(jnp.array(pt)))
        cur_beta = 1 - ab_t / ab_prev
        x0 = (xt - np.sqrt(1 - ab_t) * eps) / np.sqrt(ab_t)
        expected = (
            np.sqrt(ab_prev) * cur_beta / (1 - ab_t) * x0
            + np.sqrt(ab_t / ab_prev) * (1 - ab_prev) / (1 - ab_t) * xt
        )
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-5)

    def test_no_noise_at_t0(self):
        s = make_schedule()
        xt = jnp.ones((1, 2))
        eps = jnp.zeros((1, 2))
        big_noise = jnp.full((1, 2), 1e6)
        out = ddpm_step(s, xt, eps, jnp.array(0), jnp.array(-20), noise=big_noise)
        assert np.all(np.isfinite(np.asarray(out)))
        assert np.abs(np.asarray(out)).max() < 1e3


class TestEuler:
    def test_sigmas_monotone_terminal_zero(self):
        s = make_schedule()
        ts, sigmas, init_sigma = euler_sigmas(np.asarray(s.alphas_cumprod), 50)
        assert sigmas[-1] == 0.0
        assert np.all(np.diff(sigmas) < 0)
        assert init_sigma == pytest.approx(float(sigmas[0]))
        assert len(ts) == 50 and len(sigmas) == 51

    def test_oracle_euler_chain(self):
        """x = x0 + sigma*n with oracle epsilon=n: Euler steps are exact for
        this linear ODE and must recover x0."""
        s = make_schedule()
        _, sigmas, _ = euler_sigmas(np.asarray(s.alphas_cumprod), 50)
        rng = np.random.RandomState(5)
        x0 = rng.randn(2, 3).astype(np.float32)
        n = rng.randn(2, 3).astype(np.float32)
        x = jnp.asarray(x0 + sigmas[0] * n)
        for i in range(50):
            x = euler_step(x, jnp.asarray(n), jnp.array(sigmas[i]), jnp.array(sigmas[i + 1]))
        np.testing.assert_allclose(np.asarray(x), x0, atol=1e-4)

    def test_scale_model_input(self):
        x = jnp.ones((2, 2))
        out = euler_scale_model_input(x, jnp.array(3.0))
        np.testing.assert_allclose(np.asarray(out), 1 / np.sqrt(10), rtol=1e-6)


class TestCFG:
    def test_guidance_formula(self):
        uncond = jnp.zeros((1, 4))
        cond = jnp.ones((1, 4))
        pred = jnp.concatenate([uncond, cond], axis=0)
        out = classifier_free_guidance(pred, 7.5)
        np.testing.assert_allclose(np.asarray(out), 7.5)
        assert out.shape == (1, 4)


class TestFinalAlphaBar:
    def test_set_alpha_to_one_false_semantics(self):
        """The x4-upscaler DDIM config sets set_alpha_to_one=False: the last
        step's previous alpha-bar is alphas_cumprod[0], not 1.0
        (reference: vsr/diffusion/scheduling_ddim.py:173-175; the shipped
        entry points load exactly that config, vsr/sample.py:49-53)."""
        s = make_schedule()
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(1, 4, 4, 2), jnp.float32)
        v = jnp.asarray(rng.randn(1, 4, 4, 2), jnp.float32)
        t = jnp.asarray(1)
        pt = jnp.asarray(-19)
        ab0 = float(s.alphas_cumprod[0])

        default = ddim_step(s, x, v, t, pt, prediction_type="v_prediction")
        fixed = ddim_step(s, x, v, t, pt, prediction_type="v_prediction",
                          final_alpha_bar=s.alphas_cumprod[0])
        # closed form with ab_prev = ab0 instead of 1
        ab_t = float(s.alphas_cumprod[1])
        x0 = np.sqrt(ab_t) * np.asarray(x) - np.sqrt(1 - ab_t) * np.asarray(v)
        eps = np.sqrt(ab_t) * np.asarray(v) + np.sqrt(1 - ab_t) * np.asarray(x)
        want = np.sqrt(ab0) * x0 + np.sqrt(1 - ab0) * eps
        np.testing.assert_allclose(np.asarray(fixed), want, atol=1e-5)
        # and it must differ from the set_alpha_to_one=True default
        assert np.abs(np.asarray(fixed) - np.asarray(default)).max() > 1e-4
        # non-terminal steps are unaffected by the option
        same = ddim_step(s, x, v, jnp.asarray(501), jnp.asarray(481),
                         prediction_type="v_prediction",
                         final_alpha_bar=s.alphas_cumprod[0])
        base = ddim_step(s, x, v, jnp.asarray(501), jnp.asarray(481),
                         prediction_type="v_prediction")
        np.testing.assert_array_equal(np.asarray(same), np.asarray(base))
