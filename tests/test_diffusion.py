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


class _EulerOracle016:
    """Hand-ported numpy twin of diffusers 0.16 `EulerDiscreteScheduler`
    (set_timesteps interp + step with s_churn=0 + scale_model_input), the
    scheduler the base CLI selects for `sample_method: eulerdiscrete`
    (reference: base/pipelines/sample.py:54-59). Ported from the published
    diffusers 0.16.1 source semantics so the JAX implementation has a
    CROSS-framework check, not just self-consistency:

      __init__:  betas float32 linspace → alphas_cumprod (float32 cumprod);
                 sigmas = ((1-acp)/acp)**0.5 reversed + [0]; init_noise_sigma
                 = sigmas.max()
      set_timesteps: timesteps = linspace(0, T-1, n, float)[::-1];
                 sigmas = np.interp(timesteps, arange(T), full_sigmas) + [0],
                 cast float32
      scale_model_input: sample / ((sigma**2 + 1) ** 0.5)
      step (s_churn=0 → gamma=0, sigma_hat=sigma):
                 epsilon:  x0 = sample - sigma * model_output
                 v_pred:   x0 = model_output * (-sigma / (sigma**2+1)**0.5)
                              + sample / (sigma**2 + 1)
                 derivative = (sample - x0) / sigma
                 prev = sample + derivative * (sigmas[i+1] - sigma)
    """

    def __init__(self, num_train_timesteps=1000, beta_start=1e-4,
                 beta_end=0.02, prediction_type="epsilon"):
        self.num_train_timesteps = num_train_timesteps
        self.prediction_type = prediction_type
        betas = np.linspace(beta_start, beta_end, num_train_timesteps,
                            dtype=np.float32)
        self.alphas_cumprod = np.cumprod(1.0 - betas, dtype=np.float32)
        sigmas = np.array(((1 - self.alphas_cumprod) / self.alphas_cumprod) ** 0.5)
        sigmas = np.concatenate([sigmas[::-1], [0.0]]).astype(np.float32)
        self.sigmas = sigmas
        self.init_noise_sigma = self.sigmas.max()
        self.timesteps = np.linspace(
            0, num_train_timesteps - 1, num_train_timesteps, dtype=float
        )[::-1].copy()

    def set_timesteps(self, num_inference_steps):
        timesteps = np.linspace(
            0, self.num_train_timesteps - 1, num_inference_steps, dtype=float
        )[::-1].copy()
        sigmas = np.array(((1 - self.alphas_cumprod) / self.alphas_cumprod) ** 0.5)
        sigmas = np.interp(timesteps, np.arange(0, len(sigmas)), sigmas)
        sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float32)
        self.sigmas = sigmas
        self.timesteps = timesteps

    def _step_index(self, timestep):
        return int(np.nonzero(self.timesteps == timestep)[0][0])

    def scale_model_input(self, sample, timestep):
        sigma = self.sigmas[self._step_index(timestep)]
        return sample / ((sigma**2 + 1) ** 0.5)

    def step(self, model_output, timestep, sample):
        i = self._step_index(timestep)
        sigma = self.sigmas[i]
        # s_churn=0 → gamma=0, sigma_hat == sigma, no churn noise
        if self.prediction_type == "epsilon":
            pred_original = sample - sigma * model_output
        elif self.prediction_type == "v_prediction":
            pred_original = model_output * (-sigma / (sigma**2 + 1) ** 0.5) + (
                sample / (sigma**2 + 1)
            )
        else:
            raise ValueError(self.prediction_type)
        derivative = (sample - pred_original) / sigma
        dt = self.sigmas[i + 1] - sigma
        return sample + derivative * dt


class TestEulerDiffusersTwin:
    """Cross-framework check of euler_sigmas/euler_step/scale_model_input
    against the numpy diffusers-0.16 oracle (closes the self-consistency-only
    gap: reference scheduler choice base/pipelines/sample.py:54-59)."""

    def test_sigmas_timesteps_init_noise_sigma(self):
        s = make_schedule()
        oracle = _EulerOracle016()
        oracle.set_timesteps(50)
        ts, sigmas, init_sigma = euler_sigmas(np.asarray(s.alphas_cumprod), 50)
        np.testing.assert_allclose(ts, oracle.timesteps.astype(np.float32),
                                   rtol=0, atol=0)
        # rtol absorbs fp32-vs-fp64 alphas_cumprod accumulation (diffusers
        # cumprods in float32; NoiseSchedule in float64) — semantics identical
        np.testing.assert_allclose(sigmas, oracle.sigmas, rtol=5e-5, atol=1e-6)
        assert init_sigma == pytest.approx(float(oracle.init_noise_sigma),
                                           rel=1e-6)

    @pytest.mark.parametrize("prediction_type", ["epsilon", "v_prediction"])
    def test_full_trajectory_vs_oracle(self, prediction_type):
        """Drive BOTH implementations through a 25-step denoise with the same
        deterministic fake model (a function of the SCALED input, exactly what
        the UNet sees — exercising the pipelines' init_noise_sigma scaling +
        scale_model_input + euler_step composition, pipelines/t2v.py)."""
        s = make_schedule()
        steps = 25
        oracle = _EulerOracle016(prediction_type=prediction_type)
        oracle.set_timesteps(steps)
        ts, sigmas, init_sigma = euler_sigmas(np.asarray(s.alphas_cumprod), steps)

        rng = np.random.RandomState(11)
        noise = rng.randn(2, 3, 4).astype(np.float32)
        w = rng.randn(4, 4).astype(np.float32) * 0.3

        def model(x_scaled, t):
            # nonlinear in the scaled input and t so any scaling mistake shows
            return np.tanh(x_scaled @ w) + np.float32(t) * 1e-4

        # oracle trajectory
        xo = noise * oracle.init_noise_sigma
        for t in oracle.timesteps:
            out = model(oracle.scale_model_input(xo, t), t)
            xo = oracle.step(out, t, xo)

        # JAX trajectory, composed the way pipelines/t2v.py composes it
        xj = jnp.asarray(noise) * init_sigma
        for i in range(steps):
            scaled = euler_scale_model_input(xj, jnp.asarray(sigmas[i]))
            out = jnp.asarray(model(np.asarray(scaled), ts[i]))
            xj = euler_step(xj, out, jnp.asarray(sigmas[i]),
                            jnp.asarray(sigmas[i + 1]),
                            prediction_type=prediction_type)

        np.testing.assert_allclose(np.asarray(xj), xo, rtol=2e-4, atol=2e-4)


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
