"""Native noise schedules (no `diffusers` dependency).

Reimplements the scheduler semantics the reference gets from HuggingFace
diffusers (`grasp_ldm/models/diffusion/gaussian_diffusion.py:124-164`):
beta schedules {linear, scaled_linear, squaredcos_cap_v2}, epsilon
prediction, clip_sample, fixed_small/fixed_large variance (DDPM) and
eta=0 deterministic stepping (DDIM).

All schedule math is precomputed into flat arrays at trace time so the
sampling loop is a coefficient-indexed `lax.scan` with zero host math.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

__all__ = ["DiffusionSchedule", "make_beta_schedule"]

BETA_SCHEDULES = ("linear", "scaled_linear", "squaredcos_cap_v2", "cosine")
VARIANCE_TYPES = (
    "fixed_small",
    "fixed_small_log",
    "fixed_large",
    "fixed_large_log",
)


def make_beta_schedule(
    schedule: str, num_steps: int, beta_start: float, beta_end: float
) -> jnp.ndarray:
    """Beta schedule arrays matching diffusers conventions."""
    if schedule == "linear":
        return jnp.linspace(beta_start, beta_end, num_steps, dtype=jnp.float32)
    if schedule == "scaled_linear":
        return (
            jnp.linspace(
                beta_start**0.5, beta_end**0.5, num_steps, dtype=jnp.float32
            )
            ** 2
        )
    if schedule in ("squaredcos_cap_v2", "cosine"):

        def alpha_bar(t):
            return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

        betas = [
            min(1.0 - alpha_bar((i + 1) / num_steps) / alpha_bar(i / num_steps), 0.999)
            for i in range(num_steps)
        ]
        return jnp.asarray(betas, dtype=jnp.float32)
    raise ValueError(f"Unknown beta schedule: {schedule}")


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Precomputed forward-process constants.

    Attributes:
        betas: ``[T]``.
        alphas_cumprod: ``[T]`` cumulative products of (1 - beta).
    """

    num_train_timesteps: int
    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    clip_sample: bool = True
    clip_sample_range: float = 1.0

    @classmethod
    def create(
        cls,
        num_steps: int = 1000,
        beta_schedule: str = "linear",
        beta_start: float = 1e-4,
        beta_end: float = 0.02,
        clip_sample: bool = True,
    ) -> "DiffusionSchedule":
        betas = make_beta_schedule(beta_schedule, num_steps, beta_start, beta_end)
        return cls(
            num_train_timesteps=num_steps,
            betas=betas,
            alphas_cumprod=jnp.cumprod(1.0 - betas),
            clip_sample=clip_sample,
        )

    # ---------- forward process ----------

    def add_noise(
        self, x0: jax.Array, noise: jax.Array, t: jax.Array
    ) -> jax.Array:
        """q(x_t | x_0): ``sqrt(acp_t) x0 + sqrt(1 - acp_t) noise``.

        ``t`` is an integer array broadcastable against the batch axis.
        """
        acp = self.alphas_cumprod[t]
        shape = t.shape + (1,) * (x0.ndim - t.ndim)
        acp = acp.reshape(shape)
        return jnp.sqrt(acp) * x0 + jnp.sqrt(1.0 - acp) * noise

    def _clip(self, x0: jax.Array) -> jax.Array:
        if self.clip_sample:
            return jnp.clip(x0, -self.clip_sample_range, self.clip_sample_range)
        return x0

    def pred_x0_from_eps(
        self, x_t: jax.Array, eps: jax.Array, acp_t: jax.Array
    ) -> jax.Array:
        return (x_t - jnp.sqrt(1.0 - acp_t) * eps) / jnp.sqrt(acp_t)

    # ---------- per-step reverse kernels ----------

    def timestep_grid(self, num_inference_steps: int) -> jnp.ndarray:
        """Descending t values for a strided sampler.

        Matches the reference's loop
        ``reversed(range(0, T, T // S))`` (`gaussian_diffusion.py:258-266`).
        """
        stride = self.num_train_timesteps // num_inference_steps
        ts = jnp.arange(0, self.num_train_timesteps, stride, dtype=jnp.int32)
        return ts[::-1]

    def ddpm_step(
        self,
        x_t: jax.Array,
        eps: jax.Array,
        t: jax.Array,
        prev_t: jax.Array,
        noise: jax.Array,
        variance_type: str = "fixed_large",
    ) -> jax.Array:
        """One ancestral DDPM step (epsilon prediction, clip_sample).

        diffusers-`DDPMScheduler.step` semantics: posterior mean from the
        clipped x0 estimate; fixed_large variance = current beta; no noise
        added at the final step (t == 0 grid entry has prev_t < 0).
        """
        acp_t = self.alphas_cumprod[t]
        acp_prev = jnp.where(prev_t >= 0, self.alphas_cumprod[prev_t], 1.0)
        current_alpha = acp_t / acp_prev
        current_beta = 1.0 - current_alpha

        x0 = self._clip(self.pred_x0_from_eps(x_t, eps, acp_t))

        coeff_x0 = jnp.sqrt(acp_prev) * current_beta / (1.0 - acp_t)
        coeff_xt = jnp.sqrt(current_alpha) * (1.0 - acp_prev) / (1.0 - acp_t)
        mean = coeff_x0 * x0 + coeff_xt * x_t

        if variance_type in ("fixed_small", "fixed_small_log"):
            variance = jnp.maximum(
                (1.0 - acp_prev) / (1.0 - acp_t) * current_beta, 1e-20
            )
        elif variance_type in ("fixed_large", "fixed_large_log"):
            variance = current_beta
        else:
            raise ValueError(f"Unsupported variance type: {variance_type}")

        sigma = jnp.sqrt(jnp.maximum(variance, 0.0))
        add = jnp.where(prev_t >= 0, sigma, 0.0)
        return mean + add * noise

    def ddim_step(
        self,
        x_t: jax.Array,
        eps: jax.Array,
        t: jax.Array,
        prev_t: jax.Array,
    ) -> jax.Array:
        """One deterministic DDIM step (eta = 0, epsilon prediction).

        diffusers-`DDIMScheduler.step` semantics with ``set_alpha_to_one``:
        ``acp_prev = 1`` past the end; epsilon re-derived from the clipped x0.
        """
        acp_t = self.alphas_cumprod[t]
        acp_prev = jnp.where(prev_t >= 0, self.alphas_cumprod[prev_t], 1.0)

        x0 = self._clip(self.pred_x0_from_eps(x_t, eps, acp_t))
        eps_eff = (x_t - jnp.sqrt(acp_t) * x0) / jnp.sqrt(1.0 - acp_t)
        return jnp.sqrt(acp_prev) * x0 + jnp.sqrt(1.0 - acp_prev) * eps_eff
