"""Gaussian latent diffusion: training loss and fused `lax.scan` samplers.

Rebuild of `grasp_ldm/models/diffusion/gaussian_diffusion.py:10-277` without
the diffusers dependency or its host-side per-step Python loop: the entire
reverse process — S denoiser calls + scheduler updates — is a single
``jax.lax.scan`` inside one jitted program (SURVEY.md §3.4's "TPU insight").

The denoiser is passed in as a pure function
``denoise_fn(x, t, z_cond) -> eps`` so this module composes with any flax
module apply (and with EMA parameter pytrees) without knowing about
parameters.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from .schedules import DiffusionSchedule

__all__ = ["GaussianDiffusion1D"]

DenoiseFn = Callable[[jax.Array, jax.Array, Optional[jax.Array]], jax.Array]


@dataclasses.dataclass(frozen=True)
class GaussianDiffusion1D:
    """1-D latent diffusion process.

    Args:
        schedule: precomputed :class:`DiffusionSchedule`.
        n_dims: latent dimensionality D (x has shape ``[B, 1, D]``).
        loss_type: one of {"l1", "l2", "huber"}.
        variance_type: DDPM reverse variance ("fixed_large" in shipped configs).
    """

    schedule: DiffusionSchedule
    n_dims: int
    loss_type: str = "l2"
    variance_type: str = "fixed_large"

    # ---------------- training ----------------

    def loss(
        self,
        denoise_fn: DenoiseFn,
        x0: jax.Array,
        rng: jax.Array,
        z_cond: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Epsilon-prediction loss at uniform random timesteps.

        Matches `gaussian_diffusion.py:202-230`: per-sample t ~ U[0, T),
        mean reduction over the whole batch.
        """
        b = x0.shape[0]
        k_t, k_n = jax.random.split(rng)
        t = jax.random.randint(
            k_t, (b,), 0, self.schedule.num_train_timesteps, dtype=jnp.int32
        )
        noise = jax.random.normal(k_n, x0.shape, x0.dtype)
        x_t = self.schedule.add_noise(x0, noise, t)
        eps_pred = denoise_fn(x_t, t, z_cond)
        return self._loss_reduce(noise, eps_pred)

    def _loss_reduce(self, target: jax.Array, pred: jax.Array) -> jax.Array:
        if self.loss_type == "l1":
            return jnp.mean(jnp.abs(target - pred))
        if self.loss_type == "l2":
            return jnp.mean((target - pred) ** 2)
        if self.loss_type == "huber":
            d = target - pred
            a = jnp.abs(d)
            return jnp.mean(jnp.where(a < 1.0, 0.5 * d * d, a - 0.5))
        raise ValueError(f"Unknown loss type: {self.loss_type}")

    # ---------------- sampling ----------------

    def sample(
        self,
        denoise_fn: DenoiseFn,
        rng: jax.Array,
        batch_size: int,
        z_cond: Optional[jax.Array] = None,
        num_inference_steps: Optional[int] = None,
        sampler: str = "ddpm",
        return_trajectory: bool = False,
        guidance_fn=None,
        guidance_scale: float = 1.0,
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        """Reverse diffusion, fully fused on device.

        Args:
            denoise_fn: ``(x [B,1,D], t [B], z_cond) -> eps``.
            batch_size: number of latents B (e.g. num_pcs * num_grasps).
            num_inference_steps: S; defaults to the full T.
            sampler: "ddpm" (ancestral) or "ddim" (deterministic, eta=0).
            return_trajectory: also return all intermediate x (S+1 entries,
                time-major), matching the reference's ``return_all``.
            guidance_fn: optional latent-space guidance
                (:mod:`graspldm_tpu.diffusion.guidance`): ``x0_pred ->
                grad log p(y | x0)``. Applied as a score shift each step,
                ``eps <- eps - s * sqrt(1-a_t)/sqrt(a_t) * g`` (the x0
                estimate uses the frozen epsilon — one guidance VJP per
                step, no denoiser backprop).
            guidance_scale: s above.

        Returns:
            (x0 ``[B, 1, D]``, trajectory ``[S+1, B, 1, D]`` or None)
        """
        T = self.schedule.num_train_timesteps
        S = num_inference_steps or T
        ts = self.schedule.timestep_grid(S)  # [S], descending
        stride = T // S
        prev_ts = ts - stride

        k_init, k_loop = jax.random.split(rng)
        x_T = jax.random.normal(k_init, (batch_size, 1, self.n_dims))

        if sampler not in ("ddpm", "ddim"):
            raise ValueError(f"Unknown sampler: {sampler}")

        def step(carry, inp):
            x, key = carry
            t, prev_t = inp
            t_batch = jnp.full((batch_size,), t, dtype=jnp.int32)
            eps = denoise_fn(x, t_batch, z_cond)
            if guidance_fn is not None:
                acp_t = self.schedule.alphas_cumprod[t]
                x0_est = self.schedule.pred_x0_from_eps(x, eps, acp_t)
                g = guidance_fn(x0_est)
                eps = eps - (
                    guidance_scale * jnp.sqrt(1.0 - acp_t) / jnp.sqrt(acp_t)
                ) * g
            if sampler == "ddim":
                x_next = self.schedule.ddim_step(x, eps, t, prev_t)
            else:
                key, k_noise = jax.random.split(key)
                noise = jax.random.normal(k_noise, x.shape, x.dtype)
                x_next = self.schedule.ddpm_step(
                    x, eps, t, prev_t, noise, self.variance_type
                )
            out = x_next if return_trajectory else None
            return (x_next, key), out

        (x0, _), traj = jax.lax.scan(step, (x_T, k_loop), (ts, prev_ts))
        if return_trajectory:
            traj = jnp.concatenate([x_T[None], traj], axis=0)
        return x0, traj
