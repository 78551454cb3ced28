"""Guided sampling in the grasp latent space.

Implements the BASELINE "task-conditioned retrain + guided sampling in
latent space" capability (BASELINE.json configs[4]), which the reference
never shipped (its conditioning is purely additive-embedding at train time,
`grasp_ldm/models/modules/class_conditioned_resnet.py:73-100`). Two
mechanisms, both running entirely inside the jitted sampler scan:

* **Success guidance** (classifier guidance in latent space): the VAE
  decoder's success head ``p(success | z_h, z_pc)`` is a differentiable
  classifier over the DIFFUSION STATE'S latent space, so its log-likelihood
  gradient can steer the reverse process toward high-confidence grasps.
  At each step the sampler forms the x0 estimate, evaluates
  ``g = grad_{x0} sum log sigmoid(cls_logit(decode(x0, z_pc)))`` (one
  decoder VJP — the denoiser is NOT differentiated through; the chain rule
  factor from ``x0 = (x_t - sqrt(1-a) eps)/sqrt(a)`` with the epsilon
  estimate frozen is ``1/sqrt(a)``), and shifts the score:

    - epsilon models:  ``eps <- eps - s * sqrt(1-a)/sqrt(a) * g``
    - EDM (x0 models): ``D   <- D + s * sigma^2 * g``

* **Classifier-free guidance** (CFG) for the class-/region-conditioned
  denoisers: train with conditioning dropout (``cond_mask`` zeroes the
  conditioning embedding for a random sample subset, see
  ``make_ddm_train_step(cond_dropout=...)``), then sample with
  ``eps = eps_u + w (eps_c - eps_u)`` from one doubled-batch denoiser call
  (`graspldm_tpu.inference.pipeline.ldm_generate(cfg_scale=...)`).

Both compose: CFG sharpens the conditional distribution, success guidance
tilts it toward the decoder's success mode.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp

__all__ = ["GuidanceFn", "make_success_guidance"]

# x0 estimate [B, 1, D] -> grad of the guidance log-likelihood, same shape
GuidanceFn = Callable[[jax.Array], jax.Array]


def make_success_guidance(
    vae,
    vae_variables: Dict[str, Any],
    z_pc_rep: jax.Array,
) -> GuidanceFn:
    """Gradient of the decoder success head w.r.t. the grasp latent.

    Args:
        vae: a :class:`~graspldm_tpu.models.grasp_vae.GraspCVAE`.
        vae_variables: its variables (use the EMA set for inference).
        z_pc_rep: ``[B*G, Ce, D_pc]`` conditioning latents, already repeated
            per grasp — the same tensor the sampler conditions on.

    Returns:
        ``fn(x0 [B*G, 1, D]) -> grad [B*G, 1, D]`` of
        ``sum_i log sigmoid(cls_logit_i)``; rows are independent, so the
        sum's gradient is the per-sample gradient.

    The gradient always flows through the FLAX decoder apply (the Pallas
    fast-path kernels define no VJP); the guided sampler still decodes its
    final latents through whatever ``decoder_impl`` the pipeline resolved.
    """

    def log_success(z_h: jax.Array) -> jax.Array:
        out = vae.apply(vae_variables, z_h, z_pc_rep, method="decode")
        logits = out[1]
        return jnp.sum(jax.nn.log_sigmoid(logits.astype(jnp.float32)))

    grad_fn = jax.grad(log_success)

    def fn(x0: jax.Array) -> jax.Array:
        return grad_fn(x0[:, 0, :].astype(z_pc_rep.dtype)).astype(x0.dtype)[
            :, None, :
        ]

    return fn
