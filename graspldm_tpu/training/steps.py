"""Jitted train steps for the two training stages (VAE, then latent DDM).

Rebuild of the reference trainers' per-step logic
(`grasp_ldm/trainers/grasp_generation_trainer.py:82-110,204-328`,
`grasp_ldm/models/grasp_vae.py:119-216`, `grasp_ldm/models/grasp_ldm.py:135-187`)
as pure functions: one jitted step = forward + losses + grad + optimizer +
EMA + metrics. Under a `jax.sharding.Mesh` the same step is data-parallel:
batches are sharded on the leading axis, gradients are all-reduced by XLA
inside `jit` (this replaces Lightning DDP + `sync_dist=True`,
SURVEY.md §2.3).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import LOSSES, build_from_cfg
from ..diffusion import GaussianDiffusion1D
from ..losses import (
    ClassificationLoss,
    GraspReconstructionLoss,
    QualityLoss,
    VAELatentLoss,
)
from .ema import EMAConfig, ema_update
from .state import TrainState

__all__ = ["VAELossConfig", "make_vae_train_step", "make_ddm_train_step",
           "make_chunked_step", "init_train_state"]


def make_chunked_step(step_fn: Callable, unroll: int = 1) -> Callable:
    """Run K train steps in ONE device dispatch via ``lax.scan``.

    Takes the same signature as the wrapped step but with every batch
    array carrying a leading K axis (``stack_batches``); returns the
    state after K steps and the per-metric MEAN over the chunk. Exact:
    both step functions fold the RNG with ``state.step``, so scanned
    steps draw the same randomness the host loop would. One dispatch +
    one stacked transfer per K steps amortizes per-call host overhead
    (transfers, dispatch, and the per-call sync cost of a remote-chip
    tunnel), making the loop rate track the device step rate.

    ``unroll`` > 1 unrolls that many scan iterations into one XLA
    computation: measured +19% train throughput at unroll=8 on v5e (XLA
    fuses/pipelines across step boundaries) for ~3.4x the compile time
    — opt in via the trainer's ``dispatch_unroll`` when training runs
    long enough to amortize the compile.
    """

    def chunk_fn(state, batches, rng, *extra):
        def body(st, batch):
            st, metrics = step_fn(st, batch, rng, *extra)
            return st, metrics

        state, metrics = jax.lax.scan(body, state, batches, unroll=unroll)
        return state, jax.tree.map(lambda m: jnp.mean(m, axis=0), metrics)

    return chunk_fn


@dataclasses.dataclass(frozen=True)
class VAELossConfig:
    """Loss weights mirroring `configs/generation/fpc/...:78-98`.

    ``loss_cfgs`` optionally carries the config file's ``model.vae.losses``
    registry blocks (``{reconstruction_loss: {type, args}, latent_loss: ...,
    classification_loss: ..., quality_loss: ...}``, the reference's
    `losses/builder.py:3-16` convention); when present they override the
    scalar fields here — this is how a config selects e.g.
    ``GraspControlPointsReconstructionLoss``.
    """

    translation_weight: float = 1.0
    rotation_weight: float = 1.0
    kl: VAELatentLoss = VAELatentLoss(
        cyclical_annealing=True,
        num_steps=180_000,
        num_cycles=1,
        ratio=0.5,
        start=1e-7,
        stop=0.1,
    )
    classification_weight: Optional[float] = 0.1
    quality_weight: Optional[float] = None
    loss_cfgs: Optional[dict] = None

    def build_losses(self):
        """Resolve (recon, kl, cls, quality) loss callables."""
        recon = GraspReconstructionLoss(
            translation_weight=self.translation_weight,
            rotation_weight=self.rotation_weight,
        )
        kl = self.kl
        cls_loss = (
            ClassificationLoss(weight=self.classification_weight)
            if self.classification_weight is not None
            else None
        )
        qual_loss = (
            QualityLoss(weight=self.quality_weight)
            if self.quality_weight is not None
            else None
        )
        lc = self.loss_cfgs or {}
        if "reconstruction_loss" in lc:
            recon = build_from_cfg(lc["reconstruction_loss"], LOSSES)
        if "latent_loss" in lc:
            kl = build_from_cfg(lc["latent_loss"], LOSSES)
        if "classification_loss" in lc:
            cls_loss = build_from_cfg(lc["classification_loss"], LOSSES)
        elif lc:
            cls_loss = None  # explicit loss block omits classification
        if "quality_loss" in lc:
            qual_loss = build_from_cfg(lc["quality_loss"], LOSSES)
        elif lc:
            qual_loss = None
        return recon, kl, cls_loss, qual_loss


def init_train_state(
    module,
    tx: optax.GradientTransformation,
    rng: jax.Array,
    example_args: tuple,
    example_kwargs: Optional[dict] = None,
    with_ema: bool = True,
) -> TrainState:
    """Initialize module variables and optimizer state."""
    variables = module.init(
        {"params": rng, "dropout": rng}, *example_args, **(example_kwargs or {})
    )
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema_params=jax.tree.map(jnp.copy, params) if with_ema else None,
        batch_stats=variables.get("batch_stats"),
        constants=variables.get("constants"),
    )


def make_vae_train_step(
    vae,
    tx: optax.GradientTransformation,
    loss_cfg: VAELossConfig = VAELossConfig(),
    ema_cfg: Optional[EMAConfig] = EMAConfig(),
) -> Callable[[TrainState, Dict[str, jax.Array], jax.Array], Tuple[TrainState, Dict]]:
    """Stage-1 step: grasp reconstruction + annealed KL + success BCE.

    Batch: ``pc [B, N, 3]``, ``grasps [B, G, 7(+nq)]`` (normalized rows
    ``[tmrp(6), success(1), qualities...]``).
    """
    recon, kl_loss, cls_loss, qual_loss = loss_cfg.build_losses()

    def step_fn(state: TrainState, batch: Dict[str, jax.Array], rng: jax.Array):
        pc = batch["pc"]
        grasps = batch["grasps"]
        bg = grasps.reshape(-1, grasps.shape[-1])  # [B*G, D]
        # per-object grasp stats for unnormalizing losses (control points);
        # fall back to the fixed scales when the batch carries no metas
        recon_kwargs = {}
        if "grasp_mean" in batch and "grasp_std" in batch:
            recon_kwargs = {
                "grasp_mean": batch["grasp_mean"],
                "grasp_std": batch["grasp_std"],
            }
        k_reparam, k_drop = jax.random.split(jax.random.fold_in(rng, state.step))

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
            if state.constants is not None:
                variables["constants"] = state.constants
            (out, (mu, logvar)), updates = vae.apply(
                variables,
                pc,
                bg,
                rng=k_reparam,
                train=True,
                rngs={"dropout": k_drop},
                mutable=["batch_stats"],
            )
            tmrp_pred, cls_pred = out[0], out[1]

            metrics = {}
            l_recon = recon(tmrp_pred, bg[..., :6], **recon_kwargs)
            kl_w, kl_raw = kl_loss(mu, logvar, step=state.step)
            loss = l_recon + kl_w
            metrics["reconstruction_loss"] = l_recon
            metrics["latent_loss"] = kl_w
            metrics["unweighted_kld"] = kl_raw
            if cls_loss is not None:
                l_cls = cls_loss(cls_pred.squeeze(-1), bg[..., 6])
                loss = loss + l_cls
                metrics["classification_loss"] = l_cls
            if qual_loss is not None and len(out) > 2:
                l_q = qual_loss(out[2], bg[..., 7:])
                loss = loss + l_q
                metrics["quality_loss"] = l_q
            metrics["loss"] = loss
            return loss, (metrics, updates.get("batch_stats"))

        grads, (metrics, new_bs) = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_step = state.step + 1
        new_ema = state.ema_params
        if ema_cfg is not None and state.ema_params is not None:
            new_ema = ema_update(state.ema_params, new_params, new_step, ema_cfg)
        new_state = state.replace(
            step=new_step,
            params=new_params,
            opt_state=new_opt,
            ema_params=new_ema,
            batch_stats=new_bs if new_bs is not None else state.batch_stats,
        )
        return new_state, metrics

    return step_fn


def make_ddm_train_step(
    vae,
    ddm,
    diffusion: GaussianDiffusion1D,
    tx: optax.GradientTransformation,
    vae_variables: Optional[dict] = None,
    ema_cfg: Optional[EMAConfig] = EMAConfig(),
    loss_weight: float = 1.0,
    cond_dropout: float = 0.0,
) -> Callable:
    """Stage-2 step: epsilon-prediction loss on frozen-VAE latents.

    The frozen VAE (`grasp_ldm.py:128-133,159-163`) enters as a closed-over
    variable dict (or via ``batch["vae_variables"]`` when None here): its
    encode runs under ``stop_gradient`` in eval mode, so the optimizer pytree
    only ever sees denoiser parameters — the functional equivalent of
    `requires_grad=False`.

    ``cond_dropout`` > 0 (conditioned denoisers only) drops the class/region
    conditioning embedding per sample with that probability (``cond_mask``),
    so the model also learns the unconditional score — the training half of
    classifier-free guidance (:mod:`graspldm_tpu.diffusion.guidance`;
    sample with ``ldm_generate(cfg_scale=...)``).
    """

    def step_fn(
        state: TrainState,
        batch: Dict[str, jax.Array],
        rng: jax.Array,
        frozen_vae: Optional[dict] = None,
    ):
        vv = frozen_vae if frozen_vae is not None else vae_variables
        assert vv is not None, "frozen VAE variables required"
        pc = batch["pc"]
        grasps = batch["grasps"]
        bg = grasps.reshape(-1, grasps.shape[-1])
        B = pc.shape[0]
        repeats = bg.shape[0] // B
        rng = jax.random.fold_in(rng, state.step)
        k_enc, k_diff, k_drop = jax.random.split(rng, 3)

        # Frozen VAE encode (eval mode): z_pc once per cloud, z_h per grasp.
        z_pc = vae.apply(vv, pc, method="encode_pc")
        z_pc_rep = jnp.repeat(z_pc, repeats, axis=0)
        mu, logvar = vae.apply(
            vv, bg, z_pc_rep, method="encode_grasp"
        )
        from ..models.grasp_vae import VAEBottleneck

        z_h = VAEBottleneck.reparameterize(k_enc, mu, logvar)
        z_h = jax.lax.stop_gradient(z_h)[:, None, :]  # [BG, 1, D]
        z_cond = jax.lax.stop_gradient(z_pc_rep)

        # task conditioning (class scalar / per-grasp region points) rides
        # along in the batch for conditioned denoisers
        cond_kwargs = {}
        if "cls_cond" in batch:
            cond_kwargs["cls_cond"] = batch["cls_cond"].reshape(-1)
        if "region_points" in batch and "grasp_region_labels" in batch:
            # [B, R, P, 3] gathered by per-grasp labels [B, G] -> [BG, P, 3]
            rp = batch["region_points"]
            labels = batch["grasp_region_labels"].astype(jnp.int32)
            sel = jax.vmap(lambda r, l: r[l])(rp, labels)  # [B, G, P, 3]
            cond_kwargs["region_points"] = sel.reshape(
                -1, rp.shape[-2], rp.shape[-1]
            )
        if cond_dropout > 0.0 and cond_kwargs:
            # fold_in (not a wider split) keeps the existing k_enc/k_diff/
            # k_drop streams identical to cond_dropout=0 runs
            k_mask = jax.random.fold_in(rng, 1)
            cond_kwargs["cond_mask"] = jax.random.bernoulli(
                k_mask, 1.0 - cond_dropout, (bg.shape[0],)
            )

        def loss_fn(params):
            variables = {"params": params}
            if state.constants is not None:
                variables["constants"] = state.constants

            def denoise(x, t, z):
                return ddm.apply(
                    variables, x, t, z, train=True, rngs={"dropout": k_drop},
                    **cond_kwargs,
                )

            loss = loss_weight * diffusion.loss(denoise, z_h, k_diff, z_cond)
            return loss, {"denoising_loss": loss, "loss": loss}

        grads, metrics = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_step = state.step + 1
        new_ema = state.ema_params
        if ema_cfg is not None and state.ema_params is not None:
            new_ema = ema_update(state.ema_params, new_params, new_step, ema_cfg)
        new_state = state.replace(
            step=new_step, params=new_params, opt_state=new_opt, ema_params=new_ema
        )
        return new_state, metrics

    return step_fn
