"""High-level inference API: experiment discovery + checkpointed generation.

Unifies the reference's duplicated inference stacks (`tools/inference.py` and
`grasp_ldm/inference/` — SURVEY.md §2.2 flags the duplication) into one:

  * :class:`ExperimentPaths` — config/checkpoint discovery per mode
    (`tools/inference.py:97-158`).
  * :class:`InferenceVAE` / :class:`InferenceLDM` — load weights (EMA by
    default), build a test dataset, and run the jitted generation pipelines
    from :mod:`graspldm_tpu.inference.pipeline`.

Result dict schema matches `tools/inference.py:806-815`:
``{grasps [B,G,4,4], grasp_tmrp, confidence, qualities, pc}``.
"""

from __future__ import annotations

import glob
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, DATASETS, build_from_cfg
from ..flagship import FlagshipConfig, build_flagship, jit_init
from ..training import TrainState, build_optimizer, init_train_state
from ..training.experiment import restore_checkpoint
from ..utils.normalization import NormalizationMeta
from .pipeline import ldm_generate, vae_generate

__all__ = ["ExperimentPaths", "InferenceBase", "InferenceVAE", "InferenceLDM"]


class ExperimentPaths:
    """Resolve ``{exp_dir}/{mode}/*.py`` config and checkpoints."""

    def __init__(self, exp_path: str, mode: str):
        self.exp_path = exp_path
        self.mode = mode
        self.mode_dir = os.path.join(exp_path, mode)
        if not os.path.isdir(self.mode_dir):
            raise FileNotFoundError(f"No {mode} dir under {exp_path}")
        cfgs = glob.glob(os.path.join(self.mode_dir, "*.py"))
        self.config_path = cfgs[0] if cfgs else None
        self.ckpt_path = os.path.join(self.mode_dir, "checkpoints", "last")
        if not os.path.exists(self.ckpt_path):
            raise FileNotFoundError(f"No checkpoint at {self.ckpt_path}")


class InferenceBase:
    """Shared model/dataset setup for both generation modes."""

    def __init__(
        self,
        exp_path: str,
        data_root: Optional[str] = None,
        split: str = "test",
        use_ema: bool = True,
        num_inference_steps: int = 100,
        sampler: str = "ddim",
        build_dataset: bool = True,
    ):
        self.use_ema = use_ema
        self.num_inference_steps = num_inference_steps
        self.sampler = sampler

        vae_paths = ExperimentPaths(exp_path, "vae")
        self.cfg = (
            Config.fromfile(vae_paths.config_path) if vae_paths.config_path else {}
        )
        self.model_cfg = FlagshipConfig(**self.cfg.get("flagship_args", {}))
        self.vae, self.ddm, self.diffusion = build_flagship(self.model_cfg)

        rng = jax.random.PRNGKey(0)
        tx = build_optimizer(1e-3)
        N = self.model_cfg.pc_num_points
        pc = jnp.zeros((1, N, 3))
        grasps = jnp.zeros((2, self.model_cfg.grasp_representation_dims))
        template = init_train_state(self.vae, tx, rng, (pc, grasps), {"rng": rng})
        vae_state = restore_checkpoint(vae_paths.ckpt_path, template)
        self.vae_variables = self._variables_from_state(vae_state)

        self.dataset = None
        if build_dataset and (data_root or self.cfg.get("root_data_dir")):
            # registry-driven build, like the train CLI: the config's
            # data.train.type selects full-pc / partial-pc / classifier
            # datasets (reference `tools/inference.py:184-196` patches the
            # train config the same way)
            from .. import data as _data  # noqa: F401 — registers DATASETS

            ds_cfg = dict(self.cfg.get_path("data.train", {}) or {})
            ds_cfg.setdefault("type", "AcronymShapenetPointclouds")
            ds_args = dict(ds_cfg.get("args", {}) or {})
            ds_args.pop("augs_config", None)  # no augmentation at test time
            ds_args["split"] = split
            if data_root:
                ds_args["data_root_dir"] = data_root
            if ds_args.get("data_root_dir") and os.path.isdir(
                ds_args["data_root_dir"]
            ):
                ds_args.setdefault("num_repeat_dataset", 1)
                if self.model_cfg.conditioning == "region":
                    ds_args.setdefault("return_region_metas", True)
                    ds_args.setdefault(
                        "region_num_points", self.model_cfg.region_num_points
                    )
                self.dataset = build_from_cfg(
                    {"type": ds_cfg["type"], "args": ds_args}, DATASETS
                )

    def _variables_from_state(self, state: TrainState) -> Dict[str, Any]:
        params = (
            state.ema_params
            if (self.use_ema and state.ema_params is not None)
            else state.params
        )
        v: Dict[str, Any] = {"params": params}
        if state.batch_stats is not None:
            v["batch_stats"] = state.batch_stats
        if state.constants is not None:
            v["constants"] = state.constants
        return v

    # -- data access --

    def get_item(self, idx: int) -> Dict[str, np.ndarray]:
        assert self.dataset is not None, "no dataset configured"
        return self.dataset[idx]

    def _meta_from_item(self, metas: Dict[str, np.ndarray]) -> NormalizationMeta:
        return NormalizationMeta(
            pc_mean=jnp.asarray(metas["pc_mean"])[None],
            pc_std=jnp.asarray(metas["pc_std"])[None],
            grasp_mean=jnp.asarray(metas["grasp_mean"])[None],
            grasp_std=jnp.asarray(metas["grasp_std"])[None],
        )

    def infer(
        self, idx: int, num_grasps: int, rng: jax.Array, **kwargs
    ) -> Dict[str, Any]:
        """Generate grasps for dataset item ``idx``."""
        item = self.get_item(idx)
        pc = jnp.asarray(item["pc"])[None]  # [1, N, 3] normalized
        meta = self._meta_from_item(item["metas"])
        out = self.generate(
            pc, num_grasps, rng, meta, item_metas=item["metas"], **kwargs
        )
        out["pc"] = np.asarray(pc) * np.asarray(meta.pc_std)[:, None, :] + np.asarray(
            meta.pc_mean
        )[:, None, :]
        return out

    def set_normalization_params(
        self,
        pc_shift,
        translation_scale: float,
        rotation_scale: float,
        grasp_shift=None,
    ) -> None:
        """Override the raw-pointcloud normalization used by
        :meth:`infer_on_pointcloud`.

        Rebuild of `grasp_ldm/inference/inference_base.py:103-131` — for
        checkpoints trained with non-default (e.g. dataset-statistics)
        normalization. ``pc_shift``/``grasp_shift`` are ``[3]`` metric
        offsets; scales are the translation/MRP divisors.
        """
        pc_shift = jnp.asarray(pc_shift, jnp.float32)
        g_shift = (
            jnp.asarray(grasp_shift, jnp.float32)
            if grasp_shift is not None
            else pc_shift
        )
        self._norm_override = NormalizationMeta(
            pc_mean=pc_shift[None],
            pc_std=jnp.full((1, 3), translation_scale, jnp.float32),
            grasp_mean=jnp.concatenate([g_shift, jnp.zeros(3)])[None],
            grasp_std=jnp.asarray(
                [[translation_scale] * 3 + [rotation_scale] * 3], jnp.float32
            ),
        )

    def infer_on_pointcloud(
        self, pc_raw: np.ndarray, num_grasps: int, rng: jax.Array, **kwargs
    ) -> Dict[str, Any]:
        """Generate for a raw (metric) point cloud ``[N, 3]``.

        Normalizes with the fixed stats (`tools/inference.py:658-666`), or
        with :meth:`set_normalization_params` overrides when set.
        """
        from ..utils.normalization import normalize_pc_and_grasps

        pc = jnp.asarray(pc_raw, jnp.float32)[None]
        override = getattr(self, "_norm_override", None)
        if override is not None:
            meta = override
            pc_n = (pc - meta.pc_mean[:, None, :]) / meta.pc_std[:, None, :]
        else:
            dummy = jnp.zeros((1, 1, 6))
            pc_n, _, meta = normalize_pc_and_grasps(pc, dummy)
        out = self.generate(pc_n, num_grasps, rng, meta, **kwargs)
        out["pc"] = np.asarray(pc)
        return out

    def generate(self, pc, num_grasps, rng, meta, **kwargs):  # pragma: no cover
        raise NotImplementedError


class InferenceVAE(InferenceBase):
    """VAE-prior generation (`tools/inference.py:669-815`)."""

    def generate(self, pc, num_grasps, rng, meta, item_metas=None, **kwargs):
        out = vae_generate(self.vae, self.vae_variables, pc, num_grasps, rng, meta)
        return {k: np.asarray(v) for k, v in out.items()}


class AcronymGroundTruthModel:
    """Identity "model" that returns the dataset's ground-truth grasps.

    Reference `tools/inference.py:818-887`: used for qualitative comparison
    against generated grasps — unnormalizes the dataset item's grasp rows and
    lifts them to 4x4 transforms with confidence = the success flag.
    """

    def __init__(self, dataset):
        self.dataset = dataset

    def infer(self, idx: int, num_grasps: Optional[int] = None, rng=None):
        from ..utils.rotations import tmrp_to_H

        item = self.dataset[idx]
        grasps = item["grasps"]
        if num_grasps is not None:
            grasps = grasps[:num_grasps]
        m = item["metas"]
        tmrp = grasps[:, :6] * m["grasp_std"][None, :] + m["grasp_mean"][None, :]
        H = np.asarray(tmrp_to_H(jnp.asarray(tmrp)))
        pc = item["pc"] * m["pc_std"][None, :] + m["pc_mean"][None, :]
        return {
            "grasps": H[None],
            "grasp_tmrp": tmrp[None],
            "confidence": grasps[None, :, 6],
            "pc": pc[None],
        }


class InferenceLDM(InferenceBase):
    """Latent-diffusion generation (`tools/inference.py:401-666`).

    Discovers the diffusion stage dir (``ddm`` or ``elucidated_ddm``); for
    elucidated checkpoints the fast sampler defaults to DPM++(2M) with 32
    steps, matching the reference's `_setup_ldm_sampler`
    (`tools/inference.py:463-490`).
    """

    def __init__(self, exp_path: str, **kwargs):
        super().__init__(exp_path, **kwargs)
        try:
            ddm_paths = ExperimentPaths(exp_path, "ddm")
            self.ddm_mode = "ddm"
        except FileNotFoundError:
            ddm_paths = ExperimentPaths(exp_path, "elucidated_ddm")
            self.ddm_mode = "elucidated_ddm"

        if self.ddm_mode == "elucidated_ddm":
            import dataclasses

            if not self.model_cfg.elucidated:
                self.model_cfg = dataclasses.replace(
                    self.model_cfg, elucidated=True
                )
                self.vae, self.ddm, self.diffusion = build_flagship(
                    self.model_cfg
                )
            if self.sampler not in ("dpmpp", "churn"):
                self.sampler = "dpmpp"
                self.num_inference_steps = self.model_cfg.edm_num_sample_steps

        rng = jax.random.PRNGKey(0)
        tx = build_optimizer(1e-3)
        D = self.model_cfg.grasp_latent_size
        x = jnp.zeros((2, 1, D))
        t = jnp.zeros((2,), jnp.int32)
        zc = jnp.zeros(
            (2, self.model_cfg.pc_latent_channels, self.model_cfg.pc_latent_size)
        )
        args = (x, t, zc)
        if self.model_cfg.conditioning == "class":
            args += (jnp.zeros((2,)),)
        elif self.model_cfg.conditioning == "region":
            args += (jnp.zeros((2, self.model_cfg.region_num_points, 3)),)
        template = init_train_state(self.ddm, tx, rng, args)
        ddm_state = restore_checkpoint(ddm_paths.ckpt_path, template)
        self.ddm_variables = self._variables_from_state(ddm_state)

    def _resolve_conditioning(
        self, pc, num_grasps, cls_cond, region_id, item_metas
    ):
        """Validate requested conditioning against the checkpoint's model and
        build the per-grasp conditioning tensors."""
        cond = self.model_cfg.conditioning
        B = pc.shape[0]
        if cls_cond is not None and cond != "class":
            raise ValueError(
                "this checkpoint's denoiser is "
                f"{'unconditional' if cond is None else cond + '-conditioned'}; "
                "--conditioning class requires a class-conditioned model "
                "(flagship_args.conditioning='class')"
            )
        if region_id is not None and cond != "region":
            raise ValueError(
                "this checkpoint's denoiser is "
                f"{'unconditional' if cond is None else cond + '-conditioned'}; "
                "--conditioning region requires a region-conditioned model "
                "(flagship_args.conditioning='region')"
            )
        if cond == "class":
            if cls_cond is None:
                raise ValueError(
                    "class-conditioned model: pass cls_cond (condition_value)"
                )
            cls_cond = jnp.broadcast_to(
                jnp.asarray(cls_cond, jnp.float32).reshape(-1),
                (B * num_grasps,),
            )
            return cls_cond, None
        if cond == "region":
            if region_id is None:
                raise ValueError(
                    "region-conditioned model: pass region_id (condition_value)"
                )
            if item_metas is None or "region_points" not in item_metas:
                raise ValueError(
                    "region conditioning needs dataset region metas "
                    "(build the dataset with return_region_metas=True)"
                )
            rp = jnp.asarray(item_metas["region_points"])[int(region_id)]
            region_points = jnp.broadcast_to(
                rp[None], (B * num_grasps,) + rp.shape
            )
            return None, region_points
        return None, None

    def generate(
        self,
        pc,
        num_grasps,
        rng,
        meta,
        cls_cond=None,
        region_id=None,
        item_metas=None,
        return_trajectory=False,
        cfg_scale=None,
        guidance_scale=None,
        **kwargs,
    ):
        """``cfg_scale`` / ``guidance_scale`` enable guided sampling
        (classifier-free / decoder-success guidance, see
        :func:`graspldm_tpu.inference.pipeline.ldm_generate`)."""
        cls_cond, region_points = self._resolve_conditioning(
            pc, num_grasps, cls_cond, region_id, item_metas
        )
        out = ldm_generate(
            self.vae,
            self.vae_variables,
            self.ddm,
            self.ddm_variables,
            self.diffusion,
            pc,
            num_grasps,
            rng,
            num_inference_steps=self.num_inference_steps,
            sampler=self.sampler,
            meta=meta,
            cls_cond=cls_cond,
            region_points=region_points,
            return_trajectory=return_trajectory,
            cfg_scale=cfg_scale,
            guidance_scale=guidance_scale,
        )
        return {k: np.asarray(v) for k, v in out.items()}
