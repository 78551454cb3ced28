#!/usr/bin/env python
"""Training CLI.

Rebuild of `tools/train_generator.py:11-117`: dispatches a config file to the
stage trainer (vae | ddm | classifier), with the same small set of CLI
overrides (batch size, data root, seed, deterministic).

Usage:
    python tools/train.py --config graspldm_tpu/configs/fpc_1a_latentc3_z4_pc64_180k.py \
        --model vae [--batch-size 10] [--max-steps N] [--data-root PATH] [--seed 0]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Train GraspLDM-TPU models")
    p.add_argument("--config", required=True, help="config .py file")
    p.add_argument(
        "--model", required=True,
        choices=["vae", "ddm", "elucidated_ddm", "classifier"],
        help="which stage/model to train",
    )
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--data-root", type=str, default=None)
    p.add_argument("--out-root", type=str, default="output")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--deterministic", action="store_true")
    return p.parse_args()


def main():
    args = parse_args()
    import graspldm_tpu.data  # registers datasets
    from graspldm_tpu.config import DATASETS, Config, build_from_cfg
    from graspldm_tpu.flagship import FlagshipConfig
    from graspldm_tpu.parallel import make_mesh
    from graspldm_tpu.training import EMAConfig, VAELossConfig
    from graspldm_tpu.training.experiment import Experiment
    from graspldm_tpu.training.registry import get_trainer

    cfg = Config.fromfile(args.config)
    exp_name = os.path.splitext(os.path.basename(args.config))[0]

    batch_size = args.batch_size or cfg.get("batch_size", 10)
    max_steps = args.max_steps or cfg.get("max_steps", 180_000)
    data_root = args.data_root or cfg.get("root_data_dir")
    seed = args.seed if args.seed is not None else cfg.get("seed", 0)

    exp = Experiment(args.out_root, exp_name, args.model)
    exp.copy_config(args.config)
    trainer_cfg = cfg.get("trainer", {})
    rng = jax.random.PRNGKey(seed)

    if args.model == "classifier":
        # classifier stage: gripper-point datasets + BCE trainer
        # (reference `trainers/__init__.py:12-53` dispatch +
        # `grasp_classification_trainer.py:27-216`)
        ds_cfg = dict(cfg.get_path("data.classifier", {}) or {})
        ds_cfg.setdefault("type", "AcronymGraspPointsDataset")
        ds_cfg.setdefault("args", dict(cfg.get_path("data.train.args", {}) or {}))
        ds_cfg["args"].pop("augs_config", None)
        if data_root:
            ds_cfg["args"]["data_root_dir"] = data_root
        dataset = build_from_cfg(ds_cfg, DATASETS)

        trainer = get_trainer("classifier")(
            experiment=exp,
            num_pc_points=ds_cfg["args"].get("batch_num_points_per_pc", 1024),
            optimizer_cfg=cfg.get("optimizer"),
            scale_voxel_resolution=cfg.get_path(
                "classifier.scale_voxel_resolution", 0.75
            ),
            log_every=trainer_cfg.get("log_every_n_steps", 100),
        )
        example = next(dataset.batches(batch_size))
        state = trainer.init_state(rng, example)
        if cfg.get("resume_training_from_last", True):
            state = trainer.maybe_resume(state)

        def classifier_batches():
            while True:
                for b in dataset.batches(batch_size):
                    yield b

        trainer.fit(state, classifier_batches(), max_steps, rng)
        return

    model_cfg = FlagshipConfig(**cfg.get("flagship_args", {}))

    ds_cfg = dict(cfg.get_path("data.train", {}))
    ds_cfg.setdefault("type", "AcronymShapenetPointclouds")
    if data_root:
        ds_cfg.setdefault("args", {})
        ds_cfg["args"]["data_root_dir"] = data_root
    dataset = build_from_cfg(ds_cfg, DATASETS)

    ema_args = trainer_cfg.get("ema", {"beta": 0.990, "update_after_step": 1000})
    trainer = get_trainer(args.model)(
        experiment=exp,
        model_cfg=model_cfg,
        optimizer_cfg=cfg.get("optimizer"),
        ema_cfg=EMAConfig(**ema_args),
        vae_loss_cfg=VAELossConfig(
            kl=VAELossConfig().kl.__class__(
                cyclical_annealing=True,
                num_steps=max_steps,
                num_cycles=cfg.get_path("kl.num_cycles", 1),
                ratio=cfg.get_path("kl.ratio", 0.5),
                start=cfg.get_path("kl.start", 1e-7),
                stop=cfg.get_path("kl.stop", 0.1),
            ),
            loss_cfgs=cfg.get_path("model.vae.losses", None),
        ),
        mesh=make_mesh(),
        log_every=trainer_cfg.get("log_every_n_steps", 100),
    )

    example = next(dataset.batches(batch_size))
    state = trainer.init_state(rng, example)
    if cfg.get("resume_training_from_last", True):
        state = trainer.maybe_resume(state)
    frozen_vae = None
    if args.model in ("ddm", "elucidated_ddm"):
        frozen_vae = trainer.load_frozen_vae(rng, example)

    def infinite_batches():
        while True:
            for b in dataset.batches(batch_size):
                out = {k: b[k] for k in ("pc", "grasps")}
                metas = b.get("metas") or {}
                # per-object grasp stats ride along for losses that
                # unnormalize (GraspControlPointsReconstructionLoss)
                if "grasp_mean" in metas:
                    out["grasp_mean"] = metas["grasp_mean"]
                    out["grasp_std"] = metas["grasp_std"]
                # region conditioning metas for region-conditioned denoisers
                if "region_points" in metas:
                    out["region_points"] = metas["region_points"]
                    out["grasp_region_labels"] = metas["grasp_region_labels"]
                yield out

    from graspldm_tpu.parallel import prefetch_to_device

    batches = prefetch_to_device(infinite_batches(), size=2, mesh=trainer.mesh)
    trainer.fit(state, batches, max_steps, rng, frozen_vae)


if __name__ == "__main__":
    main()
