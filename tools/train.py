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
    p.add_argument(
        "--cfg-options", nargs="+", default=None, metavar="KEY=VALUE",
        help="dotted config overrides merged after loading, e.g. "
        "optimizer.initial_lr=5e-4 trainer.ema.beta=0.995 "
        "(reference Config.merge_from_dict)",
    )
    # multi-host (multi-process) training: the reference's num_nodes/DDP
    # (`trainers/trainer.py:43,204-224`). On TPU pods --distributed alone
    # auto-configures; CPU/GPU clusters pass the coordinator explicitly.
    p.add_argument("--distributed", action="store_true",
                   help="call jax.distributed.initialize before training")
    p.add_argument("--coordinator", type=str, default=None,
                   help="coordinator address host:port (implies --distributed)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    return p.parse_args()


def main():
    args = parse_args()
    if args.distributed or args.coordinator or args.num_processes:
        from graspldm_tpu.parallel.distributed import initialize

        initialize(args.coordinator, args.num_processes, args.process_id)
        print(
            f"[distributed] process {jax.process_index()}/"
            f"{jax.process_count()}, {jax.local_device_count()} local / "
            f"{jax.device_count()} global devices"
        )
    import graspldm_tpu.data  # registers datasets
    from graspldm_tpu.config import DATASETS, Config, build_from_cfg
    from graspldm_tpu.flagship import FlagshipConfig
    from graspldm_tpu.parallel import make_mesh
    from graspldm_tpu.training import EMAConfig, VAELossConfig
    from graspldm_tpu.training.experiment import Experiment
    from graspldm_tpu.training.registry import get_trainer

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        from graspldm_tpu.config import merge_from_dict, parse_cfg_options

        cfg = merge_from_dict(cfg, parse_cfg_options(args.cfg_options))
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
        # default classifier wrap follows the experiment's pc modality:
        # partial-pc configs get the partial classifier dataset (reference
        # `acronym_grasp_points.py:275,377` full/partial pair)
        train_type = str(cfg.get_path("data.train.type", ""))
        ds_cfg.setdefault(
            "type",
            "AcronymPartialGraspPointsDataset"
            if "Partial" in train_type
            else "AcronymGraspPointsDataset",
        )
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
            logger_cfg=trainer_cfg.get("logger"),
            steps_per_dispatch=int(
                trainer_cfg.get("steps_per_dispatch", 1)
            ),
        )
        example = next(dataset.batches(batch_size))
        state = trainer.init_state(rng, example)
        if cfg.get("resume_training_from_last", True):
            state = trainer.maybe_resume(state)

        def classifier_batches():
            while True:
                for b in dataset.batches(batch_size):
                    yield b

        src = classifier_batches()
        if trainer.steps_per_dispatch > 1:
            from graspldm_tpu.parallel import stack_batches

            src = stack_batches(src, trainer.steps_per_dispatch)
        trainer.fit(state, src, max_steps, rng)
        return

    model_cfg = FlagshipConfig(**cfg.get("flagship_args", {}))

    ds_cfg = dict(cfg.get_path("data.train", {}))
    ds_cfg.setdefault("type", "AcronymShapenetPointclouds")
    if data_root:
        ds_cfg.setdefault("args", {})
        ds_cfg["args"]["data_root_dir"] = data_root
    dataset = build_from_cfg(ds_cfg, DATASETS)
    if jax.process_count() > 1:
        # per-host data loading: each process keeps only its record slice
        # and its batches are LOCAL slices of the global batch
        from graspldm_tpu.parallel.distributed import shard_dataset_records

        shard_dataset_records(dataset)

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
        logger_cfg=trainer_cfg.get("logger"),
        eval_every=int(trainer_cfg.get("eval_every", 0)),
        steps_per_dispatch=int(trainer_cfg.get("steps_per_dispatch", 1)),
        dispatch_unroll=int(trainer_cfg.get("dispatch_unroll", 1)),
        # reference default: keep the top-3 checkpoints by loss
        # (`grasp_generation_trainer.py:146-173`)
        keep_top_k=int(trainer_cfg.get("keep_top_k", 3)),
    )

    example = next(dataset.batches(batch_size))
    state = trainer.init_state(rng, example)
    if cfg.get("resume_training_from_last", True):
        state = trainer.maybe_resume(state)
    frozen_vae = None
    if args.model in ("ddm", "elucidated_ddm"):
        frozen_vae = trainer.load_frozen_vae(rng, example)

    def _train_fields(b):
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
        # class-conditioned denoisers need a per-grasp label: the dataset's
        # mode_cls metas when present (the reference's
        # `metas["mode_cls"]` convention, `tools/inference.py:330-364`),
        # else the grasp success flag — trains success/fail as the two
        # task classes, so CFG can steer toward the success mode
        if model_cfg.conditioning == "class" and "cls_cond" not in out:
            out["cls_cond"] = metas.get("mode_cls", b["grasps"][..., 6])
        return out

    def make_iter(wid: int, n: int):
        # each worker thread gets its own RNG (and shares the mesh cache);
        # with one worker the dataset is used as-is
        ds = dataset if n == 1 else dataset.worker_copy(seed * 1009 + wid)
        while True:
            for b in ds.batches(batch_size):
                yield _train_fields(b)

    # periodic in-training generation eval (reference has none — its val
    # loop is a stub; see training/eval_hook.py)
    eval_fn = None
    if trainer.eval_every:
        from graspldm_tpu.training.eval_hook import make_generation_eval_fn

        eval_cfg = dict(trainer_cfg.get("eval", {}) or {})
        # the eval score gates a COLLECTIVE best-checkpoint save
        # (trainer.py assumes it is replicated-identical), so every process
        # must score the same objects: under multi-host training `dataset`
        # holds only this process's record shard — rebuild the full,
        # unsharded dataset for eval
        eval_ds = None
        split = eval_cfg.get("split")
        if split:
            try:
                e_cfg = {
                    "type": ds_cfg["type"],
                    "args": {**ds_cfg.get("args", {}), "split": split},
                }
                eval_ds = build_from_cfg(e_cfg, DATASETS)
            except Exception as e:  # fall back to held-out train items
                print(f"[eval] {split} split unavailable ({e}); "
                      "evaluating on train items")
        if eval_ds is None:
            eval_ds = (
                build_from_cfg(ds_cfg, DATASETS)
                if jax.process_count() > 1
                else dataset
            )
        k = min(int(eval_cfg.get("num_objects", 8)), len(eval_ds))
        eval_fn = make_generation_eval_fn(
            trainer, eval_ds, list(range(k)),
            num_grasps=int(eval_cfg.get("num_grasps", 64)),
            num_inference_steps=int(eval_cfg.get("num_steps", 25)),
            coverage_tau=float(eval_cfg.get("coverage_tau", 0.02)),
        )

    from graspldm_tpu.parallel import (
        BatchWorkerPool,
        prefetch_to_device,
        stack_batches,
    )

    # full input pipeline: worker threads assemble host batches ahead of
    # the consumer (reference DataLoader num_workers), then a 2-deep
    # non-blocking device_put double-buffer hides the transfer; with
    # trainer.steps_per_dispatch > 1 batches are stacked K at a time and
    # the trainer scans K steps per dispatch (amortizes RPC latency)
    num_workers = int(trainer_cfg.get("num_workers", 1))
    K = trainer.steps_per_dispatch
    with BatchWorkerPool(make_iter, num_workers=num_workers) as pool:
        src = stack_batches(pool, K) if K > 1 else pool
        batches = prefetch_to_device(
            src, size=2, mesh=trainer.mesh, chunked=K > 1
        )
        trainer.fit(state, batches, max_steps, rng, frozen_vae,
                    eval_fn=eval_fn)


if __name__ == "__main__":
    main()
