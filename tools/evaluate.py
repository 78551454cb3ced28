#!/usr/bin/env python
"""Generation-quality evaluation CLI.

Evaluates a trained experiment against the dataset's ground-truth grasps
(coverage / MMD / EMD, :mod:`graspldm_tpu.metrics`) — the automated eval the
reference never had (its validation loop is a stub,
`grasp_ldm/trainers/grasp_generation_trainer.py:112-140`).

Usage:
    python tools/evaluate.py --exp_path output/fpc_... --mode LDM \
        --data_root data/ACRONYM --split test --num_objects 16 \
        --num_grasps 64 [--out metrics.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Evaluate grasp generation quality")
    p.add_argument("--exp_path", required=True)
    p.add_argument("--data_root", default=None)
    p.add_argument("--mode", default="LDM", choices=["VAE", "LDM", "GT"])
    p.add_argument("--split", default="test")
    p.add_argument("--num_objects", type=int, default=16)
    p.add_argument("--num_grasps", type=int, default=64)
    p.add_argument("--inference_steps", type=int, default=100)
    p.add_argument("--coverage_tau", type=float, default=0.02,
                   help="coverage threshold in meters")
    p.add_argument("--rot_weight", type=float, default=0.0,
                   help="meters-per-radian weight of the rotation distance")
    p.add_argument("--min_confidence", type=float, default=None,
                   help="drop generated grasps below this confidence")
    p.add_argument("--guidance_scale", type=float, default=None,
                   help="LDM mode: evaluate with decoder-success guidance")
    p.add_argument("--cfg_scale", type=float, default=None,
                   help="LDM mode: classifier-free guidance weight "
                   "(conditioned checkpoints)")
    p.add_argument("--classifier_exp", default=None,
                   help="experiment dir with a trained classifier/ stage: "
                   "report the independent classifier's mean score on the "
                   "generated grasps")
    p.add_argument("--min_classifier_confidence", type=float, default=None,
                   help="drop generated grasps the classifier scores below "
                   "this (requires --classifier_exp)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=None, help="write metrics JSON here")
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    from graspldm_tpu.inference.runner import (
        AcronymGroundTruthModel,
        InferenceLDM,
        InferenceVAE,
    )
    from graspldm_tpu.metrics import evaluate_against_ground_truth

    if args.mode == "GT":
        base = InferenceVAE(args.exp_path, data_root=args.data_root,
                            split=args.split)
        runner = AcronymGroundTruthModel(base.dataset)
        runner.dataset = base.dataset
    else:
        cls = InferenceVAE if args.mode == "VAE" else InferenceLDM
        runner = cls(
            exp_path=args.exp_path,
            data_root=args.data_root,
            split=args.split,
            num_inference_steps=args.inference_steps,
        )
    assert runner.dataset is not None, "dataset required (pass --data_root)"

    rng = np.random.default_rng(args.seed)
    n = min(args.num_objects, len(runner.dataset))
    indices = rng.choice(len(runner.dataset), size=n, replace=False)

    infer_kwargs = {}
    if args.mode == "LDM":
        if args.guidance_scale is not None:
            infer_kwargs["guidance_scale"] = args.guidance_scale
        if args.cfg_scale is not None:
            infer_kwargs["cfg_scale"] = args.cfg_scale

    scorer = None
    if args.classifier_exp:
        from graspldm_tpu.inference import InferenceClassifier

        scorer = InferenceClassifier(args.classifier_exp)

    metrics = evaluate_against_ground_truth(
        runner,
        indices=indices,
        num_grasps=args.num_grasps,
        rng=jax.random.PRNGKey(args.seed),
        coverage_tau=args.coverage_tau,
        rot_weight=args.rot_weight,
        min_confidence=args.min_confidence,
        infer_kwargs=infer_kwargs or None,
        scorer=scorer,
        min_classifier_confidence=args.min_classifier_confidence,
    )
    metrics.update(mode=args.mode, split=args.split,
                   num_grasps=args.num_grasps)
    if infer_kwargs:
        metrics.update(infer_kwargs)
    print(json.dumps(metrics, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(metrics, f, indent=1)


if __name__ == "__main__":
    main()
