#!/usr/bin/env python
"""Grasp generation CLI.

Rebuild of `tools/generate_grasps.py:14-135`: load an experiment (config +
checkpoints), generate grasps in VAE or LDM mode for dataset samples or a raw
point cloud, and dump/visualize the results.

Usage:
    python tools/generate_grasps.py --exp_path output/fpc_1a_latentc3_z4_pc64_180k \
        --mode LDM --num_grasps 20 --inference_steps 100 --num_samples 3 \
        [--data_root PATH] [--split test] [--no_ema] [--save_npz OUT.npz]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Generate 6-DoF grasps")
    p.add_argument("--exp_path", required=True, help="experiment directory")
    p.add_argument("--data_root", default=None)
    p.add_argument("--mode", default="LDM", choices=["VAE", "LDM"])
    p.add_argument("--split", default="test")
    p.add_argument("--num_grasps", type=int, default=20)
    p.add_argument("--num_samples", type=int, default=1,
                   help="number of dataset objects to sample")
    p.add_argument("--inference_steps", type=int, default=100)
    p.add_argument("--sampler", default="ddim",
                   choices=["ddim", "ddpm", "dpmpp", "churn"],
                   help="ddim/ddpm for gaussian checkpoints; dpmpp/churn for "
                        "elucidated (EDM) checkpoints")
    p.add_argument("--no_ema", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save_npz", default=None)
    p.add_argument(
        "--return_trajectory", action="store_true",
        help="LDM mode: also decode <=50 intermediate diffusion steps to "
        "grasp poses (the reference's all_diffusion_grasps output)",
    )
    p.add_argument("--visualize", action="store_true")
    p.add_argument(
        "--conditioning",
        default="unconditional",
        choices=["unconditional", "class", "region"],
        help="conditioning mode for task-conditioned models "
             "(reference tools/generate_grasps.py:95-106)",
    )
    p.add_argument("--condition_value", type=float, default=0.0)
    p.add_argument(
        "--cfg_scale", type=float, default=None,
        help="LDM mode: classifier-free guidance weight for conditioned "
        "models trained with cond_dropout (1.0 = plain conditional; > 1 "
        "sharpens adherence to the condition)",
    )
    p.add_argument(
        "--guidance_scale", type=float, default=None,
        help="LDM mode: success-guidance strength — steer sampling uphill "
        "on the decoder's log p(success) in latent space",
    )
    p.add_argument(
        "--classifier_exp", default=None,
        help="experiment dir with a trained classifier/ stage: re-score "
        "every generated grasp with the independent success classifier "
        "(adds classifier_confidence to results and sorts grasps by it)",
    )
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    from graspldm_tpu.inference.runner import InferenceLDM, InferenceVAE

    cls = InferenceVAE if args.mode == "VAE" else InferenceLDM
    runner = cls(
        exp_path=args.exp_path,
        data_root=args.data_root,
        split=args.split,
        use_ema=not args.no_ema,
        num_inference_steps=args.inference_steps,
        sampler=args.sampler,
    )

    infer_kwargs = {}
    if args.return_trajectory and args.mode == "LDM":
        infer_kwargs["return_trajectory"] = True
    if args.conditioning == "class":
        # scalar class label per grasp (metas["mode_cls"] semantics,
        # reference `tools/inference.py:330-364`)
        infer_kwargs["cls_cond"] = float(args.condition_value)
    elif args.conditioning == "region":
        # region id selecting the dataset item's region_points metas
        # (reference `tools/inference.py:366-398`)
        infer_kwargs["region_id"] = int(args.condition_value)
    if args.mode == "LDM":
        if args.cfg_scale is not None:
            infer_kwargs["cfg_scale"] = args.cfg_scale
        if args.guidance_scale is not None:
            infer_kwargs["guidance_scale"] = args.guidance_scale

    scorer = None
    if args.classifier_exp:
        from graspldm_tpu.inference import InferenceClassifier

        scorer = InferenceClassifier(args.classifier_exp)

    rng = np.random.default_rng(args.seed)
    results = []
    for i in range(args.num_samples):
        idx = int(rng.integers(0, len(runner.dataset)))
        res = runner.infer(idx, num_grasps=args.num_grasps,
                           rng=jax.random.PRNGKey(args.seed + i),
                           **infer_kwargs)
        n_conf = float(np.mean(np.asarray(res["confidence"])))
        line = (
            f"sample {i} (dataset idx {idx}): {res['grasps'].shape[1]} grasps, "
            f"mean confidence {n_conf:.3f}"
        )
        if scorer is not None:
            probs = scorer.score_result(res)  # [B, G]
            # rank every per-grasp leaf by the independent classifier
            order = np.argsort(-probs, axis=1)
            g_axis = {"grasps", "grasp_tmrp", "confidence", "qualities",
                      "classifier_confidence"}
            for k in g_axis & set(res):
                if res[k] is not None:
                    res[k] = np.take_along_axis(
                        np.asarray(res[k]),
                        order.reshape(order.shape + (1,) * (np.ndim(res[k]) - 2)),
                        axis=1,
                    )
            line += (
                f", classifier mean {float(probs.mean()):.3f} "
                f"top {float(probs.max()):.3f}"
            )
        print(line)
        results.append(res)

    if args.save_npz:
        np.savez(
            args.save_npz,
            **{
                f"{k}_{i}": np.asarray(v)
                for i, res in enumerate(results)
                for k, v in res.items()
            },
        )
        print(f"saved {args.save_npz}")

    if args.visualize:
        from graspldm_tpu.utils.vis import visualize_pc_grasps

        for res in results:
            visualize_pc_grasps(
                np.asarray(res["pc"][0]),
                np.asarray(res["grasps"][0]),
                np.asarray(res["confidence"][0]),
            )


if __name__ == "__main__":
    main()
