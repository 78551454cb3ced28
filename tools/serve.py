#!/usr/bin/env python
"""Grasp-generation HTTP service.

Loads a trained experiment (same layout as tools/generate_grasps.py) and
serves it with dynamic request batching: concurrent requests coalesce into
one fixed-bucket TPU program per batch (graspldm_tpu/serving).

Usage:
    python tools/serve.py --exp_path output/fpc_1a_latentc3_z4_pc64_180k \
        --mode LDM --port 8421 --num_grasps 64 --max_batch 8

    curl -s localhost:8421/v1/generate -d \
        '{"points": [[0.01, 0.0, 0.02], ...], "num_grasps": 16}'

The reference framework stops at a per-object CLI loop; this serving
surface is rebuild-side production infrastructure (SURVEY.md §1 layer 1).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Serve 6-DoF grasp generation")
    p.add_argument("--exp_path", required=True, help="experiment directory")
    p.add_argument("--mode", default="LDM", choices=["VAE", "LDM"])
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8421)
    p.add_argument("--num_grasps", type=int, default=64,
                   help="grasps generated per object (requests may ask less)")
    p.add_argument("--inference_steps", type=int, default=100)
    p.add_argument("--sampler", default="ddim",
                   choices=["ddim", "ddpm", "dpmpp", "churn"])
    p.add_argument("--max_batch", type=int, default=8)
    p.add_argument("--max_wait_ms", type=float, default=5.0)
    p.add_argument("--no_ema", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no_warmup", action="store_true",
                   help="skip pre-compiling the batch buckets at startup")
    p.add_argument("--verbose", action="store_true")
    return p.parse_args()


def main():
    args = parse_args()
    from graspldm_tpu.inference import InferenceLDM, InferenceVAE
    from graspldm_tpu.serving import (
        DynamicBatcher,
        GraspServer,
        make_batch_generate,
    )

    cls = InferenceLDM if args.mode == "LDM" else InferenceVAE
    infer = cls(
        args.exp_path,
        use_ema=not args.no_ema,
        num_inference_steps=args.inference_steps,
        sampler=args.sampler,
        build_dataset=False,
    )
    num_points = infer.model_cfg.pc_num_points
    batch_generate = make_batch_generate(
        infer, num_grasps=args.num_grasps, seed=args.seed
    )
    batcher = DynamicBatcher(
        batch_generate,
        num_points=num_points,
        max_batch=args.max_batch,
        max_wait_ms=args.max_wait_ms,
        requires_cls=(infer.model_cfg.conditioning == "class"),
    )
    if not args.no_warmup:
        # compile every bucket up front so the first requests don't stall
        for b in batcher.buckets:
            t0 = time.perf_counter()
            pcs = np.random.default_rng(0).normal(
                scale=0.05, size=(b, num_points, 3)
            ).astype(np.float32)
            cls_arr = (
                np.zeros((b,), np.float32)
                if infer.model_cfg.conditioning == "class"
                else None
            )
            batch_generate(pcs, cls_arr)
            print(f"warmup bucket B={b}: {time.perf_counter() - t0:.1f}s")

    server = GraspServer(
        batcher,
        host=args.host,
        port=args.port,
        info={
            "mode": args.mode,
            "num_grasps": args.num_grasps,
            "num_points": num_points,
            "sampler": infer.sampler,
            "inference_steps": infer.num_inference_steps,
            "conditioning": infer.model_cfg.conditioning,
        },
        verbose=args.verbose,
    )
    print(
        f"serving {args.mode} on http://{args.host}:{args.port} "
        f"(G={args.num_grasps}, N={num_points}, max_batch={args.max_batch})"
    )
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
