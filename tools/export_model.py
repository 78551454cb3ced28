#!/usr/bin/env python
"""Export a trained experiment as a self-contained AOT program.

Serializes the full generation pipeline (encode -> sample -> decode ->
unnormalize -> 4x4 poses) at fixed serving shapes into one StableHLO
artifact via ``jax.export`` — weights baked in, loadable by any JAX
runtime for the target platform with no model code or config system
(see :mod:`graspldm_tpu.serving.export`). The reference framework has no
equivalent; its serving path re-instantiates torch modules from config +
checkpoint files per process (`/root/reference/tools/inference.py:401-566`).

    python tools/export_model.py --exp_path output/.../cfg --mode LDM \
        --batch 1 --num_grasps 1024 --inference_steps 100 \
        --out grasps_b1_g1024.jaxexp [--platforms tpu] [--no-meta]

Verify a blob without re-exporting:

    python tools/export_model.py --load grasps_b1_g1024.jaxexp
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--exp_path", type=str, help="experiment dir (vae[/ddm])")
    p.add_argument("--mode", type=str, default="LDM", choices=["VAE", "LDM"])
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--num_grasps", type=int, default=1024)
    p.add_argument("--inference_steps", type=int, default=None)
    p.add_argument("--sampler", type=str, default=None)
    p.add_argument("--no_ema", action="store_true")
    p.add_argument(
        "--no-meta", dest="no_meta", action="store_true",
        help="export without the runtime NormalizationMeta argument "
        "(outputs stay in normalized units)",
    )
    p.add_argument(
        "--platforms", type=str, default=None,
        help="comma-separated target platforms (e.g. 'tpu' or 'tpu,cpu'); "
        "default = current backend",
    )
    p.add_argument("--out", type=str, default=None)
    p.add_argument(
        "--load", type=str, default=None,
        help="deserialize an existing artifact and print its signature",
    )
    return p.parse_args()


def main():
    args = parse_args()
    from graspldm_tpu.serving.export import (
        export_program,
        load_exported,
        make_ldm_program,
        make_vae_program,
        save_exported,
    )

    if args.load:
        prog = load_exported(args.load)
        print(f"platforms: {prog.platforms}")
        for a in prog.in_avals:
            print(f"  in: {a}")
        return

    if not args.exp_path:
        raise SystemExit("--exp_path is required unless --load is given")

    from graspldm_tpu.inference import InferenceLDM, InferenceVAE

    common = dict(build_dataset=False, use_ema=not args.no_ema)
    if args.mode == "VAE":
        runner = InferenceVAE(args.exp_path, **common)
        fn = make_vae_program(
            runner.vae, runner.vae_variables,
            num_grasps=args.num_grasps, with_meta=not args.no_meta,
        )
        tag = "vae"
    else:
        runner = InferenceLDM(args.exp_path, **common)
        steps = args.inference_steps or runner.num_inference_steps
        sampler = args.sampler or runner.sampler
        fn = make_ldm_program(
            runner.vae, runner.vae_variables,
            runner.ddm, runner.ddm_variables, runner.diffusion,
            num_grasps=args.num_grasps, num_inference_steps=steps,
            sampler=sampler, with_meta=not args.no_meta,
        )
        tag = f"ldm_{sampler}{steps}"

    N = runner.model_cfg.pc_num_points
    platforms = args.platforms.split(",") if args.platforms else None
    exported = export_program(
        fn, args.batch, N,
        with_meta=not args.no_meta, platforms=platforms,
    )
    out = args.out or os.path.join(
        args.exp_path, f"{tag}_b{args.batch}_g{args.num_grasps}.jaxexp"
    )
    save_exported(exported, out)
    size_mb = os.path.getsize(out) / 1e6
    print(
        f"exported {args.mode} program (B={args.batch}, N={N}, "
        f"G={args.num_grasps}) for {exported.platforms} -> {out} "
        f"({size_mb:.1f} MB)"
    )


if __name__ == "__main__":
    main()
