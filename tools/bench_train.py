#!/usr/bin/env python
"""Training-step throughput bench (TPU): steps/sec for both stages.

The reference trains through Lightning's host loop (per-step Python +
DataLoader workers); here each stage's step is one jitted program over
device-resident batches. Run on the TPU chip:

    python tools/bench_train.py [--batch-size 10] [--grasps 100] [--iters 20]

Appends results to TRAIN_BENCH.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=10)
    p.add_argument("--grasps", type=int, default=100)
    p.add_argument("--points", type=int, default=1024)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    from graspldm_tpu.flagship import FlagshipConfig, build_flagship
    from graspldm_tpu.training import (
        build_optimizer,
        init_train_state,
        make_ddm_train_step,
        make_vae_train_step,
    )

    cfg = FlagshipConfig()
    vae, ddm, diffusion = build_flagship(cfg)
    tx = build_optimizer(1e-3)
    rng = jax.random.PRNGKey(0)
    B, G, N = args.batch_size, args.grasps, args.points
    pc = jax.random.normal(rng, (B, N, 3))
    grasps = jax.random.normal(rng, (B, G, 7))
    batch = {"pc": pc, "grasps": grasps}

    results = {"B": B, "G": G, "N": N}

    t0 = time.perf_counter()
    vae_state = init_train_state(
        vae, tx, rng, (pc, grasps.reshape(-1, 7)), {"rng": rng}
    )
    results["vae_init_s"] = round(time.perf_counter() - t0, 2)

    vae_step = jax.jit(make_vae_train_step(vae, tx), donate_argnums=0)
    t0 = time.perf_counter()
    vae_state, m = vae_step(vae_state, batch, rng)
    jax.block_until_ready(m["loss"])
    results["vae_compile_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        vae_state, m = vae_step(vae_state, batch, rng)
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / args.iters
    results["vae_steps_per_sec"] = round(1.0 / dt, 2)
    results["vae_ms_per_step"] = round(dt * 1e3, 2)

    frozen = {"params": vae_state.params}
    if vae_state.batch_stats is not None:
        frozen["batch_stats"] = vae_state.batch_stats
    x = jnp.zeros((B * G, 1, cfg.grasp_latent_size))
    t = jnp.zeros((B * G,), jnp.int32)
    zc = jnp.zeros((B * G, cfg.pc_latent_channels, cfg.pc_latent_size))
    ddm_state = init_train_state(ddm, tx, rng, (x, t, zc))
    ddm_step = jax.jit(
        make_ddm_train_step(vae, ddm, diffusion, tx), donate_argnums=0
    )
    t0 = time.perf_counter()
    ddm_state, m = ddm_step(ddm_state, batch, rng, frozen)
    jax.block_until_ready(m["loss"])
    results["ddm_compile_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        ddm_state, m = ddm_step(ddm_state, batch, rng, frozen)
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / args.iters
    results["ddm_steps_per_sec"] = round(1.0 / dt, 2)
    results["ddm_ms_per_step"] = round(dt * 1e3, 2)

    print(json.dumps(results, indent=1))
    with open("TRAIN_BENCH.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
