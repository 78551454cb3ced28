#!/usr/bin/env python
"""Training-step throughput bench (TPU): steps/sec for both stages.

The reference trains through Lightning's host loop (per-step Python +
DataLoader workers); here each stage's step is one jitted program over
device-resident batches. Run on the TPU chip:

    python tools/bench_train.py [--batch-size 10] [--grasps 100] [--iters 40]

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
    p.add_argument("--iters", type=int, default=40)
    p.add_argument("--loop", action="store_true",
                   help="also run the full host loop (dataset -> workers -> "
                   "prefetch -> trainer.fit) on the synthetic fixture")
    p.add_argument("--train-dtype", default=None,
                   help="mixed-precision training: compute dtype of the VAE "
                   "encode stack (e.g. bfloat16); params/losses stay fp32")
    args = p.parse_args()

    from graspldm_tpu.flagship import FlagshipConfig, build_flagship
    from graspldm_tpu.training import (
        build_optimizer,
        init_train_state,
        make_ddm_train_step,
        make_vae_train_step,
    )

    cfg = FlagshipConfig(train_dtype=args.train_dtype)
    vae, ddm, diffusion = build_flagship(cfg)
    tx = build_optimizer(1e-3)
    rng = jax.random.PRNGKey(0)
    B, G, N = args.batch_size, args.grasps, args.points
    pc = jax.random.normal(rng, (B, N, 3))
    grasps = jax.random.normal(rng, (B, G, 7))
    batch = {"pc": pc, "grasps": grasps}

    results = {"B": B, "G": G, "N": N}
    if args.train_dtype:
        results["train_dtype"] = args.train_dtype

    t0 = time.perf_counter()
    vae_state = init_train_state(
        vae, tx, rng, (pc, grasps.reshape(-1, 7)), {"rng": rng}
    )
    results["vae_init_s"] = round(time.perf_counter() - t0, 2)

    # timing note: the final sync is float(loss) — an actual D2H
    # materialization — NOT block_until_ready, which can return early
    # through the remote-chip tunnel and inflate rates several-fold
    # (observed 7.6 "ms/step" for a true 24.7 ms step). The one ~30 ms
    # sync round trip biases the mean by <= 30/iters ms.
    vae_step = jax.jit(make_vae_train_step(vae, tx), donate_argnums=0)
    t0 = time.perf_counter()
    vae_state, m = vae_step(vae_state, batch, rng)
    float(m["loss"])
    results["vae_compile_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        vae_state, m = vae_step(vae_state, batch, rng)
    float(m["loss"])
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
    float(m["loss"])
    results["ddm_compile_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        ddm_state, m = ddm_step(ddm_state, batch, rng, frozen)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / args.iters
    results["ddm_steps_per_sec"] = round(1.0 / dt, 2)
    results["ddm_ms_per_step"] = round(dt * 1e3, 2)

    if args.loop:
        results.update(bench_host_loop(args))

    print(json.dumps(results, indent=1))
    # mixed-precision runs get their own artifact so the fp32 baseline
    # numbers are never silently overwritten
    out_path = (
        f"TRAIN_BENCH_{args.train_dtype.upper()}.json"
        if args.train_dtype
        else "TRAIN_BENCH.json"
    )
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)


def bench_host_loop(args):
    """Full host training loop (dataset -> worker pool -> prefetch ->
    trainer.fit) on the synthetic fixture, vs the pure jitted-step rate.

    The loop rate should approach the honest jitted rate: batch assembly
    hides behind the device step (worker thread), and the K-steps-per-
    dispatch variant amortizes the per-call host overhead (device_put +
    dispatch + the tunnel's ~30 ms sync cost at each log boundary).
    """
    import tempfile
    import jax as _jax
    import numpy as np

    from graspldm_tpu.data import AcronymShapenetPointclouds, make_synthetic_acronym
    from graspldm_tpu.flagship import FlagshipConfig
    from graspldm_tpu.parallel import BatchWorkerPool, prefetch_to_device
    from graspldm_tpu.training.experiment import Experiment
    from graspldm_tpu.training.trainer import GraspGenerationTrainer

    tmp = tempfile.mkdtemp(prefix="bench_train_")
    root = make_synthetic_acronym(os.path.join(tmp, "acr"))
    ds = AcronymShapenetPointclouds(
        data_root_dir=root, split="train",
        batch_num_points_per_pc=args.points,
        batch_num_grasps_per_pc=args.grasps,
        min_num_grasps=4, num_repeat_dataset=50,
    )
    cfg = FlagshipConfig()
    exp = Experiment(os.path.join(tmp, "out"), "bench", "vae")
    trainer = GraspGenerationTrainer(
        experiment=exp, model_cfg=cfg, stage="vae",
        log_every=20, ckpt_every=10_000,
    )
    state = trainer.init_state(
        _jax.random.PRNGKey(0), next(ds.batches(args.batch_size))
    )

    def make_iter(wid, n):
        d = ds if n == 1 else ds.worker_copy(wid)
        while True:
            for b in d.batches(args.batch_size):
                yield {"pc": b["pc"], "grasps": b["grasps"]}

    # warm-up fit: compiles the trainer's own step trace outside the timing
    with BatchWorkerPool(make_iter, num_workers=1) as pool:
        state = trainer.fit(
            state, prefetch_to_device(pool, size=2), int(state.step) + 2,
            _jax.random.PRNGKey(1),
        )

    # rate source: the trainer's own inter-log windows (metrics.jsonl),
    # which exclude the end-of-fit checkpoint save — wall-clock over the
    # whole fit() would bill one full Orbax save against the steps
    def logged_rates():
        path = os.path.join(exp.log_dir, "metrics.jsonl")
        with open(path) as f:
            return [
                json.loads(line)["steps_per_sec"]
                for line in f
                if "steps_per_sec" in line
            ]

    out = {}
    for workers in (1, 2):
        seen = len(logged_rates())
        with BatchWorkerPool(make_iter, num_workers=workers) as pool:
            batches = prefetch_to_device(pool, size=2)
            state = trainer.fit(
                state, batches, int(state.step) + 100,
                _jax.random.PRNGKey(1),
            )
        rates = logged_rates()[seen:]
        rates = [r for r in rates if r < 1e6][1:]  # drop the step-1 record
        out[f"vae_loop_steps_per_sec_{workers}w"] = round(
            float(np.mean(rates)), 2
        )

    # K-steps-per-dispatch loop (trainer steps_per_dispatch): one stacked
    # transfer + one lax.scan dispatch per K steps — amortizes the
    # per-call host overhead; the loop rate should match the honest
    # jitted-step rate (vae_steps_per_sec above) within a few percent
    from graspldm_tpu.parallel import stack_batches

    for K in (8,):
        trainer_k = GraspGenerationTrainer(
            experiment=exp, model_cfg=cfg, stage="vae",
            log_every=20, ckpt_every=10_000, steps_per_dispatch=K,
        )
        with BatchWorkerPool(make_iter, num_workers=1) as pool:
            batches = prefetch_to_device(
                stack_batches(pool, K), size=2, chunked=True
            )
            # warm-up (compile) outside the timing
            state = trainer_k.fit(
                state, batches, int(state.step) + K,
                _jax.random.PRNGKey(1),
            )
            seen = len(logged_rates())
            state = trainer_k.fit(
                state, batches, int(state.step) + 96,
                _jax.random.PRNGKey(1),
            )
        rates = logged_rates()[seen:]
        rates = [r for r in rates if r < 1e6][1:]
        out[f"vae_loop_steps_per_sec_chunk{K}"] = round(
            float(np.mean(rates)), 2
        )
    # producer-only rate: how fast the host can assemble batches at all
    t0 = time.perf_counter()
    n = 0
    for b in ds.batches(args.batch_size):
        n += 1
        if n >= 30:
            break
    out["host_batches_per_sec"] = round(n / (time.perf_counter() - t0), 2)
    return out


if __name__ == "__main__":
    main()
