#!/usr/bin/env python
"""Point-cloud encoder micro-benchmark.

Rebuild of the reference benchmark harness
(`grasp_ldm/models/modules/ext/pvcnn/benchmark.py:60-360`): PVCNN vs PVCNN2
across batch sizes [1, 4, 16, 64, 256] x 1024 points, 20 warmup + 100 timed
iterations, reporting avg/p50/p95/p99 latency (ms) and throughput
(samples/s). Timing uses materialized-read syncs (the XLA equivalent of
CUDA events); results go to stdout and an optional CSV.
"""

from __future__ import annotations

import argparse
import csv
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench_model(name, apply_fn, variables, batch_sizes, n_points, warmup, iters):
    rows = []
    for bs in batch_sizes:
        x = jax.random.normal(jax.random.PRNGKey(0), (bs, n_points, 3))
        from graspldm_tpu.utils.profiling import materialize

        fn = jax.jit(lambda v, x: apply_fn(v, x))
        out = fn(variables, x)
        materialize(out)
        for _ in range(warmup):
            out = fn(variables, x)
        materialize(out)

        # per-iteration latency incl. one sync round trip (materialized
        # read — block_until_ready can return early through the tunnel)
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn(variables, x)
            materialize(out)
            times.append((time.perf_counter() - t0) * 1e3)
        times = np.asarray(times)
        row = {
            "model": name,
            "batch_size": bs,
            "n_points": n_points,
            "avg_ms": float(times.mean()),
            "p50_ms": float(np.percentile(times, 50)),
            "p95_ms": float(np.percentile(times, 95)),
            "p99_ms": float(np.percentile(times, 99)),
            "samples_per_s": float(bs / (times.mean() / 1e3)),
        }
        rows.append(row)
        print(
            f"{name:10s} bs={bs:4d}: avg {row['avg_ms']:8.2f} ms  "
            f"p95 {row['p95_ms']:8.2f} ms  {row['samples_per_s']:10.1f} samples/s"
        )
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--models", nargs="+", default=["pvcnn"],
                   choices=["pvcnn", "pvcnn2"])
    p.add_argument("--batch-sizes", nargs="+", type=int,
                   default=[1, 4, 16, 64, 256])
    p.add_argument("--n-points", type=int, default=1024)
    p.add_argument("--warmup", type=int, default=20)
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--csv", default=None)
    args = p.parse_args()

    from graspldm_tpu.models.pvcnn import PVCNNEncoder
    from graspldm_tpu.models.pvcnn2 import PVCNN2Encoder

    rng = jax.random.PRNGKey(0)
    rows = []
    x0 = jax.random.normal(rng, (1, args.n_points, 3))

    if "pvcnn" in args.models:
        enc = PVCNNEncoder(
            out_features=64, n_points=args.n_points,
            scale_channels=0.75, scale_voxel_resolution=0.75, out_channels=3,
        )
        variables = jax.jit(lambda r: enc.init({"params": r}, x0))(rng)
        rows += bench_model(
            "PVCNN", lambda v, x: enc.apply(v, x), variables,
            args.batch_sizes, args.n_points, args.warmup, args.iters,
        )

    if "pvcnn2" in args.models:
        enc2 = PVCNN2Encoder(out_features=64, n_points=args.n_points, out_channels=3)
        variables2 = jax.jit(lambda r: enc2.init({"params": r}, x0))(rng)
        rows += bench_model(
            "PVCNN2", lambda v, x: enc2.apply(v, x), variables2,
            args.batch_sizes, args.n_points, args.warmup, args.iters,
        )

    if args.csv:
        with open(args.csv, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)
        print(f"wrote {args.csv}")


if __name__ == "__main__":
    main()
