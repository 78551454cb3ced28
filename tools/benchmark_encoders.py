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
    p.add_argument("--report", default=None, metavar="DIR",
                   help="write report.md + results.csv (+ latency/"
                   "throughput plots when matplotlib is available) to DIR "
                   "— the reference harness's report artifacts "
                   "(`ext/pvcnn/benchmark.py:157,360`)")
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
        _write_csv(args.csv, rows)
    if args.report:
        write_report(args.report, rows, args)


def _write_csv(path, rows):
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {path}")


def write_report(out_dir, rows, args):
    """Markdown + CSV (+ plots) report directory, mirroring the reference
    harness's artifacts (`ext/pvcnn/benchmark.py` writes markdown/CSV/plots
    to `doc/pc_encoder_benchmark_results/`)."""
    os.makedirs(out_dir, exist_ok=True)
    _write_csv(os.path.join(out_dir, "results.csv"), rows)

    dev = jax.devices()[0]
    cols = ["model", "batch_size", "n_points", "avg_ms", "p50_ms",
            "p95_ms", "p99_ms", "samples_per_s"]
    lines = [
        "# Point-cloud encoder benchmark",
        "",
        f"Device: `{dev.device_kind}` ({dev.platform}) — "
        f"{args.warmup} warmup + {args.iters} timed iterations per point, "
        "materialized-read syncs.",
        "",
        "| " + " | ".join(cols) + " |",
        "|" + "|".join("---" for _ in cols) + "|",
    ]
    for r in rows:
        lines.append(
            "| " + " | ".join(
                f"{r[c]:.2f}" if isinstance(r[c], float) else str(r[c])
                for c in cols
            ) + " |"
        )
    md = os.path.join(out_dir, "report.md")
    with open(md, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {md}")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib unavailable; skipping plots")
        return
    models = sorted({r["model"] for r in rows})
    for metric, ylabel, fname in (
        ("avg_ms", "latency (ms, avg)", "latency.png"),
        ("samples_per_s", "throughput (samples/s)", "throughput.png"),
    ):
        fig, ax = plt.subplots(figsize=(6, 4))
        for m in models:
            pts = [(r["batch_size"], r[metric]) for r in rows
                   if r["model"] == m]
            ax.plot(*zip(*sorted(pts)), marker="o", label=m)
        ax.set_xscale("log", base=2)
        ax.set_yscale("log")
        ax.set_xlabel("batch size")
        ax.set_ylabel(ylabel)
        ax.legend()
        ax.grid(True, which="both", alpha=0.3)
        fig.tight_layout()
        path = os.path.join(out_dir, fname)
        fig.savefig(path, dpi=120)
        plt.close(fig)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
