#!/usr/bin/env python
"""Micro-bench: the 100-step DDIM sampler, unfused vs kernels-only.

Compares three lowerings of the SAME sampler math at flagship dims:
  * scan    — `GaussianDiffusion1D.sample` over the per-stage Pallas
              denoiser (the pre-fused production path: ~10 XLA glue ops
              per step for time-emb / init matmul / scheduler update);
  * fused   — `pallas_sampler.fused_sample` (zero XLA ops per step,
              n_stages+1 launches);
  * fused1  — fused_sample(fuse_stages=True) (ONE launch per step).

    python tools/bench_sampler.py [BG] [--z16] [--steps N]
    python tools/bench_sampler.py [BG] --sampler dpmpp   # EDM DPM++(2M), 32 steps
    python tools/bench_sampler.py [BG] --sampler churn   # EDM stochastic Heun
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from graspldm_tpu.utils.profiling import timeit  # noqa: E402


def main():
    from graspldm_tpu.diffusion import GaussianDiffusion1D
    from graspldm_tpu.diffusion.schedules import DiffusionSchedule
    from graspldm_tpu.models import GraspLatentDDM
    from graspldm_tpu.models.fused_denoiser import DenoiserDims
    from graspldm_tpu.models.pallas_sampler import fused_sample
    from graspldm_tpu.models.stacked_denoiser import compute_input_emb
    from graspldm_tpu.models.stacked_pallas import (
        pack_pallas_weights,
        stacked_denoiser_pallas_apply,
    )

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    BG = int(args[0]) if args else 8192
    z16 = "--z16" in sys.argv
    steps = (
        int(sys.argv[sys.argv.index("--steps") + 1])
        if "--steps" in sys.argv
        else 100
    )
    rows = (
        int(sys.argv[sys.argv.index("--rows") + 1])
        if "--rows" in sys.argv
        else 512
    )
    sampler = (
        sys.argv[sys.argv.index("--sampler") + 1]
        if "--sampler" in sys.argv
        else "ddim"
    )
    L, cond = (16, 256) if z16 else (4, 64)
    dims = DenoiserDims(
        seq_len=L, block_channels=(32, 64, 128, 256), groups=4,
        emb_dim=L * 4, cond_channels=3, cond_dim=cond, fourier_dim=16,
    )
    ddm = GraspLatentDDM(
        dropout=None, dtype=jnp.bfloat16, latent_in_features=L,
        pc_latent_size=cond,
    )
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 1, L))
    t = jnp.zeros((2,), jnp.int32)
    zc_s = jax.random.normal(jax.random.PRNGKey(1), (2, 3, cond))
    variables = jax.jit(ddm.init)({"params": key}, x, t, zc_s)

    schedule = DiffusionSchedule.create(
        num_steps=1000, beta_start=5e-5, beta_end=1e-3
    )
    diff = GaussianDiffusion1D(schedule=schedule, n_dims=L)
    w = pack_pallas_weights(variables, dims, dtype=jnp.bfloat16)
    zc = jax.random.normal(jax.random.PRNGKey(2), (BG, 3, cond))
    ie = jax.jit(lambda z: compute_input_emb(w, z))(zc)

    if sampler in ("dpmpp", "churn"):
        _run_edm(sampler, w, dims, zc, ie, BG, steps, rows)
        return

    @jax.jit
    def run_scan(ie, key):
        def denoise(x, t, z):
            return stacked_denoiser_pallas_apply(
                w, x, t, z, dims, block_rows=rows, input_emb=ie
            )

        x0, _ = diff.sample(
            denoise, key, batch_size=BG, z_cond=zc,
            num_inference_steps=steps, sampler="ddim",
        )
        return x0

    @jax.jit
    def run_fused(ie, key):
        x0, _ = fused_sample(
            w, dims, schedule, ie, key, batch_size=BG,
            num_inference_steps=steps, sampler="ddim", block_rows=rows,
            fuse_stages=False, fuse_scan=False,
        )
        return x0

    @jax.jit
    def run_fused1(ie, key):
        x0, _ = fused_sample(
            w, dims, schedule, ie, key, batch_size=BG,
            num_inference_steps=steps, sampler="ddim", block_rows=rows,
            fuse_stages=True, fuse_scan=False,
        )
        return x0

    @jax.jit
    def run_mega(ie, key):
        x0, _ = fused_sample(
            w, dims, schedule, ie, key, batch_size=BG,
            num_inference_steps=steps, sampler="ddim", block_rows=rows,
            fuse_scan=True,
        )
        return x0

    variants = [("scan", run_scan), ("fused", run_fused)]
    if os.environ.get("GRASPLDM_BENCH_FUSE1", "1") != "0":
        variants.append(("fused1", run_fused1))
    if "--mega" in sys.argv:
        variants.append(("mega", run_mega))
    _time_variants(variants, ie, steps, BG)


def _time_variants(variants, ie, steps, BG):
    if "--only" in sys.argv:
        keep = sys.argv[sys.argv.index("--only") + 1].split(",")
        variants = [v for v in variants if v[0] in keep]
    for name, fn in variants:
        try:
            s = timeit(lambda k: fn(ie, k), jax.random.PRNGKey(3), iters=5)
        except Exception as e:  # fused1 may exceed VMEM at some dims
            print(f"{name:7s} FAILED: {type(e).__name__}: {str(e)[:200]}")
            continue
        print(
            f"{name:7s} {s * 1e3:8.2f} ms / {steps} steps "
            f"({s * 1e3 / steps:6.3f} ms/step, BG={BG}, "
            f"{BG / s:9.1f} latents/s)"
        )


def _run_edm(sampler, w, dims, zc, ie, BG, steps, rows):
    """EDM samplers (DPM++(2M) / stochastic churn): scan vs fused lowerings.

    `--steps` defaults to 100 for DDIM; the reference wires 32 for DPM++
    (`tools/inference.py:472-477`), so pass `--steps 32` to match headline
    protocol.
    """
    from graspldm_tpu.diffusion import ElucidatedDiffusion
    from graspldm_tpu.models.pallas_sampler import (
        fused_sample_churn,
        fused_sample_dpmpp,
    )
    from graspldm_tpu.models.stacked_pallas import (
        stacked_denoiser_pallas_apply,
    )

    ed = ElucidatedDiffusion(n_dims=dims.seq_len)
    fused_fn = fused_sample_dpmpp if sampler == "dpmpp" else fused_sample_churn

    @jax.jit
    def run_scan(ie, key):
        def denoise(x, t, z):
            return stacked_denoiser_pallas_apply(
                w, x, t, z, dims, block_rows=rows, input_emb=ie
            )

        x0, _ = ed.sample(
            denoise, key, batch_size=BG, z_cond=zc, num_sample_steps=steps,
            use_dpmpp=(sampler == "dpmpp"),
        )
        return x0

    def _fused(fuse_stages, fuse_scan):
        @jax.jit
        def run(ie, key):
            x0, _ = fused_fn(
                w, dims, ed, ie, key, batch_size=BG, num_sample_steps=steps,
                block_rows=rows, fuse_stages=fuse_stages, fuse_scan=fuse_scan,
            )
            return x0

        return run

    variants = [
        ("scan", run_scan),
        ("fused", _fused(False, False)),
        ("fused1", _fused(True, False)),
        ("mega", _fused(None, True)),
    ]
    _time_variants(variants, ie, steps, BG)


if __name__ == "__main__":
    main()
