#!/usr/bin/env python
"""Micro-benchmark: fused Pallas denoiser vs the XLA denoiser on TPU."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from graspldm_tpu.flagship import build_flagship, jit_init
from graspldm_tpu.models.fused_denoiser import DenoiserDims, pack_denoiser_weights
from graspldm_tpu.models.pallas_denoiser import compute_emb_s, fused_denoiser_pallas

DIMS = DenoiserDims(
    seq_len=4, block_channels=(32, 64, 128, 256), groups=4, emb_dim=16,
    cond_channels=3, cond_dim=64, fourier_dim=16,
)


def timeit(f, *args, iters=5):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    BG = int(os.environ.get("BG", 8192))
    R = int(os.environ.get("ROWS", 256))
    vae, ddm, diffusion = build_flagship()
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((BG, 1, 4))
    t0_ = jnp.zeros((BG,), jnp.int32)
    zc = jax.random.normal(rng, (BG, 3, 64))
    dvars = jit_init(ddm, {"params": rng, "dropout": rng}, x0, t0_, zc)
    w = pack_denoiser_weights(dvars, DIMS)
    w16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), w)
    for k in ("fourier_w", "time_w1", "time_b1", "time_w2", "time_b2",
              "input_w", "input_b"):
        w16[k] = w[k]

    f1 = jax.jit(lambda x, e: fused_denoiser_pallas(w16, x, e, DIMS, block_rows=R))
    emb = compute_emb_s(w, t0_, zc)
    dt = timeit(f1, x0, emb)
    print(f"fused single call (BG={BG}, R={R}): {dt*1e3:.3f} ms")

    ref = ddm.apply(dvars, x0 + 0.1, t0_ + 500, zc)
    got = f1(x0 + 0.1, compute_emb_s(w, t0_ + 500, zc))
    print("tpu parity err (bf16):", float(jnp.abs(ref - got).max()))

    def denoise(x, t, z):
        e = compute_emb_s(w, t, zc)
        return fused_denoiser_pallas(w16, x, e, DIMS, block_rows=R)

    g = jax.jit(
        lambda k: diffusion.sample(
            denoise, k, BG, None, num_inference_steps=100, sampler="ddim"
        )[0]
    )
    dt = timeit(g, rng, iters=3)
    print(
        f"fused sampler 100 steps: {dt*1e3:.1f} ms -> grasps/s={BG/dt:.0f}"
    )


if __name__ == "__main__":
    main()
