#!/usr/bin/env python
"""Micro-bench: XLA formulations of the L=16 linear attention.

The z16 hybrid path (stacked_pallas._use_xla_attention) runs attention in
XLA between the stage kernels. The einsum form measured ~3.5 ms/stage at
BG=8192 (batched [16,32] matmuls lower terribly); this script compares
exact alternatives to pick the production form:

  einsum  — `_attention_stacked` (interleaved packed weights)
  mloop   — the kernel's pooling-matmul score path, in XLA (dense
            [BG, L*hd] matmuls; XLA fuses the broadcasts/elementwise)
  ctx     — flax association q (k^T v) via einsums
  flax    — LinearAttention1D module apply (reference lowering)

    python tools/bench_attn.py [BG] [--C 64]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


# honest timing: materialized syncs (block_until_ready can return early
# through the chip tunnel — see graspldm_tpu.utils.profiling.timeit)
from graspldm_tpu.utils.profiling import timeit  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("BG", nargs="?", type=int, default=8192)
    ap.add_argument("--C", type=int, default=64)
    args = ap.parse_args()

    from graspldm_tpu.models.fused_denoiser import DenoiserDims
    from graspldm_tpu.models.stacked_denoiser import _attention_stacked
    from graspldm_tpu.models import stacked_pallas as sp

    L, C, H, D = 16, args.C, 4, 32
    hd = H * D
    dims = DenoiserDims(
        seq_len=L, block_channels=(C,), groups=4, emb_dim=64,
        cond_channels=3, cond_dim=256, fourier_dim=16, heads=H, dim_head=D,
    )
    key = jax.random.PRNGKey(0)
    BG = args.BG
    x = (jax.random.normal(key, (BG, L * C)) * 0.1).astype(jnp.bfloat16)

    rngs = jax.random.split(key, 8)
    qkv = jax.random.normal(rngs[0], (C, 3 * hd)) * 0.05
    wo = jax.random.normal(rngs[1], (hd, C)) * 0.05
    norm_g = jnp.ones((C,))
    out_g = jnp.ones((C,))

    # packed interleaved weights (pack_stacked_weights layout)
    from graspldm_tpu.models.stacked_denoiser import pack_stacked_weights  # noqa

    w = {}
    Wq = jnp.zeros((L * C, H * L * D))
    Wk = jnp.zeros((L * C, H * D * L))
    Wv = jnp.zeros((L * C, H * L * D))
    for l in range(L):
        rows = slice(l * C, (l + 1) * C)
        for h in range(H):
            src_q = qkv[:, h * D : (h + 1) * D]
            src_k = qkv[:, hd + h * D : hd + (h + 1) * D]
            src_v = qkv[:, 2 * hd + h * D : 2 * hd + (h + 1) * D]
            Wq = Wq.at[rows, (h * L + l) * D : (h * L + l + 1) * D].set(src_q)
            Wv = Wv.at[rows, (h * L + l) * D : (h * L + l + 1) * D].set(src_v)
            col0 = h * D * L
            Wk = Wk.at[rows, col0 + l : col0 + D * L : L].set(src_k)
    Wo = jnp.zeros((H * L * D, L * C))
    for h in range(H):
        for l in range(L):
            Wo = Wo.at[
                (h * L + l) * D : (h * L + l + 1) * D, l * C : (l + 1) * C
            ].set(wo[h * D : (h + 1) * D, :])
    i = 0
    w[f"b{i}_Wq"] = Wq.astype(jnp.bfloat16)
    w[f"b{i}_Wk"] = Wk.astype(jnp.bfloat16)
    w[f"b{i}_Wv"] = Wv.astype(jnp.bfloat16)
    w[f"b{i}_Wo"] = Wo.astype(jnp.bfloat16)
    w[f"b{i}_Wo_b"] = jnp.tile(jnp.zeros((C,)), L).astype(jnp.bfloat16)
    w[f"b{i}_norm_g_t"] = jnp.tile(norm_g, L).astype(jnp.bfloat16)
    w[f"b{i}_out_g_t"] = jnp.tile(out_g, L).astype(jnp.bfloat16)

    def chain(attn_fn):
        @jax.jit
        def f(x0):
            def body(h, _):
                y = attn_fn(h)
                return y.astype(h.dtype), None

            h, _ = jax.lax.scan(body, x0, None, length=20)
            return h

        return f

    # --- einsum (production _attention_stacked) ---
    t = timeit(chain(lambda h: _attention_stacked(h, w, 0, dims)), x) / 20
    print(f"einsum : {t * 1e3:.3f} ms/stage")

    # --- ctx association: q (k^T v), einsum ---
    def _ln(xx, g_tiled):
        xg = xx.reshape(-1, L, C)
        mean = jnp.mean(xg, axis=-1, keepdims=True, dtype=jnp.float32)
        var = jnp.mean(
            xg.astype(jnp.float32) ** 2, axis=-1, keepdims=True
        ) - mean**2
        inv = jax.lax.rsqrt(jnp.maximum(var, 0.0) + 1e-5).astype(xx.dtype)
        return ((xg - mean.astype(xx.dtype)) * inv).reshape(xx.shape) * g_tiled

    qkv_b = qkv.astype(jnp.bfloat16)
    wo_b = wo.astype(jnp.bfloat16)

    def attn_ctx(h):
        normed = _ln(h, w["b0_norm_g_t"])
        p = normed.reshape(-1, L, C) @ qkv_b  # [R, L, 3hd]
        p = p.reshape(-1, L, 3, H, D)
        q, k, v = p[:, :, 0], p[:, :, 1], p[:, :, 2]  # [R, L, H, D]
        q = jax.nn.softmax(q, axis=-1) * (D**-0.5)
        k = jax.nn.softmax(k, axis=1)  # over L
        ctx = jnp.einsum("rmhd,rmhe->rhde", k, v)
        out = jnp.einsum("rlhd,rhde->rlhe", q, ctx)
        out = out.reshape(-1, L, hd) @ wo_b
        out = _ln(out.reshape(h.shape), w["b0_out_g_t"])
        return h + out

    t = timeit(chain(attn_ctx), x) / 20
    print(f"ctx    : {t * 1e3:.3f} ms/stage")

    # --- mloop pooling in XLA (dense [BG, L*hd] matmuls) ---
    blkq = jax.scipy.linalg.block_diag(*([qkv[:, :hd]] * L)).astype(jnp.bfloat16)
    blkk = jax.scipy.linalg.block_diag(*([qkv[:, hd:2*hd]] * L)).astype(jnp.bfloat16)
    blkv = jax.scipy.linalg.block_diag(*([qkv[:, 2*hd:]] * L)).astype(jnp.bfloat16)
    blko = jax.scipy.linalg.block_diag(*([wo] * L)).astype(jnp.bfloat16)
    qp_np = np.zeros((L * hd, L * H), np.float32)
    qb_np = np.zeros((L * H, L * hd), np.float32)
    for l in range(L):
        for hh in range(H):
            cols = slice(l * hd + hh * D, l * hd + (hh + 1) * D)
            qp_np[cols, l * H + hh] = 1.0
            qb_np[l * H + hh, cols] = 1.0
    qp = jnp.asarray(qp_np, jnp.bfloat16)
    qb = jnp.asarray(qb_np, jnp.bfloat16)

    def attn_mloop(h):
        normed = _ln(h, w["b0_norm_g_t"])
        q = (normed @ blkq).astype(jnp.float32)
        k = (normed @ blkk).astype(jnp.float32)
        v = normed @ blkv
        qmax = jnp.max(q, axis=-1, keepdims=True)
        qe = jnp.exp(q - qmax)
        qs = (qe @ qp.astype(jnp.float32)) @ qb.astype(jnp.float32)
        qn = ((qe / qs) * (D**-0.5)).astype(h.dtype)
        kr = k.reshape(-1, L, hd)
        kmax = jnp.max(kr, axis=1, keepdims=True)
        ke = jnp.exp(kr - kmax)
        kn = (ke / jnp.sum(ke, axis=1, keepdims=True)).astype(h.dtype)
        out = None
        for m in range(L):
            km = jnp.tile(kn[:, m], (1, L))
            s = ((qn * km) @ qp).astype(h.dtype)
            sb = (s @ qb).astype(h.dtype)
            term = sb * jnp.tile(v[:, m * hd : (m + 1) * hd], (1, L))
            out = term if out is None else out + term
        out = out @ blko + w["b0_Wo_b"]
        out = _ln(out, w["b0_out_g_t"])
        return h + out

    t = timeit(chain(attn_mloop), x) / 20
    print(f"mloop  : {t * 1e3:.3f} ms/stage")


if __name__ == "__main__":
    main()
