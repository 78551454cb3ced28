#!/usr/bin/env python
"""Micro-bench: per-stage Pallas denoiser kernels on the TPU chip.

Times the dependent 20-step chain (the sampler's access pattern) for the
Pallas path and, with --stages, each stage kernel in isolation. Use this to
iterate on kernel op-count work (NEXT.md round-3 item 1).

    python tools/bench_pallas.py [BG] [--stages] [--attn mloop|pairs]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


# honest timing: materialized syncs (block_until_ready can return early
# through the chip tunnel — see graspldm_tpu.utils.profiling.timeit)
from graspldm_tpu.utils.profiling import timeit  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("BG", nargs="?", type=int, default=8192)
    ap.add_argument("--stages", action="store_true")
    ap.add_argument(
        "--attn", default=None, choices=["mloop", "lloop", "pairs", "opt"]
    )
    ap.add_argument("--block-rows", type=int, default=512)
    ap.add_argument("--row-split", type=int, default=1)
    ap.add_argument(
        "--no-flax", action="store_true",
        help="skip the flax-lowering baseline chain (slow compile)",
    )
    ap.add_argument(
        "--z16", action="store_true",
        help="partial-pc flagship dims (L=16, pc_latent 256): times the "
        "flax lowering vs the generic-L sliced-conv Pallas kernels",
    )
    ap.add_argument("--fuse", action="store_true")
    ap.add_argument(
        "--floor", action="store_true",
        help="matmuls only (norms/silu/attention-softmax stripped): the "
        "in-kernel MXU floor; output is numerically WRONG",
    )
    ap.add_argument(
        "--glue", action="store_true",
        help="replace ALL pallas launches with a trivial [BG, L] map: "
        "measures the per-step XLA glue (emb, init matmul, pad, sampler "
        "update) around the kernels",
    )
    args = ap.parse_args()

    from graspldm_tpu.models import GraspLatentDDM
    from graspldm_tpu.models.stacked_denoiser import (
        FLAGSHIP_DIMS,
        compute_input_emb,
    )
    from graspldm_tpu.models import stacked_pallas as sp

    if args.attn is not None:
        sp.ATTN_IMPL = args.attn
    sp.ROW_SPLIT = args.row_split

    if args.floor:
        # strip every non-matmul: measures the MXU-only cost of the kernels
        sp._norm_apply_k = (
            lambda x, shift, pool, bcast_s, eps=1e-5: x
        )
        sp._silu_f32 = lambda x: x

        def attn_floor(x, g, i, L, C, H, D):
            if f"b{i}_Wq_c" in g:  # sliced stages pack compact projections
                q = sp._dense_per_l_k(x, g[f"b{i}_Wq_c"], L, C, x.dtype)
                k = sp._dense_per_l_k(x, g[f"b{i}_Wk_c"], L, C, x.dtype)
                v = sp._dense_per_l_k(x, g[f"b{i}_Wv_c"], L, C, x.dtype)
            elif f"b{i}_Wq_g" in g:  # grouped block-diag projections
                gC = g[f"b{i}_Wq_g"].shape[0]
                ng = x.shape[1] // gC
                q = sp._dense_per_l_k(x, g[f"b{i}_Wq_g"], ng, gC, x.dtype)
                k = sp._dense_per_l_k(x, g[f"b{i}_Wk_g"], ng, gC, x.dtype)
                v = sp._dense_per_l_k(x, g[f"b{i}_Wv_g"], ng, gC, x.dtype)
            else:
                q = sp._mmd(x, g[f"b{i}_Wq"], x.dtype)
                k = sp._mmd(x, g[f"b{i}_Wk"], x.dtype)
                v = sp._mmd(x, g[f"b{i}_Wv"], x.dtype)
            out = q * k * v
            if f"b{i}_Wo_c" in g:
                return x + sp._dense_per_l_k(
                    out, g[f"b{i}_Wo_c"], L, H * D, x.dtype
                )
            return x + sp._mmd(out, g[f"b{i}_Wo"], x.dtype)

        sp._attention_k = attn_floor

    if args.glue:
        def run_stage_stub(w, x, emb_s, dims, stage_i, final, block_rows,
                           interpret):
            cols = (
                dims.seq_len if final
                else dims.seq_len * dims.block_channels[stage_i]
            )
            return (x[:, :1] * 0.5 + emb_s[:, :1]) * jnp.ones(
                (1, cols), x.dtype
            )

        sp._run_stage = run_stage_stub

    BG = args.BG
    key = jax.random.PRNGKey(0)
    if args.z16:
        from graspldm_tpu.models.fused_denoiser import DenoiserDims

        L, cond_dim = 16, 256
        dims = DenoiserDims(
            seq_len=16, block_channels=(32, 64, 128, 256), groups=4,
            emb_dim=64, cond_channels=3, cond_dim=256, fourier_dim=16,
        )
        ddm = GraspLatentDDM(
            dropout=None, dtype=jnp.bfloat16,
            latent_in_features=16, pc_latent_size=256,
        )
    else:
        L, cond_dim = 4, 64
        dims = FLAGSHIP_DIMS
        ddm = GraspLatentDDM(dropout=None, dtype=jnp.bfloat16)
    x = jax.random.normal(key, (BG, 1, L))
    t = jnp.zeros((BG,), jnp.int32)
    zc = jax.random.normal(jax.random.PRNGKey(1), (BG, 3, cond_dim))

    variables = ddm.init({"params": key}, x, t, zc)
    w = sp.pack_pallas_weights(variables, dims)
    input_emb = compute_input_emb(w, zc.astype(jnp.float32))
    FLAGSHIP_DIMS = dims  # noqa: F811 — chain below closes over `dims`

    if args.z16 and not args.no_flax:
        @jax.jit
        def flax_chain(x0):
            def body(h, _):
                return (
                    ddm.apply(variables, h, t, zc).astype(h.dtype),
                    None,
                )
            h, _ = jax.lax.scan(body, x0, None, length=20)
            return h

        t_flax = timeit(flax_chain, x, iters=5) / 20
        print(f"BG={BG} bf16 z16 flax chain: {t_flax * 1e3:.3f} ms/step")

    @jax.jit
    def chain(x0):
        def body(h, _):
            e = sp.stacked_denoiser_pallas_apply(
                w, h, t, zc, FLAGSHIP_DIMS, input_emb=input_emb,
                block_rows=args.block_rows, fuse_stages=args.fuse,
            )
            return e.astype(h.dtype), None

        h, _ = jax.lax.scan(body, x0, None, length=20)
        return h

    t_chain = timeit(chain, x) / 20
    print(f"BG={BG} bf16 pallas chain: {t_chain * 1e3:.3f} ms/step "
          f"(attn={getattr(sp, 'ATTN_IMPL', 'loop')}, R={args.block_rows}, "
          f"fuse={args.fuse})")

    if args.stages:
        from graspldm_tpu.models.stacked_denoiser import compute_emb_s_stacked

        dims = FLAGSHIP_DIMS
        dtype = w["init_W"].dtype
        emb_s = compute_emb_s_stacked(w, t, input_emb=input_emb).astype(dtype)
        X0 = (x[:, 0, :].astype(dtype) @ w["init_W"]) + w["init_b"]
        dim0 = w["init_W"].shape[1] // dims.seq_len
        cins = [dim0] + list(dims.block_channels[:-1])
        def stage_chain(stage_fn):
            # dependent 20-iter chain inside one jit: per-call dispatch
            # overhead (~1.5 ms host->device) amortizes away
            @jax.jit
            def f(X, e):
                def body(h, _):
                    Y = stage_fn(h, e)
                    return h * (1.0 + 0.0 * jnp.sum(Y).astype(h.dtype)), None

                h, _ = jax.lax.scan(body, X, None, length=20)
                return h

            return f

        X = X0
        for i in range(len(dims.block_channels)):
            fn = stage_chain(
                lambda X, e, _i=i: sp._run_stage(
                    w, X, e, dims, _i, False, args.block_rows, False
                )
            )
            dt = timeit(fn, X, emb_s) / 20
            print(f"  stage{i} (Cin={X.shape[1] // dims.seq_len:4d}): "
                  f"{dt * 1e3:.3f} ms")
            X = sp._run_stage(w, X, emb_s, dims, i, False, args.block_rows,
                              False)
        fn = stage_chain(
            lambda X, e: sp._run_stage(w, X, e, dims, 0, True,
                                       args.block_rows, False)
        )
        dt = timeit(fn, X, emb_s) / 20
        print(f"  final  (Cin={X.shape[1] // dims.seq_len:4d}): "
              f"{dt * 1e3:.3f} ms")


if __name__ == "__main__":
    main()
