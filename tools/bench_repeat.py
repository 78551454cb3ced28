#!/usr/bin/env python
"""Microbench: Mosaic lowering cost of lane-interleave `jnp.repeat` inside a
Pallas TPU kernel, vs the one-hot broadcast matmul it would replace.

The attention score path broadcasts per-(l,h) scalars [R, L*H] to per-lane
width [R, L*H*D] (D=32). Today that is an MXU matmul against a one-hot
[128pad, L*hd] matrix — as expensive as the score pooling itself. If
`jnp.repeat(s, D, axis=1)` lowers to cheap VPU shuffles, half the attention
MXU flops drop. This tool measures both forms in isolation:

    python tools/bench_repeat.py [R_total]

Forms, each applied 20x in a dependent chain inside one kernel launch:
  matmul : sb = s @ qbcast   (one-hot [64->2048])
  repeat : sb = jnp.repeat(s, 32, axis=1)
  narrow : 16 slice-FMAs of jnp.repeat(s[:, m*4:(m+1)*4], 32) * v_m
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from graspldm_tpu.utils.profiling import timeit  # noqa: E402

L, H, D = 16, 4, 32
hd = H * D


def _qbcast():
    b = np.zeros((L * H, L * hd), np.float32)
    for l in range(L):
        for h in range(H):
            b[l * H + h, l * hd + h * D : l * hd + (h + 1) * D] = 1.0
    return jnp.asarray(b, jnp.bfloat16)


def make_kernel(form):
    def kernel(s_ref, v_ref, b_ref, o_ref):
        s = s_ref[...]
        v = v_ref[...]
        out = jnp.zeros((s.shape[0], hd), jnp.float32)
        for _ in range(20):
            if form == "matmul":
                sb = jax.lax.dot_general(
                    s, b_ref[...], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16)
                term = sb * v
                acc = functools.reduce(
                    jnp.add,
                    [term[:, m * hd : (m + 1) * hd] for m in range(L)],
                )
            elif form == "repeat":
                sb = jnp.repeat(s, D, axis=1)
                term = sb * v
                acc = functools.reduce(
                    jnp.add,
                    [term[:, m * hd : (m + 1) * hd] for m in range(L)],
                )
            else:  # narrow
                acc = functools.reduce(
                    jnp.add,
                    [
                        jnp.repeat(s[:, m * H : (m + 1) * H], D, axis=1)
                        * v[:, m * hd : (m + 1) * hd]
                        for m in range(L)
                    ],
                )
            s = s * 0.5 + acc[:, : L * H].astype(s.dtype) * 0.0
        o_ref[...] = acc.astype(o_ref.dtype)

    return kernel


def main():
    R_total = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    Rb = 512
    key = jax.random.PRNGKey(0)
    s = jax.random.normal(key, (R_total, L * H), jnp.bfloat16)
    v = jax.random.normal(key, (R_total, L * hd), jnp.bfloat16)
    b = _qbcast()

    for form in ("matmul", "repeat", "narrow"):
        try:
            fn = pl.pallas_call(
                make_kernel(form),
                grid=(R_total // Rb,),
                in_specs=[
                    pl.BlockSpec((Rb, L * H), lambda i: (i, 0)),
                    pl.BlockSpec((Rb, L * hd), lambda i: (i, 0)),
                    pl.BlockSpec((L * H, L * hd), lambda i: (0, 0)),
                ],
                out_specs=pl.BlockSpec((Rb, hd), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((R_total, hd), jnp.bfloat16),
            )
            jfn = jax.jit(lambda s, v, b: fn(s, v, b))
            # correctness vs dense reference (single application)
            t = timeit(jfn, s, v, b, iters=10) / 20
            print(f"{form:7s}: {t * 1e6:8.1f} us/apply (R={R_total})")
        except Exception as e:  # noqa: BLE001 — report lowering failures
            print(f"{form:7s}: FAILED — {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
