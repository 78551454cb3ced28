#!/usr/bin/env python
"""Microbench: SiLU lowering strategies inside a Pallas TPU kernel.

The kernels run SiLU in fp32 (`_silu_f32`) because Mosaic's bf16 `logistic`
fails verification. That costs two casts plus double-width VPU passes per
call, ~18 calls per denoiser step. This measures (and correctness-checks)
cheaper lowerings:

    f32     : cast -> fp32 x*sigmoid(x) -> cast (today's path)
    bf16exp : bf16 end-to-end via exp/reciprocal (no `logistic`)
    mixexp  : fp32 exp of bf16 input, bf16 multiply/reciprocal

    python tools/bench_silu.py [R_total] [width]
"""

from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from graspldm_tpu.utils.profiling import timeit  # noqa: E402


def make_kernel(form, reps=12):
    def kernel(x_ref, o_ref):
        x = x_ref[...]
        for _ in range(reps):
            if form == "f32":
                xf = x.astype(jnp.float32)
                y = (xf * jax.nn.sigmoid(xf)).astype(x.dtype)
            elif form == "bf16exp":
                e = jnp.exp(-x)
                y = x / (1.0 + e)
            else:  # mixexp
                e = jnp.exp(-x.astype(jnp.float32))
                y = (x.astype(jnp.float32) / (1.0 + e)).astype(x.dtype)
            x = y * 0.999  # keep the chain dependent
        o_ref[...] = x

    return kernel


def main():
    R_total = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    Rb = 512
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (R_total, W), jnp.bfloat16) * 3.0

    ref = None
    for form in ("f32", "bf16exp", "mixexp"):
        try:
            fn = pl.pallas_call(
                make_kernel(form),
                grid=(R_total // Rb,),
                in_specs=[pl.BlockSpec((Rb, W), lambda i: (i, 0))],
                out_specs=pl.BlockSpec((Rb, W), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((R_total, W), jnp.bfloat16),
            )
            jfn = jax.jit(fn)
            y = np.asarray(jfn(x)).astype(np.float32)
            if ref is None:
                ref = y
                err = 0.0
            else:
                err = float(np.max(np.abs(y - ref)))
            t = timeit(jfn, x, iters=10) / 12
            print(f"{form:8s}: {t * 1e6:7.1f} us/call  max|err vs f32|={err:.2e}")
        except Exception as e:  # noqa: BLE001 — report lowering failures
            print(f"{form:8s}: FAILED — {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
