#!/usr/bin/env python
"""Microbench: fp32 vs bf16 pooling-matmul cost inside a Pallas TPU kernel.

Every norm-statistics / q-softmax pooling in the stage kernels is an
``_mmf(xf, pool)`` with BOTH operands fp32. If the MXU runs fp32 matmuls at
1/4-1/8 the bf16 rate (3-pass decomposition), those stat pools — not the
VPU — are the hidden cost band of the z16 chain. Forms, 12-rep dependent
chain, [R, 2048] @ [2048, 128]:

    f32     : fp32 x fp32 (today's stats path)
    bf16    : bf16 x bf16, fp32 accumulate
    split   : EXACT E[x^2] trick — square in fp32, split hi/lo into two
              bf16 matmuls with fp32 accumulate (error-free vs f32)

    python tools/bench_mm.py [R_total]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from graspldm_tpu.utils.profiling import timeit  # noqa: E402

K, N = 2048, 128


def make_kernel(form, reps=12):
    def kernel(x_ref, pf_ref, pb_ref, o_ref):
        x = x_ref[...]          # bf16 [R, K]
        acc = None
        for _ in range(reps):
            if form == "f32":
                xf = x.astype(jnp.float32)
                s = jax.lax.dot_general(
                    xf * xf, pf_ref[...], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            elif form == "bf16":
                xsq = (x * x).astype(jnp.bfloat16)
                s = jax.lax.dot_general(
                    xsq, pb_ref[...], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            else:  # split: exact two-term bf16 decomposition of fp32 x*x
                xf = x.astype(jnp.float32)
                sq = xf * xf                      # exact in fp32
                hi = sq.astype(jnp.bfloat16)
                lo = (sq - hi.astype(jnp.float32)).astype(jnp.bfloat16)
                d = (((1,), (0,)), ((), ()))
                s = jax.lax.dot_general(
                    hi, pb_ref[...], d, preferred_element_type=jnp.float32
                ) + jax.lax.dot_general(
                    lo, pb_ref[...], d, preferred_element_type=jnp.float32
                )
            acc = s if acc is None else acc + s
            x = x * jnp.float32(0.999).astype(x.dtype)
        o_ref[...] = acc

    return kernel


def main():
    R_total = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    Rb = 512
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (R_total, K), jnp.bfloat16)
    pool = np.zeros((K, N), np.float32)
    for i in range(K):
        pool[i, (i // 32) % N] = 1.0 / 128.0
    pf = jnp.asarray(pool)
    pb = jnp.asarray(pool, jnp.bfloat16)

    ref = None
    for form in ("f32", "bf16", "split"):
        try:
            fn = pl.pallas_call(
                make_kernel(form),
                grid=(R_total // Rb,),
                in_specs=[
                    pl.BlockSpec((Rb, K), lambda i: (i, 0)),
                    pl.BlockSpec((K, N), lambda i: (0, 0)),
                    pl.BlockSpec((K, N), lambda i: (0, 0)),
                ],
                out_specs=pl.BlockSpec((Rb, N), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((R_total, N), jnp.float32),
            )
            jfn = jax.jit(fn)
            y = np.asarray(jfn(x, pf, pb))
            if ref is None:
                ref = y
                err = 0.0
            else:
                err = float(np.max(np.abs(y - ref) / (np.abs(ref) + 1e-6)))
            t = timeit(jfn, x, pf, pb, iters=10) / 12
            print(f"{form:6s}: {t * 1e6:7.1f} us/matmul  max rel err vs f32={err:.2e}")
        except Exception as e:  # noqa: BLE001
            print(f"{form:6s}: FAILED — {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
