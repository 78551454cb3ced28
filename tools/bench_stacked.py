#!/usr/bin/env python
"""Micro-bench: flax denoiser vs stacked-matmul denoiser on TPU.

Measures a dependent 20-step chain (the sampler's access pattern) and a
single apply, at BG rows, fp32 and bf16. Run on the TPU chip:

    python tools/bench_stacked.py [BG]
"""

from __future__ import annotations

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
    from graspldm_tpu.models import GraspLatentDDM
    from graspldm_tpu.models.stacked_denoiser import (
        FLAGSHIP_DIMS,
        pack_stacked_weights,
        stacked_denoiser_apply,
    )

    BG = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (BG, 1, 4))
    t = jnp.zeros((BG,), jnp.int32)
    zc = jax.random.normal(jax.random.PRNGKey(1), (BG, 3, 64))

    for dtype_name, dtype in (("bf16", jnp.bfloat16), ("fp32", None)):
        ddm = GraspLatentDDM(dropout=None, dtype=dtype)
        variables = ddm.init({"params": key}, x, t, zc)
        w = pack_stacked_weights(variables, FLAGSHIP_DIMS)
        if dtype is not None:
            w_c = {k: v.astype(dtype) for k, v in w.items()}
        else:
            w_c = w

        @jax.jit
        def flax_chain(x0):
            def body(h, _):
                return ddm.apply(variables, h, t, zc).astype(h.dtype), None
            h, _ = jax.lax.scan(body, x0, None, length=20)
            return h

        @jax.jit
        def stacked_chain(x0):
            def body(h, _):
                e = stacked_denoiser_apply(
                    w_c, h, t, zc, FLAGSHIP_DIMS, compute_dtype=dtype
                )
                return e.astype(h.dtype), None
            h, _ = jax.lax.scan(body, x0, None, length=20)
            return h

        t_flax = timeit(flax_chain, x) / 20
        t_stacked = timeit(stacked_chain, x) / 20
        print(
            f"BG={BG} {dtype_name}: flax {t_flax * 1e3:.3f} ms/step, "
            f"stacked {t_stacked * 1e3:.3f} ms/step "
            f"(x{t_flax / t_stacked:.2f})"
        )


if __name__ == "__main__":
    main()
