"""Fused (slice-formulation) denoiser vs the flax module — exact parity."""

import numpy as np
import jax
import jax.numpy as jnp

from graspldm_tpu.models import GraspLatentDDM
from graspldm_tpu.models.fused_denoiser import (
    DenoiserDims,
    fused_denoiser_reference,
    pack_denoiser_weights,
)

DIMS = DenoiserDims(
    seq_len=4,
    block_channels=(32, 64, 128, 256),
    groups=4,
    emb_dim=16,
    cond_channels=3,
    cond_dim=64,
    fourier_dim=16,
)


def test_fused_reference_matches_flax_module():
    ddm = GraspLatentDDM(dropout=None)
    key = jax.random.PRNGKey(0)
    BG = 8
    x = jax.random.normal(key, (BG, 1, 4))
    t = jnp.asarray([0, 1, 10, 100, 500, 999, 42, 7], jnp.int32)
    zc = jax.random.normal(jax.random.PRNGKey(1), (BG, 3, 64))

    variables = ddm.init({"params": key}, x, t, zc)
    want = np.asarray(ddm.apply(variables, x, t, zc))

    w = pack_denoiser_weights(variables, DIMS)
    got = np.asarray(fused_denoiser_reference(w, x, t, zc, DIMS))
    # fp32 reduction-order differences (slice formulation vs conv lowering)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=5e-4)
