"""Kernel fast path for the VAE grasp decoder.

The decoder (`grasp_vae.py` ``decoder_core`` + heads) is a PLAIN
conditional ResNet1D — structurally the z16 denoiser core without the time
embedding (L = intermediate_feature_resolution = 16 positions, the same
block stack, FiLM from ``silu(input_emb)``). It runs once per generation
over the full ``B*G`` batch and measures ~150 ms at BG=32768 bf16 on v5e —
~20% of an LDM generation call and ~all of a VAE-mode call — so it gets
the same generic-L sliced-conv Pallas treatment as the denoiser
(:mod:`stacked_pallas`).

``decoder_fast_apply`` is numerically equal to
``GraspCVAE.apply(..., method="decode")`` (interpret-mode parity test in
tests/test_fused_denoiser.py).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .fused_denoiser import DenoiserDims
from .stacked_denoiser import compute_emb_s_stacked, compute_input_emb
from .stacked_pallas import pack_pallas_weights, stacked_denoiser_pallas_apply

__all__ = ["decoder_dims_for", "pack_decoder_weights", "decoder_fast_apply"]


def decoder_dims_for(vae) -> DenoiserDims:
    """Kernel dims of a GraspCVAE's decoder core."""
    return DenoiserDims(
        seq_len=vae.intermediate_feature_resolution,
        block_channels=tuple(vae.block_channels),
        groups=vae.resnet_block_groups,
        emb_dim=vae.intermediate_feature_resolution * 4,
        cond_channels=vae.pc_latent_channels,
        cond_dim=vae.pc_latent_size,
        fourier_dim=16,  # unused (no time head)
    )


def pack_decoder_weights(
    vae_variables: Dict, dims: DenoiserDims, dtype=jnp.bfloat16
) -> Dict[str, jax.Array]:
    """GraspCVAE variables -> kernel weights for the decoder core + heads."""
    p = vae_variables["params"]
    net = p["decoder_core"]["net"]
    core_vars = {"params": {"denoiser": dict(net)}}
    w = pack_pallas_weights(core_vars, dims, dtype=dtype)
    # in-layer and output heads run in XLA around the kernels (tiny)
    w["dec_in_w"] = p["decoder_core"]["in_layer"]["kernel"]
    w["dec_in_b"] = p["decoder_core"]["in_layer"]["bias"]
    w["head_tmrp_w"] = p["head_tmrp"]["kernel"]
    w["head_tmrp_b"] = p["head_tmrp"]["bias"]
    w["head_class_w"] = p["head_class"]["kernel"]
    w["head_class_b"] = p["head_class"]["bias"]
    if "head_qualities" in p:
        w["head_q_w"] = p["head_qualities"]["kernel"]
        w["head_q_b"] = p["head_qualities"]["bias"]
    return w


def decoder_fast_apply(
    w: Dict[str, jax.Array],
    z_h: jax.Array,
    z_pc: jax.Array,
    dims: DenoiserDims,
    block_rows: int = 512,
    interpret: bool = False,
    input_emb: Optional[jax.Array] = None,
) -> Tuple[jax.Array, ...]:
    """``(z_h [BG, D], z_pc [BG, Ce, Dpc]) -> (tmrp, cls_logits[, quals])``.

    Equal to ``GraspCVAE.decode``; the core runs through the per-stage
    Pallas kernels. ``input_emb`` (``compute_input_emb(w, z_pc)``) can be
    precomputed when z_pc is reused across calls.
    """
    x = z_h @ w["dec_in_w"] + w["dec_in_b"]  # [BG, L]
    if input_emb is None:
        input_emb = compute_input_emb(w, z_pc.astype(jnp.float32))
    out = stacked_denoiser_pallas_apply(
        w, x[:, None, :], None, z_pc, dims,
        block_rows=block_rows, interpret=interpret, input_emb=input_emb,
    )[:, 0, :]  # [BG, L]
    out = out.astype(z_h.dtype)
    tmrp = out @ w["head_tmrp_w"] + w["head_tmrp_b"]
    cls = out @ w["head_class_w"] + w["head_class_b"]  # [BG, 1] like flax
    if "head_q_w" in w:
        return tmrp, cls, out @ w["head_q_w"] + w["head_q_b"]
    return tmrp, cls


def reference_emb_s(w, z_pc):
    """XLA emb path for the decoder (no time head) — used by tests."""
    return compute_emb_s_stacked(w, None, z_cond=z_pc.astype(jnp.float32))
