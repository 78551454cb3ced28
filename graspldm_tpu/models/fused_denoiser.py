"""Fused flagship denoiser: weight packing + slice-formulation forward.

The sampler is HBM-bandwidth bound: each of the ~60 XLA ops in one denoiser
step streams the full ``[BG, L, C]`` activations through HBM, costing
~5 ms/step at BG=8192 (measured; see git history). This module reformulates
the flagship TimeConditionedResNet1D as a chain over POSITION SLICES
``x_l [R, C]`` (L=4 slices):

  * every conv becomes a sum of per-offset matmuls ``x_{l+dl} @ W[dl]``;
  * per-position ops (Dense / GroupNorm / FiLM / SiLU) act on 2-D slices;
  * the multi-channel FiLM reduces to one matmul with a 3x-tiled weight.

Two consumers:
  * :func:`fused_denoiser_reference` — pure-jnp, numerically equal to
    ``GraspLatentDDM.apply`` (tested); documents the math.
  * the stacked-matmul formulations built on these packed weights:
    :mod:`graspldm_tpu.models.stacked_denoiser` (XLA) and
    :mod:`graspldm_tpu.models.stacked_pallas` (per-stage TPU kernels, the
    production sampler fast path).

A round-1 single-mega-kernel variant (`pallas_denoiser.py`) was measured at
20-50 min Mosaic compiles and 10.4 ms/call (slower than XLA) and was removed;
the per-stage stacked kernels compile in ~40 s and run 2.6x faster than the
flax lowering (see git history / ARCHITECTURE.md).
"""

from __future__ import annotations

import math
from typing import Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "DenoiserDims",
    "pack_denoiser_weights",
    "fused_denoiser_reference",
]


class DenoiserDims(NamedTuple):
    seq_len: int  # L = grasp latent dims (4 for flagship)
    block_channels: Tuple[int, ...]  # (32, 64, 128, 256)
    groups: int  # groupnorm groups (4)
    emb_dim: int  # L * 4
    cond_channels: int  # 3
    cond_dim: int  # 64
    fourier_dim: int  # 16
    heads: int = 4
    dim_head: int = 32


def _standardize(kernel: jax.Array) -> jax.Array:
    """Weight standardization over (spatial, in) per out-channel (fp32)."""
    mean = jnp.mean(kernel, axis=(0, 1), keepdims=True)
    var = jnp.var(kernel, axis=(0, 1), keepdims=True)
    return (kernel - mean) * jax.lax.rsqrt(var + 1e-5)


def pack_denoiser_weights(variables: Dict, dims: DenoiserDims) -> Dict:
    """Flatten the GraspLatentDDM variable tree into fused-kernel arrays.

    Weight standardization of the WSConvs is baked in here (it depends only
    on parameters), so the kernel applies plain convs.
    """
    p = variables["params"]["denoiser"]
    core = p["core"]
    consts = variables.get("constants", {}).get("denoiser", {})

    out: Dict[str, jax.Array] = {}
    # time-embedding head — absent for plain (non-temporal) ResNet1D cores
    # such as the VAE decoder, which share everything below
    if "time_mlp_1" in p:
        out["fourier_w"] = consts["sinu_pos_emb"]["weights"]
        out["time_w1"] = p["time_mlp_1"]["kernel"]
        out["time_b1"] = p["time_mlp_1"]["bias"]
        out["time_w2"] = p["time_mlp_2"]["kernel"]
        out["time_b2"] = p["time_mlp_2"]["bias"]
    out["input_w"] = p["input_emb"]["kernel"]  # [cond_dim, emb]
    out["input_b"] = p["input_emb"]["bias"]
    # optional conditioning heads (class- / region-conditioned denoisers):
    # both are step-invariant additive embeddings, computed once per
    # generation and folded into the hoisted input embedding
    if "cls_embed" in p:
        out["cls_w"] = p["cls_embed"]["kernel"]  # [1, emb]
        out["cls_b"] = p["cls_embed"]["bias"]
    if "region_mlp_1" in p:
        out["region_w1"] = p["region_mlp_1"]["kernel"]  # [3, hidden]
        out["region_b1"] = p["region_mlp_1"]["bias"]
        out["region_w2"] = p["region_mlp_2"]["kernel"]  # [hidden, emb]
        out["region_b2"] = p["region_mlp_2"]["bias"]

    out["init_w"] = core["init_conv"]["kernel"]  # [7, 1, L]
    out["init_b"] = core["init_conv"]["bias"]

    def pack_resblock(src, prefix):
        # FiLM mlp: Dense(emb -> 2C) applied per cond channel then summed ->
        # tiled [Ce*emb, 2C] matmul on the flattened silu(emb).
        w = src["mlp_dense"]["kernel"]  # [emb, 2C]
        out[f"{prefix}_mlp_w"] = jnp.concatenate([w] * dims.cond_channels, axis=0)
        out[f"{prefix}_mlp_b"] = src["mlp_dense"]["bias"] * dims.cond_channels
        for blk in ("block1", "block2"):
            ker = _standardize(src[blk]["proj"]["kernel"])  # [3, Cin, Cout]
            out[f"{prefix}_{blk}_w"] = ker
            out[f"{prefix}_{blk}_b"] = src[blk]["proj"]["bias"]
            out[f"{prefix}_{blk}_scale"] = src[blk]["norm"]["scale"]
            out[f"{prefix}_{blk}_shift"] = src[blk]["norm"]["bias"]
        if "res_conv" in src:
            out[f"{prefix}_res_w"] = src["res_conv"]["kernel"][0]  # [Cin, Cout]
            out[f"{prefix}_res_b"] = src["res_conv"]["bias"]

    n_blocks = len(dims.block_channels)
    for i in range(n_blocks):
        pack_resblock(core[f"blocks_{i}_res1"], f"b{i}r1")
        pack_resblock(core[f"blocks_{i}_res2"], f"b{i}r2")
        attn = core[f"blocks_{i}_attn"]
        out[f"b{i}_attn_norm_g"] = core[f"blocks_{i}_attn_norm"]["g"]
        out[f"b{i}_qkv_w"] = attn["to_qkv"]["kernel"]  # [C, 3*h*d]
        out[f"b{i}_attn_out_w"] = attn["to_out"]["kernel"]  # [h*d, C]
        out[f"b{i}_attn_out_b"] = attn["to_out"]["bias"]
        out[f"b{i}_attn_out_g"] = attn["out_norm"]["g"]
        out[f"b{i}_proj_w"] = core[f"blocks_{i}_proj"]["kernel"]  # [3, Cin, Cout]
        out[f"b{i}_proj_b"] = core[f"blocks_{i}_proj"]["bias"]
    pack_resblock(core["final_res_block"], "final")
    out["final_conv_w"] = core["final_conv"]["kernel"][0]  # [C, 1]
    out["final_conv_b"] = core["final_conv"]["bias"]
    return out


# ---------------------------------------------------------------------------
# Pure-jnp reference in the slice formulation.
# All helpers operate on a list of L slices ``x_l [R, C]``.
# ---------------------------------------------------------------------------


def _conv_slices(
    xs: List[jax.Array], w: jax.Array, b: Optional[jax.Array]
) -> List[jax.Array]:
    """k-tap conv across position slices: ``out_l = sum_dl x_{l+dl} @ w[tap]``."""
    L = len(xs)
    k = w.shape[0]
    half = k // 2
    outs = []
    for l in range(L):
        acc = None
        for tap in range(k):
            src = l + tap - half
            if src < 0 or src >= L:
                continue
            term = xs[src] @ w[tap]
            acc = term if acc is None else acc + term
        if b is not None:
            acc = acc + b
        outs.append(acc)
    return outs


def _group_norm_slices(
    xs: List[jax.Array], scale: jax.Array, shift: jax.Array, groups: int,
    eps: float = 1e-5,
) -> List[jax.Array]:
    """GroupNorm with stats over (channels-in-group x all L positions)."""
    L = len(xs)
    C = xs[0].shape[-1]
    gs = C // groups
    x = jnp.stack(xs, axis=1)  # [R, L, C]
    xg = x.reshape(x.shape[0], L, groups, gs)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.var(xg, axis=(1, 3), keepdims=True)
    xn = ((xg - mean) * jax.lax.rsqrt(var + eps)).reshape(x.shape)
    xn = xn * scale + shift
    return [xn[:, l] for l in range(L)]


def _layer_norm_channel_slices(xs, g, eps=1e-5):
    outs = []
    for x in xs:
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        outs.append((x - mean) * jax.lax.rsqrt(var + eps) * g)
    return outs


def _film(xs: List[jax.Array], ss: jax.Array, e: int) -> List[jax.Array]:
    """Summed multi-channel FiLM: ``x * (scale_sum + e) + shift_sum``."""
    C = xs[0].shape[-1]
    scale, shift = ss[:, :C], ss[:, C:]
    return [x * (scale + float(e)) + shift for x in xs]


def _resblock(xs, w, prefix, emb_s, dims):
    ss = emb_s @ w[f"{prefix}_mlp_w"] + w[f"{prefix}_mlp_b"]
    h = _conv_slices(xs, w[f"{prefix}_block1_w"], w[f"{prefix}_block1_b"])
    h = _group_norm_slices(
        h, w[f"{prefix}_block1_scale"], w[f"{prefix}_block1_shift"], dims.groups
    )
    h = _film(h, ss, dims.cond_channels)
    h = [jax.nn.silu(x) for x in h]
    h = _conv_slices(h, w[f"{prefix}_block2_w"], w[f"{prefix}_block2_b"])
    h = _group_norm_slices(
        h, w[f"{prefix}_block2_scale"], w[f"{prefix}_block2_shift"], dims.groups
    )
    h = [jax.nn.silu(x) for x in h]
    if f"{prefix}_res_w" in w:
        xs = [x @ w[f"{prefix}_res_w"] + w[f"{prefix}_res_b"] for x in xs]
    return [a + b for a, b in zip(h, xs)]


def _linear_attention(xs, w, i, dims):
    """LinearAttention over the L position axis (slice formulation)."""
    L = len(xs)
    h_, d = dims.heads, dims.dim_head
    normed = _layer_norm_channel_slices(xs, w[f"b{i}_attn_norm_g"])
    qkv = [x @ w[f"b{i}_qkv_w"] for x in normed]  # [R, 3*h*d] per slice
    hd = h_ * d
    outs_per_l = []
    # q: softmax over d within each head; k: softmax over L per (head, d).
    q = [v[:, :hd].reshape(-1, h_, d) for v in qkv]
    k = [v[:, hd : 2 * hd].reshape(-1, h_, d) for v in qkv]
    v = [t[:, 2 * hd :].reshape(-1, h_, d) for t in qkv]

    q = [jax.nn.softmax(t, axis=-1) * (d**-0.5) for t in q]
    k_stack = jnp.stack(k, axis=-1)  # [R, h, d, L]
    k_sm = jax.nn.softmax(k_stack, axis=-1)
    # context[r, h, d, e] = sum_l k_sm[..., l] * v_l[r, h, e]
    v_stack = jnp.stack(v, axis=-1)  # [R, h, d, L]
    context = jnp.einsum("rhdl,rhel->rhde", k_sm, v_stack)
    for l in range(L):
        out_l = jnp.einsum("rhde,rhd->rhe", context, q[l]).reshape(-1, hd)
        out_l = out_l @ w[f"b{i}_attn_out_w"] + w[f"b{i}_attn_out_b"]
        outs_per_l.append(out_l)
    outs_per_l = _layer_norm_channel_slices(outs_per_l, w[f"b{i}_attn_out_g"])
    return [x + o for x, o in zip(xs, outs_per_l)]


def fused_denoiser_reference(
    w: Dict[str, jax.Array],
    x: jax.Array,
    t: jax.Array,
    z_cond: jax.Array,
    dims: DenoiserDims,
) -> jax.Array:
    """Numerically-equal reimplementation of the flagship denoiser forward.

    Args:
        x: ``[BG, 1, L]`` latents; t: ``[BG]``; z_cond ``[BG, Ce, cond_dim]``.
    Returns:
        eps ``[BG, 1, L]``.
    """
    L = dims.seq_len

    # --- embeddings ---
    tf = t.astype(jnp.float32)[:, None]
    freqs = tf * w["fourier_w"][None, :] * (2.0 * math.pi)
    t_feat = jnp.concatenate([tf, jnp.sin(freqs), jnp.cos(freqs)], axis=-1)
    t_emb = t_feat @ w["time_w1"] + w["time_b1"]
    t_emb = jax.nn.gelu(t_emb, approximate=False)
    t_emb = t_emb @ w["time_w2"] + w["time_b2"]  # [R, emb]

    input_emb = jax.nn.silu(z_cond @ w["input_w"] + w["input_b"])  # [R, Ce, emb]
    latent = t_emb[:, None, :] + input_emb  # [R, Ce, emb]
    emb_s = jax.nn.silu(latent).reshape(latent.shape[0], -1)  # [R, Ce*emb]

    # --- init conv: channels 1 -> L over the position axis ---
    x_slices = [x[:, 0, l : l + 1] for l in range(L)]  # [R, 1] each
    xs = _conv_slices(x_slices, w["init_w"], w["init_b"])  # [R, L(dim)] each

    for i in range(len(dims.block_channels)):
        xs = _resblock(xs, w, f"b{i}r1", emb_s, dims)
        xs = _resblock(xs, w, f"b{i}r2", emb_s, dims)
        xs = _linear_attention(xs, w, i, dims)
        xs = _conv_slices(xs, w[f"b{i}_proj_w"], w[f"b{i}_proj_b"])

    xs = _resblock(xs, w, "final", emb_s, dims)
    out = [x @ w["final_conv_w"] + w["final_conv_b"] for x in xs]  # [R, 1]
    return jnp.concatenate(out, axis=-1)[:, None, :]  # [R, 1, L]
