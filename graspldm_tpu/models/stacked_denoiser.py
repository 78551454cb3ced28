"""Stacked-matmul flagship denoiser: every conv as ONE banded matmul.

The flagship denoiser operates on a tiny sequence (L = 4 latent positions),
so the XLA lowering of the flax module runs ~60 small kernels per step, each
streaming the full ``[BG, L, C]`` activations through HBM (~2.9 ms/step bf16
at BG = 8192 — HBM-bound, not MXU-bound). This module re-expresses the
network on a STACKED activation matrix ``X [R, L*C]`` (position-major
columns):

  * every k-tap conv becomes a single matmul with a block-banded weight
    ``[L*Cin, L*Cout]`` built at pack time (`band_matrix`) — the MXU does
    in one pass what the conv lowering does in 12 slice matmuls;
  * 1x1 convs (residual/qkv/out projections) become block-diagonal matmuls;
  * GroupNorm/FiLM/SiLU are elementwise on X (XLA fuses them into the
    surrounding matmuls);
  * LinearAttention runs on the L column slices (cheap: C <= 256, L = 4).

Numerically equal to ``GraspLatentDDM.apply`` (parity-tested); used as the
fast production denoiser in :func:`graspldm_tpu.inference.pipeline.
ldm_generate` for unconditional flagship sampling.

Reference baseline this beats: the per-step Python loop + module stack in
`grasp_ldm/models/diffusion/gaussian_diffusion.py:232-277`.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from .fused_denoiser import DenoiserDims, _linear_attention, pack_denoiser_weights

__all__ = [
    "band_matrix",
    "pack_stacked_weights",
    "stacked_denoiser_apply",
    "compute_extra_emb",
    "FLAGSHIP_DIMS",
]

FLAGSHIP_DIMS = DenoiserDims(
    seq_len=4,
    block_channels=(32, 64, 128, 256),
    groups=4,
    emb_dim=16,
    cond_channels=3,
    cond_dim=64,
    fourier_dim=16,
)


def band_matrix(w_taps: jax.Array, L: int) -> jax.Array:
    """k-tap conv kernel ``[k, Cin, Cout]`` -> banded ``[L*Cin, L*Cout]``.

    ``out[:, l*Cout:(l+1)*Cout] = sum_tap X[:, src*Cin:(src+1)*Cin] @ w[tap]``
    with ``src = l + tap - k//2`` (taps outside [0, L) dropped = zero pad).
    """
    k, cin, cout = w_taps.shape
    half = k // 2
    W = jnp.zeros((L * cin, L * cout), w_taps.dtype)
    for l in range(L):
        for tap in range(k):
            src = l + tap - half
            if 0 <= src < L:
                W = W.at[
                    src * cin : (src + 1) * cin, l * cout : (l + 1) * cout
                ].set(w_taps[tap])
    return W


def _block_diag(w: jax.Array, L: int) -> jax.Array:
    """1x1 conv ``[Cin, Cout]`` -> block-diagonal ``[L*Cin, L*Cout]``."""
    return jax.scipy.linalg.block_diag(*([w] * L))


def _tile(v: jax.Array, L: int) -> jax.Array:
    return jnp.tile(v, L)


def pack_stacked_weights(variables: Dict, dims: DenoiserDims = FLAGSHIP_DIMS) -> Dict:
    """GraspLatentDDM variables -> stacked-matmul weight arrays.

    Builds on :func:`pack_denoiser_weights` (which bakes in weight
    standardization), then converts every conv to its banded/block-diagonal
    matrix and pre-tiles biases/norm affines over positions.
    """
    w = pack_denoiser_weights(variables, dims)
    L = dims.seq_len
    out: Dict[str, jax.Array] = {}
    # embedding weights pass through (incl. optional conditioning heads)
    for k in ("fourier_w", "time_w1", "time_b1", "time_w2", "time_b2",
              "input_w", "input_b", "cls_w", "cls_b",
              "region_w1", "region_b1", "region_w2", "region_b2"):
        if k in w:
            out[k] = w[k]

    out["init_W"] = band_matrix(w["init_w"], L)
    out["init_b"] = _tile(w["init_b"], L)

    def pack_resblock(prefix):
        out[f"{prefix}_mlp_w"] = w[f"{prefix}_mlp_w"]
        out[f"{prefix}_mlp_b"] = w[f"{prefix}_mlp_b"]
        for blk in ("block1", "block2"):
            out[f"{prefix}_{blk}_W"] = band_matrix(w[f"{prefix}_{blk}_w"], L)
            out[f"{prefix}_{blk}_b"] = _tile(w[f"{prefix}_{blk}_b"], L)
            out[f"{prefix}_{blk}_scale"] = _tile(w[f"{prefix}_{blk}_scale"], L)
            out[f"{prefix}_{blk}_shift"] = _tile(w[f"{prefix}_{blk}_shift"], L)
        if f"{prefix}_res_w" in w:
            out[f"{prefix}_res_W"] = _block_diag(w[f"{prefix}_res_w"], L)
            out[f"{prefix}_res_b"] = _tile(w[f"{prefix}_res_b"], L)

    H, D = dims.heads, dims.dim_head
    for i in range(len(dims.block_channels)):
        pack_resblock(f"b{i}r1")
        pack_resblock(f"b{i}r2")
        for k in (f"b{i}_attn_norm_g", f"b{i}_qkv_w", f"b{i}_attn_out_w",
                  f"b{i}_attn_out_b", f"b{i}_attn_out_g"):
            out[k] = w[k]
        # Transpose-free attention weights: ONE dense qkv matmul whose output
        # columns are pre-interleaved so q arrives as [R, H, L, D], k as
        # [R, H, D, L] (softmax axes contiguous) and the out-projection
        # consumes [R, H, L, D] rows directly. The permutations live in the
        # weight matrices (built once here), not in runtime transposes.
        C = w[f"b{i}_qkv_w"].shape[0]
        hd = H * D
        qkv = w[f"b{i}_qkv_w"]  # [C, 3*hd], columns ordered (qkv, h, d)
        Wq = jnp.zeros((L * C, H * L * D), qkv.dtype)
        Wk = jnp.zeros((L * C, H * D * L), qkv.dtype)
        Wv = jnp.zeros((L * C, H * L * D), qkv.dtype)
        for l in range(L):
            rows = slice(l * C, (l + 1) * C)
            for h in range(H):
                src_q = qkv[:, h * D : (h + 1) * D]
                src_k = qkv[:, hd + h * D : hd + (h + 1) * D]
                src_v = qkv[:, 2 * hd + h * D : 2 * hd + (h + 1) * D]
                Wq = Wq.at[rows, (h * L + l) * D : (h * L + l + 1) * D].set(src_q)
                Wv = Wv.at[rows, (h * L + l) * D : (h * L + l + 1) * D].set(src_v)
                # k columns ordered (h, d, l)
                col0 = h * D * L
                Wk = Wk.at[rows, col0 + l : col0 + D * L : L].set(src_k)
        out[f"b{i}_Wq"] = Wq
        out[f"b{i}_Wk"] = Wk
        out[f"b{i}_Wv"] = Wv
        # out-projection: rows ordered (h, l, d) -> columns (l, C)
        wo = w[f"b{i}_attn_out_w"]  # [hd, C], rows ordered (h, d)
        Wo = jnp.zeros((H * L * D, L * C), wo.dtype)
        for h in range(H):
            for l in range(L):
                Wo = Wo.at[
                    (h * L + l) * D : (h * L + l + 1) * D, l * C : (l + 1) * C
                ].set(wo[h * D : (h + 1) * D, :])
        out[f"b{i}_Wo"] = Wo
        out[f"b{i}_Wo_b"] = _tile(w[f"b{i}_attn_out_b"], L)
        out[f"b{i}_norm_g_t"] = _tile(w[f"b{i}_attn_norm_g"], L)
        out[f"b{i}_out_g_t"] = _tile(w[f"b{i}_attn_out_g"], L)
        out[f"b{i}_proj_W"] = band_matrix(w[f"b{i}_proj_w"], L)
        out[f"b{i}_proj_b"] = _tile(w[f"b{i}_proj_b"], L)
    pack_resblock("final")
    out["final_W"] = _block_diag(w["final_conv_w"], L)
    out["final_b"] = _tile(w["final_conv_b"], L)
    return out


def _group_norm_stacked(
    x: jax.Array, scale: jax.Array, shift: jax.Array, L: int, groups: int,
    eps: float = 1e-5,
) -> jax.Array:
    """GroupNorm with stats over (group channels x all L positions).

    ``x [R, L*C]`` position-major; ``scale/shift [L*C]`` pre-tiled.
    Reductions accumulate in fp32 (fused into the reduce — no full-array
    casts); the normalize stays in the compute dtype.
    """
    R = x.shape[0]
    C = x.shape[1] // L
    gs = C // groups
    xg = x.reshape(R, L, groups, gs)
    n = L * gs
    s1 = jnp.sum(xg, axis=(1, 3), keepdims=True, dtype=jnp.float32)
    s2 = jnp.sum(
        xg.astype(jnp.float32) ** 2, axis=(1, 3), keepdims=True,
        dtype=jnp.float32,
    )
    mean = s1 / n
    var = jnp.maximum(s2 / n - mean**2, 0.0)
    inv = jax.lax.rsqrt(var + eps).astype(x.dtype)
    mean = mean.astype(x.dtype)
    xn = ((xg - mean) * inv).reshape(R, L * C)
    return xn * scale + shift


def _mm(a: jax.Array, b: jax.Array) -> jax.Array:
    # bf16 inputs: the MXU accumulates in fp32 internally; keeping the
    # output in the compute dtype avoids materializing fp32 activations.
    return jnp.dot(a, b)


def _resblock_stacked(x, w, prefix, emb_s, dims):
    L = dims.seq_len
    C = w[f"{prefix}_block1_b"].shape[0] // L
    ss = _mm(emb_s, w[f"{prefix}_mlp_w"]) + w[f"{prefix}_mlp_b"]  # [R, 2C]
    scale_t = jnp.tile(ss[:, :C], (1, L))
    shift_t = jnp.tile(ss[:, C:], (1, L))

    h = _mm(x, w[f"{prefix}_block1_W"]) + w[f"{prefix}_block1_b"]
    h = _group_norm_stacked(
        h, w[f"{prefix}_block1_scale"], w[f"{prefix}_block1_shift"], L,
        dims.groups,
    )
    h = h * (scale_t + float(dims.cond_channels)) + shift_t
    h = jax.nn.silu(h)
    h = _mm(h, w[f"{prefix}_block2_W"]) + w[f"{prefix}_block2_b"]
    h = _group_norm_stacked(
        h, w[f"{prefix}_block2_scale"], w[f"{prefix}_block2_shift"], L,
        dims.groups,
    )
    h = jax.nn.silu(h)
    if f"{prefix}_res_W" in w:
        x = _mm(x, w[f"{prefix}_res_W"]) + w[f"{prefix}_res_b"]
    return h + x


def _channel_ln_stacked(x, g_tiled, L):
    """Per-position channel LayerNorm on ``x [R, L*C]`` (g pre-tiled)."""
    C = x.shape[1] // L
    xg = x.reshape(-1, L, C)
    mean = jnp.mean(xg, axis=-1, keepdims=True, dtype=jnp.float32)
    var = jnp.mean(
        xg.astype(jnp.float32) ** 2, axis=-1, keepdims=True
    ) - mean**2
    inv = jax.lax.rsqrt(jnp.maximum(var, 0.0) + 1e-5).astype(x.dtype)
    xn = ((xg - mean.astype(x.dtype)) * inv).reshape(x.shape)
    return xn * g_tiled


def _attention_stacked(x, w, i, dims):
    """LinearAttention, transpose-free, with the ``(q k^T) v`` association.

    Two exact rewrites of the flax formulation:
      * q is softmaxed over d and k over L INDEPENDENTLY before the bilinear
        product, so ``q (k^T v)`` reassociates to ``(q k^T) v`` — the
        per-row context ``[R, h, d, e]`` (~67 MB at BG=8192) collapses to a
        ``[R, h, L, L]`` score tensor;
      * the head/position interleavings live in the packed qkv/out weight
        matrices (`pack_stacked_weights`), so q lands as ``[R, H, L, D]``
        and k as ``[R, H, D, L]`` with both softmax axes contiguous — zero
        runtime transposes.
    """
    L = dims.seq_len
    H, D = dims.heads, dims.dim_head

    normed = _channel_ln_stacked(x, w[f"b{i}_norm_g_t"], L)

    q = _mm(normed, w[f"b{i}_Wq"]).reshape(-1, H, L, D)
    k = _mm(normed, w[f"b{i}_Wk"]).reshape(-1, H, D, L)
    v = _mm(normed, w[f"b{i}_Wv"]).reshape(-1, H, L, D)

    q = jax.nn.softmax(q, axis=-1) * (D**-0.5)
    k = jax.nn.softmax(k, axis=-1)  # over L per (head, dim)

    scores = jnp.einsum("rhld,rhdm->rhlm", q, k)  # [R, H, L, L] tiny
    out = jnp.einsum("rhlm,rhmd->rhld", scores, v)
    out = _mm(out.reshape(-1, H * L * D), w[f"b{i}_Wo"]) + w[f"b{i}_Wo_b"]
    out = _channel_ln_stacked(out, w[f"b{i}_out_g_t"], L)
    return x + out


def compute_time_emb(w, t):
    """Per-sample time embedding ``[B, emb]`` (random Fourier + MLP)."""
    tf = t.astype(jnp.float32)[:, None]
    freqs = tf * w["fourier_w"][None, :] * (2.0 * math.pi)
    t_feat = jnp.concatenate([tf, jnp.sin(freqs), jnp.cos(freqs)], axis=-1)
    t_emb = t_feat @ w["time_w1"] + w["time_b1"]
    t_emb = jax.nn.gelu(t_emb, approximate=False)
    return t_emb @ w["time_w2"] + w["time_b2"]


def compute_input_emb(w, z_cond):
    """Conditioning embedding ``[B, Ce, emb]`` — CONSTANT across sampler
    steps (z_cond is fixed), so hoist it out of the scan and pass it to
    :func:`compute_emb_s_stacked` via ``input_emb``."""
    return jax.nn.silu(z_cond @ w["input_w"] + w["input_b"])


def compute_extra_emb(w, cls_cond=None, region_points=None):
    """Step-invariant conditioning embedding ``[B, emb]`` for the class- /
    region-conditioned denoisers (an additive term before the silu; see
    `models/conditioning.py`). Returns None for unconditional weights."""
    if cls_cond is not None:
        cls = cls_cond.reshape(-1, 1).astype(jnp.float32)
        return jax.nn.silu(cls @ w["cls_w"] + w["cls_b"])
    if region_points is not None:
        pts = region_points.astype(jnp.float32)
        h = jax.nn.silu(pts @ w["region_w1"] + w["region_b1"])
        h = h @ w["region_w2"] + w["region_b2"]
        return jax.nn.silu(jnp.max(h, axis=-2))
    return None


def compute_emb_s_stacked(w, t, z_cond=None, input_emb=None, extra_emb=None):
    if input_emb is None:
        input_emb = compute_input_emb(w, z_cond)
    if t is None or "time_w1" not in w:
        latent = input_emb  # plain (non-temporal) ResNet1D core
    else:
        latent = compute_time_emb(w, t)[:, None, :] + input_emb
    if extra_emb is not None:
        latent = latent + extra_emb[:, None, :]
    return jax.nn.silu(latent).reshape(latent.shape[0], -1)


def stacked_denoiser_apply(
    w: Dict[str, jax.Array],
    x: jax.Array,
    t: jax.Array,
    z_cond: jax.Array,
    dims: DenoiserDims = FLAGSHIP_DIMS,
    compute_dtype: Optional[jnp.dtype] = None,
    extra_emb: Optional[jax.Array] = None,
) -> jax.Array:
    """Forward pass; numerically equal to ``GraspLatentDDM.apply``.

    Args:
        w: packed tree from :func:`pack_stacked_weights` (cast to
            ``compute_dtype`` beforehand for bf16 runs, or pass fp32).
        x: ``[R, 1, L]`` latents; t ``[R]``; z_cond ``[R, Ce, cond_dim]``.
        extra_emb: optional ``[R, emb]`` conditioning embedding
            (:func:`compute_extra_emb`) for class/region-conditioned models.
    """
    in_dtype = x.dtype
    emb_s = compute_emb_s_stacked(
        w, t, z_cond.astype(jnp.float32), extra_emb=extra_emb
    )
    if compute_dtype is not None:
        emb_s = emb_s.astype(compute_dtype)
        x = x.astype(compute_dtype)

    X = _mm(x[:, 0, :], w["init_W"].astype(x.dtype)) + w["init_b"]
    wc = (
        {k: v.astype(compute_dtype) for k, v in w.items()}
        if compute_dtype is not None
        else w
    )
    for i in range(len(dims.block_channels)):
        X = _resblock_stacked(X, wc, f"b{i}r1", emb_s, dims)
        X = _resblock_stacked(X, wc, f"b{i}r2", emb_s, dims)
        X = _attention_stacked(X, wc, i, dims)
        X = _mm(X, wc[f"b{i}_proj_W"]) + wc[f"b{i}_proj_b"]
    X = _resblock_stacked(X, wc, "final", emb_s, dims)
    out = _mm(X, wc["final_W"]) + wc["final_b"]  # [R, L]
    return out[:, None, :].astype(in_dtype)
