"""Pallas TPU kernel: the entire flagship denoiser as ONE fused program.

Why: the XLA denoiser step is ~60 kernels each streaming the full
``[BG, L, C]`` activations through HBM (measured 5.2 ms/step fp32,
~2.9 ms bf16 at BG=8192). This kernel keeps ALL weights (~1.1M params)
resident in VMEM across the whole batch and runs the complete network chain
on row chunks — HBM traffic per step collapses to (x in + eps out + one
weight fetch), bounded by compute instead of bandwidth.

Structure (see `fused_denoiser.py` for the validated slice formulation):
  * grid over row chunks; weight blocks use constant index maps so Pallas
    fetches them once and reuses the buffers across grid steps;
  * activations live as L=4 position slices ``[R, C]`` in VMEM;
  * convs = sums of per-tap slice matmuls; GroupNorm/FiLM/SiLU/attention are
    VPU ops on resident slices; matmuls accumulate fp32 on the MXU.

The conditioning embedding ``emb_s = silu(time_emb + input_emb)`` is
precomputed outside (it is 3 tiny matmuls) and streamed per chunk.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_denoiser import DenoiserDims, pack_denoiser_weights

__all__ = ["weight_names", "fused_denoiser_pallas", "compute_emb_s"]


def weight_names(dims: DenoiserDims) -> List[str]:
    """Canonical ordering of the packed weight arrays (kernel ABI)."""

    def resblock(prefix):
        names = [f"{prefix}_mlp_w", f"{prefix}_mlp_b"]
        for blk in ("block1", "block2"):
            names += [
                f"{prefix}_{blk}_w",
                f"{prefix}_{blk}_b",
                f"{prefix}_{blk}_scale",
                f"{prefix}_{blk}_shift",
            ]
        return names

    names = ["init_w", "init_b"]
    n = len(dims.block_channels)
    for i in range(n):
        names += resblock(f"b{i}r1")
        if i == 0:
            names += ["b0r1_res_w_dummy"]  # placeholder slot, unused
        names += resblock(f"b{i}r2")
        names += [
            f"b{i}_attn_norm_g",
            f"b{i}_qkv_w",
            f"b{i}_attn_out_w",
            f"b{i}_attn_out_b",
            f"b{i}_attn_out_g",
            f"b{i}_proj_w",
            f"b{i}_proj_b",
        ]
    names += resblock("final")
    names += ["final_conv_w", "final_conv_b"]
    return [x for x in names if not x.endswith("dummy")]


def compute_emb_s(
    w: Dict[str, jax.Array], t: jax.Array, z_cond: jax.Array
) -> jax.Array:
    """``silu(time_emb[:,None,:] + input_emb)`` flattened to ``[BG, Ce*emb]``."""
    import math

    tf = t.astype(jnp.float32)[:, None]
    freqs = tf * w["fourier_w"][None, :] * (2.0 * math.pi)
    t_feat = jnp.concatenate([tf, jnp.sin(freqs), jnp.cos(freqs)], axis=-1)
    t_emb = t_feat @ w["time_w1"] + w["time_b1"]
    t_emb = jax.nn.gelu(t_emb, approximate=False)
    t_emb = t_emb @ w["time_w2"] + w["time_b2"]
    input_emb = jax.nn.silu(z_cond @ w["input_w"] + w["input_b"])
    latent = t_emb[:, None, :] + input_emb
    return jax.nn.silu(latent).reshape(latent.shape[0], -1)


def _mm(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _kernel(dims: DenoiserDims, names: List[str], compute_dtype, *refs):
    # refs = (x_ref, emb_ref, *weight_refs, out_ref)
    x_ref, emb_ref = refs[0], refs[1]
    out_ref = refs[-1]
    w = dict(zip(names, refs[2:-1]))
    L = dims.seq_len
    groups = dims.groups
    h_, d = dims.heads, dims.dim_head
    hd = h_ * d
    cd = compute_dtype

    def _silu(x):
        # bf16 logistic hits a Mosaic verification bug on some shapes;
        # compute the sigmoid in f32 and cast back.
        xf = x.astype(jnp.float32)
        return (xf * jax.nn.sigmoid(xf)).astype(cd)

    emb_s = emb_ref[:].astype(cd)  # [R, Ce*emb]

    # ---- init conv (in-channels 1): broadcasted taps ----
    init_w = w["init_w"][:].astype(jnp.float32)  # [7, 1, L]
    init_b = w["init_b"][:].astype(jnp.float32)
    half = init_w.shape[0] // 2
    xs = []
    for l in range(L):
        acc = None
        for tap in range(init_w.shape[0]):
            src = l + tap - half
            if src < 0 or src >= L:
                continue
            col = x_ref[:, src : src + 1].astype(jnp.float32)  # [R, 1]
            term = col * init_w[tap, 0, :][None, :]
            acc = term if acc is None else acc + term
        xs.append((acc + init_b[None, :]).astype(cd))

    def conv3(xs, wk, bk):
        wv = wk[:].astype(cd)  # [3, Cin, Cout]
        bv = bk[:].astype(jnp.float32)
        outs = []
        for l in range(L):
            acc = None
            for tap in range(3):
                src = l + tap - 1
                if src < 0 or src >= L:
                    continue
                term = _mm(xs[src], wv[tap])
                acc = term if acc is None else acc + term
            outs.append((acc + bv[None, :]).astype(cd))
        return outs

    def group_norm(xs, scale_ref, shift_ref):
        C = xs[0].shape[-1]
        gs = C // groups
        scale = scale_ref[:].astype(jnp.float32)
        shift = shift_ref[:].astype(jnp.float32)
        # fp32 stats over (L x group channels); affine applied in f32 too
        # (1-sublane bf16 broadcasts are unsupported by Mosaic).
        pieces = [[None] * groups for _ in range(L)]
        for g in range(groups):
            sl = slice(g * gs, (g + 1) * gs)
            parts = [x[:, sl].astype(jnp.float32) for x in xs]
            n = float(L * gs)
            mean = sum(p.sum(axis=1, keepdims=True) for p in parts) / n
            var = (
                sum((p * p).sum(axis=1, keepdims=True) for p in parts) / n
                - mean * mean
            )
            inv = jax.lax.rsqrt(var + 1e-5)
            for l in range(L):
                normed = (parts[l] - mean) * inv
                pieces[l][g] = (
                    normed * scale[sl][None, :] + shift[sl][None, :]
                ).astype(cd)
        return [jnp.concatenate(pieces[l], axis=1) for l in range(L)]

    def resblock(xs, prefix):
        ss = (
            _mm(emb_s, w[f"{prefix}_mlp_w"][:].astype(cd))
            + w[f"{prefix}_mlp_b"][:].astype(jnp.float32)[None, :]
        ).astype(cd)
        C = w[f"{prefix}_block1_w"].shape[2]
        scale, shift = ss[:, :C], ss[:, C:]
        h = conv3(xs, w[f"{prefix}_block1_w"], w[f"{prefix}_block1_b"])
        h = group_norm(h, w[f"{prefix}_block1_scale"], w[f"{prefix}_block1_shift"])
        ce = jnp.asarray(float(dims.cond_channels), cd)
        h = [x * (scale + ce) + shift for x in h]
        h = [_silu(x) for x in h]
        h = conv3(h, w[f"{prefix}_block2_w"], w[f"{prefix}_block2_b"])
        h = group_norm(h, w[f"{prefix}_block2_scale"], w[f"{prefix}_block2_shift"])
        h = [_silu(x) for x in h]
        return [a + b for a, b in zip(h, xs)]

    def channel_ln(x, g):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        return (
            (xf - mean) * jax.lax.rsqrt(var + 1e-5) * g.astype(jnp.float32)[None, :]
        ).astype(cd)

    def attention(xs, i):
        g_in = w[f"b{i}_attn_norm_g"][:]
        qkv_w = w[f"b{i}_qkv_w"][:].astype(cd)
        out_w = w[f"b{i}_attn_out_w"][:].astype(cd)
        out_b = w[f"b{i}_attn_out_b"][:].astype(jnp.float32)
        g_out = w[f"b{i}_attn_out_g"][:]

        qkv = [_mm(channel_ln(x, g_in), qkv_w).astype(cd) for x in xs]
        q = [v[:, :hd] for v in qkv]
        k = [v[:, hd : 2 * hd] for v in qkv]
        v = [t[:, 2 * hd :] for t in qkv]

        # k: softmax over the L axis — elementwise across slices
        kf = [t.astype(jnp.float32) for t in k]
        kmax = functools.reduce(jnp.maximum, kf)
        ke = [jnp.exp(t - kmax) for t in kf]
        ksum = sum(ke)
        kn = [(t / ksum).astype(cd) for t in ke]

        # Algebraic 2-D form (keeps Mosaic away from 3-D tiny-tile tensors):
        #   out_l[r, e] = sum_m s_{lm}[r] * v_m[r, e],
        #   s_{lm}[r]   = sum_d q'_l[r, d] * k'_m[r, d]   (per head)
        outs = [[] for _ in range(L)]
        for hh in range(h_):
            sl = slice(hh * d, (hh + 1) * d)
            inv_scale = jnp.asarray(d**-0.5, jnp.float32)
            qh = []
            for l in range(L):
                qf = q[l][:, sl].astype(jnp.float32)
                qf = qf - jnp.max(qf, axis=1, keepdims=True)
                e = jnp.exp(qf)
                qh.append((e / e.sum(axis=1, keepdims=True)) * inv_scale)
            kh = [kn[l][:, sl].astype(jnp.float32) for l in range(L)]
            vh = [v[l][:, sl].astype(jnp.float32) for l in range(L)]
            for l in range(L):
                o = None
                for m in range(L):
                    s_lm = jnp.sum(qh[l] * kh[m], axis=1, keepdims=True)  # [R,1]
                    term = s_lm * vh[m]
                    o = term if o is None else o + term
                outs[l].append(o.astype(cd))

        res = []
        for l in range(L):
            o = jnp.concatenate(outs[l], axis=1)  # [R, hd]
            o = (_mm(o, out_w) + out_b[None, :]).astype(cd)
            res.append(xs[l] + channel_ln(o, g_out))
        return res

    for i in range(len(dims.block_channels)):
        xs = resblock(xs, f"b{i}r1")
        xs = resblock(xs, f"b{i}r2")
        xs = attention(xs, i)
        xs = conv3(xs, w[f"b{i}_proj_w"], w[f"b{i}_proj_b"])

    xs = resblock(xs, "final")

    fw = w["final_conv_w"][:].astype(cd)  # [C, 1]
    fb = w["final_conv_b"][:].astype(jnp.float32)
    cols = [(_mm(x, fw) + fb[None, :]).astype(cd) for x in xs]  # [R, 1] each
    out_ref[:] = jnp.concatenate(cols, axis=1).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("dims", "block_rows", "interpret", "compute_dtype")
)
def fused_denoiser_pallas(
    weights: Dict[str, jax.Array],
    x: jax.Array,
    emb_s: jax.Array,
    dims: DenoiserDims,
    block_rows: int = 256,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """Fused denoiser forward.

    Args:
        weights: packed tree from :func:`pack_denoiser_weights` (fp32 or bf16).
        x: ``[BG, 1, L]`` latents.
        emb_s: ``[BG, Ce*emb]`` from :func:`compute_emb_s`.
    Returns:
        eps ``[BG, 1, L]`` in ``x.dtype``.
    """
    BG = x.shape[0]
    L = dims.seq_len
    R = block_rows
    pad = (-BG) % R
    x2 = x[:, 0, :]
    if pad:
        x2 = jnp.concatenate([x2, jnp.zeros((pad, L), x2.dtype)])
        emb_s = jnp.concatenate(
            [emb_s, jnp.zeros((pad, emb_s.shape[1]), emb_s.dtype)]
        )
    n_chunks = x2.shape[0] // R

    names = weight_names(dims)
    w_arrays = [weights[n] for n in names]

    in_specs = [
        pl.BlockSpec((R, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (R, emb_s.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
    ]
    for a in w_arrays:
        nd = a.ndim
        in_specs.append(
            pl.BlockSpec(
                a.shape, (lambda i, _nd=nd: (0,) * _nd), memory_space=pltpu.VMEM
            )
        )

    out = pl.pallas_call(
        functools.partial(_kernel, dims, names, compute_dtype),
        grid=(n_chunks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((R, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((x2.shape[0], L), x.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(x2, emb_s, *w_arrays)
    if pad:
        out = out[:BG]
    return out[:, None, :]
