"""Per-stage Pallas TPU kernels for the stacked-matmul denoiser.

The XLA stacked denoiser (:mod:`stacked_denoiser`) is HBM-bound: ~2.4 ms/step
at BG=8192 against a 0.74 ms matmul floor, because every GroupNorm / FiLM /
SiLU / residual pass streams the full ``[BG, L*C]`` activations through HBM.
These kernels run one NETWORK STAGE (resblock x2 + linear attention + proj,
or the final resblock + head) per launch with activations resident in VMEM,
so per-stage HBM traffic collapses to (X in + X out + weights).

Mosaic-safety rules baked into the design (the round-1 mega-kernel hit
20-50 min compiles and bf16 `logistic` miscompiles):
  * NO reshapes and NO unaligned lane slicing inside the kernel. GroupNorm /
    per-position LayerNorm statistics are computed with one-hot averaging
    MATMULS (``X @ M_pool`` then ``mu @ M_bcast``), built at pack time.
  * The only lane slicing is on ``[R, L*hd]`` attention tensors at
    128-aligned position boundaries (hd = heads * dim_head = 128).
  * sigmoid/exp run in fp32 (bf16 transcendentals miscompile on Mosaic).
  * Each stage is a separate, small kernel -> tractable compile times.

Attention uses the exact ``(q k^T) v`` reassociation from
`stacked_denoiser._attention_stacked` (q softmaxed over d, k over L,
so the bilinear product reassociates): the per-row context tensor never
materializes.

Numerically equal to ``GraspLatentDDM.apply`` within bf16 tolerance
(interpret-mode parity test in tests/test_fused_denoiser.py).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_denoiser import DenoiserDims
from .stacked_denoiser import (
    FLAGSHIP_DIMS,
    band_matrix,
    _block_diag,
    pack_stacked_weights,
    compute_emb_s_stacked,
)

__all__ = ["pack_pallas_weights", "stacked_denoiser_pallas_apply"]


# ---------------------------------------------------------------------------
# pack-time auxiliary matrices (one-hot pooling / broadcast)
# ---------------------------------------------------------------------------


def _gn_pool_matrices(L: int, C: int, groups: int):
    """(M_pool [L*C, groups], M_bcast [groups, L*C]) for GroupNorm stats
    over (group channels x all L positions); pooling averages (exact: the
    1/(L*gs) divisor is a power of two)."""
    gs = C // groups
    pool = np.zeros((L * C, groups), np.float32)
    bcast = np.zeros((groups, L * C), np.float32)
    for l in range(L):
        for c in range(C):
            g = c // gs
            pool[l * C + c, g] = 1.0 / (L * gs)
            bcast[g, l * C + c] = 1.0
    return jnp.asarray(pool), jnp.asarray(bcast)


def _pos_pool_matrices(L: int, C: int):
    """Per-position channel-LayerNorm pooling over C columns."""
    pool = np.zeros((L * C, L), np.float32)
    bcast = np.zeros((L, L * C), np.float32)
    for l in range(L):
        pool[l * C : (l + 1) * C, l] = 1.0 / C
        bcast[l, l * C : (l + 1) * C] = 1.0
    return jnp.asarray(pool), jnp.asarray(bcast)


def _head_pool_matrices(L: int, H: int, D: int):
    """q-softmax segment pooling: sum over d within each (l, h) 32-block of
    a [R, L*H*D] tensor, and its broadcast back."""
    hd = H * D
    pool = np.zeros((L * hd, L * H), np.float32)
    bcast = np.zeros((L * H, L * hd), np.float32)
    for l in range(L):
        for h in range(H):
            cols = slice(l * hd + h * D, l * hd + (h + 1) * D)
            pool[cols, l * H + h] = 1.0
            bcast[l * H + h, cols] = 1.0
    return jnp.asarray(pool), jnp.asarray(bcast)


def pack_pallas_weights(
    variables: Dict, dims: DenoiserDims = FLAGSHIP_DIMS,
    dtype=jnp.bfloat16,
) -> Dict:
    """Stacked weights + kernel aux matrices, cast for the TPU kernels."""
    w = pack_stacked_weights(variables, dims)
    L = dims.seq_len
    H, D = dims.heads, dims.dim_head
    out: Dict[str, jax.Array] = {}

    def put(k, v):
        out[k] = v.astype(dtype)

    for k in ("fourier_w", "time_w1", "time_b1", "time_w2", "time_b2",
              "input_w", "input_b"):
        out[k] = w[k]  # embedding path stays fp32 (runs in XLA)
    put("init_W", w["init_W"])
    put("init_b", w["init_b"])

    def pack_resblock(prefix, C):
        # FiLM mlp tiled to full width: ss_full [R, 2*L*C]
        mw, mb = w[f"{prefix}_mlp_w"], w[f"{prefix}_mlp_b"]
        put(f"{prefix}_mlpW",
            jnp.concatenate([jnp.tile(mw[:, :C], (1, L)),
                             jnp.tile(mw[:, C:], (1, L))], axis=1))
        put(f"{prefix}_mlpb",
            jnp.concatenate([jnp.tile(mb[:C], L), jnp.tile(mb[C:], L)]))
        for blk in ("block1", "block2"):
            put(f"{prefix}_{blk}_W", w[f"{prefix}_{blk}_W"])
            put(f"{prefix}_{blk}_b", w[f"{prefix}_{blk}_b"])
            put(f"{prefix}_{blk}_scale", w[f"{prefix}_{blk}_scale"])
            put(f"{prefix}_{blk}_shift", w[f"{prefix}_{blk}_shift"])
        if f"{prefix}_res_W" in w:
            put(f"{prefix}_res_W", w[f"{prefix}_res_W"])
            put(f"{prefix}_res_b", w[f"{prefix}_res_b"])

    # within block i the resblocks + attention run at the INCOMING width;
    # the trailing proj conv performs the channel change (see the flax core:
    # blocks_{i} = [ResnetBlock(C_in) x2, attn(C_in), Conv(C_in -> C_i)])
    chans = list(dims.block_channels)
    dim0 = w["init_W"].shape[1] // L
    cins = [dim0] + chans[:-1]
    for i, C in enumerate(cins):
        pack_resblock(f"b{i}r1", C)
        pack_resblock(f"b{i}r2", C)
        # attention: block-diagonal q/k/v [L*C, L*hd] + out [L*hd, L*C]
        qkv = w[f"b{i}_qkv_w"]  # [C, 3*hd]
        hd = H * D
        put(f"b{i}_Wq", _block_diag(qkv[:, :hd], L))
        put(f"b{i}_Wk", _block_diag(qkv[:, hd : 2 * hd], L))
        put(f"b{i}_Wv", _block_diag(qkv[:, 2 * hd :], L))
        put(f"b{i}_Wo", _block_diag(w[f"b{i}_attn_out_w"], L))
        put(f"b{i}_Wo_b", jnp.tile(w[f"b{i}_attn_out_b"], L))
        put(f"b{i}_norm_g", jnp.tile(w[f"b{i}_attn_norm_g"], L))
        put(f"b{i}_out_g", jnp.tile(w[f"b{i}_attn_out_g"], L))
        put(f"b{i}_proj_W", w[f"b{i}_proj_W"])
        put(f"b{i}_proj_b", w[f"b{i}_proj_b"])
    pack_resblock("final", chans[-1])
    put("final_W", w["final_W"])
    put("final_b", w["final_b"])

    # aux one-hot matrices (kept fp32; tiny)
    for C in sorted(set(cins + [chans[-1]])):
        p, b = _gn_pool_matrices(L, C, dims.groups)
        out[f"gnpool_{C}"], out[f"gnbcast_{C}"] = p, b
        pp, pb = _pos_pool_matrices(L, C)
        out[f"pospool_{C}"], out[f"posbcast_{C}"] = pp, pb
    qp, qb = _head_pool_matrices(L, H, D)
    out["qpool"], out["qbcast"] = qp, qb
    # per-head indicator matrices for the score sums, in compute dtype
    hd = H * D
    out["hpool"] = qp[:hd, :H].astype(dtype)
    out["hbcast"] = qb[:H, :hd].astype(dtype)
    return out


# ---------------------------------------------------------------------------
# in-kernel math (values, not refs)
# ---------------------------------------------------------------------------


def _mmf(a, b):
    """Matmul with fp32 accumulate/output."""
    return jax.lax.dot_general(
        a, b, (((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _silu_f32(x):
    xf = x.astype(jnp.float32)
    return (xf * jax.nn.sigmoid(xf)).astype(x.dtype)


def _group_norm_k(x, scale, shift, pool, bcast, eps=1e-5):
    """GroupNorm via pooling matmuls. x [R, LC] bf16; stats fp32."""
    xf = x.astype(jnp.float32)
    mu = _mmf(xf, pool)          # [R, groups] (already averaged)
    musq = _mmf(xf * xf, pool)
    var = jnp.maximum(musq - mu * mu, 0.0)
    mu_f = _mmf(mu, bcast)       # [R, LC]
    inv_f = _mmf(jax.lax.rsqrt(var + eps), bcast)
    return ((xf - mu_f) * inv_f).astype(x.dtype) * scale + shift


def _pos_ln_k(x, g, pool, bcast, eps=1e-5):
    """Per-position channel LayerNorm via pooling matmuls."""
    xf = x.astype(jnp.float32)
    mu = _mmf(xf, pool)
    musq = _mmf(xf * xf, pool)
    var = jnp.maximum(musq - mu * mu, 0.0)
    mu_f = _mmf(mu, bcast)
    inv_f = _mmf(jax.lax.rsqrt(var + eps), bcast)
    return ((xf - mu_f) * inv_f).astype(x.dtype) * g


def _resblock_k(x, emb_s, g, prefix, L, C, cond_channels):
    """One ResnetBlock on VMEM values. g = dict of weight values.

    ``emb_s`` arrives in the compute dtype; the FiLM matmul accumulates
    fp32 so the scale/shift stay fp32 through the modulation.
    """
    ss = _mmf(emb_s, g[f"{prefix}_mlpW"]) + g[f"{prefix}_mlpb"].astype(
        jnp.float32
    )  # [R, 2*L*C] fp32
    scale_f = ss[:, : L * C]
    shift_f = ss[:, L * C :]

    h = _mmf(x, g[f"{prefix}_block1_W"]).astype(x.dtype) + g[f"{prefix}_block1_b"]
    h = _group_norm_k(
        h, g[f"{prefix}_block1_scale"], g[f"{prefix}_block1_shift"],
        g[f"gnpool_{C}"], g[f"gnbcast_{C}"],
    )
    h = (
        h.astype(jnp.float32) * (scale_f + float(cond_channels)) + shift_f
    ).astype(x.dtype)
    h = _silu_f32(h)
    h = _mmf(h, g[f"{prefix}_block2_W"]).astype(x.dtype) + g[f"{prefix}_block2_b"]
    h = _group_norm_k(
        h, g[f"{prefix}_block2_scale"], g[f"{prefix}_block2_shift"],
        g[f"gnpool_{C}"], g[f"gnbcast_{C}"],
    )
    h = _silu_f32(h)
    if f"{prefix}_res_W" in g:
        x = _mmf(x, g[f"{prefix}_res_W"]).astype(x.dtype) + g[f"{prefix}_res_b"]
    return h + x


def _attention_k(x, g, i, L, C, H, D):
    """Linear attention, (q k^T) v order, 128-aligned slicing only."""
    hd = H * D
    normed = _pos_ln_k(
        x, g[f"b{i}_norm_g"], g[f"pospool_{C}"], g[f"posbcast_{C}"]
    )
    q = _mmf(normed, g[f"b{i}_Wq"])  # [R, L*hd] fp32
    k = _mmf(normed, g[f"b{i}_Wk"])
    v = _mmf(normed, g[f"b{i}_Wv"]).astype(x.dtype)

    # q softmax over d within each (l, h) 32-block: global-row-max shift
    # (exact softmax; larger shift only costs underflow range)
    qmax = jnp.max(q, axis=-1, keepdims=True)
    qe = jnp.exp(q - qmax)
    qs = _mmf(_mmf(qe, g["qpool"]), g["qbcast"])
    q = (qe / qs) * (float(D) ** -0.5)

    # k softmax over the L position blocks per (h, d)
    ks = [k[:, l * hd : (l + 1) * hd] for l in range(L)]
    kmax = functools.reduce(jnp.maximum, ks)
    kes = [jnp.exp(kl - kmax) for kl in ks]
    ksum = functools.reduce(jnp.add, kes)
    ks = [(ke / ksum).astype(x.dtype) for ke in kes]

    q = q.astype(x.dtype)
    qs_l = [q[:, l * hd : (l + 1) * hd] for l in range(L)]
    vs_m = [v[:, m * hd : (m + 1) * hd] for m in range(L)]

    # scores s[l, m] per head: [R, H]; out_l = sum_m bcast(s) * v_m
    hp = g["hpool"]   # [hd, H] 0/1 head indicator (compute dtype)
    hb = g["hbcast"]  # [H, hd]
    outs = []
    for l in range(L):
        acc = None
        for m in range(L):
            s = _mmf(qs_l[l] * ks[m], hp)                   # [R, H] fp32
            sm = _mmf(s.astype(hb.dtype), hb).astype(x.dtype)  # [R, hd]
            term = sm * vs_m[m]
            acc = term if acc is None else acc + term
        outs.append(acc)
    out = jnp.concatenate(outs, axis=-1)  # [R, L*hd]
    out = _mmf(out, g[f"b{i}_Wo"]).astype(x.dtype) + g[f"b{i}_Wo_b"]
    out = _pos_ln_k(
        out, g[f"b{i}_out_g"], g[f"pospool_{C}"], g[f"posbcast_{C}"]
    )
    return x + out


# ---------------------------------------------------------------------------
# per-stage pallas_call wrappers
# ---------------------------------------------------------------------------


def _full_kernel(names, dims, cins, *refs):
    """All stages in one launch: zero inter-stage HBM round-trips."""
    x_ref, emb_ref = refs[0], refs[1]
    out_ref = refs[-1]
    g = {n: r[...] for n, r in zip(names, refs[2:-1])}
    L = dims.seq_len
    x = x_ref[...]
    emb = emb_ref[...]
    for i, C in enumerate(cins):
        x = _resblock_k(x, emb, g, f"b{i}r1", L, C, dims.cond_channels)
        x = _resblock_k(x, emb, g, f"b{i}r2", L, C, dims.cond_channels)
        x = _attention_k(x, g, i, L, C, dims.heads, dims.dim_head)
        x = _mmf(x, g[f"b{i}_proj_W"]).astype(x.dtype) + g[f"b{i}_proj_b"]
    x = _resblock_k(x, emb, g, "final", L, dims.block_channels[-1],
                    dims.cond_channels)
    out_ref[...] = _mmf(x, g["final_W"]).astype(x.dtype) + g["final_b"]


def _run_full(w, x, emb_s, dims, cins, block_rows, interpret):
    R = block_rows
    BG = x.shape[0]
    assert BG % R == 0
    L = dims.seq_len
    names = []
    for i, C in enumerate(cins):
        names += _stage_weight_names(w, i, dims, C, final=False)
    names += _stage_weight_names(w, 0, dims, dims.block_channels[-1],
                                 final=True)
    seen = set()
    names = [n for n in names if not (n in seen or seen.add(n))]
    arrays = [w[n] for n in names]

    in_specs = [
        pl.BlockSpec((R, x.shape[1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((R, emb_s.shape[1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    for a in arrays:
        nd = a.ndim
        in_specs.append(
            pl.BlockSpec(a.shape, (lambda i, _nd=nd: (0,) * _nd),
                         memory_space=pltpu.VMEM)
        )
    return pl.pallas_call(
        functools.partial(_full_kernel, names, dims, cins),
        grid=(BG // R,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((R, L), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BG, L), x.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
    )(x, emb_s, *arrays)


def _stage_kernel(names, dims, stage_i, C, *refs):
    x_ref, emb_ref = refs[0], refs[1]
    out_ref = refs[-1]
    g = {n: r[...] for n, r in zip(names, refs[2:-1])}
    L = dims.seq_len
    x = x_ref[...]
    emb = emb_ref[...]
    x = _resblock_k(x, emb, g, f"b{stage_i}r1", L, C, dims.cond_channels)
    x = _resblock_k(x, emb, g, f"b{stage_i}r2", L, C, dims.cond_channels)
    x = _attention_k(x, g, stage_i, L, C, dims.heads, dims.dim_head)
    x = _mmf(x, g[f"b{stage_i}_proj_W"]).astype(x.dtype) + g[f"b{stage_i}_proj_b"]
    out_ref[...] = x


def _final_kernel(names, dims, C, *refs):
    x_ref, emb_ref = refs[0], refs[1]
    out_ref = refs[-1]
    g = {n: r[...] for n, r in zip(names, refs[2:-1])}
    L = dims.seq_len
    x = x_ref[...]
    emb = emb_ref[...]
    x = _resblock_k(x, emb, g, "final", L, C, dims.cond_channels)
    out_ref[...] = (
        _mmf(x, g["final_W"]).astype(x.dtype) + g["final_b"]
    )


def _stage_weight_names(w, stage_i, dims, C, final=False):
    names = []
    prefixes = ("final",) if final else (f"b{stage_i}r1", f"b{stage_i}r2")
    for p in prefixes:
        names += [f"{p}_mlpW", f"{p}_mlpb"]
        for blk in ("block1", "block2"):
            names += [f"{p}_{blk}_W", f"{p}_{blk}_b",
                      f"{p}_{blk}_scale", f"{p}_{blk}_shift"]
        if f"{p}_res_W" in w:
            names += [f"{p}_res_W", f"{p}_res_b"]
    names += [f"gnpool_{C}", f"gnbcast_{C}"]
    if final:
        names += ["final_W", "final_b"]
    else:
        names += [
            f"b{stage_i}_Wq", f"b{stage_i}_Wk", f"b{stage_i}_Wv",
            f"b{stage_i}_Wo", f"b{stage_i}_Wo_b",
            f"b{stage_i}_norm_g", f"b{stage_i}_out_g",
            f"pospool_{C}", f"posbcast_{C}", "qpool", "qbcast",
            "hpool", "hbcast",
            f"b{stage_i}_proj_W", f"b{stage_i}_proj_b",
        ]
    return names


def _run_stage(w, x, emb_s, dims, stage_i, final, block_rows, interpret):
    R = block_rows
    BG = x.shape[0]
    assert BG % R == 0
    n_chunks = BG // R
    L = dims.seq_len
    # resblocks + attention run at the incoming width C_in; the proj conv
    # at the stage's end maps to L * block_channels[stage_i].
    C_in = x.shape[1] // L
    names = _stage_weight_names(w, stage_i, dims, C_in, final=final)
    arrays = [w[n] for n in names]
    out_cols = L if final else L * dims.block_channels[stage_i]

    in_specs = [
        pl.BlockSpec((R, x.shape[1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((R, emb_s.shape[1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    for a in arrays:
        nd = a.ndim
        in_specs.append(
            pl.BlockSpec(a.shape, (lambda i, _nd=nd: (0,) * _nd),
                         memory_space=pltpu.VMEM)
        )
    kernel = (
        functools.partial(_final_kernel, names, dims, C_in)
        if final
        else functools.partial(_stage_kernel, names, dims, stage_i, C_in)
    )
    return pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((R, out_cols), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BG, out_cols), x.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(x, emb_s, *arrays)


def stacked_denoiser_pallas_apply(
    w: Dict[str, jax.Array],
    x: jax.Array,
    t: jax.Array,
    z_cond: jax.Array,
    dims: DenoiserDims = FLAGSHIP_DIMS,
    block_rows: int = 512,
    interpret: bool = False,
    fuse_stages: bool = False,
    input_emb: Optional[jax.Array] = None,
) -> jax.Array:
    """Full denoiser forward via fused Pallas kernels.

    Args:
        w: tree from :func:`pack_pallas_weights` (bf16 weights + fp32 aux).
        x: ``[BG, 1, L]`` latents; t ``[BG]``; z_cond ``[BG, Ce, cond_dim]``.
        input_emb: optional precomputed ``compute_input_emb(w, z_cond)``
            (``[BG, Ce, emb]``) — constant across sampler steps, hoist it
            out of the scan to cut per-step glue.
        fuse_stages: run the WHOLE network in one kernel launch instead of
            one kernel per stage. Measured a wash on v5e (1.58-1.72 ms/step
            fused vs 1.58-1.61 per-stage at BG=8192 bf16, identical
            outputs): the chain is compute-bound inside the kernels, not on
            inter-stage HBM round-trips. Kept for R/topology experiments.
    """
    in_dtype = x.dtype
    dtype = w["init_W"].dtype
    L = dims.seq_len
    BG = x.shape[0]
    # Per-stage timing at BG=8192/R=512: stage0 (width 16) ~0.30 ms,
    # stage1 ~0.31, stage2 ~0.41, stage3 ~0.70, final ~0.54 — the NARROW
    # stages are bounded by per-op issue latency, not FLOPs or chunk count
    # (giving them 8x larger row blocks measured WORSE: 1.67 vs 1.58
    # ms/step). A uniform R is the best-known configuration; per-stage
    # block sizes are accepted for experiments.
    if isinstance(block_rows, int):
        rs = [block_rows] * (len(dims.block_channels) + 1)
    else:
        rs = list(block_rows)
    rs = [min(r, BG) for r in rs]
    pad = (-BG) % max(rs)

    emb_s = compute_emb_s_stacked(
        w, t,
        z_cond=None if input_emb is not None else z_cond.astype(jnp.float32),
        input_emb=input_emb,
    )
    emb_s = emb_s.astype(dtype)
    X = (x[:, 0, :].astype(dtype) @ w["init_W"]) + w["init_b"]
    if pad:
        X = jnp.concatenate([X, jnp.zeros((pad, X.shape[1]), X.dtype)])
        emb_s = jnp.concatenate(
            [emb_s, jnp.zeros((pad, emb_s.shape[1]), emb_s.dtype)]
        )
    # channel growth between stages rides the stage's first res conv, so the
    # input width of stage i is L * C_{i-1}; stage 0 consumes the init width.
    dim0 = w["init_W"].shape[1] // L
    cins = [dim0] + list(dims.block_channels[:-1])
    if fuse_stages:
        X = _run_full(w, X, emb_s, dims, cins, rs[-1], interpret)
    else:
        for i in range(len(dims.block_channels)):
            X = _run_stage(w, X, emb_s, dims, i, False, rs[i], interpret)
        X = _run_stage(w, X, emb_s, dims, 0, True, rs[-1], interpret)
    if pad:
        X = X[:BG]
    return X[:, None, :].astype(in_dtype)
