"""Per-stage Pallas TPU kernels for the stacked-matmul denoiser.

The XLA stacked denoiser (:mod:`stacked_denoiser`) is HBM-bound: ~2.4 ms/step
at BG=8192 against a 0.74 ms matmul floor, because every GroupNorm / FiLM /
SiLU / residual pass streams the full ``[BG, L*C]`` activations through HBM.
These kernels run one NETWORK STAGE (resblock x2 + linear attention + proj,
or the final resblock + head) per launch with activations resident in VMEM,
so per-stage HBM traffic collapses to (X in + X out + weights).

Measured performance map (v5e, BG=8192 bf16, R=512, 100-step access
pattern; see tools/bench_pallas.py): full chain 1.50 ms/step against a
0.73 ms matmul-only floor and 0.12 ms of XLA glue — the remaining ~0.65 ms
is VPU norm/softmax/silu work that Mosaic schedules STRICTLY SERIAL with
the MXU. Variants measured and rejected: naive L^2 score loop / "mloop" /
"pairs" attention are all within noise of each other; fp32-resident
activations +7%; row-split (2/4 independent sub-blocks for ILP) +3/+16%;
block rows 1024/2048 compile >10 min; whole-net single launch a wash.
The kernel math therefore minimizes instruction count and keeps the
compute dtype end-to-end:

  * GroupNorm / per-position LayerNorm statistics are one-hot-averaging
    MATMULS (``X @ M_pool``), and the normalize+affine collapses to
    ``x * (inv @ bcast_scaled) - (mu * inv) @ bcast_scaled + shift`` with the
    per-channel affine gain pre-multiplied into the broadcast matrix at pack
    time — no full-width fp32 intermediates.
  * Linear attention batches the ``L x L`` score/broadcast pairs: one
    pooling matmul per key position ("mloop", L launches of 2 matmuls)
    or one for ALL pairs at ``L^2`` width ("pairs") instead of the naive
    ``L^2`` per-pair loop (5x the instructions, measured slower).
  * Activations stay in the COMPUTE dtype between ops (bf16 VPU ops are
    measurably faster than fp32 here; an fp32-resident variant lost 7%);
    fp32 appears only inside norm stats and softmax transcendentals.

Mosaic-safety rules baked into the design (the round-1 mega-kernel hit
20-50 min compiles and bf16 `logistic` miscompiles):
  * NO reshapes inside the kernel; lane slicing only at block boundaries
    that exist in the layout (attention ``[R, L*hd]`` slices at hd=128).
  * sigmoid/exp run in fp32 (bf16 transcendentals miscompile on Mosaic).
  * Each stage is a separate, small kernel -> tractable compile times.

Attention uses the exact ``(q k^T) v`` reassociation from
`stacked_denoiser._attention_stacked` (q softmaxed over d, k over L,
so the bilinear product reassociates): the per-row context tensor never
materializes.

GENERIC L: at L=16 (the partial-pc z16 flagship and every VAE decoder
core) the layout decisions flip — see `_use_sliced` (per-position
exact-FLOP convs at Cin >= 128), `_conv_group` (pair-sliced convs at
Cin = 64), per-GROUP qkv projections (g = 128/C block-diag, up to 8x
fewer FLOPs than the full block-diag) and per-position out-projections
(hd = 128 is lane-aligned). Measured L=16 chain at BG=8192 bf16:
round-2 kernels 9.58 -> 8.17 ms/step; per-stage 1.27 / 1.52 / 1.85 /
2.60 / 1.71, of which the attention-free kernel bodies are only
0.21 / 0.39 / 0.65 / 1.37 / 1.74 — the in-kernel attention (~1.1-1.3
ms/stage, dominated by the L^3-scaling score pooling + its serial VPU
work) is the known wall. Measured alternatives, all REJECTED: attention
in XLA between kernel launches (einsum 3.98 / ctx-association 3.92 /
pooling-form 5.63 ms/stage — every XLA form round-trips [BG, L*H*D]
through HBM; the hybrid chain was 18.5 ms/step; see `XLA_ATTENTION` and
tools/bench_attn.py) and slice-wise mloop products (8.33 vs 8.17).

Numerically equal to ``GraspLatentDDM.apply`` within bf16 tolerance
(interpret-mode parity test in tests/test_fused_denoiser.py).
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_denoiser import DenoiserDims, pack_denoiser_weights
from .stacked_denoiser import (
    FLAGSHIP_DIMS,
    band_matrix,
    _block_diag,
    pack_stacked_weights,
    compute_emb_s_stacked,
)

__all__ = ["pack_pallas_weights", "stacked_denoiser_pallas_apply"]

# attention inner-product strategy: "mloop" (one pooling-matmul pair per key
# position), "lloop" (one pair per QUERY position: drops the v-tile
# materialization and turns the full-width output accumulation into
# hd-wide slice reductions), "pairs" (single L^2-wide batched pooling) or
# "opt" (per-query loop with the q-softmax normalization FOLDED into a
# per-(l,h) post-accumulation scale, reciprocal-multiply softmax
# denominators, slice-wise products and hd-slice FMA accumulation — the
# same matmul count as lloop but ~2.5 fewer full-width VPU passes per
# query position; measured WITHIN RUN NOISE of mloop on the z16 chain,
# 7.03 vs 7.06 ms/step — the chain is critical-path bound, not
# VPU-pass bound). All are exact (up to float reassociation).
ATTN_IMPL = os.environ.get("GRASPLDM_ATTN_IMPL", "mloop")

# score/softmax head-broadcast strategy: "matmul" ([R, L*H] @ qbcast — an
# MXU pass as big as the score pooling itself, K=128-padded x N=L*hd) or
# "repeat" (VPU lane-repeat: each (l, h) score lane replicated D times —
# drops HALF the attention MXU flops if Mosaic lowers it well; measure
# with tools/bench_pallas.py --stages before flipping the default).
ATTN_BCAST = os.environ.get("GRASPLDM_ATTN_BCAST", "matmul")

# v2 norm/FiLM paths: GroupNorm statistics, their normalize/affine
# broadcasts, and the FiLM scale/shift are all POSITION-INDEPENDENT (the
# affine gains are per-channel and the FiLM MLP weights are tiled L times
# at pack time), so the [R, L*C] @ [L*C, tiny-N] pooling matmuls — whose
# MXU cost is K * 128(padded N) * R regardless of the tiny true N, much of
# it in fp32 — collapse to a slice-reduction over position blocks plus
# matmuls at width max(C, 128): an L*C/max(C,128)-fold K reduction on
# every GN/FiLM matmul. The [R, W] results are tile-copied back to full
# width (lane-aligned copies). Exact up to sum reassociation.
FILM_NORM_V2 = os.environ.get("GRASPLDM_KERNEL_V2", "1") != "0"


def _v2_block_width(L: int, C: int) -> int:
    """Lane-aligned position-block width for the v2 slice-reduction: the
    smallest multiple of C that is >= 128 (so slices land on lane-tile
    boundaries). Returns 0 when the reduction would be trivial (< 2
    blocks), in which case the v1 full-width pooling path is used."""
    W = C if C >= 128 else C * (128 // C) if 128 % C == 0 else 0
    if W == 0 or (L * C) % W or (L * C) // W < 2:
        return 0
    return W

# rows-per-grid-step are processed in this many independent sub-blocks.
# Intended to let Mosaic overlap sub-block A's MXU matmuls with sub-block
# B's VPU work; MEASURED: the scheduler does not interleave (2 -> +3%,
# 4 -> +16%), so the default stays 1. Kept for future-compiler experiments.
ROW_SPLIT = 1


def _use_sliced(L: int, Cin: int) -> bool:
    """Static choice between dense block-banded matmuls and per-position
    SLICED matmuls for convs/projections.

    The banded [L*Cin, L*Cout] form wastes (L^2 - 3L + 2)/L^2 of its MXU
    flops on structural zeros — 37% at L=4 (cheap, and one launch beats L
    launches there) but 83% at L=16 (the partial-pc z16 flagship), where
    the sliced form ``out_l = x_pad[l : l+k] @ W_taps`` does exact-FLOP
    work with lane-aligned slices (Cin >= 128).
    """
    return L > 4 and Cin >= 128


def _conv_group(L: int, Cin: int) -> int:
    """Positions per GROUP-sliced conv window (0 = dense banded).

    Lane alignment needs slice offsets at multiples of 128 columns, so
    narrow stages can't use per-position slices. Grouping g = 128/Cin
    positions restores alignment: ``out_group_j = x_pad[(j-1)g : (j+2)g] @
    W_g`` costs g x the exact conv FLOPs (vs L/k x for dense banded).
    Worth it only while g x exact < dense, i.e. g < L/k — at L=16 that is
    g = 2 (Cin = 64), where it cuts the conv cost 2.6x. Narrower stages
    (g >= 4) stay dense banded: their absolute conv cost is tiny and the
    grouped form would not beat it.
    """
    if L > 4 and Cin == 64:
        return 2
    return 0


# Attention placement experiment flag — MEASURED AND REJECTED as default.
# True routes L>4 attention to XLA between kernel launches
# (`stacked_denoiser._attention_stacked`). v5e measurements at BG=8192
# bf16, L=16, 20-step chain: XLA einsum 3.98 ms/stage, XLA ctx
# association 3.92, XLA mloop-pooling 5.63 (tools/bench_attn.py — all
# HBM/layout-bound: every formulation streams multi-pass [BG, L*H*D]
# intermediates), vs ~1.2 ms/stage for the VMEM-resident in-kernel score
# pooling. The hybrid chain measured 18.5 ms/step vs 9.6 all-kernel.
XLA_ATTENTION = False


def _use_xla_attention(dims: DenoiserDims) -> bool:
    """Attention placement: in-kernel (default) or XLA between kernels.

    The in-kernel score path (`_attention_k`) batches the per-key-position
    inner products as one-hot pooling matmuls on [R, L*H*D] VMEM operands;
    its cost scales ~L^3 (~1.2 ms/stage at L=16) but every XLA
    formulation measured 3-5x worse (see `XLA_ATTENTION`), because the
    kernels keep the activations in VMEM while XLA round-trips them
    through HBM for each of its ~10 unfused passes.
    """
    return XLA_ATTENTION and dims.seq_len > 4


# ---------------------------------------------------------------------------
# pack-time auxiliary matrices (one-hot pooling / broadcast)
# ---------------------------------------------------------------------------


def _group_band_matrix(w_taps: jax.Array, g: int) -> jax.Array:
    """k-tap conv ``[k, Cin, Cout]`` -> window matrix ``[3*g*Cin, g*Cout]``
    for GROUP-sliced convs (`_conv_group`): output group j consumes the
    3-group input window ``x_pad[(j-1)g : (j+2)g]``. Rows for window
    positions outside each output position's k-tap reach stay zero."""
    k, cin, cout = w_taps.shape
    half = k // 2
    W = jnp.zeros((3 * g * cin, g * cout), w_taps.dtype)
    for p in range(g):  # output position within the group
        for tap in range(k):
            src = g + p + tap - half  # window-relative input position
            W = W.at[
                src * cin : (src + 1) * cin, p * cout : (p + 1) * cout
            ].set(w_taps[tap])
    return W


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


def _gn_pool2_matrices(C: int, groups: int, W: int, L: int):
    """v2 GN pooling at block width W = g2*C (g2 positions per block):
    pool2 [W, groups] maps a position-block-reduced tensor to per-group
    means (the 1/(L*gs) divisor covers ALL L positions, summed by the
    in-kernel slice reduction); bcast2 [groups, W] broadcasts back over
    one block (the kernel tiles the result to full width)."""
    gs = C // groups
    g2 = W // C
    pool = np.zeros((W, groups), np.float32)
    bcast = np.zeros((groups, W), np.float32)
    for p in range(g2):
        for c in range(C):
            g = c // gs
            pool[p * C + c, g] = 1.0 / (L * gs)
            bcast[g, p * C + c] = 1.0
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
    """q-softmax segment pooling: sum over d within each (l, h) block of
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
    wraw = pack_denoiser_weights(variables, dims)  # raw conv taps
    L = dims.seq_len
    H, D = dims.heads, dims.dim_head
    out: Dict[str, jax.Array] = {}

    def put(k, v):
        out[k] = v.astype(dtype)

    for k in ("fourier_w", "time_w1", "time_b1", "time_w2", "time_b2",
              "input_w", "input_b", "cls_w", "cls_b",
              "region_w1", "region_b1", "region_w2", "region_b2"):
        if k in w:
            out[k] = w[k]  # embedding path stays fp32 (runs in XLA)
    put("init_W", w["init_W"])
    put("init_b", w["init_b"])

    def put_conv(name, raw_key, Cin):
        """Pack a k-tap conv in its cheapest lane-aligned form."""
        if _use_sliced(L, Cin):
            taps = wraw[raw_key]  # [k, Cin, Cout]
            put(f"{name}_W3", taps.reshape(-1, taps.shape[-1]))
        elif _conv_group(L, Cin):
            put(f"{name}_W3g",
                _group_band_matrix(wraw[raw_key], _conv_group(L, Cin)))
        else:
            put(f"{name}_W", w[f"{name}_W"])

    def pack_resblock(prefix, C):
        gn_pool, gn_bcast = _gn_pool_matrices(L, C, dims.groups)
        # FiLM mlp tiled to full width: ss_full [R, 2*L*C]
        mw, mb = w[f"{prefix}_mlp_w"], w[f"{prefix}_mlp_b"]
        put(f"{prefix}_mlpW",
            jnp.concatenate([jnp.tile(mw[:, :C], (1, L)),
                             jnp.tile(mw[:, C:], (1, L))], axis=1))
        put(f"{prefix}_mlpb",
            jnp.concatenate([jnp.tile(mb[:C], L), jnp.tile(mb[C:], L)]))
        W2 = _v2_block_width(L, C)
        if W2:
            g2 = W2 // C
            # v2 FiLM: one position-block wide, tile-copied in the kernel
            put(f"{prefix}_mlpWsc", jnp.tile(mw[:, :C], (1, g2)))
            put(f"{prefix}_mlpbsc", jnp.tile(mb[:C], g2))
            put(f"{prefix}_mlpWsh", jnp.tile(mw[:, C:], (1, g2)))
            put(f"{prefix}_mlpbsh", jnp.tile(mb[C:], g2))
        for blk in ("block1", "block2"):
            put_conv(f"{prefix}_{blk}", f"{prefix}_{blk}_w", C)
            put(f"{prefix}_{blk}_b", w[f"{prefix}_{blk}_b"])
            # affine gain folded into the stat-broadcast matrix: the kernel
            # computes x * (inv @ bcs) - (mu*inv) @ bcs + shift
            put(f"{prefix}_{blk}_bcs",
                gn_bcast * w[f"{prefix}_{blk}_scale"][None, :])
            put(f"{prefix}_{blk}_shift", w[f"{prefix}_{blk}_shift"])
            if W2:
                _, bcast2 = _gn_pool2_matrices(C, dims.groups, W2, L)
                put(f"{prefix}_{blk}_bcs2",
                    bcast2
                    * w[f"{prefix}_{blk}_scale"][None, :W2])
        if f"{prefix}_res_W" in w:
            if _use_sliced(L, C):
                put(f"{prefix}_res_Wc", wraw[f"{prefix}_res_w"])
            elif _conv_group(L, C):
                put(f"{prefix}_res_Wg",
                    _block_diag(wraw[f"{prefix}_res_w"], _conv_group(L, C)))
            else:
                put(f"{prefix}_res_W", w[f"{prefix}_res_W"])
            put(f"{prefix}_res_b", w[f"{prefix}_res_b"])

    # within block i the resblocks + attention run at the INCOMING width;
    # the trailing proj conv performs the channel change (see the flax core:
    # blocks_{i} = [ResnetBlock(C_in) x2, attn(C_in), Conv(C_in -> C_i)])
    chans = list(dims.block_channels)
    dim0 = w["init_W"].shape[1] // L
    cins = [dim0] + chans[:-1]
    xla_attn = _use_xla_attention(dims)
    for i, C in enumerate(cins):
        pack_resblock(f"b{i}r1", C)
        pack_resblock(f"b{i}r2", C)
        hd = H * D
        if xla_attn:
            # attention runs in XLA between the stage kernels: keep the
            # transpose-free interleaved einsum weights built by
            # `pack_stacked_weights` (consumed by `_attention_stacked`)
            for k in (f"b{i}_Wq", f"b{i}_Wk", f"b{i}_Wv", f"b{i}_Wo",
                      f"b{i}_Wo_b", f"b{i}_norm_g_t", f"b{i}_out_g_t"):
                put(k, w[k])
        else:
            # in-kernel attention projections, cheapest lane-aligned form:
            #   * per-position [C, hd] when C itself is lane-aligned
            #     (C >= 128): exact FLOPs;
            #   * per-GROUP block-diag [g*C, g*hd] with g = 128/C for
            #     narrow stages at L > 4: g x exact (vs L x for the full
            #     block-diag — 8x cheaper at C=64);
            #   * full block-diagonal [L*C, L*hd] at L=4, where one
            #     full-lane launch beats L tiny ones.
            # The out-projection is per-position [hd, C] whenever
            # hd = H*D is lane-aligned (default hd=128): exact FLOPs.
            qkv = w[f"b{i}_qkv_w"]  # [C, 3*hd]
            g_att = max(1, 128 // C) if L > 4 else 1
            if L > 4 and C % 128 == 0:
                put(f"b{i}_Wq_c", qkv[:, :hd])
                put(f"b{i}_Wk_c", qkv[:, hd : 2 * hd])
                put(f"b{i}_Wv_c", qkv[:, 2 * hd :])
            elif g_att > 1 and L % g_att == 0:
                put(f"b{i}_Wq_g", _block_diag(qkv[:, :hd], g_att))
                put(f"b{i}_Wk_g", _block_diag(qkv[:, hd : 2 * hd], g_att))
                put(f"b{i}_Wv_g", _block_diag(qkv[:, 2 * hd :], g_att))
            else:
                put(f"b{i}_Wq", _block_diag(qkv[:, :hd], L))
                put(f"b{i}_Wk", _block_diag(qkv[:, hd : 2 * hd], L))
                put(f"b{i}_Wv", _block_diag(qkv[:, 2 * hd :], L))
            if L > 4 and (H * D) % 128 == 0:
                put(f"b{i}_Wo_c", w[f"b{i}_attn_out_w"])
            else:
                put(f"b{i}_Wo", _block_diag(w[f"b{i}_attn_out_w"], L))
            put(f"b{i}_Wo_b", jnp.tile(w[f"b{i}_attn_out_b"], L))
            # per-position LN gains folded into the broadcast matrices
            _, pos_bcast = _pos_pool_matrices(L, C)
            put(f"b{i}_normA",
                pos_bcast * jnp.tile(w[f"b{i}_attn_norm_g"], L)[None, :])
            put(f"b{i}_outA",
                pos_bcast * jnp.tile(w[f"b{i}_attn_out_g"], L)[None, :])
        put_conv(f"b{i}_proj", f"b{i}_proj_w", C)
        put(f"b{i}_proj_b", w[f"b{i}_proj_b"])
    pack_resblock("final", chans[-1])
    put("final_W", w["final_W"])
    put("final_b", w["final_b"])

    # aux one-hot matrices (pool stats fp32; broadcast sides that produce
    # compute-dtype tensors are stored in the compute dtype)
    for C in sorted(set(cins + [chans[-1]])):
        p, _ = _gn_pool_matrices(L, C, dims.groups)
        out[f"gnpool_{C}"] = p
        W2 = _v2_block_width(L, C)
        if W2:
            p2, _ = _gn_pool2_matrices(C, dims.groups, W2, L)
            out[f"gnpool2_{C}"] = p2
        if not xla_attn:
            pp, _ = _pos_pool_matrices(L, C)
            out[f"pospool_{C}"] = pp
    if not xla_attn:
        qp, qb = _head_pool_matrices(L, H, D)
        out["qpool"], out["qbcast"] = qp, qb
        put("qpool_c", qp)   # compute-dtype copies for the score path
        put("qbcast_c", qb)
        if ATTN_IMPL == "pairs":
            # L^2-pair pooling for the "pairs" attention strategy
            put("qpool_p", _block_diag(qp, L))
            put("qbcast_p", _block_diag(qb, L))
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


def _mmd(a, b, dtype):
    """Matmul cast to ``dtype`` (Mosaic requires a 32-bit accumulator, so
    a post-matmul cast is the only way to land in the compute dtype).

    Activations stay in the COMPUTE dtype between ops: bf16 VPU ops run
    measurably faster than fp32 here (fp32-resident activations with
    cast-at-matmul-input measured 1.61 vs 1.51 ms/step), so the compute
    dtype is kept end-to-end and fp32 appears only inside stats/softmax.
    """
    return _mmf(a, b).astype(dtype)


def _silu_f32(x):
    """SiLU with fp32 transcendentals (Mosaic miscompiles bf16 `logistic`).

    The raw-exp form ``x / (1 + exp(-x))`` measures 2.0x faster in
    ISOLATION (112.5 -> 56.7 us per [8192, 2048] call, bit-identical;
    tools/bench_silu.py) but a WASH in situ (z16 chain 7.06 -> 7.14
    ms/step): the kernels' VPU work hides under the MXU pipeline, so
    only matmul-count changes move the chain. Kept in the canonical
    ``x * sigmoid(x)`` form.
    """
    xf = x.astype(jnp.float32)
    return (xf * jax.nn.sigmoid(xf)).astype(x.dtype)


def _tile_full(a, n):
    """[R, W] -> [R, n*W] by lane-aligned tile copies."""
    return a if n == 1 else jnp.concatenate([a] * n, axis=-1)


def _norm_apply2_k(x, shift, pool2, bcs2, eps=1e-5):
    """v2 GroupNorm: position-block slice-reduction + narrow matmuls.

    ``pool2 [W, groups]`` consumes the block-summed tensor (W = g2*C,
    lane-aligned); the normalize/affine factors are computed at width W
    and tile-copied to full width — exact (up to sum reassociation)
    because GN statistics and the per-channel affine gain are
    position-independent. Collapses the K dimension of every GN matmul
    by L*C/W (16x at the z16 flagship's wide stages).
    """
    W = pool2.shape[0]
    n = x.shape[1] // W
    xf = x.astype(jnp.float32)
    xsq = xf * xf
    xs = functools.reduce(
        jnp.add, [xf[:, j * W : (j + 1) * W] for j in range(n)]
    )
    xs2 = functools.reduce(
        jnp.add, [xsq[:, j * W : (j + 1) * W] for j in range(n)]
    )
    mu = _mmf(xs, pool2)          # [R, groups] (already averaged)
    musq = _mmf(xs2, pool2)
    var = jnp.maximum(musq - mu * mu, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    A = _mmd(inv.astype(bcs2.dtype), bcs2, x.dtype)      # [R, W]
    B = _mmd((mu * inv).astype(bcs2.dtype), bcs2, x.dtype)
    y = x * _tile_full(A, n) - _tile_full(B, n)
    return y + shift if shift is not None else y


def _norm_apply_k(x, shift, pool, bcast_s, eps=1e-5):
    """Normalize-with-folded-affine on ``x [R, LC]``.

    Stats (mean/var over the pooling pattern) via one-hot matmuls; the
    full-width application runs in the compute dtype:
    ``y = x * A - B (+ shift)`` with ``A = inv @ bcast_s`` and
    ``B = (mu * inv) @ bcast_s`` (bcast_s carries the affine gain).

    (bf16-input stat matmuls — MXU fp32 accumulation from compute-dtype
    operands — were measured a WASH on the z16 chain, 7.056 -> 7.039
    ms/step within run noise, and reverted: the chain is bound by its
    dependent-op critical path, not stat-matmul precision. See NEXT.md
    round-5 notes.)
    """
    xf = x.astype(jnp.float32)
    mu = _mmf(xf, pool)          # [R, groups|L] (already averaged)
    musq = _mmf(xf * xf, pool)
    var = jnp.maximum(musq - mu * mu, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    A = _mmd(inv.astype(bcast_s.dtype), bcast_s, x.dtype)
    B = _mmd((mu * inv).astype(bcast_s.dtype), bcast_s, x.dtype)
    y = x * A - B
    return y + shift if shift is not None else y


def _conv3_k(x, g, name, L, Cin, dtype):
    """k-tap conv on stacked ``x [R, L*Cin]`` -> ``[R, L*Cout]``.

    Dense block-banded matmul when ``{name}_W`` is packed; exact-FLOP
    SLICED form (zero-pad + per-position [R, k*Cin] @ [k*Cin, Cout]) when
    ``{name}_W3`` is packed (L > 4, lane-aligned Cin); GROUP-sliced window
    form (`_group_band_matrix`, 3-group window per g-position output
    group) when ``{name}_W3g`` is packed (L > 4, Cin = 64).
    """
    if f"{name}_W" in g:
        return _mmd(x, g[f"{name}_W"], dtype) + g[f"{name}_b"]
    if f"{name}_W3g" in g:
        Wg = g[f"{name}_W3g"]
        gcin = Wg.shape[0] // 3  # group width in columns (128-aligned)
        n_groups = x.shape[1] // gcin
        z = jnp.zeros((x.shape[0], gcin), x.dtype)
        xp = jnp.concatenate([z, x, z], axis=-1)
        out = jnp.concatenate(
            [
                _mmf(xp[:, j * gcin : (j + 3) * gcin], Wg)
                for j in range(n_groups)
            ],
            axis=-1,
        )
        return out.astype(dtype) + g[f"{name}_b"]
    W3 = g[f"{name}_W3"]
    k = W3.shape[0] // Cin
    half = k // 2
    z = jnp.zeros((x.shape[0], half * Cin), x.dtype)
    xp = jnp.concatenate([z, x, z], axis=-1)
    out = jnp.concatenate(
        [_mmf(xp[:, l * Cin : (l + k) * Cin], W3) for l in range(L)],
        axis=-1,
    )
    return out.astype(dtype) + g[f"{name}_b"]


def _dense_per_l_k(x, W, L, Cin, dtype=None):
    """Per-position 1x1 projection: ``out_l = x_l @ W [Cin, Cout]``."""
    out = jnp.concatenate(
        [_mmf(x[:, l * Cin : (l + 1) * Cin], W) for l in range(L)], axis=-1
    )
    return out if dtype is None else out.astype(dtype)


def _resblock_k(x, emb_s, g, prefix, L, C, cond_channels):
    """One ResnetBlock on VMEM values. g = dict of weight values."""
    if f"{prefix}_mlpWsc" in g:
        # v2 FiLM: block-wide matmuls + tile copies (see FILM_NORM_V2)
        sc = _mmd(emb_s, g[f"{prefix}_mlpWsc"], x.dtype) + g[f"{prefix}_mlpbsc"]
        sh = _mmd(emb_s, g[f"{prefix}_mlpWsh"], x.dtype) + g[f"{prefix}_mlpbsh"]
        n = (L * C) // sc.shape[1]
        scale = _tile_full(sc, n)
        shift = _tile_full(sh, n)
    else:
        ss = _mmd(emb_s, g[f"{prefix}_mlpW"], x.dtype) + g[f"{prefix}_mlpb"]
        scale = ss[:, : L * C]
        shift = ss[:, L * C :]

    def norm(h, blk):
        if f"{prefix}_{blk}_bcs2" in g:
            return _norm_apply2_k(
                h, g[f"{prefix}_{blk}_shift"], g[f"gnpool2_{C}"],
                g[f"{prefix}_{blk}_bcs2"],
            )
        return _norm_apply_k(
            h, g[f"{prefix}_{blk}_shift"], g[f"gnpool_{C}"],
            g[f"{prefix}_{blk}_bcs"],
        )

    h = _conv3_k(x, g, f"{prefix}_block1", L, C, x.dtype)
    h = norm(h, "block1")
    h = h * (scale + jnp.asarray(float(cond_channels), x.dtype)) + shift
    h = _silu_f32(h)
    h = _conv3_k(h, g, f"{prefix}_block2", L, C, x.dtype)
    h = norm(h, "block2")
    h = _silu_f32(h)
    if f"{prefix}_res_W" in g:
        x = _mmd(x, g[f"{prefix}_res_W"], x.dtype) + g[f"{prefix}_res_b"]
    elif f"{prefix}_res_Wc" in g:
        x = (
            _dense_per_l_k(x, g[f"{prefix}_res_Wc"], L, C, x.dtype)
            + g[f"{prefix}_res_b"]
        )
    elif f"{prefix}_res_Wg" in g:
        Wg = g[f"{prefix}_res_Wg"]  # group block-diag [g*Cin, g*Cout]
        gcin = Wg.shape[0]
        x = (
            _dense_per_l_k(x, Wg, x.shape[1] // gcin, gcin, x.dtype)
            + g[f"{prefix}_res_b"]
        )
    return h + x


def _tile_block(x, m, hd, L):
    """[R, L*hd] -> the m-th hd block tiled L times (lane-aligned copies)."""
    blk = x[:, m * hd : (m + 1) * hd]
    return jnp.concatenate([blk] * L, axis=-1)


def _head_bcast(s, D, dtype=None):
    """[R, n*H] per-head scalars -> [R, n*hd], each lane repeated D times
    (the qbcast matmul's exact result, on the VPU instead of the MXU)."""
    out = jnp.repeat(s, D, axis=1)
    return out if dtype is None else out.astype(dtype)


def _attention_tail(x, out, g, i, L, C):
    """Shared attention epilogue: out-projection + LayerNorm + residual."""
    if f"b{i}_Wo_c" in g:
        hd_ = g[f"b{i}_Wo_c"].shape[0]
        out = (
            _dense_per_l_k(out, g[f"b{i}_Wo_c"], L, hd_, x.dtype)
            + g[f"b{i}_Wo_b"]
        )
    else:
        out = _mmd(out, g[f"b{i}_Wo"], x.dtype) + g[f"b{i}_Wo_b"]
    out = _norm_apply_k(out, None, g[f"pospool_{C}"], g[f"b{i}_outA"])
    return x + out


def _attention_opt(x, qe, k, v, g, L, H, D):
    """VPU-diet score path (``ATTN_IMPL="opt"``).

    Identical math to mloop/lloop, restructured to cut both the MXU and
    VPU cost of the per-row score contraction:

    * the q-softmax DENOMINATOR (and the ``D**-0.5`` scale) is not applied
      to ``qe`` — it is a per-``(l, h)`` scalar, so it commutes through the
      d-contraction AND the m-accumulation and lands as one narrow
      ``[R, hd]`` multiply on the accumulated output per query position
      (drops the q-normalization division and its broadcast entirely);
    * the k-softmax divides once per (h, d) via a narrow reciprocal
      ([R, hd]) and a full-width MULTIPLY (bf16) instead of a full-width
      fp32 divide;
    * the m-accumulation runs as hd-wide slice FMAs (no full-width term
      tensor, no full-width accumulator, no q/k/v tile materializations).

    The pooling + broadcast MATMULS are kept: they are the lane-crossing
    floor of this dataflow (every (l, m) score is contracted FROM a
    32-lane segment and fanned back OUT to 32 lanes; on Mosaic every
    lane-crossing primitive — one-hot matmul, transpose, interleave — has
    the same ~[R,2048]x128 MXU cost, and `jnp.repeat` does not lower at
    all). See the module docstring for the measured-and-rejected list.

    Exact up to float reassociation; parity-tested against the flax
    lowering in tests/test_fused_denoiser.py.
    """
    hd = H * D
    dt = x.dtype
    # folded q normalization: out_l scale = D^-0.5 / qs[l, h], broadcast
    # once for all query positions (ONE bcast matmul instead of L).
    qs = _mmf(qe, g["qpool"])                       # [R, L*H] fp32
    qinv = ((float(D) ** -0.5) / qs).astype(dt)     # narrow reciprocal
    qinvw = _mmd(qinv, g["qbcast_c"], dt)           # [R, L*hd]
    qeb = qe.astype(dt)

    # k softmax over the L position blocks per (h, d): reciprocal-multiply
    # (narrow [R, hd] reciprocal + bf16 multiply, not a full-width divide)
    kblks = [k[:, m * hd : (m + 1) * hd] for m in range(L)]
    kmax = functools.reduce(jnp.maximum, kblks)
    ke = jnp.exp(k - _tile_full(kmax, L))
    ksum = functools.reduce(
        jnp.add, [ke[:, m * hd : (m + 1) * hd] for m in range(L)]
    )
    krecip = (1.0 / ksum).astype(dt)
    kn = ke.astype(dt) * _tile_full(krecip, L)

    parts = []
    for l in range(L):
        ql = qeb[:, l * hd : (l + 1) * hd]
        # slice-wise products (no ql tile materialization)
        prod = jnp.concatenate(
            [ql * kn[:, m * hd : (m + 1) * hd] for m in range(L)], axis=-1
        )
        s = _mmd(prod, g["qpool_c"], dt)            # [R, L*H] raw scores
        sb = _mmd(s, g["qbcast_c"], dt)             # [R, L*hd]
        # m-accumulation: hd-wide slice FMAs (no full-width term tensor)
        acc = functools.reduce(
            jnp.add,
            [
                sb[:, m * hd : (m + 1) * hd] * v[:, m * hd : (m + 1) * hd]
                for m in range(L)
            ],
        )
        parts.append(acc * qinvw[:, l * hd : (l + 1) * hd])
    return jnp.concatenate(parts, axis=-1)


def _attention_k(x, g, i, L, C, H, D):
    """Linear attention, (q k^T) v order, batched score pooling."""
    hd = H * D
    normed = _norm_apply_k(
        x, None, g[f"pospool_{C}"], g[f"b{i}_normA"]
    )
    if f"b{i}_Wq_c" in g:
        q = _dense_per_l_k(normed, g[f"b{i}_Wq_c"], L, C)
        k = _dense_per_l_k(normed, g[f"b{i}_Wk_c"], L, C)
        v = _dense_per_l_k(normed, g[f"b{i}_Wv_c"], L, C, x.dtype)
    elif f"b{i}_Wq_g" in g:
        gC = g[f"b{i}_Wq_g"].shape[0]  # group width (128-aligned)
        ng = (L * C) // gC
        q = _dense_per_l_k(normed, g[f"b{i}_Wq_g"], ng, gC)
        k = _dense_per_l_k(normed, g[f"b{i}_Wk_g"], ng, gC)
        v = _dense_per_l_k(normed, g[f"b{i}_Wv_g"], ng, gC, x.dtype)
    else:
        q = _mmf(normed, g[f"b{i}_Wq"])  # [R, L*hd] fp32
        k = _mmf(normed, g[f"b{i}_Wk"])
        v = _mmd(normed, g[f"b{i}_Wv"], x.dtype)

    # q softmax over d within each (l, h) block: global-row-max shift
    # (exact softmax; larger shift only costs underflow range)
    qmax = jnp.max(q, axis=-1, keepdims=True)
    qe = jnp.exp(q - qmax)
    if ATTN_IMPL == "opt":
        out = _attention_opt(x, qe, k, v, g, L, H, D)
        return _attention_tail(x, out, g, i, L, C)
    if ATTN_BCAST == "repeat":
        qs = _head_bcast(_mmf(qe, g["qpool"]), D)
    else:
        qs = _mmf(_mmf(qe, g["qpool"]), g["qbcast"])
    qn = ((qe / qs) * (float(D) ** -0.5)).astype(x.dtype)

    # k softmax over the L position blocks per (h, d), batched full-width
    kblks = [k[:, m * hd : (m + 1) * hd] for m in range(L)]
    kmax = functools.reduce(jnp.maximum, kblks)
    ke = jnp.exp(k - jnp.concatenate([kmax] * L, axis=-1))
    ksum = functools.reduce(
        jnp.add, [ke[:, m * hd : (m + 1) * hd] for m in range(L)]
    )
    kn = (ke / jnp.concatenate([ksum] * L, axis=-1)).astype(x.dtype)

    # scores s[l, m] per head = sum_d q_l * k_m; out_l = sum_m bcast(s) v_m
    if ATTN_IMPL == "pairs":
        # one batched pooling over all L^2 (l, m) pairs, m-major layout
        qt = jnp.concatenate([qn] * L, axis=-1)              # [R, L^2*hd]
        kt = jnp.concatenate(
            [_tile_block(kn, m, hd, L) for m in range(L)], axis=-1
        )
        vt = jnp.concatenate(
            [_tile_block(v, m, hd, L) for m in range(L)], axis=-1
        )
        s = _mmd(qt * kt, g["qpool_p"], x.dtype)             # [R, L^2*H]
        sb = (
            _head_bcast(s, D)
            if ATTN_BCAST == "repeat"
            else _mmd(s, g["qbcast_p"], x.dtype)
        )
        terms = sb * vt
        w = L * hd
        out = functools.reduce(
            jnp.add, [terms[:, m * w : (m + 1) * w] for m in range(L)]
        )
    elif ATTN_IMPL == "lloop":
        # one pooling-matmul pair per QUERY position l: vs mloop this
        # drops the v-tile materialization (v is consumed in place) and
        # replaces the full-width output accumulation with hd-wide slice
        # reductions — same MXU flops, ~2 fewer full-width VPU passes
        # per iteration.
        parts = []
        for l in range(L):
            ql = _tile_block(qn, l, hd, L)                   # [R, L*hd]
            s = _mmd(ql * kn, g["qpool_c"], x.dtype)         # [R, L*H]
            sb = (
                _head_bcast(s, D)
                if ATTN_BCAST == "repeat"
                else _mmd(s, g["qbcast_c"], x.dtype)         # [R, L*hd]
            )
            term = sb * v
            parts.append(functools.reduce(
                jnp.add,
                [term[:, m * hd : (m + 1) * hd] for m in range(L)],
            ))
        out = jnp.concatenate(parts, axis=-1)
    else:  # "mloop": one pooling-matmul pair per key position m
        # (a slice-wise-product variant that builds the q*k_m / sb*v_m
        # tensors block-by-block from lane-aligned hd slices — avoiding
        # the two tile materializations — measured 8.33 vs 8.17 ms for
        # the L=16 chain: the concat writes cost as much as the tiles)
        out = None
        for m in range(L):
            km = _tile_block(kn, m, hd, L)                   # [R, L*hd]
            s = _mmd(qn * km, g["qpool_c"], x.dtype)         # [R, L*H]
            sb = (
                _head_bcast(s, D)
                if ATTN_BCAST == "repeat"
                else _mmd(s, g["qbcast_c"], x.dtype)         # [R, L*hd]
            )
            term = sb * _tile_block(v, m, hd, L)
            out = term if out is None else out + term

    return _attention_tail(x, out, g, i, L, C)


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
        x = _conv3_k(x, g, f"b{i}_proj", L, C, x.dtype)
    x = _resblock_k(x, emb, g, "final", L, dims.block_channels[-1],
                    dims.cond_channels)
    out_ref[...] = _mmd(x, g["final_W"], x.dtype) + g["final_b"]


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


def _row_parts(x_ref, emb_ref):
    """Split the block's rows into ROW_SPLIT independent sub-blocks."""
    x = x_ref[...]
    emb = emb_ref[...]
    n = ROW_SPLIT
    R = x.shape[0]
    if n == 1 or R % n:
        return [(x, emb, slice(None))]
    r = R // n
    return [
        (x[j * r : (j + 1) * r], emb[j * r : (j + 1) * r],
         slice(j * r, (j + 1) * r))
        for j in range(n)
    ]


def _stage_kernel(names, dims, stage_i, C, *refs):
    x_ref, emb_ref = refs[0], refs[1]
    out_ref = refs[-1]
    g = {n: r[...] for n, r in zip(names, refs[2:-1])}
    L = dims.seq_len
    for x, emb, rows in _row_parts(x_ref, emb_ref):
        x = _resblock_k(x, emb, g, f"b{stage_i}r1", L, C,
                        dims.cond_channels)
        x = _resblock_k(x, emb, g, f"b{stage_i}r2", L, C,
                        dims.cond_channels)
        x = _attention_k(x, g, stage_i, L, C, dims.heads, dims.dim_head)
        out_ref[rows, :] = _conv3_k(x, g, f"b{stage_i}_proj", L, C, x.dtype)


def _final_kernel(names, dims, C, *refs):
    x_ref, emb_ref = refs[0], refs[1]
    out_ref = refs[-1]
    g = {n: r[...] for n, r in zip(names, refs[2:-1])}
    L = dims.seq_len
    for x, emb, rows in _row_parts(x_ref, emb_ref):
        x = _resblock_k(x, emb, g, "final", L, C, dims.cond_channels)
        out_ref[rows, :] = _mmd(x, g["final_W"], x.dtype) + g["final_b"]


def _conv_key(w, name):
    for suffix in ("_W", "_W3", "_W3g"):
        if f"{name}{suffix}" in w:
            return f"{name}{suffix}"
    raise KeyError(f"no packed conv for {name!r}")


def _res_names(w, prefix):
    v2 = FILM_NORM_V2 and f"{prefix}_mlpWsc" in w
    if v2:
        names = [f"{prefix}_mlpWsc", f"{prefix}_mlpbsc",
                 f"{prefix}_mlpWsh", f"{prefix}_mlpbsh"]
    else:
        names = [f"{prefix}_mlpW", f"{prefix}_mlpb"]
    for blk in ("block1", "block2"):
        names += [_conv_key(w, f"{prefix}_{blk}"), f"{prefix}_{blk}_b",
                  f"{prefix}_{blk}_shift"]
        names += [
            f"{prefix}_{blk}_bcs2"
            if v2 and f"{prefix}_{blk}_bcs2" in w
            else f"{prefix}_{blk}_bcs"
        ]
    for suffix in ("_res_W", "_res_Wc", "_res_Wg"):
        if f"{prefix}{suffix}" in w:
            names += [f"{prefix}{suffix}", f"{prefix}_res_b"]
            break
    return names


def _stage_weight_names(w, stage_i, dims, C, final=False):
    names = []
    prefixes = ("final",) if final else (f"b{stage_i}r1", f"b{stage_i}r2")
    for p in prefixes:
        names += _res_names(w, p)
    names += [f"gnpool_{C}"]
    if FILM_NORM_V2 and f"gnpool2_{C}" in w:
        names += [f"gnpool2_{C}"]
    if final:
        names += ["final_W", "final_b"]
    else:
        suff = (
            "_c" if f"b{stage_i}_Wq_c" in w
            else "_g" if f"b{stage_i}_Wq_g" in w
            else ""
        )
        wo = f"b{stage_i}_Wo_c" if f"b{stage_i}_Wo_c" in w else f"b{stage_i}_Wo"
        names += [
            f"b{stage_i}_Wq{suff}", f"b{stage_i}_Wk{suff}",
            f"b{stage_i}_Wv{suff}",
            wo, f"b{stage_i}_Wo_b",
            f"b{stage_i}_normA", f"b{stage_i}_outA",
            f"pospool_{C}", "qpool", "qbcast",
            _conv_key(w, f"b{stage_i}_proj"), f"b{stage_i}_proj_b",
        ]
        names += ["qpool_c", "qbcast_c"]
        if ATTN_IMPL == "pairs":
            names += ["qpool_p", "qbcast_p"]
    return names


# ---------------------------------------------------------------------------
# hybrid stages (L > 4): kernels carry convs/FiLM/GN/SiLU, attention in XLA
# ---------------------------------------------------------------------------


def _hybrid_weight_names(w, stage_i, dims, C, final=False):
    names = []
    j = (len(dims.block_channels) - 1) if final else stage_i - 1
    if j >= 0:  # the PREVIOUS stage's channel-change proj opens this kernel
        names += [_conv_key(w, f"b{j}_proj"), f"b{j}_proj_b"]
    for p in (("final",) if final else (f"b{stage_i}r1", f"b{stage_i}r2")):
        names += _res_names(w, p)
    names += [f"gnpool_{C}"]
    if FILM_NORM_V2 and f"gnpool2_{C}" in w:
        names += [f"gnpool2_{C}"]
    if final:
        names += ["final_W", "final_b"]
    return names


def _hybrid_stage_kernel(names, dims, stage_i, C_prev, C, *refs):
    """[proj_{i-1} (i > 0)] + resblock x2 — attention follows in XLA."""
    x_ref, emb_ref = refs[0], refs[1]
    out_ref = refs[-1]
    g = {n: r[...] for n, r in zip(names, refs[2:-1])}
    L = dims.seq_len
    x = x_ref[...]
    emb = emb_ref[...]
    if stage_i > 0:
        x = _conv3_k(x, g, f"b{stage_i - 1}_proj", L, C_prev, x.dtype)
    x = _resblock_k(x, emb, g, f"b{stage_i}r1", L, C, dims.cond_channels)
    x = _resblock_k(x, emb, g, f"b{stage_i}r2", L, C, dims.cond_channels)
    out_ref[...] = x


def _hybrid_final_kernel(names, dims, n_stages, C_prev, C, *refs):
    """proj_{n-1} + final resblock + head."""
    x_ref, emb_ref = refs[0], refs[1]
    out_ref = refs[-1]
    g = {n: r[...] for n, r in zip(names, refs[2:-1])}
    L = dims.seq_len
    x = x_ref[...]
    emb = emb_ref[...]
    x = _conv3_k(x, g, f"b{n_stages - 1}_proj", L, C_prev, x.dtype)
    x = _resblock_k(x, emb, g, "final", L, C, dims.cond_channels)
    out_ref[...] = _mmd(x, g["final_W"], x.dtype) + g["final_b"]


def _run_stage(w, x, emb_s, dims, stage_i, final, block_rows, interpret):
    R = block_rows
    BG = x.shape[0]
    assert BG % R == 0
    n_chunks = BG // R
    L = dims.seq_len
    C_in = x.shape[1] // L
    if _use_xla_attention(dims):
        # hybrid kernel: [prev proj] + resblock x2 (+ final head); the
        # input width is the PRE-proj width of the previous stage
        if final:
            C = dims.block_channels[-1]
            names = _hybrid_weight_names(w, 0, dims, C, final=True)
            kernel = functools.partial(
                _hybrid_final_kernel, names, dims,
                len(dims.block_channels), C_in, C,
            )
            out_cols = L
        else:
            C = C_in if stage_i == 0 else dims.block_channels[stage_i - 1]
            names = _hybrid_weight_names(w, stage_i, dims, C, final=False)
            kernel = functools.partial(
                _hybrid_stage_kernel, names, dims, stage_i, C_in, C,
            )
            out_cols = L * C
        return _launch_stage(
            kernel, [w[n] for n in names], x, emb_s, R, n_chunks, out_cols,
            interpret,
        )
    # resblocks + attention run at the incoming width C_in; the proj conv
    # at the stage's end maps to L * block_channels[stage_i].
    names = _stage_weight_names(w, stage_i, dims, C_in, final=final)
    arrays = [w[n] for n in names]
    out_cols = L if final else L * dims.block_channels[stage_i]
    kernel = (
        functools.partial(_final_kernel, names, dims, C_in)
        if final
        else functools.partial(_stage_kernel, names, dims, stage_i, C_in)
    )
    return _launch_stage(
        kernel, arrays, x, emb_s, R, n_chunks, out_cols, interpret
    )


def _launch_stage(kernel, arrays, x, emb_s, R, n_chunks, out_cols, interpret):
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
        kernel,
        grid=(n_chunks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((R, out_cols), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R * n_chunks, out_cols), x.dtype),
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
    extra_emb: Optional[jax.Array] = None,
) -> jax.Array:
    """Full denoiser forward via fused Pallas kernels.

    Args:
        w: tree from :func:`pack_pallas_weights` (bf16 weights + fp32 aux).
        x: ``[BG, 1, L]`` latents; t ``[BG]``; z_cond ``[BG, Ce, cond_dim]``.
        input_emb: optional precomputed ``compute_input_emb(w, z_cond)``
            (``[BG, Ce, emb]``) — constant across sampler steps, hoist it
            out of the scan to cut per-step glue.
        extra_emb: ``[BG, emb]`` class/region conditioning embedding
            (``compute_extra_emb``). REQUIRED for conditioned weight packs
            unless the caller already folded it into ``input_emb`` — the
            kernels cannot detect a missing fold themselves.
        fuse_stages: run the WHOLE network in one kernel launch instead of
            one kernel per stage. For THIS entry point it measured a
            wash-to-loss everywhere on v5e (1.58-1.72 ms/step fused vs
            1.58-1.61 per-stage at BG=8192 bf16), so the default stays
            per-stage. NOTE: the verdict flips inside the kernels-only
            sampler (:mod:`pallas_sampler`), where the single-launch step
            wins at L=16 everywhere and at L=4 for BG <= 1024 — see
            `fused_sample`'s auto policy.
    """
    in_dtype = x.dtype
    dtype = w["init_W"].dtype
    L = dims.seq_len
    BG = x.shape[0]
    # Per-stage timing at BG=8192/R=512 (dummy-chain harness, includes
    # ~0.07 ms harness overhead each): stage0 0.23 / stage1 0.23 /
    # stage2 0.32 / stage3 0.62 / final 0.46 ms; matmul-only floors
    # 0.12 / 0.12 / 0.18 / 0.37 / 0.30. Narrow stages are bounded by
    # per-op issue latency, not FLOPs or chunk count; a uniform R is the
    # best-known configuration (R=1024/2048 compile >10 min and measured
    # worse historically); per-stage block sizes accepted for experiments.
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
        extra_emb=extra_emb,
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
    if _use_xla_attention(dims):
        if fuse_stages:
            raise ValueError(
                "fuse_stages is unsupported for L > 4 (hybrid XLA-attention "
                "path; see _use_xla_attention)"
            )
        # kernel_i = [proj_{i-1}] + res1 + res2; attention between launches
        from .stacked_denoiser import _attention_stacked

        for i in range(len(dims.block_channels)):
            X = _run_stage(w, X, emb_s, dims, i, False, rs[i], interpret)
            X = _attention_stacked(X, w, i, dims)
        X = _run_stage(w, X, emb_s, dims, 0, True, rs[-1], interpret)
    elif fuse_stages:
        X = _run_full(w, X, emb_s, dims, cins, rs[-1], interpret)
    else:
        for i in range(len(dims.block_channels)):
            X = _run_stage(w, X, emb_s, dims, i, False, rs[i], interpret)
        X = _run_stage(w, X, emb_s, dims, 0, True, rs[-1], interpret)
    if pad:
        X = X[:BG]
    return X[:, None, :].astype(in_dtype)
