"""Zero-glue reverse-diffusion sampler: every scan step is ONLY kernels.

The per-stage Pallas denoiser (:mod:`stacked_pallas`) still leaves ~10 XLA
ops in the sampler's `lax.scan` body: the time-embedding MLP + silu, the
init matmul, dtype casts, and the DDIM/DDPM scheduler update (reference
semantics: `grasp_ldm/models/diffusion/gaussian_diffusion.py:232-277`,
rebuilt in :mod:`graspldm_tpu.diffusion.schedules`). Each is tiny, but at
~1.5 ms/step the launch/glue overhead is a measurable slice of the chain
(~0.12 ms at BG=8192) and dominates the B=1 serving path.

This module removes ALL of it. Two observations make that possible:

  * ``t`` is a per-step SCALAR on a static grid, so the whole
    time-embedding head collapses to a precomputed ``[S, 1, W]`` row table
    built once outside the scan; each stage kernel rebuilds
    ``emb_s = silu(input_emb + time_row)`` in VMEM from the step's row
    (a [1, W] broadcast-add — cheaper than reading a precomputed emb_s
    from HBM).
  * the DDIM / DDPM updates are affine in ``(x, eps)`` around a clip, so
    each step reduces to 4-5 precomputed scalars consumed by the FINAL
    stage kernel, which takes the carry ``x`` as an extra input block and
    emits ``x_{t-1}`` directly.

The scan body is therefore exactly ``n_stages + 1`` `pallas_call`s (plus,
for DDPM only, the per-step normal draw): no XLA elementwise ops, no
reshapes, no host math. Numerics match
``GaussianDiffusion1D.sample(stacked_denoiser_pallas_apply)`` (parity
test: tests/test_fused_denoiser.py::test_fused_sampler_parity).
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_denoiser import DenoiserDims
from .stacked_denoiser import FLAGSHIP_DIMS, compute_time_emb
from .stacked_pallas import (
    _attention_k,
    _conv3_k,
    _mmd,
    _resblock_k,
    _stage_weight_names,
    _use_xla_attention,
)
from ..diffusion.schedules import DiffusionSchedule

__all__ = ["fused_sample", "fused_sample_dpmpp", "fused_sample_churn"]


def _silu_f32_to(x, dtype):
    xf = x.astype(jnp.float32)
    return (xf * jax.nn.sigmoid(xf)).astype(dtype)


def _emb_from_row(embin, trow, dtype):
    """emb_s = silu(input_emb + time_row) in fp32, cast to compute dtype.

    ``embin [R, W]`` is the hoisted (pre-silu) conditioning embedding;
    ``trow [1, W]`` is this step's tiled time embedding. Matches
    `stacked_denoiser.compute_emb_s_stacked` bit-for-bit (same op order).
    """
    return _silu_f32_to(embin.astype(jnp.float32) + trow.astype(jnp.float32),
                        dtype)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _stage0_kernel(names, dims, C, *refs):
    """init matmul + stage-0 resblocks/attention/proj, emb built in-kernel."""
    x_ref, embin_ref, trow_ref = refs[0], refs[1], refs[2]
    out_ref = refs[-1]
    g = {n: r[...] for n, r in zip(names, refs[3:-1])}
    L = dims.seq_len
    dtype = g["init_W"].dtype
    emb = _emb_from_row(embin_ref[...], trow_ref[...], dtype)
    x = _mmd(x_ref[...].astype(dtype), g["init_W"], dtype) + g["init_b"]
    x = _resblock_k(x, emb, g, "b0r1", L, C, dims.cond_channels)
    x = _resblock_k(x, emb, g, "b0r2", L, C, dims.cond_channels)
    x = _attention_k(x, g, 0, L, C, dims.heads, dims.dim_head)
    out_ref[...] = _conv3_k(x, g, "b0_proj", L, C, x.dtype)


def _mid_stage_kernel(names, dims, stage_i, C, *refs):
    x_ref, embin_ref, trow_ref = refs[0], refs[1], refs[2]
    out_ref = refs[-1]
    g = {n: r[...] for n, r in zip(names, refs[3:-1])}
    L = dims.seq_len
    x = x_ref[...]
    emb = _emb_from_row(embin_ref[...], trow_ref[...], x.dtype)
    x = _resblock_k(x, emb, g, f"b{stage_i}r1", L, C, dims.cond_channels)
    x = _resblock_k(x, emb, g, f"b{stage_i}r2", L, C, dims.cond_channels)
    x = _attention_k(x, g, stage_i, L, C, dims.heads, dims.dim_head)
    out_ref[...] = _conv3_k(x, g, f"b{stage_i}_proj", L, C, x.dtype)


def _ct(c, j, lanes=1):
    """The j-th coefficient slice of a packed row ``c [1, 8*lanes]``.

    Per-step kernels pass lanes=1: the row is a STATIC [1, 8] block, so
    Mosaic splats the [1, 1] slice across both sublanes and lanes. The
    whole-scan megakernels read the row with a DYNAMIC ``pl.ds(s, 1)``
    slice, where that two-axis broadcast is "Not implemented" — they pass
    a lane-PRE-TILED table (each coefficient repeated ``lanes`` times, see
    :func:`_lane_tile`) so the [1, lanes] slice broadcasts along sublanes
    only.
    """
    return c[:, j * lanes : (j + 1) * lanes]


def _lane_tile(rows, lanes):
    """[S, K] coefficient rows -> [S, K*lanes], entry j tiled contiguous."""
    return jnp.repeat(rows, lanes, axis=-1)


def _scheduler_update_v(eps, xt, c, noise, sampler, clip, clip_range,
                        lanes=1):
    """DDIM / DDPM update on fp32 VMEM VALUES (shared by all kernels)."""
    # coefficient slices broadcast against [R, L] (no scalar extracts —
    # lane/sublane broadcasts are the safe Mosaic lowering; see _ct)
    a, b = _ct(c, 0, lanes), _ct(c, 1, lanes)
    x0 = a * xt - b * eps
    if clip:
        x0 = jnp.clip(x0, -clip_range, clip_range)
    if sampler == "ddim":
        # x_{t-1} = d * x_t + e * clip(x0)   (affine residue of ddim_step)
        d, e = _ct(c, 2, lanes), _ct(c, 3, lanes)
        return d * xt + e * x0
    # ddpm: posterior mean + sigma * noise
    c0, c1, sigma = _ct(c, 2, lanes), _ct(c, 3, lanes), _ct(c, 4, lanes)
    return c0 * x0 + c1 * xt + sigma * noise


def _scheduler_update(eps, xt_ref, coef_ref, noise_ref, sampler, clip,
                      clip_range):
    """Ref-reading wrapper around :func:`_scheduler_update_v`."""
    return _scheduler_update_v(
        eps,
        xt_ref[...].astype(jnp.float32),
        coef_ref[...].astype(jnp.float32),
        None if noise_ref is None else noise_ref[...].astype(jnp.float32),
        sampler, clip, clip_range,
    )


def _full_step_kernel(names, dims, cins, sampler, clip, clip_range, *refs):
    """The ENTIRE sampler step in one launch: init matmul, every stage,
    the eps head and the scheduler update. One grid pass over the rows."""
    xt_ref, embin_ref, trow_ref, coef_ref = refs[:4]
    noise_ref = refs[4] if sampler == "ddpm" else None
    w0 = 5 if sampler == "ddpm" else 4
    out_ref = refs[-1]
    g = {n: r[...] for n, r in zip(names, refs[w0:-1])}
    L = dims.seq_len
    dtype = g["init_W"].dtype
    emb = _emb_from_row(embin_ref[...], trow_ref[...], dtype)
    x = _mmd(xt_ref[...].astype(dtype), g["init_W"], dtype) + g["init_b"]
    for i, C in enumerate(cins):
        x = _resblock_k(x, emb, g, f"b{i}r1", L, C, dims.cond_channels)
        x = _resblock_k(x, emb, g, f"b{i}r2", L, C, dims.cond_channels)
        x = _attention_k(x, g, i, L, C, dims.heads, dims.dim_head)
        x = _conv3_k(x, g, f"b{i}_proj", L, C, x.dtype)
    x = _resblock_k(x, emb, g, "final", L, dims.block_channels[-1],
                    dims.cond_channels)
    eps = (_mmd(x, g["final_W"], x.dtype) + g["final_b"]).astype(jnp.float32)
    out_ref[...] = _scheduler_update(
        eps, xt_ref, coef_ref, noise_ref, sampler, clip, clip_range
    )


def _final_step_kernel(names, dims, C, sampler, clip, clip_range, *refs):
    """final resblock + eps head + the scheduler update, in one launch.

    Extra refs vs the plain final kernel: the carry ``x_t [R, L]`` (fp32),
    the step's coefficient row ``[1, 8]`` (fp32), and for DDPM the step's
    normal draw ``[R, L]``. Emits ``x_{t-1} [R, L]`` fp32.
    """
    h_ref, embin_ref, trow_ref, xt_ref, coef_ref = refs[:5]
    noise_ref = refs[5] if sampler == "ddpm" else None
    w0 = 6 if sampler == "ddpm" else 5
    out_ref = refs[-1]
    g = {n: r[...] for n, r in zip(names, refs[w0:-1])}
    L = dims.seq_len
    h = h_ref[...]
    emb = _emb_from_row(embin_ref[...], trow_ref[...], h.dtype)
    h = _resblock_k(h, emb, g, "final", L, C, dims.cond_channels)
    # eps in the compute dtype then fp32 — identical to the unfused path
    # (kernel output cast -> XLA upcast)
    eps = (_mmd(h, g["final_W"], h.dtype) + g["final_b"]).astype(jnp.float32)
    out_ref[...] = _scheduler_update(
        eps, xt_ref, coef_ref, noise_ref, sampler, clip, clip_range
    )


# ---------------------------------------------------------------------------
# DPM-Solver++(2M) kernels (EDM preconditioning folded in)
# ---------------------------------------------------------------------------


def _stage0_dpmpp_kernel(names, dims, C, *refs):
    """c_in scaling + init matmul + stage 0. Matches `_stage0_kernel` with
    the EDM input preconditioning ``x_in = c_in * x`` folded in."""
    x_ref, embin_ref, trow_ref, coef_ref = refs[:4]
    out_ref = refs[-1]
    g = {n: r[...] for n, r in zip(names, refs[4:-1])}
    L = dims.seq_len
    dtype = g["init_W"].dtype
    emb = _emb_from_row(embin_ref[...], trow_ref[...], dtype)
    cin = coef_ref[...].astype(jnp.float32)[:, 0:1]
    x_in = (cin * x_ref[...].astype(jnp.float32)).astype(dtype)
    x = _mmd(x_in, g["init_W"], dtype) + g["init_b"]
    x = _resblock_k(x, emb, g, "b0r1", L, C, dims.cond_channels)
    x = _resblock_k(x, emb, g, "b0r2", L, C, dims.cond_channels)
    x = _attention_k(x, g, 0, L, C, dims.heads, dims.dim_head)
    out_ref[...] = _conv3_k(x, g, "b0_proj", L, C, x.dtype)


def _dpmpp_update_v(net_out, xt, old, c, clamp, lanes=1):
    """(x_new, denoised) from the 2M update (`elucidated.py:203-225`) on
    fp32 values, all step constants precomputed into the coefficient row."""
    cskip, cout = _ct(c, 1, lanes), _ct(c, 2, lanes)
    g1, g2 = _ct(c, 3, lanes), _ct(c, 4, lanes)
    ratio, em1 = _ct(c, 5, lanes), _ct(c, 6, lanes)
    denoised = cskip * xt + cout * net_out
    if clamp:
        denoised = jnp.clip(denoised, -1.0, 1.0)
    denoised_d = g1 * denoised + g2 * old
    x_new = ratio * xt - em1 * denoised_d
    return x_new, denoised


def _dpmpp_update(net_out, xt_ref, old_ref, coef_ref, clamp):
    """Ref-reading wrapper around :func:`_dpmpp_update_v`."""
    return _dpmpp_update_v(
        net_out,
        xt_ref[...].astype(jnp.float32),
        old_ref[...].astype(jnp.float32),
        coef_ref[...].astype(jnp.float32),
        clamp,
    )


def _final_dpmpp_kernel(names, dims, C, clamp, *refs):
    """final resblock + eps head + EDM output precond + 2M update.

    Two outputs: ``x_{i+1}`` and ``denoised`` (the next old_denoised)."""
    h_ref, embin_ref, trow_ref, xt_ref, old_ref, coef_ref = refs[:6]
    x_out_ref, den_out_ref = refs[-2], refs[-1]
    g = {n: r[...] for n, r in zip(names, refs[6:-2])}
    L = dims.seq_len
    h = h_ref[...]
    emb = _emb_from_row(embin_ref[...], trow_ref[...], h.dtype)
    h = _resblock_k(h, emb, g, "final", L, C, dims.cond_channels)
    net = (_mmd(h, g["final_W"], h.dtype) + g["final_b"]).astype(jnp.float32)
    x_new, denoised = _dpmpp_update(net, xt_ref, old_ref, coef_ref, clamp)
    x_out_ref[...] = x_new
    den_out_ref[...] = denoised


def _full_dpmpp_kernel(names, dims, cins, clamp, *refs):
    """The entire DPM++ step in one launch (fuse_stages variant)."""
    xt_ref, embin_ref, trow_ref, old_ref, coef_ref = refs[:5]
    x_out_ref, den_out_ref = refs[-2], refs[-1]
    g = {n: r[...] for n, r in zip(names, refs[5:-2])}
    L = dims.seq_len
    dtype = g["init_W"].dtype
    emb = _emb_from_row(embin_ref[...], trow_ref[...], dtype)
    cin = coef_ref[...].astype(jnp.float32)[:, 0:1]
    x = (cin * xt_ref[...].astype(jnp.float32)).astype(dtype)
    x = _mmd(x, g["init_W"], dtype) + g["init_b"]
    for i, C in enumerate(cins):
        x = _resblock_k(x, emb, g, f"b{i}r1", L, C, dims.cond_channels)
        x = _resblock_k(x, emb, g, f"b{i}r2", L, C, dims.cond_channels)
        x = _attention_k(x, g, i, L, C, dims.heads, dims.dim_head)
        x = _conv3_k(x, g, f"b{i}_proj", L, C, x.dtype)
    x = _resblock_k(x, emb, g, "final", L, dims.block_channels[-1],
                    dims.cond_channels)
    net = (_mmd(x, g["final_W"], x.dtype) + g["final_b"]).astype(jnp.float32)
    x_new, denoised = _dpmpp_update(net, xt_ref, old_ref, coef_ref, clamp)
    x_out_ref[...] = x_new
    den_out_ref[...] = denoised


# ---------------------------------------------------------------------------
# EDM churn (stochastic Heun) kernels — two net evaluations per step
# ---------------------------------------------------------------------------
#
# Per-step math (`elucidated.py:141-168`; all greek constants static):
#   x_hat = x + s_eps * noise                    s_eps = sqrt(sh^2 - s^2)
#   denA  = cskipA*x_hat + coutA*net(cinA*x_hat, c_noise(sh))
#   d     = (x_hat - denA) * inv_sh
#   x_eul = x_hat + dsc * d                      dsc = s_next - s_hat
#   denB  = cskipB*x_eul + coutB*net(cinB*x_eul, c_noise(s_next))
#   d'    = (x_eul - denB) * inv_sn
#   x_new = sel * (x_hat + 0.5*dsc*(d + d')) + (1-sel) * x_eul
# coefA row: [cinA, cskipA, coutA, s_eps, dsc, inv_sh, 0, 0]
# coefB row: [cinB, cskipB, coutB, s_eps, hh=0.5*dsc, inv_sn, sel, 0]


def _xhat_v(x, noise, c, lanes=1):
    return x + _ct(c, 3, lanes) * noise


def _xhat(x_ref, noise_ref, c):
    return _xhat_v(
        x_ref[...].astype(jnp.float32), noise_ref[...].astype(jnp.float32), c
    )


def _stage0_churn_a_kernel(names, dims, C, *refs):
    """x_hat from (x, noise) + c_in scaling + init matmul + stage 0."""
    x_ref, noise_ref, embin_ref, trow_ref, coef_ref = refs[:5]
    out_ref = refs[-1]
    g = {n: r[...] for n, r in zip(names, refs[5:-1])}
    L = dims.seq_len
    dtype = g["init_W"].dtype
    emb = _emb_from_row(embin_ref[...], trow_ref[...], dtype)
    c = coef_ref[...].astype(jnp.float32)
    x_in = (c[:, 0:1] * _xhat(x_ref, noise_ref, c)).astype(dtype)
    x = _mmd(x_in, g["init_W"], dtype) + g["init_b"]
    x = _resblock_k(x, emb, g, "b0r1", L, C, dims.cond_channels)
    x = _resblock_k(x, emb, g, "b0r2", L, C, dims.cond_channels)
    x = _attention_k(x, g, 0, L, C, dims.heads, dims.dim_head)
    out_ref[...] = _conv3_k(x, g, "b0_proj", L, C, x.dtype)


def _churn_a_update_v(netA, x, noise, c, clamp, lanes=1):
    """(x_eul, d) from the Euler half-step, on fp32 values."""
    x_hat = _xhat_v(x, noise, c, lanes)
    den = _ct(c, 1, lanes) * x_hat + _ct(c, 2, lanes) * netA
    if clamp:
        den = jnp.clip(den, -1.0, 1.0)
    d = (x_hat - den) * _ct(c, 5, lanes)
    return x_hat + _ct(c, 4, lanes) * d, d


def _churn_a_update(netA, x_ref, noise_ref, coef_ref, clamp):
    """Ref-reading wrapper around :func:`_churn_a_update_v`."""
    return _churn_a_update_v(
        netA,
        x_ref[...].astype(jnp.float32),
        noise_ref[...].astype(jnp.float32),
        coef_ref[...].astype(jnp.float32),
        clamp,
    )


def _final_churn_a_kernel(names, dims, C, clamp, *refs):
    h_ref, embin_ref, trow_ref, x_ref, noise_ref, coef_ref = refs[:6]
    xe_out, d_out = refs[-2], refs[-1]
    g = {n: r[...] for n, r in zip(names, refs[6:-2])}
    L = dims.seq_len
    h = h_ref[...]
    emb = _emb_from_row(embin_ref[...], trow_ref[...], h.dtype)
    h = _resblock_k(h, emb, g, "final", L, C, dims.cond_channels)
    net = (_mmd(h, g["final_W"], h.dtype) + g["final_b"]).astype(jnp.float32)
    x_eul, d = _churn_a_update(net, x_ref, noise_ref, coef_ref, clamp)
    xe_out[...] = x_eul
    d_out[...] = d


def _churn_b_update_v(netB, x_eul, d, x, noise, c, clamp, lanes=1):
    """x_new from the Heun correction (static first/last-step select),
    on fp32 values."""
    den = _ct(c, 1, lanes) * x_eul + _ct(c, 2, lanes) * netB
    if clamp:
        den = jnp.clip(den, -1.0, 1.0)
    d_prime = (x_eul - den) * _ct(c, 5, lanes)
    x_hat = _xhat_v(x, noise, c, lanes)
    x_heun = x_hat + _ct(c, 4, lanes) * (d + d_prime)
    sel = _ct(c, 6, lanes)
    return sel * x_heun + (1.0 - sel) * x_eul


def _churn_b_update(netB, x_eul_ref, d_ref, x_ref, noise_ref, coef_ref,
                    clamp):
    """Ref-reading wrapper around :func:`_churn_b_update_v`."""
    return _churn_b_update_v(
        netB,
        x_eul_ref[...].astype(jnp.float32),
        d_ref[...].astype(jnp.float32),
        x_ref[...].astype(jnp.float32),
        noise_ref[...].astype(jnp.float32),
        coef_ref[...].astype(jnp.float32),
        clamp,
    )


def _final_churn_b_kernel(names, dims, C, clamp, *refs):
    (h_ref, embin_ref, trow_ref, x_eul_ref, d_ref, x_ref, noise_ref,
     coef_ref) = refs[:8]
    out_ref = refs[-1]
    g = {n: r[...] for n, r in zip(names, refs[8:-1])}
    L = dims.seq_len
    h = h_ref[...]
    emb = _emb_from_row(embin_ref[...], trow_ref[...], h.dtype)
    h = _resblock_k(h, emb, g, "final", L, C, dims.cond_channels)
    net = (_mmd(h, g["final_W"], h.dtype) + g["final_b"]).astype(jnp.float32)
    out_ref[...] = _churn_b_update(
        net, x_eul_ref, d_ref, x_ref, noise_ref, coef_ref, clamp
    )


def _net_in_kernel(x, emb, g, dims, cins):
    """Shared whole-net body on VMEM values (init matmul .. eps head)."""
    L = dims.seq_len
    dtype = g["init_W"].dtype
    h = _mmd(x.astype(dtype), g["init_W"], dtype) + g["init_b"]
    for i, C in enumerate(cins):
        h = _resblock_k(h, emb, g, f"b{i}r1", L, C, dims.cond_channels)
        h = _resblock_k(h, emb, g, f"b{i}r2", L, C, dims.cond_channels)
        h = _attention_k(h, g, i, L, C, dims.heads, dims.dim_head)
        h = _conv3_k(h, g, f"b{i}_proj", L, C, h.dtype)
    h = _resblock_k(h, emb, g, "final", L, dims.block_channels[-1],
                    dims.cond_channels)
    return (_mmd(h, g["final_W"], h.dtype) + g["final_b"]).astype(jnp.float32)


def _churn_step_v(x, noise, embA, embB, cA, cB, g, dims, cins, clamp,
                  lanes=1):
    """One full churn step (both net evaluations) on fp32 values."""
    netA = _net_in_kernel(
        _ct(cA, 0, lanes) * _xhat_v(x, noise, cA, lanes), embA, g, dims,
        cins,
    )
    x_eul, d = _churn_a_update_v(netA, x, noise, cA, clamp, lanes)
    netB = _net_in_kernel(_ct(cB, 0, lanes) * x_eul, embB, g, dims, cins)
    return _churn_b_update_v(netB, x_eul, d, x, noise, cB, clamp, lanes)


def _full_churn_kernel(names, dims, cins, clamp, *refs):
    """One launch for the WHOLE churn step — both net evaluations."""
    (x_ref, noise_ref, embin_ref, trowA_ref, trowB_ref, coefA_ref,
     coefB_ref) = refs[:7]
    out_ref = refs[-1]
    g = {n: r[...] for n, r in zip(names, refs[7:-1])}
    dtype = g["init_W"].dtype
    embA = _emb_from_row(embin_ref[...], trowA_ref[...], dtype)
    embB = _emb_from_row(embin_ref[...], trowB_ref[...], dtype)
    out_ref[...] = _churn_step_v(
        x_ref[...].astype(jnp.float32),
        noise_ref[...].astype(jnp.float32),
        embA, embB,
        coefA_ref[...].astype(jnp.float32),
        coefB_ref[...].astype(jnp.float32),
        g, dims, cins, clamp,
    )


# ---------------------------------------------------------------------------
# whole-scan megakernels: ALL sampler steps in ONE launch per row chunk
# ---------------------------------------------------------------------------
#
# Every sampler row evolves INDEPENDENTLY across steps — the carry x[r]
# only ever meets the weights and its own conditioning row. So the loop
# nest can be inverted: instead of `lax.scan` dispatching S per-step
# launches that each re-stream the weights, the conditioning embedding and
# the carry through HBM, the grid walks row chunks and a `fori_loop`
# INSIDE the kernel runs all S steps with the weights, embin, the time-row
# table and the coefficient table VMEM-resident. Per-chunk HBM traffic
# collapses from S*(weights + embin + 2x) to (weights + embin [+ noise]
# + x + out), and the per-step launch/dispatch overhead disappears
# entirely. The compute per step is unchanged (same `_resblock_k` /
# `_attention_k` bodies as `_full_step_kernel`), so the win concentrates
# where that overhead dominates: the small-BG / serving-latency regime.
# Samplers that consume per-step noise (DDPM, churn) precompute the whole
# [S, BG, L] noise tensor OUTSIDE the kernel with the exact same PRNG
# consumption order as the per-step path, so fixed seeds still reproduce
# `GaussianDiffusion1D.sample` / `ElucidatedDiffusion.sample_churn`.


def _mega_kernel(names, dims, cins, S, sampler, clip, clip_range, *refs):
    """DDIM/DDPM: the ENTIRE reverse diffusion for one row chunk.

    The coefficient table is lane-PRE-TILED ([S, 8*L]): its rows are read
    with a dynamic ``pl.ds`` slice, where a [1, 1]-to-[R, L] two-axis
    broadcast does not lower (see :func:`_ct`).
    """
    x_ref, embin_ref, trows_ref, coefs_ref = refs[:4]
    has_noise = sampler == "ddpm"
    noise_ref = refs[4] if has_noise else None
    w0 = 5 if has_noise else 4
    out_ref = refs[-1]
    g = {n: r[...] for n, r in zip(names, refs[w0:-1])}
    dtype = g["init_W"].dtype
    embin = embin_ref[...]
    L = dims.seq_len

    def body(s, x):
        trow = trows_ref[pl.ds(s, 1), :]
        c = coefs_ref[pl.ds(s, 1), :].astype(jnp.float32)
        emb = _emb_from_row(embin, trow, dtype)
        eps = _net_in_kernel(x, emb, g, dims, cins)
        noise = noise_ref[s] if has_noise else None
        return _scheduler_update_v(eps, x, c, noise, sampler, clip,
                                   clip_range, lanes=L)

    out_ref[...] = jax.lax.fori_loop(
        0, S, body, x_ref[...].astype(jnp.float32)
    )


def _mega_dpmpp_kernel(names, dims, cins, S, clamp, *refs):
    """DPM-Solver++(2M): whole trajectory, (x, old_denoised) carried."""
    x_ref, embin_ref, trows_ref, coefs_ref = refs[:4]
    out_ref = refs[-1]
    g = {n: r[...] for n, r in zip(names, refs[4:-1])}
    dtype = g["init_W"].dtype
    embin = embin_ref[...]
    L = dims.seq_len

    def body(s, carry):
        x, old = carry
        trow = trows_ref[pl.ds(s, 1), :]
        c = coefs_ref[pl.ds(s, 1), :].astype(jnp.float32)
        emb = _emb_from_row(embin, trow, dtype)
        net = _net_in_kernel(_ct(c, 0, L) * x, emb, g, dims, cins)
        return _dpmpp_update_v(net, x, old, c, clamp, lanes=L)

    x0 = x_ref[...].astype(jnp.float32)
    x0, _ = jax.lax.fori_loop(0, S, body, (x0, jnp.zeros_like(x0)))
    out_ref[...] = x0


def _mega_churn_kernel(names, dims, cins, S, clamp, *refs):
    """EDM churn (Heun): whole trajectory, both net evals per step."""
    (x_ref, embin_ref, trowsA_ref, trowsB_ref, coefA_ref, coefB_ref,
     noise_ref) = refs[:7]
    out_ref = refs[-1]
    g = {n: r[...] for n, r in zip(names, refs[7:-1])}
    dtype = g["init_W"].dtype
    embin = embin_ref[...]
    L = dims.seq_len

    def body(s, x):
        embA = _emb_from_row(embin, trowsA_ref[pl.ds(s, 1), :], dtype)
        embB = _emb_from_row(embin, trowsB_ref[pl.ds(s, 1), :], dtype)
        cA = coefA_ref[pl.ds(s, 1), :].astype(jnp.float32)
        cB = coefB_ref[pl.ds(s, 1), :].astype(jnp.float32)
        return _churn_step_v(x, noise_ref[s], embA, embB, cA, cB, g, dims,
                             cins, clamp, lanes=L)

    out_ref[...] = jax.lax.fori_loop(
        0, S, body, x_ref[...].astype(jnp.float32)
    )


# ---------------------------------------------------------------------------
# launch plumbing
# ---------------------------------------------------------------------------


def _const_specs(arrays):
    specs = []
    for a in arrays:
        nd = a.ndim
        specs.append(
            pl.BlockSpec(a.shape, (lambda i, _nd=nd: (0,) * _nd),
                         memory_space=pltpu.VMEM)
        )
    return specs


def _const_spec(a):
    return _const_specs([a])[0]


def _full_weight_names(stage_names, final_names):
    """Deduped weight-name list covering every stage + the final head."""
    full_names = []
    seen = set()
    for ns in list(stage_names) + [final_names]:
        for n in ns:
            if n not in seen:
                seen.add(n)
                full_names.append(n)
    return full_names


def _fuse_scan_policy(flag: Optional[bool], BG: int, return_trajectory: bool):
    """Whether to run the whole-scan megakernel.

    `GRASPLDM_FUSED_SCAN` forces ("1") or disables ("0") it; otherwise an
    explicit `fuse_scan` argument wins, and the auto default is ON: the
    megakernel measured fastest in EVERY regime (v5e, bf16, 100-step DDIM,
    tools/bench_sampler.py --mega; ms/step fused / fused1 / mega):

        z4  BG=1024   0.185 / 0.210 /  0.155
        z4  BG=8192   1.293 / 1.424 /  1.256
        z4  BG=32768  5.118 / 5.641 /  5.024
        z16 BG=1024   1.055 / 0.848 /  0.794
        z16 BG=8192   7.088 / 6.518 /  6.383
        z16 BG=32768 27.855 / 25.933 / 25.341

    Keeping the whole trajectory VMEM-resident per row chunk beats both
    per-step lowerings even where per-step compute is at the MXU/VPU floor
    (the 100 launch + scan-glue round trips still cost ~2%), and by 10-20%
    in the launch-overhead-dominated small-BG regime. Trajectory capture
    needs per-step outputs, so it always falls back to the per-step scan.
    """
    if return_trajectory:
        return False
    env = os.environ.get("GRASPLDM_FUSED_SCAN", "auto")
    if env == "0":
        return False
    if env == "1":
        return True
    if flag is not None:
        return flag
    return _MEGA_AUTO(BG)


# measured auto policy for the whole-scan megakernel: wins everywhere
# measured (table in _fuse_scan_policy)
def _MEGA_AUTO(BG: int) -> bool:
    return True


def _mega_rows(R: int, BGp: int) -> int:
    """Row-chunk size for the megakernel grid.

    A SINGLE chunk measured fastest at small BG (v5e, 100-step DDIM
    ms/trajectory at BG=1024, rows 256/512/1024: z4 13.47/14.54/13.34;
    z16 79.01/79.06/78.61) — one grid step keeps every weight load
    one-time and drops inter-chunk pipeline bubbles. The bump is gated to
    the measured regime (128 <= BGp <= 1024, sublane-aligned) so tiny
    interpret-mode test shapes keep exercising the multi-chunk grid and
    large-BG chunking (where per-chunk pipelining wins) is untouched.
    """
    if R < BGp <= 1024 and BGp >= 128 and BGp % 8 == 0:
        return BGp
    return R


def _row_spec(R, cols):
    return pl.BlockSpec((R, cols), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _bcast_spec(cols):
    return pl.BlockSpec((1, cols), lambda i: (0, 0), memory_space=pltpu.VMEM)


def _launch(kernel, arrays, blocks, R, n_chunks, out_cols, out_dtype,
            interpret, vmem_mb=110):
    """blocks = [(array, spec), ...] leading operands; arrays = weights.

    ``vmem_mb`` bounds Mosaic's scoped-VMEM budget; the z16 whole-scan
    CHURN megakernel (two denoiser chains + the [N, R, L] noise table
    resident per chunk) needs 123 MB and passes ``vmem_mb=124`` — every
    other kernel stays at the measured 110 MB default.
    """
    in_specs = [s for _, s in blocks] + _const_specs(arrays)
    return pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=in_specs,
        out_specs=_row_spec(R, out_cols),
        out_shape=jax.ShapeDtypeStruct((R * n_chunks, out_cols), out_dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024,
        ),
    )(*[a for a, _ in blocks], *arrays)


def _launch2(kernel, arrays, blocks, R, n_chunks, out_cols, interpret):
    """Two-output variant of `_launch` (x_new + denoised, both fp32)."""
    in_specs = [s for _, s in blocks] + _const_specs(arrays)
    shape = jax.ShapeDtypeStruct((R * n_chunks, out_cols), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=in_specs,
        out_specs=[_row_spec(R, out_cols), _row_spec(R, out_cols)],
        out_shape=[shape, shape],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(*[a for a, _ in blocks], *arrays)


def _step_coeffs(
    schedule: DiffusionSchedule, ts, prev_ts, sampler: str,
    variance_type: str,
) -> jnp.ndarray:
    """[S, 1, 8] fp32 rows of precomputed scheduler scalars.

    ddim (eta=0, `schedules.ddim_step` refactored around the clip):
      x0  = a*x_t - b*eps            a = 1/sqrt(acp_t), b = sqrt(1-acp_t)*a
      out = d*x_t + e*clip(x0)       d = sqrt(1-acp_prev)/sqrt(1-acp_t)
                                     e = sqrt(acp_prev) - d*sqrt(acp_t)
    ddpm (`schedules.ddpm_step`):
      out = c0*clip(x0) + c1*x_t + sigma*noise
    """
    acp_t = schedule.alphas_cumprod[ts]
    acp_prev = jnp.where(
        prev_ts >= 0, schedule.alphas_cumprod[jnp.maximum(prev_ts, 0)], 1.0
    )
    a = 1.0 / jnp.sqrt(acp_t)
    b = jnp.sqrt(1.0 - acp_t) * a
    if sampler == "ddim":
        d = jnp.sqrt(1.0 - acp_prev) / jnp.sqrt(1.0 - acp_t)
        e = jnp.sqrt(acp_prev) - d * jnp.sqrt(acp_t)
        rows = jnp.stack([a, b, d, e], axis=-1)
    else:
        current_alpha = acp_t / acp_prev
        current_beta = 1.0 - current_alpha
        c0 = jnp.sqrt(acp_prev) * current_beta / (1.0 - acp_t)
        c1 = jnp.sqrt(current_alpha) * (1.0 - acp_prev) / (1.0 - acp_t)
        if variance_type in ("fixed_small", "fixed_small_log"):
            variance = jnp.maximum(
                (1.0 - acp_prev) / (1.0 - acp_t) * current_beta, 1e-20
            )
        else:  # fixed_large
            variance = current_beta
        sigma = jnp.where(prev_ts >= 0, jnp.sqrt(jnp.maximum(variance, 0.0)),
                          0.0)
        rows = jnp.stack([a, b, c0, c1, sigma], axis=-1)
    pad = 8 - rows.shape[-1]
    rows = jnp.concatenate(
        [rows, jnp.zeros(rows.shape[:-1] + (pad,), rows.dtype)], axis=-1
    )
    return rows[:, None, :].astype(jnp.float32)  # [S, 1, 8]


def fused_sample(
    w: Dict[str, jax.Array],
    dims: DenoiserDims,
    schedule: DiffusionSchedule,
    input_emb: jax.Array,
    rng: jax.Array,
    batch_size: int,
    num_inference_steps: Optional[int] = None,
    sampler: str = "ddim",
    variance_type: str = "fixed_large",
    block_rows: int = 512,
    return_trajectory: bool = False,
    fuse_stages: Optional[bool] = None,
    fuse_scan: Optional[bool] = None,
    interpret: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Reverse diffusion with a kernels-only scan body.

    Args:
        w: packed tree from `stacked_pallas.pack_pallas_weights`.
        input_emb: ``[BG, Ce, emb]`` hoisted conditioning embedding
            (``compute_input_emb`` + optional ``compute_extra_emb`` fold),
            i.e. the pre-silu FiLM input — constant across steps.
        rng: consumed exactly like ``GaussianDiffusion1D.sample`` (same
            split tree), so fixed seeds reproduce the unfused sampler.

    Returns:
        ``(x0 [BG, 1, L] fp32, trajectory [S+1, BG, 1, L] or None)``.
    """
    if sampler not in ("ddim", "ddpm"):
        raise ValueError(f"Unknown sampler: {sampler}")
    if _use_xla_attention(dims):
        raise ValueError("fused_sample requires in-kernel attention")
    L = dims.seq_len
    BG = batch_size
    if fuse_stages is None:
        # v5e measurements (tools/bench_sampler.py, bf16, 100-step DDIM):
        # at L=16 ONE launch per step wins everywhere (8.19 -> 7.46 ms/step
        # at BG=8192, 32.3 -> 29.7 at BG=32768 — it removes 4 inter-stage
        # HBM round trips of [BG, 16*C] activations); at L=4 those
        # activations are 4x smaller and the whole-net kernel only wins
        # once launch overhead dominates (BG <= 1024: 0.217 -> 0.173
        # ms/step; at BG >= 4096 it LOSES ~10%).
        fuse_stages = dims.seq_len > 4 or BG <= 1024
    T = schedule.num_train_timesteps
    S = num_inference_steps or T
    ts = schedule.timestep_grid(S)
    prev_ts = ts - T // S

    k_init, k_loop = jax.random.split(rng)
    x_T = jax.random.normal(k_init, (BG, L))  # fp32 carry, stacked 2-D

    # per-step tables, outside the scan: time rows [S, 1, Ce*emb] and
    # scheduler coefficient rows [S, 1, 8]
    Ce = input_emb.shape[1]
    t_emb = compute_time_emb(w, ts)  # [S, emb] fp32
    trows = jnp.tile(t_emb, (1, Ce))[:, None, :]
    coefs = _step_coeffs(schedule, ts, prev_ts, sampler, variance_type)

    embin = input_emb.reshape(BG, -1).astype(jnp.float32)

    dtype = w["init_W"].dtype
    n_stages = len(dims.block_channels)
    if isinstance(block_rows, int):
        rs = [block_rows] * (n_stages + 1)
    else:
        rs = list(block_rows)
    rs = [min(r, BG) for r in rs]
    pad = (-BG) % max(rs)
    if pad:  # rows are independent end-to-end; pad rows run as garbage
        x_T = jnp.concatenate([x_T, jnp.zeros((pad, L), x_T.dtype)])
        embin = jnp.concatenate(
            [embin, jnp.zeros((pad, embin.shape[1]), embin.dtype)]
        )
    BGp = BG + pad

    dim0 = w["init_W"].shape[1] // L
    cins = [dim0] + list(dims.block_channels[:-1])
    W_emb = embin.shape[1]

    stage_names = []
    for i, C in enumerate(cins):
        names = _stage_weight_names(w, i, dims, C, final=False)
        if i == 0:
            names = ["init_W", "init_b"] + names
        stage_names.append(names)
    final_names = _stage_weight_names(
        w, 0, dims, dims.block_channels[-1], final=True
    )
    full_names = _full_weight_names(stage_names, final_names)

    if _fuse_scan_policy(fuse_scan, BG, return_trajectory):
        # ONE launch for the WHOLE trajectory: a fori_loop over steps
        # inside the kernel, weights/embin/tables VMEM-resident per chunk.
        R = _mega_rows(rs[-1], BGp)
        if sampler == "ddpm":
            # bound the per-chunk [S, R, L] noise block to ~8 MB VMEM
            while (R > 8 and S * R * L * 4 > 8 * 1024 * 1024
                   and BGp % (R // 2) == 0):
                R //= 2
        coefs_lt = _lane_tile(coefs[:, 0, :], L)
        blocks = [
            (x_T, _row_spec(R, L)),
            (embin, _row_spec(R, W_emb)),
            (trows[:, 0, :], _const_spec(trows[:, 0, :])),
            (coefs_lt, _const_spec(coefs_lt)),
        ]
        if sampler == "ddpm":
            # same PRNG consumption order as the per-step scan below
            def _gen(key, _):
                key, k_noise = jax.random.split(key)
                return key, jax.random.normal(k_noise, (BGp, L))

            _, noises = jax.lax.scan(_gen, k_loop, None, length=S)
            blocks.append((
                noises,
                pl.BlockSpec((S, R, L), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
            ))
        kern = functools.partial(
            _mega_kernel, full_names, dims, cins, S, sampler,
            schedule.clip_sample, schedule.clip_sample_range,
        )
        x0 = _launch(
            kern, [w[n] for n in full_names], blocks, R, BGp // R, L,
            jnp.float32, interpret,
        )
        return x0[:BG, None, :], None

    if fuse_stages:
        # ONE launch per step: init matmul + every stage + eps head +
        # scheduler update. All weights resident; one grid pass.

        def one_step_full(x, trow, coef, noise):
            R = rs[-1]
            blocks = [
                (x, _row_spec(R, L)),
                (embin, _row_spec(R, W_emb)),
                (trow, _bcast_spec(W_emb)),
                (coef, _bcast_spec(8)),
            ]
            if sampler == "ddpm":
                blocks.append((noise, _row_spec(R, L)))
            kern = functools.partial(
                _full_step_kernel, full_names, dims, cins, sampler,
                schedule.clip_sample, schedule.clip_sample_range,
            )
            return _launch(
                kern, [w[n] for n in full_names], blocks, R, BGp // R, L,
                jnp.float32, interpret,
            )

    def one_step(x, trow, coef, noise):
        h = x
        for i, C in enumerate(cins):
            R = rs[i]
            blocks = [
                (h, _row_spec(R, h.shape[1])),
                (embin, _row_spec(R, W_emb)),
                (trow, _bcast_spec(W_emb)),
            ]
            kern = (
                functools.partial(_stage0_kernel, stage_names[i], dims, C)
                if i == 0
                else functools.partial(
                    _mid_stage_kernel, stage_names[i], dims, i, C
                )
            )
            h = _launch(
                kern, [w[n] for n in stage_names[i]], blocks, R, BGp // R,
                L * dims.block_channels[i], dtype, interpret,
            )
        R = rs[-1]
        blocks = [
            (h, _row_spec(R, h.shape[1])),
            (embin, _row_spec(R, W_emb)),
            (trow, _bcast_spec(W_emb)),
            (x, _row_spec(R, L)),
            (coef, _bcast_spec(8)),
        ]
        if sampler == "ddpm":
            blocks.append((noise, _row_spec(R, L)))
        kern = functools.partial(
            _final_step_kernel, final_names, dims, dims.block_channels[-1],
            sampler, schedule.clip_sample, schedule.clip_sample_range,
        )
        return _launch(
            kern, [w[n] for n in final_names], blocks, R, BGp // R, L,
            jnp.float32, interpret,
        )

    def step(carry, inp):
        x, key = carry
        trow, coef = inp
        if sampler == "ddpm":
            key, k_noise = jax.random.split(key)
            noise = jax.random.normal(k_noise, (BGp, L))
        else:
            noise = None
        x_next = (one_step_full if fuse_stages else one_step)(
            x, trow, coef, noise
        )
        return (x_next, key), (x_next if return_trajectory else None)

    (x0, _), traj = jax.lax.scan(step, (x_T, k_loop), (trows, coefs))
    x0 = x0[:BG, None, :]
    if return_trajectory:
        traj = jnp.concatenate([x_T[None], traj], axis=0)
        traj = traj[:, :BG, None, :]
    return x0, traj


def fused_sample_dpmpp(
    w: Dict[str, jax.Array],
    dims: DenoiserDims,
    ed,
    input_emb: jax.Array,
    rng: jax.Array,
    batch_size: int,
    num_sample_steps: Optional[int] = None,
    clamp: bool = False,
    block_rows: int = 512,
    return_trajectory: bool = False,
    fuse_stages: Optional[bool] = None,
    fuse_scan: Optional[bool] = None,
    interpret: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """DPM-Solver++(2M) with a kernels-only scan body.

    Mirrors ``ElucidatedDiffusion.sample_dpmpp`` exactly (same PRNG
    consumption, same update): the EDM preconditioning (c_in into stage 0;
    c_skip/c_out into the final kernel), the 2M multistep combination and
    the sigma-ratio update all reduce to per-step coefficient rows; the
    time embedding rows come from ``c_noise(sigma_i)``.

    Args:
        ed: the :class:`~graspldm_tpu.diffusion.ElucidatedDiffusion`
            process (schedule + preconditioning constants).
    """
    if _use_xla_attention(dims):
        raise ValueError("fused_sample_dpmpp requires in-kernel attention")
    L = dims.seq_len
    BG = batch_size
    if fuse_stages is None:
        fuse_stages = dims.seq_len > 4 or BG <= 1024
    N = num_sample_steps or ed.num_sample_steps
    sigmas = ed.sample_schedule(N)  # [N+1]
    sig_i, sig_next = sigmas[:-1], sigmas[1:]
    sig_prev = jnp.concatenate([sig_i[:1], sig_i[:-1]])

    def t_fn(s):
        return -jnp.log(jnp.maximum(s, 1e-20))

    t_i, t_next = t_fn(sig_i), t_fn(sig_next)
    h = t_next - t_i
    h_last = t_i - t_fn(sig_prev)
    r = h_last / jnp.where(h == 0, 1e-20, h)
    gamma = -1.0 / (2.0 * jnp.where(r == 0, 1e-20, r))
    use_first = jnp.logical_or(jnp.arange(N) == 0, sig_next == 0.0)
    g1 = jnp.where(use_first, 1.0, 1.0 - gamma)
    g2 = jnp.where(use_first, 0.0, gamma)
    ratio = jnp.maximum(sig_next, 1e-20) / jnp.maximum(sig_i, 1e-20)
    em1 = jnp.expm1(-h)
    coefs = jnp.stack(
        [ed.c_in(sig_i), ed.c_skip(sig_i), ed.c_out(sig_i), g1, g2, ratio,
         em1, jnp.zeros_like(h)],
        axis=-1,
    )[:, None, :].astype(jnp.float32)  # [N, 1, 8]

    Ce = input_emb.shape[1]
    t_emb = compute_time_emb(w, ed.c_noise(sig_i))
    trows = jnp.tile(t_emb, (1, Ce))[:, None, :]

    k_init, _ = jax.random.split(rng)
    x_T = sigmas[0] * jax.random.normal(k_init, (BG, L))
    embin = input_emb.reshape(BG, -1).astype(jnp.float32)

    dtype = w["init_W"].dtype
    n_stages = len(dims.block_channels)
    rs = (
        [block_rows] * (n_stages + 1)
        if isinstance(block_rows, int)
        else list(block_rows)
    )
    rs = [min(r, BG) for r in rs]
    pad = (-BG) % max(rs)
    if pad:
        x_T = jnp.concatenate([x_T, jnp.zeros((pad, L), x_T.dtype)])
        embin = jnp.concatenate(
            [embin, jnp.zeros((pad, embin.shape[1]), embin.dtype)]
        )
    BGp = BG + pad
    W_emb = embin.shape[1]

    dim0 = w["init_W"].shape[1] // L
    cins = [dim0] + list(dims.block_channels[:-1])
    stage_names = []
    for i, C in enumerate(cins):
        names = _stage_weight_names(w, i, dims, C, final=False)
        if i == 0:
            names = ["init_W", "init_b"] + names
        stage_names.append(names)
    final_names = _stage_weight_names(
        w, 0, dims, dims.block_channels[-1], final=True
    )
    full_names = _full_weight_names(stage_names, final_names)

    if _fuse_scan_policy(fuse_scan, BG, return_trajectory):
        R = _mega_rows(rs[-1], BGp)
        coefs_lt = _lane_tile(coefs[:, 0, :], L)
        blocks = [
            (x_T, _row_spec(R, L)),
            (embin, _row_spec(R, W_emb)),
            (trows[:, 0, :], _const_spec(trows[:, 0, :])),
            (coefs_lt, _const_spec(coefs_lt)),
        ]
        kern = functools.partial(
            _mega_dpmpp_kernel, full_names, dims, cins, N, clamp
        )
        x0 = _launch(
            kern, [w[n] for n in full_names], blocks, R, BGp // R, L,
            jnp.float32, interpret,
        )
        return x0[:BG, None, :], None

    if fuse_stages:

        def one_step(x, old, trow, coef):
            R = rs[-1]
            blocks = [
                (x, _row_spec(R, L)),
                (embin, _row_spec(R, W_emb)),
                (trow, _bcast_spec(W_emb)),
                (old, _row_spec(R, L)),
                (coef, _bcast_spec(8)),
            ]
            kern = functools.partial(
                _full_dpmpp_kernel, full_names, dims, cins, clamp
            )
            return _launch2(
                kern, [w[n] for n in full_names], blocks, R, BGp // R, L,
                interpret,
            )

    else:

        def one_step(x, old, trow, coef):
            act = x
            for i, C in enumerate(cins):
                R = rs[i]
                blocks = [
                    (act, _row_spec(R, act.shape[1])),
                    (embin, _row_spec(R, W_emb)),
                    (trow, _bcast_spec(W_emb)),
                ]
                if i == 0:
                    blocks.append((coef, _bcast_spec(8)))
                    kern = functools.partial(
                        _stage0_dpmpp_kernel, stage_names[i], dims, C
                    )
                else:
                    kern = functools.partial(
                        _mid_stage_kernel, stage_names[i], dims, i, C
                    )
                act = _launch(
                    kern, [w[n] for n in stage_names[i]], blocks, R,
                    BGp // R, L * dims.block_channels[i], dtype, interpret,
                )
            R = rs[-1]
            blocks = [
                (act, _row_spec(R, act.shape[1])),
                (embin, _row_spec(R, W_emb)),
                (trow, _bcast_spec(W_emb)),
                (x, _row_spec(R, L)),
                (old, _row_spec(R, L)),
                (coef, _bcast_spec(8)),
            ]
            kern = functools.partial(
                _final_dpmpp_kernel, final_names, dims,
                dims.block_channels[-1], clamp,
            )
            return _launch2(
                kern, [w[n] for n in final_names], blocks, R, BGp // R, L,
                interpret,
            )

    def step(carry, inp):
        x, old = carry
        trow, coef = inp
        x_new, denoised = one_step(x, old, trow, coef)
        return (x_new, denoised), (x_new if return_trajectory else None)

    (x0, _), traj = jax.lax.scan(
        step, (x_T, jnp.zeros_like(x_T)), (trows, coefs)
    )
    x0 = x0[:BG, None, :]
    if return_trajectory:
        traj = traj[:, :BG, None, :]  # sample_dpmpp does not prepend x_T
    return x0, traj


def fused_sample_churn(
    w: Dict[str, jax.Array],
    dims: DenoiserDims,
    ed,
    input_emb: jax.Array,
    rng: jax.Array,
    batch_size: int,
    num_sample_steps: Optional[int] = None,
    clamp: bool = False,
    block_rows: int = 512,
    return_trajectory: bool = False,
    fuse_stages: Optional[bool] = None,
    fuse_scan: Optional[bool] = None,
    interpret: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """EDM stochastic churn sampler (Heun) with a kernels-only scan body.

    Mirrors ``ElucidatedDiffusion.sample_churn`` exactly (same PRNG
    consumption): per step the only XLA op is the normal draw; the churn
    injection, both preconditioned net evaluations, the Euler half-step
    and the Heun correction run inside the kernels, driven by two
    precomputed coefficient rows (the sigma_hat leg and the sigma_next
    leg). ``fuse_stages`` runs the WHOLE two-evaluation step in one
    launch.
    """
    import math as _math

    if _use_xla_attention(dims):
        raise ValueError("fused_sample_churn requires in-kernel attention")
    L = dims.seq_len
    BG = batch_size
    if fuse_stages is None:
        fuse_stages = dims.seq_len > 4 or BG <= 1024
    N = num_sample_steps or ed.num_sample_steps
    sigmas = ed.sample_schedule(N)  # [N+1]
    gammas = jnp.where(
        (sigmas >= ed.S_tmin) & (sigmas <= ed.S_tmax),
        min(ed.S_churn / N, _math.sqrt(2.0) - 1.0),
        0.0,
    )
    sig, sig_next, gamma = sigmas[:-1], sigmas[1:], gammas[:-1]
    sigma_hat = sig + gamma * sig
    # eps = S_noise * normal folds into the coefficient (scaling commutes
    # with the draw, so PRNG parity with the reference sampler holds)
    s_eps = jnp.sqrt(jnp.maximum(sigma_hat**2 - sig**2, 0.0)) * ed.S_noise
    dsc = sig_next - sigma_hat
    zeros = jnp.zeros_like(sig)
    coefA = jnp.stack(
        [ed.c_in(sigma_hat), ed.c_skip(sigma_hat), ed.c_out(sigma_hat),
         s_eps, dsc, 1.0 / sigma_hat, zeros, zeros], axis=-1,
    )[:, None, :].astype(jnp.float32)
    coefB = jnp.stack(
        [ed.c_in(sig_next), ed.c_skip(sig_next), ed.c_out(sig_next),
         s_eps, 0.5 * dsc, 1.0 / jnp.maximum(sig_next, 1e-12),
         (sig_next != 0.0).astype(jnp.float32), zeros], axis=-1,
    )[:, None, :].astype(jnp.float32)

    Ce = input_emb.shape[1]
    trowsA = jnp.tile(compute_time_emb(w, ed.c_noise(sigma_hat)), (1, Ce))[
        :, None, :
    ]
    trowsB = jnp.tile(compute_time_emb(w, ed.c_noise(sig_next)), (1, Ce))[
        :, None, :
    ]

    k_init, k_loop = jax.random.split(rng)
    x_T = sigmas[0] * jax.random.normal(k_init, (BG, L))
    embin = input_emb.reshape(BG, -1).astype(jnp.float32)

    dtype = w["init_W"].dtype
    n_stages = len(dims.block_channels)
    rs = (
        [block_rows] * (n_stages + 1)
        if isinstance(block_rows, int)
        else list(block_rows)
    )
    rs = [min(r, BG) for r in rs]
    pad = (-BG) % max(rs)
    if pad:
        x_T = jnp.concatenate([x_T, jnp.zeros((pad, L), x_T.dtype)])
        embin = jnp.concatenate(
            [embin, jnp.zeros((pad, embin.shape[1]), embin.dtype)]
        )
    BGp = BG + pad
    W_emb = embin.shape[1]

    dim0 = w["init_W"].shape[1] // L
    cins = [dim0] + list(dims.block_channels[:-1])
    stage_names = []
    for i, C in enumerate(cins):
        names = _stage_weight_names(w, i, dims, C, final=False)
        if i == 0:
            names = ["init_W", "init_b"] + names
        stage_names.append(names)
    final_names = _stage_weight_names(
        w, 0, dims, dims.block_channels[-1], final=True
    )
    full_names = _full_weight_names(stage_names, final_names)

    if _fuse_scan_policy(fuse_scan, BG, return_trajectory):
        R = _mega_rows(rs[-1], BGp)
        if dims.seq_len > 4:
            # z16 churn mega: two denoiser chains + the noise table make
            # the single-chunk small-batch grid exceed the 128 MB VMEM
            # hardware capacity (measured 142.3M at R=1024); stay on the
            # default multi-chunk rows, which fit under vmem_mb=124.
            R = rs[-1]
        # bound the per-chunk [N, R, L] noise block to ~8 MB VMEM
        while (R > 8 and N * R * L * 4 > 8 * 1024 * 1024
               and BGp % (R // 2) == 0):
            R //= 2

        # same PRNG consumption order as the per-step scan below
        def _gen(key, _):
            key, k_eps = jax.random.split(key)
            return key, jax.random.normal(k_eps, (BGp, L))

        _, noises = jax.lax.scan(_gen, k_loop, None, length=N)
        coefA_lt = _lane_tile(coefA[:, 0, :], L)
        coefB_lt = _lane_tile(coefB[:, 0, :], L)
        blocks = [
            (x_T, _row_spec(R, L)),
            (embin, _row_spec(R, W_emb)),
            (trowsA[:, 0, :], _const_spec(trowsA[:, 0, :])),
            (trowsB[:, 0, :], _const_spec(trowsB[:, 0, :])),
            (coefA_lt, _const_spec(coefA_lt)),
            (coefB_lt, _const_spec(coefB_lt)),
            (noises, pl.BlockSpec((N, R, L), lambda i: (0, i, 0),
                                  memory_space=pltpu.VMEM)),
        ]
        kern = functools.partial(
            _mega_churn_kernel, full_names, dims, cins, N, clamp
        )
        x0 = _launch(
            kern, [w[n] for n in full_names], blocks, R, BGp // R, L,
            jnp.float32, interpret, vmem_mb=124,
        )
        return x0[:BG, None, :], None

    def run_mids(act, trow):
        for i, C in enumerate(cins):
            if i == 0:
                continue
            R = rs[i]
            act = _launch(
                functools.partial(
                    _mid_stage_kernel, stage_names[i], dims, i, C
                ),
                [w[n] for n in stage_names[i]],
                [
                    (act, _row_spec(R, act.shape[1])),
                    (embin, _row_spec(R, W_emb)),
                    (trow, _bcast_spec(W_emb)),
                ],
                R, BGp // R, L * dims.block_channels[i], dtype, interpret,
            )
        return act

    if fuse_stages:

        def one_step(x, noise, trowA, trowB, cA, cB):
            R = rs[-1]
            blocks = [
                (x, _row_spec(R, L)),
                (noise, _row_spec(R, L)),
                (embin, _row_spec(R, W_emb)),
                (trowA, _bcast_spec(W_emb)),
                (trowB, _bcast_spec(W_emb)),
                (cA, _bcast_spec(8)),
                (cB, _bcast_spec(8)),
            ]
            return _launch(
                functools.partial(
                    _full_churn_kernel, full_names, dims, cins, clamp
                ),
                [w[n] for n in full_names], blocks, R, BGp // R, L,
                jnp.float32, interpret,
            )

    else:

        def one_step(x, noise, trowA, trowB, cA, cB):
            # chain A (sigma_hat leg): churn injection + Euler half-step
            R0 = rs[0]
            act = _launch(
                functools.partial(
                    _stage0_churn_a_kernel, stage_names[0], dims, cins[0]
                ),
                [w[n] for n in stage_names[0]],
                [
                    (x, _row_spec(R0, L)),
                    (noise, _row_spec(R0, L)),
                    (embin, _row_spec(R0, W_emb)),
                    (trowA, _bcast_spec(W_emb)),
                    (cA, _bcast_spec(8)),
                ],
                R0, BGp // R0, L * dims.block_channels[0], dtype, interpret,
            )
            act = run_mids(act, trowA)
            R = rs[-1]
            x_eul, d = _launch2(
                functools.partial(
                    _final_churn_a_kernel, final_names, dims,
                    dims.block_channels[-1], clamp,
                ),
                [w[n] for n in final_names],
                [
                    (act, _row_spec(R, act.shape[1])),
                    (embin, _row_spec(R, W_emb)),
                    (trowA, _bcast_spec(W_emb)),
                    (x, _row_spec(R, L)),
                    (noise, _row_spec(R, L)),
                    (cA, _bcast_spec(8)),
                ],
                R, BGp // R, L, interpret,
            )
            # chain B (sigma_next leg): Heun correction
            act = _launch(
                functools.partial(
                    _stage0_dpmpp_kernel, stage_names[0], dims, cins[0]
                ),
                [w[n] for n in stage_names[0]],
                [
                    (x_eul, _row_spec(R0, L)),
                    (embin, _row_spec(R0, W_emb)),
                    (trowB, _bcast_spec(W_emb)),
                    (cB, _bcast_spec(8)),
                ],
                R0, BGp // R0, L * dims.block_channels[0], dtype, interpret,
            )
            act = run_mids(act, trowB)
            return _launch(
                functools.partial(
                    _final_churn_b_kernel, final_names, dims,
                    dims.block_channels[-1], clamp,
                ),
                [w[n] for n in final_names],
                [
                    (act, _row_spec(R, act.shape[1])),
                    (embin, _row_spec(R, W_emb)),
                    (trowB, _bcast_spec(W_emb)),
                    (x_eul, _row_spec(R, L)),
                    (d, _row_spec(R, L)),
                    (x, _row_spec(R, L)),
                    (noise, _row_spec(R, L)),
                    (cB, _bcast_spec(8)),
                ],
                R, BGp // R, L, jnp.float32, interpret,
            )

    def step(carry, inp):
        x, key = carry
        trowA, trowB, cA, cB = inp
        key, k_eps = jax.random.split(key)
        noise = jax.random.normal(k_eps, (BGp, L))
        x_new = one_step(x, noise, trowA, trowB, cA, cB)
        return (x_new, key), (x_new if return_trajectory else None)

    (x0, _), traj = jax.lax.scan(
        step, (x_T, k_loop), (trowsA, trowsB, coefA, coefB)
    )
    x0 = x0[:BG, None, :]
    if return_trajectory:
        traj = jnp.concatenate([x_T[None], traj], axis=0)
        traj = traj[:, :BG, None, :]
    return x0, traj
