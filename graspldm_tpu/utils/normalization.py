"""Normalization contract for point clouds and grasp poses.

Mirrors the reference semantics (`grasp_ldm/dataset/acronym/acronym_pointclouds.py:14-16,
230-376`): point clouds and grasp translations are centered on the per-object
point-cloud mean, then divided by a fixed translation scale (0.05); MRP
components are divided by a fixed rotation scale (0.5). The meta dict records
the exact shift/scale used so generation can invert it:

    unnormalized = normalized * std + mean
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

TRANSLATION_SCALE_FACTOR = 0.05
ROTATION_SCALE_FACTOR = 0.5


class NormalizationMeta(NamedTuple):
    """Per-object normalization parameters.

    Attributes:
        pc_mean: ``[..., 3]`` total point-cloud shift (centering + dataset shift).
        pc_std: ``[..., 3]`` point-cloud scale.
        grasp_mean: ``[..., 6]`` total grasp shift (translation slice carries pc_mean).
        grasp_std: ``[..., 6]`` grasp scale ([t_scale]*3 + [r_scale]*3).
    """

    pc_mean: jax.Array
    pc_std: jax.Array
    grasp_mean: jax.Array
    grasp_std: jax.Array


def default_grasp_std(dtype=jnp.float32) -> jax.Array:
    return jnp.array(
        [TRANSLATION_SCALE_FACTOR] * 3 + [ROTATION_SCALE_FACTOR] * 3, dtype=dtype
    )


def default_pc_std(dtype=jnp.float32) -> jax.Array:
    return jnp.full((3,), TRANSLATION_SCALE_FACTOR, dtype=dtype)


def normalize_pc_and_grasps(
    pc: jax.Array, grasps: jax.Array
) -> Tuple[jax.Array, jax.Array, NormalizationMeta]:
    """Center on pc mean and apply fixed scales.

    Args:
        pc: ``[..., N, 3]`` point cloud.
        grasps: ``[..., G, 6+]`` grasp rows; only the first 6 dims ([t, mrp])
            are normalized, trailing dims (success flag, qualities) pass through.

    Returns:
        (pc_normalized, grasps_normalized, meta)
    """
    pc_mean = jnp.mean(pc, axis=-2)
    pc_c = pc - pc_mean[..., None, :]
    t = grasps[..., :3] - pc_mean[..., None, :]
    mrp = grasps[..., 3:6]

    pc_n = pc_c / TRANSLATION_SCALE_FACTOR
    t_n = t / TRANSLATION_SCALE_FACTOR
    mrp_n = mrp / ROTATION_SCALE_FACTOR
    grasps_n = jnp.concatenate([t_n, mrp_n, grasps[..., 6:]], axis=-1)

    grasp_mean = jnp.concatenate(
        [pc_mean, jnp.zeros_like(pc_mean)], axis=-1
    )
    batch = pc_mean.shape[:-1]
    meta = NormalizationMeta(
        pc_mean=pc_mean,
        pc_std=jnp.broadcast_to(default_pc_std(pc.dtype), batch + (3,)),
        grasp_mean=grasp_mean,
        grasp_std=jnp.broadcast_to(default_grasp_std(pc.dtype), batch + (6,)),
    )
    return pc_n, grasps_n, meta


def unnormalize_grasps(grasps_n: jax.Array, meta: NormalizationMeta) -> jax.Array:
    """Invert normalization for tmrp grasp rows ``[..., G, 6]``."""
    return grasps_n * meta.grasp_std[..., None, :] + meta.grasp_mean[..., None, :]


def unnormalize_pc(pc_n: jax.Array, meta: NormalizationMeta) -> jax.Array:
    return pc_n * meta.pc_std[..., None, :] + meta.pc_mean[..., None, :]
