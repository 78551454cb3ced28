"""FrustumPointNet multi-task loss (vendored-extra parity), pure JAX.

Rebuild of `grasp_ldm/models/modules/ext/pvcnn/modules/frustum.py:11-197` —
an extra the reference vendors with PVCNN (unused by GraspLDM itself, kept
for component parity): instance-mask cross-entropy + bounded-box regression
with heading/size bin classification, normalized-residual refinement, and a
flip-invariant corner loss.

Functional (no module state): the size templates and bin count parameterize
the call. All reductions are means, huber deltas match the reference.
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp

__all__ = ["frustum_pointnet_loss", "get_box_corners_3d"]


def _huber(error: jax.Array, delta: float) -> jax.Array:
    a = jnp.abs(error)
    quad = jnp.minimum(a, delta)
    return jnp.mean(0.5 * quad**2 + delta * (a - quad))


def _xent(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Cross entropy over axis 1 (torch F.cross_entropy layout)."""
    logp = jax.nn.log_softmax(logits, axis=1)
    lab = jax.nn.one_hot(labels, logits.shape[1], axis=1, dtype=logp.dtype)
    return -jnp.mean(jnp.sum(logp * lab, axis=1))


def get_box_corners_3d(centers, headings, sizes, with_flip=False):
    """Box corners ``[N, 3, 8]`` (counter-clockwise, y-up heading rotation);
    mirrors `frustum.py:140-178`."""
    l, w, h = sizes[:, 0], sizes[:, 1], sizes[:, 2]
    x_c = jnp.stack([l, l, -l, -l, l, l, -l, -l], axis=1) / 2
    y_c = jnp.stack([h, h, h, h, -h, -h, -h, -h], axis=1) / 2
    z_c = jnp.stack([w, -w, -w, w, w, -w, -w, w], axis=1) / 2
    corners = jnp.stack([x_c, y_c, z_c], axis=1)  # [N, 3, 8]

    c, s = jnp.cos(headings), jnp.sin(headings)
    o, z = jnp.ones_like(headings), jnp.zeros_like(headings)
    R = jnp.stack([c, z, s, z, o, z, -s, z, c], axis=1).reshape(-1, 3, 3)
    out = R @ corners + centers[:, :, None]
    if not with_flip:
        return out
    R_f = jnp.stack([-c, z, -s, z, o, z, s, z, -c], axis=1).reshape(-1, 3, 3)
    return out, R_f @ corners + centers[:, :, None]


def frustum_pointnet_loss(
    inputs: Dict[str, jax.Array],
    targets: Dict[str, jax.Array],
    size_templates: jax.Array,  # [NS, 3]
    num_heading_angle_bins: int,
    box_loss_weight: float = 1.0,
    corners_loss_weight: float = 10.0,
    heading_residual_loss_weight: float = 20.0,
    size_residual_loss_weight: float = 20.0,
) -> jax.Array:
    """Input/target dicts use the reference's keys (`frustum.py:38-55`)."""
    bin_centers = jnp.arange(
        0.0, 2 * math.pi, 2 * math.pi / num_heading_angle_bins
    )
    b = jnp.arange(inputs["center"].shape[0])
    h_id = targets["heading_bin_id"]
    s_id = targets["size_template_id"]

    mask_loss = _xent(inputs["mask_logits"], targets["mask_logits"])
    heading_loss = _xent(inputs["heading_scores"], h_id)
    size_loss = _xent(inputs["size_scores"], s_id)
    center_loss = _huber(
        jnp.linalg.norm(targets["center"] - inputs["center"], axis=-1), 2.0
    )
    center_reg_loss = _huber(
        jnp.linalg.norm(targets["center"] - inputs["center_reg"], axis=-1), 1.0
    )

    hr_norm = inputs["heading_residuals_normalized"][b, h_id]
    hr_norm_target = targets["heading_residual"] / (
        math.pi / num_heading_angle_bins
    )
    heading_residual_loss = _huber(hr_norm - hr_norm_target, 1.0)

    sr_norm = inputs["size_residuals_normalized"][b, s_id]  # [B, 3]
    sr_norm_target = targets["size_residual"] / size_templates[s_id]
    size_residual_loss = _huber(
        jnp.linalg.norm(sr_norm_target - sr_norm, axis=-1), 1.0
    )

    heading = inputs["heading_residuals"][b, h_id] + bin_centers[h_id]
    size = inputs["size_residuals"][b, s_id] + size_templates[s_id]
    corners = get_box_corners_3d(inputs["center"], heading, size)
    heading_t = bin_centers[h_id] + targets["heading_residual"]
    size_t = size_templates[s_id] + targets["size_residual"]
    corners_t, corners_t_flip = get_box_corners_3d(
        targets["center"], heading_t, size_t, with_flip=True
    )
    corners_loss = _huber(
        jnp.minimum(
            jnp.linalg.norm(corners - corners_t, axis=1),
            jnp.linalg.norm(corners - corners_t_flip, axis=1),
        ),
        1.0,
    )

    return mask_loss + box_loss_weight * (
        center_loss
        + center_reg_loss
        + heading_loss
        + size_loss
        + heading_residual_loss_weight * heading_residual_loss
        + size_residual_loss_weight * size_residual_loss
        + corners_loss_weight * corners_loss
    )
