"""Batched SO(3)/SE(3) conversions in pure JAX.

TPU-native rebuild of the rotation utilities of the reference implementation
(`grasp_ldm/utils/rotations.py:67-337`): translation + Modified Rodrigues
Parameters ("tmrp", layout ``[t(3), mrp(3)]``) <-> quaternion <-> rotation
matrix <-> 4x4 homogeneous transforms.

Design notes (TPU-first):
  * Everything is shape-polymorphic over leading batch dims and fully
    vectorized -- no data-dependent branching. The branch selection in the
    rotmat->quat conversion (largest-diagonal pivot, SciPy-style, reference
    `rotations.py:80-105`) is expressed with ``jnp.where`` masks so it jits to
    pure vector ops on the VPU.
  * fp32 throughout; these run once per batch at the edges of the hot path.

Conventions (identical to the reference):
  * quaternions are ``xyzw`` unless stated otherwise.
  * MRP p = q_vec / (1 + q_w); inverse: q_vec = 2p/(1+|p|^2),
    q_w = (1-|p|^2)/(1+|p|^2)   (reference `rotations.py:218-252`).
  * tmrp layout is [t(3), mrp(3)] -- translation first
    (reference `rotations.py:298-309`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "quat_xyzw_to_wxyz",
    "quat_wxyz_to_xyzw",
    "rotmat_to_quat",
    "quat_to_rotmat",
    "quat_to_mrp",
    "mrp_to_quat",
    "rotmat_to_mrp",
    "mrp_to_rotmat",
    "Rt_to_H",
    "H_to_Rt",
    "H_to_qt",
    "qt_to_H",
    "tmrp_to_H",
    "H_to_tmrp",
    "random_rotations_in_angle_limit",
]


def quat_xyzw_to_wxyz(q: jax.Array) -> jax.Array:
    return q[..., jnp.array([3, 0, 1, 2])]


def quat_wxyz_to_xyzw(q: jax.Array) -> jax.Array:
    return q[..., jnp.array([1, 2, 3, 0])]


def rotmat_to_quat(R: jax.Array, return_wxyz: bool = False) -> jax.Array:
    """Rotation matrices ``[..., 3, 3]`` -> unit quaternions ``[..., 4]`` (xyzw).

    Vectorized SciPy-style largest-pivot construction: the four candidate
    quaternions (one per pivot i in {0,1,2} plus the trace branch) are all
    computed and the numerically-stable one selected with masks.
    """
    d0 = R[..., 0, 0]
    d1 = R[..., 1, 1]
    d2 = R[..., 2, 2]
    trace = d0 + d1 + d2

    # Candidate for pivot i (i = argmax diagonal): indices j = (i+1)%3, k = (j+1)%3
    def pivot_candidate(i):
        j = (i + 1) % 3
        k = (j + 1) % 3
        q = [None, None, None, None]
        diag = (d0, d1, d2)
        q[i] = 1.0 - trace + 2.0 * diag[i]
        q[j] = R[..., j, i] + R[..., i, j]
        q[k] = R[..., k, i] + R[..., i, k]
        q[3] = R[..., k, j] - R[..., j, k]
        return jnp.stack(q, axis=-1)

    cand0 = pivot_candidate(0)
    cand1 = pivot_candidate(1)
    cand2 = pivot_candidate(2)
    cand3 = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
            1.0 + trace,
        ],
        axis=-1,
    )

    decision = jnp.stack([d0, d1, d2, trace], axis=-1)
    choice = jnp.argmax(decision, axis=-1)[..., None]

    quat = jnp.where(
        choice == 0,
        cand0,
        jnp.where(choice == 1, cand1, jnp.where(choice == 2, cand2, cand3)),
    )
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    if return_wxyz:
        quat = quat_xyzw_to_wxyz(quat)
    return quat


def quat_to_rotmat(quat: jax.Array, is_xyzw: bool = True) -> jax.Array:
    """Unit quaternions ``[..., 4]`` -> rotation matrices ``[..., 3, 3]``.

    No normalization is applied (matches reference `rotations.py:171-215`).
    """
    if not is_xyzw:
        quat = quat_wxyz_to_xyzw(quat)
    x, y, z, w = quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3]

    x2, y2, z2, w2 = x * x, y * y, z * z, w * w
    xy, zw, xz, yw, yz, xw = x * y, z * w, x * z, y * w, y * z, x * w

    r00 = x2 - y2 - z2 + w2
    r10 = 2.0 * (xy + zw)
    r20 = 2.0 * (xz - yw)
    r01 = 2.0 * (xy - zw)
    r11 = -x2 + y2 - z2 + w2
    r21 = 2.0 * (yz + xw)
    r02 = 2.0 * (xz + yw)
    r12 = 2.0 * (yz - xw)
    r22 = -x2 - y2 + z2 + w2

    rows = jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )
    return rows


def quat_to_mrp(quat: jax.Array, is_xyzw: bool = True) -> jax.Array:
    """Quaternion -> modified Rodrigues parameters: p = q_vec / (1 + q_w)."""
    if not is_xyzw:
        quat = quat_wxyz_to_xyzw(quat)
    return quat[..., :3] / (1.0 + quat[..., 3:4])


def mrp_to_quat(mrp: jax.Array, return_wxyz: bool = False) -> jax.Array:
    """MRP ``[..., 3]`` -> quaternion ``[..., 4]`` (xyzw by default)."""
    magsq = jnp.sum(mrp * mrp, axis=-1, keepdims=True)
    qvec = 2.0 * mrp / (1.0 + magsq)
    qw = (1.0 - magsq) / (1.0 + magsq)
    quat = jnp.concatenate([qvec, qw], axis=-1)
    if return_wxyz:
        quat = quat_xyzw_to_wxyz(quat)
    return quat


def rotmat_to_mrp(R: jax.Array) -> jax.Array:
    return quat_to_mrp(rotmat_to_quat(R))


def mrp_to_rotmat(mrp: jax.Array) -> jax.Array:
    return quat_to_rotmat(mrp_to_quat(mrp))


def Rt_to_H(R: jax.Array, t: jax.Array) -> jax.Array:
    """Rotation ``[..., 3, 3]`` + translation ``[..., 3]`` -> homogeneous ``[..., 4, 4]``."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.zeros(batch + (1, 4), dtype=R.dtype).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def H_to_Rt(H: jax.Array):
    return H[..., :3, :3], H[..., :3, 3]


def H_to_qt(H: jax.Array, return_wxyz: bool = False):
    R, t = H_to_Rt(H)
    return rotmat_to_quat(R, return_wxyz=return_wxyz), t


def qt_to_H(quat: jax.Array, t: jax.Array, is_xyzw: bool = True) -> jax.Array:
    return Rt_to_H(quat_to_rotmat(quat, is_xyzw=is_xyzw), t)


def tmrp_to_H(tmrp: jax.Array) -> jax.Array:
    """``[..., 6]`` (t first, then mrp) -> ``[..., 4, 4]``."""
    return Rt_to_H(mrp_to_rotmat(tmrp[..., 3:6]), tmrp[..., :3])


def H_to_tmrp(H: jax.Array) -> jax.Array:
    R, t = H_to_Rt(H)
    return jnp.concatenate([t, rotmat_to_mrp(R)], axis=-1)


def random_rotations_in_angle_limit(
    key: jax.Array, angle_limit_rad: jax.Array | float, batch_size: int = 1
) -> jax.Array:
    """Uniform random axis + uniform random angle in [0, limit] -> rotmats ``[B, 3, 3]``.

    Mirrors the reference's sampling scheme (`rotations.py:312-337`): the axis
    is a normalized uniform sample of the unit cube (NOT uniform on the sphere;
    preserved for behavioral parity) and the angle is uniform in the limit.
    """
    k_axis, k_angle = jax.random.split(key)
    axis = jax.random.uniform(k_axis, (batch_size, 3))
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    angle = jax.random.uniform(k_angle, (batch_size, 1)) * angle_limit_rad
    qvec = axis * jnp.sin(angle / 2.0)
    quat = jnp.concatenate([qvec, jnp.cos(angle / 2.0)], axis=-1)
    return quat_to_rotmat(quat, is_xyzw=True)
