"""Host-side point-cloud utilities.

Rebuild of `grasp_ldm/utils/pointcloud_helpers.py:10-261`: point-count
regularization, host FPS (native C++ fast path), normal estimation via
kd-tree + local PCA, and Delaunay-based meshification (scipy).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
from scipy.spatial import Delaunay, cKDTree

__all__ = [
    "regularize_pc_point_count",
    "farthest_point_sample_np",
    "estimate_normals",
    "meshify_delaunay",
]


def farthest_point_sample_np(points: np.ndarray, num_samples: int) -> np.ndarray:
    """Host FPS indices (first index 0). Native C++ when available."""
    from ..native import farthest_point_sample_native

    native = farthest_point_sample_native(points, num_samples)
    if native is not None:
        return native

    n = len(points)
    dist = np.full((n,), np.inf)
    idx = np.zeros((num_samples,), np.int64)
    last = 0
    for j in range(1, num_samples):
        d = np.sum((points - points[last]) ** 2, axis=-1)
        dist = np.minimum(dist, d)
        last = int(np.argmax(dist))
        idx[j] = last
    return idx


def regularize_pc_point_count(
    pc: np.ndarray,
    num_points: int,
    use_farthest_point: bool = False,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Resize a cloud to exactly ``num_points`` (subsample or pad-by-resample).

    Reference `pointcloud_helpers.py:124-160`.
    """
    rng = rng or np.random.default_rng()
    n = len(pc)
    if n == num_points:
        return pc
    if n > num_points:
        if use_farthest_point:
            return pc[farthest_point_sample_np(pc, num_points)]
        return pc[rng.choice(n, num_points, replace=False)]
    extra = rng.choice(n, num_points - n, replace=True)
    return np.concatenate([pc, pc[extra]], axis=0)


def estimate_normals(
    pc: np.ndarray, k: int = 16, orient_toward: Optional[np.ndarray] = None
) -> np.ndarray:
    """Per-point normals from local PCA over k nearest neighbors.

    Reference `pointcloud_helpers.py:74-122` (cKDTree + smallest-eigenvector
    plane normal); optionally orients normals toward a viewpoint.
    """
    tree = cKDTree(pc)
    _, nbrs = tree.query(pc, k=k)
    neigh = pc[nbrs]  # [N, k, 3]
    centered = neigh - neigh.mean(axis=1, keepdims=True)
    cov = np.einsum("nki,nkj->nij", centered, centered) / k
    _, vecs = np.linalg.eigh(cov)
    normals = vecs[:, :, 0]  # smallest eigenvalue
    if orient_toward is not None:
        to_view = orient_toward[None, :] - pc
        flip = np.sum(normals * to_view, axis=-1) < 0
        normals[flip] = -normals[flip]
    return normals


def meshify_delaunay(pc: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """2.5-D Delaunay triangulation over the two principal axes.

    Reference `pointcloud_helpers.py:11-38`. Returns (vertices, faces).
    """
    centered = pc - pc.mean(0)
    _, _, vt = np.linalg.svd(centered, full_matrices=False)
    uv = centered @ vt[:2].T
    tri = Delaunay(uv)
    return pc, tri.simplices.astype(np.int64)
