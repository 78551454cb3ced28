"""Minimal mesh IO + surface sampling (numpy, no trimesh dependency).

Replaces the reference's trimesh usage for the training data path
(`acronym_pointclouds.py:174-177` `mesh.sample(N)`, `acronym.py:273-312`
mesh loading/scaling): a tiny OBJ reader and area-weighted uniform surface
sampling. Visualization-only trimesh features live in `utils/vis.py` behind
an optional import.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

__all__ = ["load_obj", "sample_surface", "Mesh"]


class Mesh:
    """Triangle mesh: vertices ``[V, 3]`` float64, faces ``[F, 3]`` int64."""

    def __init__(self, vertices: np.ndarray, faces: np.ndarray):
        self.vertices = np.asarray(vertices, dtype=np.float64)
        self.faces = np.asarray(faces, dtype=np.int64)

    def scaled(self, scale: float) -> "Mesh":
        return Mesh(self.vertices * float(scale), self.faces)

    @property
    def face_areas(self) -> np.ndarray:
        v = self.vertices
        f = self.faces
        a, b, c = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
        return 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=-1)

    def sample(
        self, count: int, rng: Optional[np.random.Generator] = None
    ) -> np.ndarray:
        return sample_surface(self, count, rng)


def load_obj(path: str) -> Mesh:
    """Parse a Wavefront OBJ (v / f records; polygons fan-triangulated)."""
    vertices = []
    faces = []
    with open(path, "r") as fh:
        for line in fh:
            if line.startswith("v "):
                parts = line.split()
                vertices.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif line.startswith("f "):
                idx = []
                for tok in line.split()[1:]:
                    # f v, f v/vt, f v/vt/vn, f v//vn
                    i = int(tok.split("/")[0])
                    idx.append(i - 1 if i > 0 else len(vertices) + i)
                for k in range(1, len(idx) - 1):
                    faces.append([idx[0], idx[k], idx[k + 1]])
    if not vertices or not faces:
        raise ValueError(f"OBJ file has no triangles: {path}")
    return Mesh(np.asarray(vertices), np.asarray(faces))


def sample_surface(
    mesh: Mesh, count: int, rng: Optional[np.random.Generator] = None
) -> np.ndarray:
    """Uniform area-weighted surface sampling -> ``[count, 3]`` float32.

    Uses the native C++ path (`graspldm_tpu/native/host_ops.cpp`) when
    available; numpy fallback otherwise.
    """
    rng = rng or np.random.default_rng()

    from ..native import sample_surface_native

    native = sample_surface_native(
        mesh.vertices, mesh.faces, count, int(rng.integers(1 << 62))
    )
    if native is not None:
        return native
    areas = mesh.face_areas
    total = areas.sum()
    if total <= 0:
        raise ValueError("Mesh has zero surface area")
    probs = areas / total
    face_idx = rng.choice(len(probs), size=count, p=probs)
    f = mesh.faces[face_idx]
    a = mesh.vertices[f[:, 0]]
    b = mesh.vertices[f[:, 1]]
    c = mesh.vertices[f[:, 2]]
    # uniform barycentric sampling
    r1 = np.sqrt(rng.random((count, 1)))
    r2 = rng.random((count, 1))
    pts = (1 - r1) * a + r1 * (1 - r2) * b + r1 * r2 * c
    return pts.astype(np.float32)
