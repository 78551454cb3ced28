"""Pure-torch CPU implementations of the reference's CUDA kernel semantics.

Injected as ``grasp_ldm.models.modules.ext.pvcnn.modules.functional`` so the
REAL reference modules run on CPU for golden-parity tests. Each function
matches the CUDA kernel contract documented in SURVEY.md §2.1:

  * ``avg_voxelize``        — `vox.cu:19-73` scatter-mean, empty voxels 0
  * ``trilinear_devoxelize``— `trilinear_devox.cu:38-106` 8-corner gather
  * ``ball_query``          — `ball_query.cu:20-52` first-U within r², rows
                              pre-padded with the FIRST found index
  * ``grouping``            — `grouping.cu:19-44` indexed gather
  * ``nearest_neighbor_interpolate`` — `neighbor_interpolate.cu` 3-NN inverse
                              distance weights
  * ``furthest_point_sample`` (+``gather``) — `sampling.cu:87-170`, seeded at
                              index 0
  * ``logits_mask``         — `functional/sampling.py:54-103`
"""

from __future__ import annotations

import torch

__all__ = [
    "avg_voxelize",
    "trilinear_devoxelize",
    "ball_query",
    "grouping",
    "nearest_neighbor_interpolate",
    "furthest_point_sample",
    "gather",
    "logits_mask",
    "kl_loss",
    "huber_loss",
]


def avg_voxelize(features: torch.Tensor, coords: torch.Tensor, resolution: int):
    """features [B, C, N], int coords [B, 3, N] -> [B, C, r, r, r]."""
    B, C, N = features.shape
    r = int(resolution)
    V = r * r * r
    flat = (
        coords[:, 0].long() * (r * r) + coords[:, 1].long() * r + coords[:, 2].long()
    )  # [B, N]
    out = torch.zeros(B, C, V, dtype=features.dtype)
    cnt = torch.zeros(B, 1, V, dtype=features.dtype)
    out.scatter_add_(2, flat.unsqueeze(1).expand(B, C, N), features)
    cnt.scatter_add_(2, flat.unsqueeze(1), torch.ones(B, 1, N, dtype=features.dtype))
    out = out / cnt.clamp(min=1.0)
    return out.view(B, C, r, r, r)


def trilinear_devoxelize(
    voxel_features: torch.Tensor, coords: torch.Tensor, resolution: int,
    training: bool = False,
):
    """grid [B, C, r, r, r] (or [B, C, r^3]), float coords [B, 3, N] in
    [0, r-1] -> [B, C, N]."""
    r = int(resolution)
    B, C = voxel_features.shape[:2]
    feat = voxel_features.reshape(B, C, -1)
    lo = torch.floor(coords)
    frac = coords - lo
    lo = lo.long()
    hi = torch.clamp(lo + 1, max=r - 1)
    w1 = frac
    w0 = 1.0 - frac
    out = torch.zeros(B, C, coords.shape[-1], dtype=feat.dtype)
    for cx in (0, 1):
        for cy in (0, 1):
            for cz in (0, 1):
                ix = (hi if cx else lo)[:, 0]
                iy = (hi if cy else lo)[:, 1]
                iz = (hi if cz else lo)[:, 2]
                w = (
                    (w1 if cx else w0)[:, 0]
                    * (w1 if cy else w0)[:, 1]
                    * (w1 if cz else w0)[:, 2]
                )  # [B, N]
                flat = ix * (r * r) + iy * r + iz
                corner = torch.gather(
                    feat, 2, flat.unsqueeze(1).expand(B, C, -1)
                )
                out = out + corner * w.unsqueeze(1)
    return out


def ball_query(
    centers_coords: torch.Tensor, points_coords: torch.Tensor,
    radius: float, num_neighbors: int,
):
    """centers [B, 3, M], points [B, 3, N] -> int32 indices [B, M, U]."""
    B, _, M = centers_coords.shape
    N = points_coords.shape[-1]
    U = num_neighbors
    d2 = (
        (centers_coords.transpose(1, 2).unsqueeze(2)
         - points_coords.transpose(1, 2).unsqueeze(1)) ** 2
    ).sum(-1)  # [B, M, N]
    within = d2 < radius * radius
    out = torch.zeros(B, M, U, dtype=torch.int32)
    for b in range(B):
        for j in range(M):
            hits = torch.nonzero(within[b, j], as_tuple=False).flatten()
            if len(hits) == 0:
                continue
            row = hits[:U]
            pad = hits[0].repeat(U - len(row)) if len(row) < U else row[:0]
            out[b, j] = torch.cat([row, pad]).to(torch.int32)
    return out


def grouping(features: torch.Tensor, indices: torch.Tensor):
    """features [B, C, N], indices [B, M, U] -> [B, C, M, U]."""
    B, C, N = features.shape
    M, U = indices.shape[1:]
    flat = indices.reshape(B, 1, M * U).expand(B, C, M * U).long()
    return torch.gather(features, 2, flat).reshape(B, C, M, U)


def nearest_neighbor_interpolate(
    points_coords: torch.Tensor, centers_coords: torch.Tensor,
    centers_features: torch.Tensor,
):
    """points [B, 3, N], centers [B, 3, M], features [B, C, M] -> [B, C, N].

    3 nearest centers, inverse-distance weights (eps 1e-8 like the kernel).
    """
    d2 = (
        (points_coords.transpose(1, 2).unsqueeze(2)
         - centers_coords.transpose(1, 2).unsqueeze(1)) ** 2
    ).sum(-1)  # [B, N, M]
    dist2, idx = torch.topk(d2, k=3, dim=-1, largest=False)
    recip = 1.0 / torch.clamp(torch.sqrt(dist2), min=1e-8)
    weights = recip / recip.sum(-1, keepdim=True)  # [B, N, 3]
    B, C, M = centers_features.shape
    N = points_coords.shape[-1]
    gathered = torch.gather(
        centers_features.unsqueeze(2).expand(B, C, N, M),
        3,
        idx.unsqueeze(1).expand(B, C, N, 3),
    )  # [B, C, N, 3]
    return (gathered * weights.unsqueeze(1)).sum(-1)


def furthest_point_sample(coords: torch.Tensor, num_samples: int):
    """coords [B, 3, N] -> sampled coords [B, 3, num_samples] (seed index 0)."""
    B, _, N = coords.shape
    pts = coords.transpose(1, 2)  # [B, N, 3]
    idx = torch.zeros(B, num_samples, dtype=torch.long)
    dist = torch.full((B, N), float("inf"))
    last = torch.zeros(B, dtype=torch.long)
    for i in range(num_samples):
        idx[:, i] = last
        d = ((pts - pts[torch.arange(B), last].unsqueeze(1)) ** 2).sum(-1)
        dist = torch.minimum(dist, d)
        last = dist.argmax(-1)
    return torch.gather(coords, 2, idx.unsqueeze(1).expand(B, 3, num_samples))


def gather(features: torch.Tensor, indices: torch.Tensor):
    """features [B, C, N], indices [B, M] -> [B, C, M]."""
    B, C, _ = features.shape
    M = indices.shape[1]
    return torch.gather(features, 2, indices.reshape(B, 1, M).expand(B, C, M).long())


def logits_mask(coords: torch.Tensor, logits: torch.Tensor, num_points_per_object: int):
    """Reference `functional/sampling.py:54-103` (pure torch upstream)."""
    batch_size, _, num_points = coords.shape
    mask = torch.lt(logits[:, 0, :], logits[:, 1, :]).float()
    num_candidates = torch.sum(mask, dim=-1, keepdim=True)
    masked_coords = coords * mask.view(batch_size, 1, num_points)
    masked_coords_mean = torch.sum(masked_coords, dim=-1) / torch.max(
        num_candidates, torch.ones_like(num_candidates)
    )
    selected_indices = torch.zeros((batch_size, num_points_per_object), dtype=torch.long)
    for b in range(batch_size):
        if int(num_candidates[b].item()) > 0:
            hits = torch.nonzero(mask[b], as_tuple=False).flatten()
            pick = torch.randint(len(hits), (num_points_per_object,))
            selected_indices[b] = hits[pick]
        else:
            pick = torch.randint(num_points, (num_points_per_object,))
            selected_indices[b] = pick
    selected_coords = torch.gather(
        coords - masked_coords_mean.unsqueeze(-1),
        2,
        selected_indices.unsqueeze(1).expand(batch_size, 3, num_points_per_object),
    )
    return selected_coords, masked_coords_mean, selected_indices


def kl_loss(x: torch.Tensor, y: torch.Tensor):
    return torch.nn.functional.kl_div(x, y)


def huber_loss(error: torch.Tensor, delta: float):
    abs_error = torch.abs(error)
    quadratic = torch.clamp(abs_error, max=delta)
    linear = abs_error - quadratic
    return 0.5 * quadratic ** 2 + delta * linear
