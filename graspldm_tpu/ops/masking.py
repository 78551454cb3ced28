"""Logits-based point masking/resampling (FrustumPointNet-style).

Rebuild of `.../functional/sampling.py:54-103` (`logits_mask`): select points
whose foreground logit beats the background logit, center them on the masked
mean, and resample a fixed count M (random without replacement when enough
candidates; repeat+random-fill otherwise).

TPU-native formulation: instead of a host loop with data-dependent nonzero
counts, candidates are ranked with random keys (masked entries pushed last),
and the fixed-shape index pattern ``arange(M) mod num_candidates`` re-indexes
into the ranked candidate list — static shapes, fully vmappable.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["logits_mask"]


@functools.partial(jax.jit, static_argnames=("num_points_per_object",))
def logits_mask(
    coords: jax.Array,
    logits: jax.Array,
    num_points_per_object: int,
    rng: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Args:
        coords: ``[B, N, 3]`` (feature-last, unlike the torch layout).
        logits: ``[B, N, 2]`` binary background/foreground logits.
        rng: PRNG key for the random subsampling.

    Returns:
        (selected_coords ``[B, M, 3]`` centered on the masked mean,
         masked_coords_mean ``[B, 3]``, mask ``[B, N]`` bool)
    """
    B, N, _ = coords.shape
    M = num_points_per_object
    mask = logits[..., 0] < logits[..., 1]  # [B, N]
    num_candidates = jnp.sum(mask, axis=-1, keepdims=True)  # [B, 1]

    masked_coords = coords * mask[..., None]
    mean = jnp.sum(masked_coords, axis=1) / jnp.maximum(
        num_candidates, 1
    ).astype(coords.dtype)

    # rank candidates by random key; non-candidates last
    u = jax.random.uniform(rng, (B, N))
    key = jnp.where(mask, u, 2.0)
    order = jnp.argsort(key, axis=-1)  # candidates (shuffled) first

    slots = jnp.arange(M, dtype=jnp.int32)[None, :]  # [1, M]
    nc = jnp.maximum(num_candidates, 1)
    idx_into_order = jnp.mod(slots, nc)  # repeat candidates when short
    selected = jnp.take_along_axis(order, idx_into_order, axis=-1)  # [B, M]

    centered = masked_coords - mean[:, None, :]
    selected_coords = jnp.take_along_axis(
        centered, selected[..., None], axis=1
    )
    return selected_coords, mean, mask
