"""Small shared utilities (reference `grasp_ldm/utils/utils.py:1-82`)."""

from __future__ import annotations

import json
from typing import Any, Dict, List, Sequence

import jax

__all__ = ["count_parameters", "load_json", "split_list"]


def count_parameters(params: Any) -> int:
    """Total parameter count of a pytree."""
    return sum(x.size for x in jax.tree.leaves(params))


def load_json(path: str) -> Dict:
    with open(path) as f:
        return json.load(f)


def split_list(items: Sequence, n_chunks: int) -> List[List]:
    """Split a list into ``n_chunks`` near-equal chunks."""
    k, m = divmod(len(items), n_chunks)
    return [
        list(items[i * k + min(i, m) : (i + 1) * k + min(i + 1, m)])
        for i in range(n_chunks)
    ]
