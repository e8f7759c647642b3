"""Deterministic seeding primitives (splitmix64), vectorized."""

from __future__ import annotations

import numpy as np

_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Public-domain splitmix64 finalizer, elementwise over uint64."""
    with np.errstate(over="ignore"):
        z = x.astype(np.uint64) + _GAMMA
        z = (z ^ (z >> np.uint64(30))) * _M1
        z = (z ^ (z >> np.uint64(27))) * _M2
        return z ^ (z >> np.uint64(31))


def phash_for_index(i: np.ndarray, seed: int) -> np.ndarray:
    """Stable int64 phash per row index (FIXTURES.md §1)."""
    with np.errstate(over="ignore"):
        base = i.astype(np.uint64) ^ (np.uint64(seed) * _GAMMA)
    return splitmix64(base).view(np.int64)
