"""Shared helpers: deterministic hashing, id routing, small-file IO."""

from __future__ import annotations

import json
import os
import tempfile

import numpy as np

_U64 = np.uint64
_MASK = _U64(0xFFFFFFFFFFFFFFFF)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer: uint64 array -> uint64 array.

    Used to derive per-(conv, turn) pseudo-random draws that are a pure
    function of ids + seed, so synthetic data is identical for any block
    layout / parallelism level.
    """
    with np.errstate(over="ignore"):
        x = (x.astype(_U64) + _U64(0x9E3779B97F4A7C15)) & _MASK
        x = (x ^ (x >> _U64(30))) * _U64(0xBF58476D1CE4E5B9) & _MASK
        x = (x ^ (x >> _U64(27))) * _U64(0x94D049BB133111EB) & _MASK
        return x ^ (x >> _U64(31))


def mix2(seed: int, a: np.ndarray, b) -> np.ndarray:
    """Deterministic uint64 draw from (seed, a, b)."""
    with np.errstate(over="ignore"):
        x = splitmix64(np.asarray(a, dtype=np.uint64) * _U64(0x9E3779B97F4A7C15) + _U64(seed))
        return splitmix64(x ^ (np.asarray(b, dtype=np.uint64) * _U64(0xC2B2AE3D27D4EB4F)))


def uniform01(bits: np.ndarray) -> np.ndarray:
    """uint64 draws -> float64 in [0, 1)."""
    return (bits >> np.uint64(11)).astype(np.float64) * (1.0 / (1 << 53))


def atomic_write_json(path: str, obj) -> None:
    """Write JSON atomically (tmp file + rename) — checkpoint commits."""
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(obj, f)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def read_json(path: str):
    with open(path) as f:
        return json.load(f)


def part_of(node_ids: np.ndarray, boundaries: np.ndarray) -> np.ndarray:
    """Partition index of each (dense) node id for range partitioning.

    ``boundaries`` is the length-(P+1) array of partition starts with a
    trailing node_count; partition p owns ids [boundaries[p], boundaries[p+1]).
    """
    return np.searchsorted(boundaries[1:-1], node_ids, side="right")
