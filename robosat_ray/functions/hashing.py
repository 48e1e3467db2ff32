"""Shared bucket hashing for co-partition groupbys.

A bare `(key * odd_constant) % 2^k` is a BIJECTION of `key mod 2^k`
(any odd constant is a unit mod 2^k), so clustered keys — city tiles
sharing `ty mod 64`, cells where 4096 | stride — land in a handful of
buckets and skew the shuffle. The murmur3-style finalizer folds every
input bit into the low bits before the modulus."""

from __future__ import annotations

import numpy as np

_C1 = np.uint64(0xFF51AFD7ED558CCD)
_C2 = np.uint64(0xC4CEB9FE1A85EC53)


def mix64(k) -> np.ndarray:
    h = np.asarray(k).astype(np.uint64)
    h = (h ^ (h >> np.uint64(33))) * _C1
    h = (h ^ (h >> np.uint64(33))) * _C2
    return h ^ (h >> np.uint64(33))


def hash_bucket(keys, n: int) -> np.ndarray:
    """Well-mixed bucket ids in [0, n) for int64 keys."""
    return (mix64(keys) % np.uint64(n)).astype(np.int64)


def key_bucket(keys, n: int) -> np.ndarray:
    """hash_bucket generalized to non-integer join keys: integer
    arrays go through mix64; anything else (strings, objects) through
    pandas' siphash-based hash_array, which is deterministic across
    processes (fixed default hash key) — required so both sides of a
    co-partition shuffle agree on the bucket of a key."""
    a = np.asarray(keys)
    if a.dtype.kind in "iu":
        return hash_bucket(a, n)
    import pandas as pd

    h = pd.util.hash_array(a.astype(object), categorize=False)
    return (h % np.uint64(n)).astype(np.int64)


def hash_bucket2(a, b, n: int) -> np.ndarray:
    """Bucket of a key pair (e.g. tile_x, tile_y)."""
    k = np.asarray(a).astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) + np.asarray(
        b
    ).astype(np.uint64)
    return hash_bucket(k, n)
