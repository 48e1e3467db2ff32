"""Document fingerprinting: token shingles, MinHash signatures, LSH
band keys, SimHash, exact Jaccard. Standard public constructions
(Broder 1997 minhash; Charikar 2002 simhash); no reference counterpart
(robosat has no text ops) — these are the training-data-pipeline
operators the engine adds (task brief: dedup family).
"""

from __future__ import annotations

import hashlib

import numpy as np

MERSENNE_61 = (1 << 61) - 1
N_PERM = 128
N_BANDS = 64  # 64 bands x 2 rows: near-certain recall at jaccard >= 0.5
ROWS_PER_BAND = N_PERM // N_BANDS

# deterministic permutation parameters (seeded, fixed forever)
_rng = np.random.default_rng(20240817)
PERM_A = _rng.integers(1, MERSENNE_61, size=N_PERM, dtype=np.int64).astype(np.uint64)
PERM_B = _rng.integers(0, MERSENNE_61, size=N_PERM, dtype=np.int64).astype(np.uint64)


def tokenize(text: str) -> list[str]:
    return text.split(" ")


def shingles(tokens: list[str], k: int = 3) -> list[str]:
    return [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]


def hash64(s: str) -> int:
    """Stable 64-bit hash (md5 prefix)."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "little")


_TOKEN_HASH_CACHE: dict[str, int] = {}


def _token_hash(t: str) -> int:
    h = _TOKEN_HASH_CACHE.get(t)
    if h is None:
        h = hash64(t)
        if len(_TOKEN_HASH_CACHE) < 1_000_000:
            _TOKEN_HASH_CACHE[t] = h
    return h


def shingle_hash_set(text: str, k: int = 3) -> np.ndarray:
    """Distinct shingle hashes, sorted uint64. Shingle hash = rolling
    polynomial combine of per-token hashes (token hashes cached — the
    md5 runs once per vocabulary word, not once per shingle)."""
    toks = tokenize(text)
    n = len(toks) - k + 1
    if n <= 0:
        return np.empty(0, dtype=np.uint64)
    th = np.fromiter((_token_hash(t) for t in toks), dtype=np.uint64, count=len(toks))
    acc = np.zeros(n, dtype=np.uint64)
    for j in range(k):
        acc = acc * np.uint64(1099511628211) + th[j : j + n]
    return np.sort(np.unique(acc))


def minhash_signature(shingle_hashes: np.ndarray) -> np.ndarray:
    """128 minhash values (uint64) for one document. (A
    shift-and-fold Mersenne reduction was benchmarked against numpy's
    `%` here and lost — the extra temporaries cost more memory
    bandwidth than the vectorized divide.)"""
    if len(shingle_hashes) == 0:
        return np.full(N_PERM, np.uint64(MERSENNE_61), dtype=np.uint64)
    h = shingle_hashes[:, None]  # (S, 1)
    vals = (h * PERM_A[None, :] + PERM_B[None, :]) % np.uint64(MERSENNE_61)
    return vals.min(axis=0)


def band_keys(sig: np.ndarray) -> np.ndarray:
    """LSH band hashes: combine each band's rows into one int64 key."""
    bands = sig.reshape(N_BANDS, ROWS_PER_BAND)
    key = np.zeros(N_BANDS, dtype=np.uint64)
    for r in range(ROWS_PER_BAND):
        key = key * np.uint64(1099511628211) + bands[:, r]  # FNV-ish mix
    return key.astype(np.int64) & np.int64(0x7FFFFFFFFFFFFFFF)


def jaccard_sorted(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two sorted unique uint64 arrays."""
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    return inter / (len(a) + len(b) - inter)


def batch_minhash_signatures(texts: list[str], k: int = 3) -> np.ndarray:
    """Minhash signatures for a batch of documents in one vectorized
    pass: ragged shingle-hash arrays concatenated, permuted once, then
    per-document minima via np.minimum.reduceat. Identical output to
    per-doc minhash_signature (tested)."""
    sets = [shingle_hash_set(t, k) for t in texts]
    lens = np.array([len(s) for s in sets], dtype=np.int64)
    out = np.full((len(texts), N_PERM), np.uint64(MERSENNE_61), dtype=np.uint64)
    nz = lens > 0
    if not nz.any():
        return out
    flat = np.concatenate([s for s in sets if len(s)])
    vals = (flat[:, None] * PERM_A[None, :] + PERM_B[None, :]) % np.uint64(MERSENNE_61)
    offs = np.concatenate([[0], np.cumsum(lens[nz])[:-1]])
    mins = np.minimum.reduceat(vals, offs, axis=0)
    out[nz] = mins
    return out


def batch_band_keys(sigs: np.ndarray) -> np.ndarray:
    """band_keys over a whole (n_docs, N_PERM) signature matrix in one
    pass -> (n_docs, N_BANDS) int64 (identical values to per-doc
    band_keys; replaces a per-doc Python loop)."""
    bands = sigs.reshape(len(sigs), N_BANDS, ROWS_PER_BAND)
    key = np.zeros((len(sigs), N_BANDS), dtype=np.uint64)
    for r in range(ROWS_PER_BAND):
        key = key * np.uint64(1099511628211) + bands[:, :, r]
    return key.astype(np.int64) & np.int64(0x7FFFFFFFFFFFFFFF)


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over token counts."""
    if not tokens:
        return 0
    uniq, counts = np.unique(np.asarray(tokens, dtype=object), return_counts=True)
    hs = np.fromiter((hash64(t) for t in uniq), dtype=np.uint64, count=len(uniq))
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    w = counts[:, None] * (2 * bits - 1)
    v = w.sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if v[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")
