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


def _batch_token_hashes(texts: list[str]):
    """All documents' tokens hashed in one pass: ONE factorize over the
    batch's flat token array, md5 ONCE per batch-unique token (cached
    per worker), then a gather — the per-token Python of a
    doc-at-a-time loop collapses to a per-UNIQUE-token loop. Returns
    (th uint64 flat token hashes, doc_off int64 doc boundaries)."""
    import pandas as pd

    toks = [t.split(" ") for t in texts]
    lens = np.fromiter((len(x) for x in toks), dtype=np.int64, count=len(toks))
    doc_off = np.concatenate([[0], np.cumsum(lens)])
    flat = np.concatenate([np.asarray(x, dtype=object) for x in toks]) if len(toks) else np.empty(0, object)
    codes, uniq = pd.factorize(pd.Series(flat, dtype=object), sort=False)
    uh = np.fromiter(
        (_token_hash(u) for u in uniq), dtype=np.uint64, count=len(uniq)
    )
    th = uh[codes] if len(codes) else np.empty(0, np.uint64)
    return th, doc_off


def batch_shingle_sets(texts: list[str], k: int = 3):
    """Distinct shingle hashes for a whole batch in one vectorized
    pass (identical values to per-doc shingle_hash_set, tested):
    rolling polynomial combine over the flat token-hash array with
    per-doc boundaries, then ONE lexsort + adjacent-dedup for the
    per-doc sorted unique sets. Returns (flat sorted-unique hashes,
    set_off int64 per-doc offsets)."""
    th, doc_off = _batch_token_hashes(texts)
    n_docs = len(doc_off) - 1
    lens = np.diff(doc_off)
    n_sh = np.maximum(lens - k + 1, 0)
    sh_off = np.concatenate([[0], np.cumsum(n_sh)])
    total = int(sh_off[-1])
    if total == 0:
        return np.empty(0, np.uint64), np.zeros(n_docs + 1, np.int64)
    # global start position of each shingle window
    doc_of = np.repeat(np.arange(n_docs), n_sh)
    local = np.arange(total, dtype=np.int64) - np.repeat(sh_off[:-1], n_sh)
    start = doc_off[:-1][doc_of] + local
    acc = np.zeros(total, dtype=np.uint64)
    for j in range(k):
        acc = acc * np.uint64(1099511628211) + th[start + j]
    # per-doc sorted unique: one lexsort over (doc, hash), drop
    # adjacent duplicates within a doc
    order = np.lexsort((acc, doc_of))
    d, a = doc_of[order], acc[order]
    keep = np.ones(total, dtype=bool)
    keep[1:] = (d[1:] != d[:-1]) | (a[1:] != a[:-1])
    d, a = d[keep], a[keep]
    set_off = np.zeros(n_docs + 1, dtype=np.int64)
    np.add.at(set_off, d + 1, 1)
    return a, np.cumsum(set_off)


def batch_minhash_signatures(texts: list[str], k: int = 3) -> np.ndarray:
    """Minhash signatures for a batch of documents in one vectorized
    pass: batch shingle sets (no per-doc Python), permuted once, then
    per-document minima via np.minimum.reduceat. Identical output to
    per-doc minhash_signature (tested)."""
    flat, set_off = batch_shingle_sets(texts, k)
    lens = np.diff(set_off)
    out = np.full((len(texts), N_PERM), np.uint64(MERSENNE_61), dtype=np.uint64)
    nz = lens > 0
    if not nz.any():
        return out
    vals = (flat[:, None] * PERM_A[None, :] + PERM_B[None, :]) % np.uint64(MERSENNE_61)
    offs = set_off[:-1][nz]
    mins = np.minimum.reduceat(vals, offs, axis=0)
    out[nz] = mins
    return out


def batch_simhash64(texts: list[str]) -> np.ndarray:
    """64-bit SimHash for a whole batch (identical values to per-doc
    simhash64(tokenize(t)), tested): per-token ±1 bit votes accumulate
    with one np.add.at over the flat token-hash array — summing ±1 per
    token occurrence equals the count-weighted unique-token sum."""
    th, doc_off = _batch_token_hashes(texts)
    n_docs = len(doc_off) - 1
    doc_of = np.repeat(np.arange(n_docs), np.diff(doc_off))
    bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    votes = np.zeros((n_docs, 64), dtype=np.int64)
    np.add.at(votes, doc_of, 2 * bits - 1)
    pos = votes > 0
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
    out = (pos.astype(np.uint64) * weights[None, :]).sum(axis=1, dtype=np.uint64)
    # empty docs: tokenize("") == [""] gives one token, matching the
    # per-doc path (simhash64 only returns 0 for a truly empty list)
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
