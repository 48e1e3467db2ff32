"""Image perceptual-hash dedup: dHash spec, planted-copy recall, and
banded == brute-force exactness."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from robosat_ray.stages.phash import (
    PERTURB_BASE,
    PHASH_MAX_HAMMING,
    dhash63,
    phash_dup_pairs,
)


def test_dhash_spec():
    # constant image -> no strict rise anywhere -> hash 0
    assert dhash63(np.zeros((32, 32), dtype=np.uint8)) == 0
    # strictly decreasing along x -> every comparison true -> all 63 bits
    px = np.tile(np.arange(255, 0, -1, dtype=np.uint8)[:48], (32, 1))[:, :48]
    assert dhash63(px) == 0x7FFFFFFFFFFFFFFF
    # one flipped pixel moves the hash by at most a couple of bits
    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, size=(48, 64)).astype(np.uint8)
    b = a.copy()
    b[(5 * 48) // 8, (3 * 64) // 9] ^= 0xFF  # lands exactly on the grid
    d = bin(dhash63(a) ^ dhash63(b)).count("1")
    assert 1 <= d <= 2  # affects its own cell's two comparisons at most


def test_planted_copies_found(ray_session):
    n = 600
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "text": pa.array([f"image body {i} {i*i}" for i in range(n)]),
            }
        )
    )
    pairs = phash_dup_pairs(docs).to_pandas()
    planted = set()
    for i in range(0, n, 6):
        planted.add((i, i + PERTURB_BASE))
    got = set(zip(pairs["doc_a"], pairs["doc_b"]))
    # every planted one-bad-pixel copy within the hamming budget is
    # found (a grid-hit pixel flips <= 2 difference bits, < the budget)
    missing = planted - got
    assert not missing, f"planted copies missed: {sorted(missing)[:5]}"


def test_banded_equals_bruteforce(ray_session):
    """The pigeonhole banding finds EXACTLY the pairs a quadratic
    popcount scan finds (same guarantee the text simhash tests pin,
    re-proven on image dHashes)."""
    n = 480
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "text": pa.array([f"brute body {i}" for i in range(n)]),
            }
        )
    )
    got = phash_dup_pairs(docs).to_pandas()
    got_set = set(zip(got["doc_a"], got["doc_b"], got["hamming"]))

    # brute force over the same hash table
    from robosat_ray.stages.phash import _hash_batch, synth_image_pairs_batch

    ht = (
        docs.map_batches(synth_image_pairs_batch, batch_format="pyarrow")
        .map_batches(_hash_batch, batch_format="pyarrow")
        .to_pandas()
    )
    ids = ht["doc_id"].to_numpy()
    hs = ht["simhash"].to_numpy().astype(np.uint64)
    want = set()
    for i in range(len(ids)):
        x = hs[i] ^ hs[i + 1 :]
        ham = np.array([bin(int(v)).count("1") for v in x])
        for j in np.nonzero(ham <= PHASH_MAX_HAMMING)[0]:
            a, b = ids[i], ids[i + 1 + j]
            want.add((min(a, b), max(a, b), int(ham[j])))
    assert got_set == want
