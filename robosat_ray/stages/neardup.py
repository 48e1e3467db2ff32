"""Near-duplicate detection: MinHash + LSH banding + exact-Jaccard
verification (the classic shingle -> minhash -> band -> bucket-groupby
-> candidate-pairs -> verify pipeline; SNIPPETS/ray-guide pattern).

Scale shape: the banding pass and the bucket groupby are fully
distributed; candidate pairs are a tiny fraction of the corpus, so the
verify step broadcasts only the CANDIDATE documents' shingle sets
(at 10^12 scale the verify becomes a co-partition join of pairs with
shingle sets on doc_id instead of a driver gather — same semantics).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from robosat_ray.functions.text_hash import (
    N_BANDS,
    band_keys,
    jaccard_sorted,
    minhash_signature,
    shingle_hash_set,
)

VARIANT_OFFSET = 10_000_000


def with_variants_batch(batch: pa.Table) -> pa.Table:
    """documents batch -> documents + deterministic near-dup variants:
    every doc_id % 5 == 0 gets a copy (id + VARIANT_OFFSET) whose first
    token is replaced by 'zzvariant' (mirrored in the SQL oracle)."""
    ids = batch.column("doc_id").to_numpy()
    texts = batch.column("text").to_pylist()
    sel = ids % 5 == 0
    v_ids = ids[sel] + VARIANT_OFFSET
    v_texts = [
        "zzvariant" + t[t.index(" ") :] if " " in t else "zzvariant"
        for t, s in zip(texts, sel)
        if s
    ]
    return pa.table(
        {
            "doc_id": pa.array(np.concatenate([ids, v_ids])),
            "text": pa.array(texts + v_texts, pa.string()),
        }
    )


NUM_LSH_BUCKETS = 4096


def _band_rows(batch: pa.Table) -> pa.Table:
    """Band keys fold the band index in, so plain key equality defines
    LSH candidacy; rows are grouped by a COMPACT bucket (key % 4096)
    rather than the raw key — a groupby over millions of singleton
    buckets pays per-group overhead, a few thousand buckets don't."""
    from robosat_ray.functions.text_hash import batch_minhash_signatures

    ids = batch.column("doc_id").to_numpy()
    texts = batch.column("text").to_pylist()
    out_id = np.repeat(ids, N_BANDS)
    keys = np.empty(len(ids) * N_BANDS, dtype=np.int64)
    bands = np.arange(N_BANDS, dtype=np.uint64)
    sigs = batch_minhash_signatures(texts)  # (n_docs, N_PERM) one numpy pass
    for i in range(len(texts)):
        combined = (
            band_keys(sigs[i]).astype(np.uint64) * np.uint64(1099511628211) + bands
        ) & np.uint64(0x7FFFFFFFFFFFFFFF)
        keys[i * N_BANDS : (i + 1) * N_BANDS] = combined.astype(np.int64)
    return pa.table(
        {
            "doc_id": pa.array(out_id),
            "band_key": pa.array(keys),
            "bucket": pa.array(keys % NUM_LSH_BUCKETS),
        }
    )


def _bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
    """Within a compact bucket: sort by exact band_key, emit all pairs
    of each equal-key run (vectorized, 200-doc cap per run)."""
    keys = group["band_key"].to_numpy()
    ids = group["doc_id"].to_numpy()
    order = np.lexsort((ids, keys))
    keys, ids = keys[order], ids[order]
    starts = np.concatenate([[0], np.nonzero(np.diff(keys))[0] + 1, [len(keys)]])
    out_a, out_b = [], []
    for s, e in zip(starts[:-1], starts[1:]):
        n = e - s
        if n < 2 or n > 200:  # cap pathological buckets
            continue
        run = np.unique(ids[s:e])
        if len(run) < 2:
            continue
        ii, jj = np.triu_indices(len(run), k=1)
        out_a.append(run[ii])
        out_b.append(run[jj])
    if not out_a:
        return pd.DataFrame(
            {"a": pd.Series([], dtype=np.int64), "b": pd.Series([], dtype=np.int64)}
        )
    return pd.DataFrame({"a": np.concatenate(out_a), "b": np.concatenate(out_b)})


def near_dup_pairs(docs_ds, threshold: float = 0.5) -> pd.DataFrame:
    """-> DataFrame (a, b) of document pairs with exact shingle-set
    Jaccard >= threshold, found via LSH (64 bands x 2 rows: recall at
    j >= 0.5 is 1 - (1 - j^2)^64 > 0.98, and > 1 - 1e-9 for the
    synthetic variants at j ~ 0.8)."""
    import ray
    from ray.data.aggregate import Count

    bands = docs_ds.map_batches(_band_rows, batch_format="pyarrow")
    cand = bands.groupby("bucket").map_groups(_bucket_pairs, batch_format="pandas")
    pairs = (
        cand.groupby(["a", "b"]).aggregate(Count(alias_name="_n")).drop_columns(["_n"])
    )
    pdf = pairs.to_pandas()  # candidates << corpus
    if len(pdf) == 0:
        return pd.DataFrame({"a": pd.Series([], dtype=np.int64), "b": pd.Series([], dtype=np.int64)})
    cand_ids = set(pdf["a"].tolist()) | set(pdf["b"].tolist())
    cand_ref = ray.put(cand_ids)

    def shingle_rows(batch: pa.Table) -> pa.Table:
        want = ray.get(cand_ref)
        ids = batch.column("doc_id").to_numpy()
        texts = batch.column("text").to_pylist()
        keep = [i for i, d in enumerate(ids) if int(d) in want]
        return pa.table(
            {
                "doc_id": pa.array(ids[keep] if keep else np.array([], np.int64)),
                "hashes": pa.array(
                    [shingle_hash_set(texts[i]).tolist() for i in keep],
                    pa.list_(pa.uint64()),
                ),
            }
        )

    sh_rows = docs_ds.map_batches(shingle_rows, batch_format="pyarrow").take_all()
    sets = {int(r["doc_id"]): np.asarray(r["hashes"], dtype=np.uint64) for r in sh_rows}
    keep_a, keep_b = [], []
    for a, b in zip(pdf["a"].to_numpy(), pdf["b"].to_numpy()):
        if jaccard_sorted(sets[int(a)], sets[int(b)]) >= threshold:
            keep_a.append(int(a))
            keep_b.append(int(b))
    return pd.DataFrame({"a": pd.Series(keep_a, dtype=np.int64), "b": pd.Series(keep_b, dtype=np.int64)})


def simhash_table(docs_ds):
    """-> Dataset (doc_id, simhash int64, n_tokens) — 64-bit SimHash
    fingerprints (rows-only driver check; hamming-distance clustering
    exercised in tests)."""
    from robosat_ray.functions.text_hash import simhash64, tokenize

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        texts = batch.column("text").to_pylist()
        hs = [simhash64(tokenize(t)) & 0x7FFFFFFFFFFFFFFF for t in texts]
        nt = [len(tokenize(t)) for t in texts]
        return pa.table(
            {
                "doc_id": ids,
                "simhash": pa.array(hs, pa.int64()),
                "n_tokens": pa.array(nt, pa.int64()),
            }
        )

    return docs_ds.map_batches(f, batch_format="pyarrow")
