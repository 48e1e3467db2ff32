"""Incremental snapshot ingestion — the dedup-against-the-corpus step
of a continuously-crawled training set: a new crawl snapshot is
ingested only where its content is NEW, i.e. (a) drop snapshot docs
whose text already exists in the corpus (unchanged pages), (b) dedup
the snapshot against itself (mirrors), keeping the lowest new doc_id.

This is the corpus-scale x corpus-scale content anti-join: both
sides stream into ONE md5 hash-bucket co-partition; neither side is
ever broadcast or materialized (contrast J4 `subset`, whose key set
fits a broadcast).

Snapshot fixture (deterministic re-crawl, mirrored in oracle.INGEST):
- doc_id % 3 == 0 -> page unchanged: (doc_id + 10M, text)   [rejected]
- doc_id % 3 == 1 -> page changed:  (doc_id + 10M, 'rev2 ' || text)
- doc_id % 21 == 1 -> a mirror ALSO ships the changed page:
  (doc_id + 20M, 'rev2 ' || text)  [rejected by within-shard dedup]

Output: accepted rows (doc_id, text_hash, n_shard_dups) — the new id,
its content hash, and how many snapshot rows carried that content.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

SNAP_BASE = 10_000_000
MIRROR_BASE = 20_000_000
N_INGEST_BUCKETS = 64


def snapshot_batch(batch: pa.Table) -> pa.Table:
    """documents -> the re-crawl snapshot rows (doc_id, text)."""
    ids = batch.column("doc_id").to_numpy()
    texts = batch.column("text")
    rev2 = pc.binary_join_element_wise(
        pa.array(["rev2"] * len(ids), pa.string()), texts, " "
    )
    parts = []
    m0 = ids % 3 == 0
    if m0.any():
        parts.append(
            pa.table(
                {"doc_id": pa.array(ids[m0] + SNAP_BASE), "text": texts.filter(pa.array(m0))}
            )
        )
    m1 = ids % 3 == 1
    if m1.any():
        parts.append(
            pa.table(
                {"doc_id": pa.array(ids[m1] + SNAP_BASE), "text": rev2.filter(pa.array(m1))}
            )
        )
    m2 = ids % 21 == 1
    if m2.any():
        parts.append(
            pa.table(
                {"doc_id": pa.array(ids[m2] + MIRROR_BASE), "text": rev2.filter(pa.array(m2))}
            )
        )
    if not parts:
        return pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
    return pa.concat_tables(parts)


def _hash_side(batch: pa.Table, side: int) -> pa.Table:
    from robosat_ray.functions.hashing import key_bucket
    from robosat_ray.stages.text_ops import _md5_hex

    th = [_md5_hex(t) for t in batch.column("text").to_pylist()]
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "text_hash": pa.array(th, pa.string()),
            "side": pa.array(np.full(len(th), side, dtype=np.int64)),
            "hbucket": pa.array(key_bucket(np.asarray(th, dtype=object), N_INGEST_BUCKETS)),
        }
    )


def _ingest_bucket(group: pd.DataFrame) -> pd.DataFrame:
    # hashes present on the corpus side reject the whole group
    old = set(group.loc[group["side"] == 0, "text_hash"])
    new = group[(group["side"] == 1) & ~group["text_hash"].isin(old)]
    if new.empty:
        return pd.DataFrame(
            {
                "doc_id": pd.Series(dtype=np.int64),
                "text_hash": pd.Series(dtype=object),
                "n_shard_dups": pd.Series(dtype=np.int64),
            }
        )
    g = (
        new.groupby("text_hash", sort=False)
        .agg(doc_id=("doc_id", "min"), n_shard_dups=("doc_id", "size"))
        .reset_index()
    )
    g["doc_id"] = g["doc_id"].astype(np.int64)
    g["n_shard_dups"] = g["n_shard_dups"].astype(np.int64)
    return g[["doc_id", "text_hash", "n_shard_dups"]]


def ingest_snapshot(documents_ds):
    """-> (doc_id, text_hash, n_shard_dups) of ACCEPTED snapshot docs."""
    docs = documents_ds.select_columns(["doc_id", "text"])
    corpus = docs.map_batches(lambda b: _hash_side(b, 0), batch_format="pyarrow")
    snap = docs.map_batches(snapshot_batch, batch_format="pyarrow").map_batches(
        lambda b: _hash_side(b, 1), batch_format="pyarrow"
    )
    return (
        corpus.union(snap)
        .groupby("hbucket")
        .map_groups(_ingest_bucket, batch_format="pandas")
    )
