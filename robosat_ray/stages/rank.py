"""Exact distributed rank / percentile normalization — score
calibration over the whole corpus: every doc's quality score is
replaced by its EXACT global rank (RANK() semantics: ties share the
rank of their first member) and integer-micro percentile. Filtering
on a raw score threshold drifts as the corpus distribution drifts;
filtering on the percentile does not — that's why curation pipelines
normalize first.

Spec (mirrored bit-for-bit in oracle.QUALITY_RANK):
- score = ratio_micro, the quality_filter/clean_corpus IEEE-exact
  integer micro alpha-ratio (floor(1e6 * n_alpha / max(n_chars,1)
  + 0.5))
- rank = 1 + count of docs with strictly smaller score (RANK())
- pct_micro = (rank - 1) * 1_000_000 // max(n_total - 1, 1)

Scale shape: the pack.py two-pass prefix scan generalized from the
id key to a VALUE key — value-range buckets (equal scores always
co-locate, so cross-bucket ties are impossible by construction),
pass A streams per-bucket counts (one bincount per batch, K x blocks
tiny rows), exclusive cumsum -> one offset broadcast (which also
yields n_total for free), pass B co-partitions by bucket and ranks
locally with one searchsorted. No global sort.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

N_RANK_BUCKETS = 64


def score_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> (doc_id, score): the quality micro-ratio."""
    texts = batch.column("text")
    n_chars = pc.cast(pc.utf8_length(texts), pa.int64()).to_numpy()
    n_alpha = pc.cast(
        pc.utf8_length(pc.replace_substring_regex(texts, "[^A-Za-z]", "")),
        pa.int64(),
    ).to_numpy()
    micro = np.floor(
        1000000.0 * n_alpha.astype(np.float64)
        / np.maximum(n_chars, 1).astype(np.float64)
        + 0.5
    ).astype(np.int64)
    return pa.table({"doc_id": batch.column("doc_id"), "score": pa.array(micro)})


def quality_rank(documents_ds):
    """-> (doc_id, score, rank, pct_micro)."""
    scored = documents_ds.select_columns(["doc_id", "text"]).map_batches(
        score_batch, batch_format="pyarrow"
    )
    return exact_rank(scored, emit_pct=True)


def exact_rank(scored, emit_pct: bool = False, descending: bool = False):
    """Generalized exact distributed RANK() over any (doc_id, score
    int64) dataset — the quality_rank plan factored out so other
    pipelines (e.g. RRF fusion) can rank arbitrary integer keys.
    descending=True ranks the LARGEST score 1 (implemented by ranking
    the negated key, so tie semantics stay RANK()-exact)."""
    import ray

    if descending:
        scored = scored.map_batches(
            lambda b: pa.table(
                {
                    "doc_id": b.column("doc_id"),
                    "score": pa.compute.negate_checked(b.column("score")),
                }
            ),
            batch_format="pyarrow",
        )
    lo = int(scored.min("score"))
    hi = int(scored.max("score"))
    span = hi - lo + 1

    def bucketed(batch: pa.Table) -> pa.Table:
        s = batch.column("score").to_numpy()
        return batch.append_column(
            "rbucket", pa.array((s - lo) * N_RANK_BUCKETS // span)
        )

    bd = scored.map_batches(bucketed, batch_format="pyarrow")

    counts = np.zeros(N_RANK_BUCKETS, dtype=np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        c = np.bincount(
            batch.column("rbucket").to_numpy(), minlength=N_RANK_BUCKETS
        ).astype(np.int64)
        return pa.table({"c": pa.array([c], pa.list_(pa.int64()))})

    for row in bd.map_batches(partial, batch_format="pyarrow").take_all():
        counts += np.asarray(row["c"], dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    n_total = int(counts.sum())
    ref = ray.put(offsets)

    def rank_bucket(group: pd.DataFrame, _ref=ref) -> pd.DataFrame:
        offs = ray.get(_ref)
        s = group["score"].to_numpy(np.int64)
        srt = np.sort(s)
        n_smaller = np.searchsorted(srt, s, side="left")
        rank = offs[int(group["rbucket"].iloc[0])] + n_smaller + 1
        out = {
            "doc_id": group["doc_id"].to_numpy(np.int64),
            "score": -s if descending else s,
            "rank": rank.astype(np.int64),
        }
        if emit_pct:
            out["pct_micro"] = (
                (rank - 1) * 1_000_000 // max(n_total - 1, 1)
            ).astype(np.int64)
        return pd.DataFrame(out)

    return bd.groupby("rbucket").map_groups(rank_bucket, batch_format="pandas")
