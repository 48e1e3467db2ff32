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

    # divide-first bucketing: (s - lo) * N // span overflows int64 for
    # wide composite keys (e.g. adaptive_grid's (coord << 31 | doc_id));
    # step-division is monotone-equivalent and overflow-safe
    step = max(1, (span + N_RANK_BUCKETS - 1) // N_RANK_BUCKETS)

    def bucketed(batch: pa.Table) -> pa.Table:
        s = batch.column("score").to_numpy()
        return batch.append_column("rbucket", pa.array((s - lo) // step))

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


RRF_K = 60
RRF_SCALE = 1_000_000_000
RRF_TOP = 50


def rrf_fusion(documents_ds, k: int = RRF_K, top: int = RRF_TOP):
    """Reciprocal-rank fusion (Cormack et al. 2009) of two retrieval
    signals — the quality micro-score and document length — each
    turned into an exact global descending RANK() by exact_rank, then
    fused as rrf = RRF_SCALE // (k + rank_q) + RRF_SCALE // (k +
    rank_l) (integer division only, so the SQL twin is bit-exact) and
    cut to the top `top` docs by (rrf DESC, doc_id ASC).

    Scale shape: two two-pass rank plans (no global sort), one
    doc_id co-partition join, then per-batch partial top-k (bounded
    at top x blocks rows) finished on the driver -> pandas
    (doc_id, rank_q, rank_l, rrf)."""
    import pyarrow.compute as pc

    from robosat_ray.stages.join import copartition_join

    docs = documents_ds
    scored_q = docs.select_columns(["doc_id", "text"]).map_batches(
        score_batch, batch_format="pyarrow"
    )
    rq = exact_rank(scored_q, descending=True).map_batches(
        lambda g: pa.table(
            {
                "doc_id": pa.array(g["doc_id"].to_numpy(np.int64)),
                "rank_q": pa.array(g["rank"].to_numpy(np.int64)),
            }
        ),
        batch_format="pandas",
    )
    scored_l = docs.select_columns(["doc_id", "n_chars"]).map_batches(
        lambda b: pa.table(
            {
                "doc_id": b.column("doc_id"),
                "score": pc.cast(b.column("n_chars"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    rl = exact_rank(scored_l, descending=True).map_batches(
        lambda g: pa.table(
            {
                "doc_id": pa.array(g["doc_id"].to_numpy(np.int64)),
                "rank_l": pa.array(g["rank"].to_numpy(np.int64)),
            }
        ),
        batch_format="pandas",
    )
    joined = copartition_join(rq, rl, on="doc_id", how="inner")

    def partial_top(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        rnk_q = b.column("rank_q").to_numpy()
        rnk_l = b.column("rank_l").to_numpy()
        rrf = RRF_SCALE // (k + rnk_q) + RRF_SCALE // (k + rnk_l)
        sel = np.lexsort((ids, -rrf))[:top]
        return pa.table(
            {
                "doc_id": pa.array(ids[sel]),
                "rank_q": pa.array(rnk_q[sel]),
                "rank_l": pa.array(rnk_l[sel]),
                "rrf": pa.array(rrf[sel]),
            }
        )

    small = joined.map_batches(partial_top, batch_format="pyarrow").to_pandas()
    sel = np.lexsort((small["doc_id"].to_numpy(), -small["rrf"].to_numpy()))[:top]
    return small.iloc[sel].reset_index(drop=True)
