"""Ranked retrieval over the document corpus: BM25 top-k, integer-exact.

The scoring spec is a log-free BM25 variant chosen so the whole chain
(corpus stats -> idf -> tf saturation -> top-k) has a bit-exact DuckDB
twin (oracle.BM25):

  idf_milli(t)  = min((1000 * N) // df(t), BM25_IDF_CAP_MILLI)
  A             = min((1000 * L) // N, BM25_AVGDL_CAP_MILLI)
  tfc           = min(tf, BM25_TF_CAP)      (saturation cap; BM25's own
                                             k1 curve is flat out here)
  term_milli    = (44 * idf_milli * tfc * A)
                  // (20*A*tfc + 6*A + 18000*dl)
  score_milli   = sum over query terms present in the doc

which is floor(idf_milli * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)))
with k1 = 6/5 and b = 3/4 cleared of denominators. Every quantity is
bounded INDEPENDENT of corpus size AND of document length (idf, tf and
avgdl all explicitly capped), so the int64 arithmetic can never
overflow — at 10^12 docs or on a pathological megatoken document
(worst-case numerator 44 * 1e5 * 255 * 1.05e9 ~ 1.2e18 < 2^63).

Scale shape: two streaming passes over `documents` (BM25 inherently
needs global stats before scoring). Pass 1 reduces to ONE tiny row
(N, L, df per query term) via per-batch partials + Sum aggregates;
pass 2 scores per batch against those broadcast scalars and keeps a
per-block top-k (ties straddling the k-th score kept, exactly the
top_tokens idiom) so the driver merge sees <= (k + ties) x blocks rows.
No shuffle anywhere.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

BM25_QUERY = ("hash", "join", "stream", "merge", "window", "dup")
BM25_K = 20
BM25_IDF_CAP_MILLI = 100_000
BM25_TF_CAP = 255
BM25_AVGDL_CAP_MILLI = 1000 * (1 << 20)


def _tokens(batch: pa.Table) -> tuple[np.ndarray, np.ndarray, int]:
    """-> (flat token array 'U', parent doc index per token, n_docs)."""
    import pyarrow.compute as pc

    lists = pc.split_pattern(batch.column("text"), " ")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    parents = pc.list_parent_indices(lists).to_numpy().astype(np.int64)
    flat = np.asarray(lists.values.to_pandas(), dtype="U")
    return flat, parents, len(batch)


def _tf_matrix(flat: np.ndarray, parents: np.ndarray, n_docs: int) -> np.ndarray:
    """(n_docs, n_query_terms) exact term frequencies, vectorized."""
    tf = np.zeros((n_docs, len(BM25_QUERY)), dtype=np.int64)
    for j, term in enumerate(BM25_QUERY):
        hit = parents[flat == term]
        if len(hit):
            tf[:, j] = np.bincount(hit, minlength=n_docs)
    return tf


def corpus_stats(documents_ds) -> dict:
    """One streaming pass -> {n_docs, total_len, df_<term>...}: each
    batch collapses to a single partial row, Sum-aggregated driver-side
    (constant-size result regardless of corpus size)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        flat, parents, n = _tokens(batch)
        tf = _tf_matrix(flat, parents, n)
        cols = {
            "n_docs": pa.array([n], pa.int64()),
            "total_len": pa.array([len(flat)], pa.int64()),
        }
        for j, term in enumerate(BM25_QUERY):
            cols[f"df_{j}"] = pa.array([int((tf[:, j] > 0).sum())], pa.int64())
        return pa.table(cols)

    aggs = [Sum("n_docs", alias_name="n_docs"), Sum("total_len", alias_name="total_len")]
    aggs += [Sum(f"df_{j}", alias_name=f"df_{j}") for j in range(len(BM25_QUERY))]
    return (
        documents_ds.select_columns(["doc_id", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .aggregate(*aggs)
    )


def bm25_topk(documents_ds, k: int = BM25_K):
    """-> (doc_id, score_milli, rank) for the BM25_QUERY terms: the
    ranked-retrieval op of a training-data search index. Docs with no
    query term are excluded; ties break doc_id ASC."""
    import pandas as pd

    stats = corpus_stats(documents_ds)
    n_docs = int(stats["n_docs"])
    total_len = int(stats["total_len"])
    a = min((1000 * total_len) // n_docs, BM25_AVGDL_CAP_MILLI)
    idf = np.array(
        [
            min((1000 * n_docs) // max(int(stats[f"df_{j}"]), 1), BM25_IDF_CAP_MILLI)
            if int(stats[f"df_{j}"]) > 0
            else 0
            for j in range(len(BM25_QUERY))
        ],
        dtype=np.int64,
    )

    def score(batch: pa.Table) -> pa.Table:
        flat, parents, n = _tokens(batch)
        tf = _tf_matrix(flat, parents, n)
        dl = np.bincount(parents, minlength=n).astype(np.int64)
        # term_milli per (doc, term), floor-div exactly as the oracle
        tfc = np.minimum(tf, BM25_TF_CAP)
        numer = 44 * idf[None, :] * tfc * a
        denom = 20 * a * tfc + 6 * a + 18000 * dl[:, None]
        term = np.where(tf > 0, numer // np.maximum(denom, 1), 0)
        s = term.sum(axis=1)
        keep = tf.sum(axis=1) > 0
        return pa.table(
            {
                "doc_id": batch.column("doc_id").to_numpy()[keep],
                "score_milli": pa.array(s[keep]),
            }
        )

    def local_topk(batch: pa.Table) -> pa.Table:
        t = batch.column("score_milli").to_numpy()
        if len(t) > k:
            kth = np.partition(t, len(t) - k)[len(t) - k]
            batch = batch.take(pa.array(np.nonzero(t >= kth)[0]))
        return batch

    small = (
        documents_ds.select_columns(["doc_id", "text"])
        .map_batches(score, batch_format="pyarrow")
        .map_batches(local_topk, batch_format="pyarrow")
        .to_pandas()
    )
    small = small.sort_values(
        ["score_milli", "doc_id"], ascending=[False, True], kind="stable"
    ).head(k)
    small["rank"] = np.arange(1, len(small) + 1, dtype=np.int64)
    return small.reset_index(drop=True)
