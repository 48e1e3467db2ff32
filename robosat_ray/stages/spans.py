"""Cross-document repeated-span detection — the exact-substring-dedup
signal of Lee et al., "Deduplicating Training Data Makes Language
Models Better" (2022): find token spans that recur across documents
(boilerplate, licenses, templates) so they can be cut or down-weighted.

Spec (mirrored bit-for-bit in oracle.DUP_SPANS):

- token hash  th = md5_64(token)                (vocabulary-bounded md5)
- span hash   h  = fold over SPAN_W=16 tokens: acc = acc*B + th mod 2^64
               (B = 2^40-ish FNV prime, so the SQL twin's HUGEINT
               intermediate acc*B < 2^104 never overflows)
- anchors     h % SPAN_SAMPLE_MOD == 0           (deterministic 1/8
               sample — the winnowing idea: full stride-1 span grouping
               at 10^12 docs would shuffle corpus x W tokens; anchor
               sampling bounds it to corpus/8 rows with recall 1 - 7/8^k
               for a k-anchor duplicated region)
- group by h  -> n_docs distinct docs, n_occ occurrences; keep n_docs
               >= 2; top SPAN_TOP_K by (n_docs DESC, n_occ DESC, h ASC)

Grouping is BY HASH, not by span text: a 64-bit collision would fuse
two span groups, but both engine and oracle group by the same hash, so
parity is exact and the (astronomically rare) fusion is deterministic.

Scale shape: one streaming pass emits in-batch pre-aggregated
(span_hash, doc_id, occ) rows for anchors only; ONE hash-bucket
shuffle co-partitions them; per-bucket pandas groupby computes
(n_docs, n_occ) and a local tie-keeping top-k so the driver merge sees
<= (k + ties) x buckets rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

SPAN_W = 16
SPAN_SAMPLE_MOD = 8
SPAN_TOP_K = 50
SPAN_B = np.uint64(1099511628211)  # the codebase's FNV-ish fold base (< 2^41)
N_SPAN_BUCKETS = 64


def _span_hashes(
    texts: list[str], w: int = SPAN_W
) -> tuple[np.ndarray, np.ndarray]:
    """-> (flat span hashes uint64, doc index per span): stride-1
    w-token windows, vectorized over the whole batch (the
    batch_shingle_sets window idiom, without per-doc dedup). Shared
    with stages/decontaminate.py (w=13 there)."""
    from robosat_ray.functions.text_hash import _batch_token_hashes

    th, doc_off = _batch_token_hashes(texts)
    n_docs = len(doc_off) - 1
    lens = np.diff(doc_off)
    n_sp = np.maximum(lens - w + 1, 0)
    sp_off = np.concatenate([[0], np.cumsum(n_sp)])
    total = int(sp_off[-1])
    if total == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    doc_of = np.repeat(np.arange(n_docs), n_sp)
    local = np.arange(total, dtype=np.int64) - np.repeat(sp_off[:-1], n_sp)
    start = doc_off[:-1][doc_of] + local
    acc = np.zeros(total, dtype=np.uint64)
    for j in range(w):
        acc = acc * SPAN_B + th[start + j]
    return acc, doc_of


def _anchor_rows(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> pre-aggregated (span_hash int64, doc_id, occ)
    anchor rows (docs are whole within a batch, so in-batch occurrence
    counts are exact)."""
    ids = batch.column("doc_id").to_numpy()
    texts = batch.column("text").to_pylist()
    h, doc_of = _span_hashes(texts)
    keep = h % np.uint64(SPAN_SAMPLE_MOD) == 0
    h, doc_of = h[keep], doc_of[keep]
    # count occurrences per (hash, doc) with one lexsort
    order = np.lexsort((h, doc_of))
    h, doc_of = h[order], doc_of[order]
    new = np.ones(len(h), dtype=bool)
    new[1:] = (h[1:] != h[:-1]) | (doc_of[1:] != doc_of[:-1])
    starts = np.nonzero(new)[0]
    occ = np.diff(np.concatenate([starts, [len(h)]]))
    hs = h[starts].view(np.int64)  # two's-complement == the SQL CASE
    return pa.table(
        {
            "span_hash": pa.array(hs),
            "doc_id": pa.array(ids[doc_of[starts]]),
            "occ": pa.array(occ.astype(np.int64)),
            "sbucket": pa.array(
                (h[starts] % np.uint64(N_SPAN_BUCKETS)).astype(np.int64)
            ),
        }
    )


def _bucket_topk(group: pd.DataFrame) -> pd.DataFrame:
    g = (
        group.groupby("span_hash", sort=False)
        .agg(n_docs=("doc_id", "nunique"), n_occ=("occ", "sum"))
        .reset_index()
    )
    g = g[g["n_docs"] >= 2]
    if len(g) > SPAN_TOP_K:
        # keep every row tying the local k-th (n_docs, n_occ) so the
        # global (n_docs DESC, n_occ DESC, hash ASC) order is preserved
        g = g.sort_values(
            ["n_docs", "n_occ", "span_hash"], ascending=[False, False, True]
        )
        kth = g.iloc[SPAN_TOP_K - 1]
        g = g[
            (g["n_docs"] > kth["n_docs"])
            | ((g["n_docs"] == kth["n_docs"]) & (g["n_occ"] >= kth["n_occ"]))
        ]
    return g[["span_hash", "n_docs", "n_occ"]].astype(np.int64)


def dup_spans(documents_ds, k: int = SPAN_TOP_K):
    """-> (span_hash, n_docs, n_occ, rank): the k most-duplicated
    sampled 16-token spans across the corpus."""
    small = (
        documents_ds.select_columns(["doc_id", "text"])
        .map_batches(_anchor_rows, batch_format="pyarrow")
        .groupby("sbucket")
        .map_groups(_bucket_topk, batch_format="pandas")
        .to_pandas()
    )
    small = small.sort_values(
        ["n_docs", "n_occ", "span_hash"], ascending=[False, False, True], kind="stable"
    ).head(k)
    small["rank"] = np.arange(1, len(small) + 1, dtype=np.int64)
    return small.reset_index(drop=True)
