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


def _span_hash_positions(
    texts: list[str], w: int = SPAN_W
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (flat span hashes uint64, doc index per span, 0-based token
    position of the span start within its doc): stride-1 w-token
    windows, vectorized over the whole batch (the batch_shingle_sets
    window idiom, without per-doc dedup). Shared with
    stages/decontaminate.py (w=13 there)."""
    from robosat_ray.functions.text_hash import _batch_token_hashes

    th, doc_off = _batch_token_hashes(texts)
    n_docs = len(doc_off) - 1
    lens = np.diff(doc_off)
    n_sp = np.maximum(lens - w + 1, 0)
    sp_off = np.concatenate([[0], np.cumsum(n_sp)])
    total = int(sp_off[-1])
    if total == 0:
        e = np.empty(0, np.int64)
        return np.empty(0, np.uint64), e, e
    doc_of = np.repeat(np.arange(n_docs), n_sp)
    local = np.arange(total, dtype=np.int64) - np.repeat(sp_off[:-1], n_sp)
    start = doc_off[:-1][doc_of] + local
    acc = np.zeros(total, dtype=np.uint64)
    for j in range(w):
        acc = acc * SPAN_B + th[start + j]
    return acc, doc_of, local


def _span_hashes(
    texts: list[str], w: int = SPAN_W
) -> tuple[np.ndarray, np.ndarray]:
    """(hashes, doc index) view of _span_hash_positions."""
    h, doc_of, _ = _span_hash_positions(texts, w)
    return h, doc_of


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


# ---------------------------------------------------------------------------
# Exact-substring REMOVAL (the rewrite step of Lee et al. 2022): cut
# every non-first occurrence of a duplicated sampled span from the
# corpus, keeping the canonical (lowest doc_id, then lowest position)
# occurrence intact. Mirrored bit-for-bit in oracle.SPAN_CLEAN.
#
# Rule (all deterministic, mirrored in SQL):
# - anchors: the dup_spans sampled stride-1 SPAN_W-token spans
#   (h % SPAN_SAMPLE_MOD == 0), EVERY occurrence (doc_id, pos),
#   pos 1-based to match the SQL twin
# - duplicated: a hash with >= 2 total occurrences (within- OR
#   cross-document, counting multiplicity — Lee et al. remove all
#   repeats, not just cross-doc ones)
# - removal intervals: all occurrences except the (doc_id, pos)-min
#   one; a removed occurrence blanks tokens [pos, pos+SPAN_W-1]
# - rewrite: per doc, drop tokens covered by the interval UNION,
#   re-join with ' '; untouched docs pass through byte-identical
#
# Scale shape: pass 1 emits anchor occurrence rows (~tokens/8 compact
# rows) into ONE span-hash bucket shuffle; interval mining is a
# per-bucket lexsort (no per-row Python). The removal set is tiny
# relative to the corpus, so by default it is BROADCAST into a pure
# map over the docs (no second corpus shuffle); above
# SPAN_REMOVAL_BROADCAST_CAP rows it switches to the doc-bucket
# co-partition union (ingest.py idiom) so neither side is ever
# driver-materialized. The rewrite itself touches only affected docs.
# ---------------------------------------------------------------------------

SPAN_REMOVAL_BROADCAST_CAP = 1_000_000
N_DOC_BUCKETS = 64


def _occurrence_rows(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> one row PER anchor occurrence:
    (sh int64, doc_id, pos 1-based, sbucket)."""
    ids = batch.column("doc_id").to_numpy()
    texts = batch.column("text").to_pylist()
    h, doc_of, local = _span_hash_positions(texts)
    keep = h % np.uint64(SPAN_SAMPLE_MOD) == 0
    h, doc_of, local = h[keep], doc_of[keep], local[keep]
    return pa.table(
        {
            "sh": pa.array(h.view(np.int64)),
            "doc_id": pa.array(ids[doc_of]),
            "pos": pa.array(local + 1),
            "sbucket": pa.array(
                (h % np.uint64(N_SPAN_BUCKETS)).astype(np.int64)
            ),
        }
    )


def _bucket_removals(group: pd.DataFrame) -> pd.DataFrame:
    """anchor occurrences of one hash bucket -> (doc_id, pos) removal
    rows: every occurrence of a >=2-occurrence hash except the
    (doc_id, pos)-first. One lexsort, run-length ranks, no Python."""
    sh = group["sh"].to_numpy(np.int64)
    ids = group["doc_id"].to_numpy(np.int64)
    pos = group["pos"].to_numpy(np.int64)
    order = np.lexsort((pos, ids, sh))
    sh, ids, pos = sh[order], ids[order], pos[order]
    new = np.ones(len(sh), dtype=bool)
    new[1:] = sh[1:] != sh[:-1]
    starts = np.nonzero(new)[0]
    sizes = np.diff(np.concatenate([starts, [len(sh)]]))
    rank = np.arange(len(sh)) - np.repeat(starts, sizes)
    dup_run = np.repeat(sizes, sizes) >= 2
    cut = dup_run & (rank > 0)
    return pd.DataFrame(
        {"doc_id": ids[cut], "pos": pos[cut]}
    ).astype(np.int64)


def _splice(text: str, starts: np.ndarray, w: int = SPAN_W) -> tuple[str, int]:
    """Cut the interval union [s, s+w-1] (1-based starts) out of the
    doc's tokens; -> (clean_text, n_removed)."""
    toks = text.split(" ")
    n = len(toks)
    cover = np.zeros(n + 1, dtype=np.int64)
    s0 = starts - 1  # 0-based
    np.add.at(cover, s0, 1)
    np.add.at(cover, np.minimum(s0 + w, n), -1)
    mask = np.cumsum(cover[:-1]) > 0
    n_rm = int(mask.sum())
    if n_rm == 0:
        return text, 0
    kept = [t for t, m in zip(toks, mask) if not m]
    return " ".join(kept), n_rm


def _rewrite_bucket(group: pd.DataFrame) -> pd.DataFrame:
    """doc rows (side 0) + removal rows (side 1) of one doc bucket ->
    (doc_id, n_removed, clean_text)."""
    docs = group[group["side"] == 0]
    rem = group[group["side"] == 1]
    rm_pos = {
        did: g["pos"].to_numpy(np.int64)
        for did, g in rem.groupby("doc_id", sort=False)
    }
    out_id = docs["doc_id"].to_numpy(np.int64)
    texts = docs["text"].to_numpy(object)
    clean = np.empty(len(out_id), dtype=object)
    n_rm = np.zeros(len(out_id), dtype=np.int64)
    for i, (did, t) in enumerate(zip(out_id, texts)):
        p = rm_pos.get(did)
        if p is None:
            clean[i] = t
        else:
            clean[i], n_rm[i] = _splice(t, p)
    return pd.DataFrame(
        {"doc_id": out_id, "n_removed": n_rm, "clean_text": clean}
    )


def remove_dup_spans(documents_ds, broadcast_cap: int = SPAN_REMOVAL_BROADCAST_CAP):
    """-> (doc_id, n_removed, clean_text) for EVERY input doc, with
    all non-canonical duplicated-span occurrences excised."""
    import ray

    from robosat_ray.functions.hashing import hash_bucket

    docs = documents_ds.select_columns(["doc_id", "text"])
    removals = (
        docs.map_batches(_occurrence_rows, batch_format="pyarrow")
        .groupby("sbucket")
        .map_groups(_bucket_removals, batch_format="pandas")
    ).materialize()

    if removals.count() <= broadcast_cap:
        rm = removals.to_pandas()
        rm_ref = ray.put(
            {}
            if rm.empty  # a fully empty Dataset has no column schema
            else {
                did: g["pos"].to_numpy(np.int64)
                for did, g in rm.groupby("doc_id", sort=False)
            }
        )

        def rewrite_batch(b: pa.Table, _ref=rm_ref) -> pa.Table:
            rm_pos = ray.get(_ref)
            ids = b.column("doc_id").to_numpy()
            texts = b.column("text").to_pylist()
            clean = list(texts)
            n_rm = np.zeros(len(ids), dtype=np.int64)
            for i, did in enumerate(ids):
                p = rm_pos.get(did)
                if p is not None:
                    clean[i], n_rm[i] = _splice(texts[i], p)
            return pa.table(
                {
                    "doc_id": pa.array(ids),
                    "n_removed": pa.array(n_rm),
                    "clean_text": pa.array(clean, pa.string()),
                }
            )

        return docs.map_batches(rewrite_batch, batch_format="pyarrow")

    # co-partition path: tag-union both sides on a doc_id bucket
    def tag_docs(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "text": b.column("text"),
                "pos": pa.array(np.zeros(len(ids), dtype=np.int64)),
                "side": pa.array(np.zeros(len(ids), dtype=np.int64)),
                "dbucket": pa.array(hash_bucket(ids, N_DOC_BUCKETS)),
            }
        )

    def tag_removals(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "text": pa.array([""] * len(ids), pa.string()),
                "pos": b.column("pos"),
                "side": pa.array(np.ones(len(ids), dtype=np.int64)),
                "dbucket": pa.array(hash_bucket(ids, N_DOC_BUCKETS)),
            }
        )

    return (
        docs.map_batches(tag_docs, batch_format="pyarrow")
        .union(removals.map_batches(tag_removals, batch_format="pyarrow"))
        .groupby("dbucket")
        .map_groups(_rewrite_bucket, batch_format="pandas")
    )
