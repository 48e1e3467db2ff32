"""Skyline (Pareto-front) query over `documents`: the docs not
dominated on (maximize integer-micro alpha-quality score, maximize
token count) — the classic multi-criteria selection operator
(Borzsony/Kossmann/Stocker, ICDE 2001), here the "quality vs length"
frontier an LLM-data curator scans (the two metrics are naturally
anti-correlated, so the front is a real curve, not a corner point).
Beyond-reference scope (robosat has no preference queries).

Dominance (both metrics int64, fully deterministic): o dominates t
iff o.score_micro >= t.score_micro AND o.n_tokens >= t.n_tokens AND
they differ in at least one metric. Exact (score, tokens) duplicates
do not dominate each other — all survive.

Scale shape — skyline is ALGEBRAIC (skyline(A ∪ B) =
skyline(skyline(A) ∪ skyline(B))), which gives an exact two-stage
plan with no driver cap and no broadcast of data-scale state:

1. per-block partial skyline inside `map_batches` (a sort + two
   segmented prefix-extrema — no quadratic anywhere), pruning each
   block to its local Pareto front;
2. candidates shuffle ONCE into score-range buckets
   (b = score_micro // SKY_BUCKET_W, <= ~62 non-empty buckets by
   construction since score_micro <= 1e6). The per-bucket MAX token
   count over candidates equals the max over ALL points of the bucket
   (any pruned point is dominated by a surviving candidate with
   >= score and >= tokens in the same-or-higher bucket), so the tiny
   (bucket, max_tokens) table — bounded by construction, gathered to
   the driver like the quantile thresholds — yields the exact
   strict-suffix bound m_ext[b] = max tokens over buckets > b.
   Each bucket group then finishes its skyline locally against
   m_ext[b]: survive iff tokens == max tokens within its exact score
   AND tokens > max(local strict-higher-score max, m_ext[b]).

Metric contract (mirrored bit-for-bit by oracle.SKYLINE):
- score_micro = n_alpha * 1_000_000 // max(n_chars, 1)  (int64 floor
  division, nonnegative — identical to DuckDB's `//`); n_alpha and
  n_chars per the QUALITY oracle expressions.
- n_tokens = number of `[A-Za-z0-9]+` matches (the TOKEN_COUNT
  contract; pc.count_substring_regex counts the same non-overlapping
  matches as regexp_extract_all).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SKY_SCALE = 1_000_000
SKY_BUCKET_W = 16_384  # score_micro in [0, 1e6] -> <= 62 buckets

# internally tokens are NEGATED so the core solves minimize-t; the
# public contract (and every comment above) is maximize-both
_INT64_MAX = np.iinfo(np.int64).max


def _metrics(batch: pa.Table) -> pa.Table:
    texts = batch.column("text")
    n_chars = pc.cast(pc.utf8_length(texts), pa.int64()).to_numpy()
    n_alpha = pc.cast(
        pc.utf8_length(pc.replace_substring_regex(texts, "[^A-Za-z]", "")),
        pa.int64(),
    ).to_numpy()
    n_tokens = pc.cast(
        pc.count_substring_regex(texts, "[A-Za-z0-9]+"), pa.int64()
    ).to_numpy()
    score = n_alpha * SKY_SCALE // np.maximum(n_chars, 1)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "score_micro": pa.array(score),
            "n_tokens": pa.array(n_tokens),
        }
    )


def _local_skyline(
    ids: np.ndarray, s: np.ndarray, t: np.ndarray, m_ext: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Exact skyline on (maximize s, MINIMIZE t) against an external
    bound m_ext = min t over points with strictly greater s that live
    elsewhere (int64 max when none). Vectorized: sort by (-s, t),
    segment per distinct s, survive iff t == own-s min AND
    t < min(strict-higher-s min, m_ext). Callers pass t = -tokens to
    get the public maximize-both semantics."""
    if len(ids) == 0:
        return ids, s, t
    order = np.lexsort((ids, t, -s))
    ids, s, t = ids[order], s[order], t[order]
    new_seg = np.concatenate([[True], s[1:] != s[:-1]])
    seg_id = np.cumsum(new_seg) - 1
    n_seg = seg_id[-1] + 1
    # per-segment min t = first t of the segment (sorted t asc within)
    seg_min = t[new_seg]
    # strict-higher-s min: prefix min over PRECEDING segments, seeded
    # with the external bound
    prior = np.empty(n_seg, dtype=np.int64)
    prior[0] = m_ext
    if n_seg > 1:
        np.minimum.accumulate(np.minimum(seg_min, m_ext)[:-1], out=prior[1:])
    keep = (t == seg_min[seg_id]) & (t < prior[seg_id])
    return ids[keep], s[keep], t[keep]


def _partial_batch(batch: pa.Table, bucket_w: int) -> pa.Table:
    m = _metrics(batch)
    ids, s, nt = _local_skyline(
        m.column("doc_id").to_numpy(),
        m.column("score_micro").to_numpy(),
        -m.column("n_tokens").to_numpy(),
        _INT64_MAX,
    )
    return pa.table(
        {
            "doc_id": pa.array(ids),
            "score_micro": pa.array(s),
            "neg_tokens": pa.array(nt),
            "bucket": pa.array(s // bucket_w),
        }
    )


def skyline(docs_ds, bucket_w: int = SKY_BUCKET_W):
    """documents (doc_id, text) -> (doc_id, score_micro, n_tokens):
    the exact Pareto front (max score, max tokens). One bucket
    shuffle; driver state is the <= 62-row bucket suffix-min table.
    bucket_w is a test seam (tiny widths force the cross-bucket
    external bound on every group)."""
    import pandas as pd

    from ray.data.aggregate import Min

    cand = (
        docs_ds.select_columns(["doc_id", "text"])
        .map_batches(
            lambda b: _partial_batch(b, bucket_w), batch_format="pyarrow"
        )
        .materialize()
    )
    mins = cand.groupby("bucket").aggregate(
        Min("neg_tokens", alias_name="mn")
    ).to_pandas()  # bounded by construction: <= 1 + SKY_SCALE // SKY_BUCKET_W rows
    mins = mins.sort_values("bucket", ascending=False)
    b_sorted = mins["bucket"].to_numpy()  # descending
    suffix = np.minimum.accumulate(mins["mn"].to_numpy())
    # m_ext for bucket b = min over buckets STRICTLY greater -> shift by one
    ext_for = {int(b): int(suffix[i - 1]) if i > 0 else _INT64_MAX
               for i, b in enumerate(b_sorted)}

    def finish(group: pd.DataFrame) -> pd.DataFrame:
        b = int(group["bucket"].iloc[0])
        ids, s, nt = _local_skyline(
            group["doc_id"].to_numpy(),
            group["score_micro"].to_numpy(),
            group["neg_tokens"].to_numpy(),
            ext_for.get(b, _INT64_MAX),
        )
        return pd.DataFrame({"doc_id": ids, "score_micro": s, "n_tokens": -nt})

    return cand.groupby("bucket").map_groups(finish, batch_format="pandas")
