"""Hashed bigram language-model fluency scoring — the CCNet-style
"LM perplexity" curation signal (Wenzek et al. 2020) rebuilt
logarithm-free so it stays integer-exact and SQL-twinnable. The
reference has no text ops; this is a training-data-pipeline operator
the task brief adds (quality family, next to stages/quality.py's
surface heuristics and text_ops.doc_rarity's TF-IDF shape).

Model: corpus-level occurrence counts of whitespace unigrams and
adjacent bigrams, feature-hashed into dense 2^18-slot int64 arrays —
the broadcast is capped at 2 x 2 MiB BY CONSTRUCTION regardless of
corpus vocabulary, the same trade doc_rarity documents (rare features
sharing a slot share a count). Hash conventions are the repo-wide
ones so the SQL twin is bit-exact:
    th(t)  = md5 low-8-LE == md5_number(t) mod 2^64
    ub(t)  = th(t) mod 2^18
    bb(t1,t2) = ((th(t1) * 1099511628211 + th(t2)) mod 2^64) mod 2^18
(the FNV polynomial fold stages/spans.py already mirrors in HUGEINT).
md5 runs once per worker-lifetime-unique TOKEN (shared _token_hash
cache); bigram buckets are a pure uint64 gather+fma — no per-bigram
Python or string construction anywhere.

Score: for each adjacent token pair,
    p_milli = (1000 * count[bb]) // count[ub(t1)]
(an integer conditional-probability estimate; bucket collisions can
push it past 1000 — deterministic, mirrored by the oracle) and
    fluency_milli = sum(p_milli) // n_bigrams  (0 when n_bigrams = 0).
Common phrasing scores high, shuffled/gibberish text scores low.
int64 headroom: 1000 * count fits until 9.2e15 bigram occurrences per
bucket; at 10^12 docs re-salt to more buckets before that bound.

Plan shape (two streaming passes, zero data-scale shuffles):
pass 1 emits in-batch-aggregated (slot, cnt) partials — shuffle rows
bounded at 2 x 2^18 x blocks, never the vocabulary; pass 2 broadcasts
the two dense arrays once via ray.put and scores every doc in-batch
(factorize + gather + np.add.at), embarrassingly parallel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from robosat_ray.functions.text_hash import _token_hash

N_LM_BUCKETS = 1 << 18
_B = np.uint64(1099511628211)  # FNV-ish fold prime (spans.py convention)


def _tok_arrays(batch: pa.Table):
    """-> (parents int64, th uint64 per-token hashes): one Arrow split,
    one factorize, md5 once per batch-unique token (worker cache)."""
    lists = pa.compute.split_pattern(batch.column("text"), " ")
    lists = lists.combine_chunks() if isinstance(lists, pa.ChunkedArray) else lists
    parents = pa.compute.list_parent_indices(lists).to_numpy().astype(np.int64)
    codes, uniq = pd.factorize(lists.values.to_pandas(), sort=False)
    uh = np.fromiter(
        (_token_hash(u) for u in uniq), dtype=np.uint64, count=len(uniq)
    )
    return parents, uh[codes] if len(codes) else np.empty(0, np.uint64)


def _buckets(parents, th):
    """-> (bigram parent doc-index, ub of t1, bb) for every adjacent
    same-doc token pair, plus the full per-token ub array."""
    ub_all = (th % np.uint64(N_LM_BUCKETS)).astype(np.int64)
    adj = parents[:-1] == parents[1:]
    bb = ((th[:-1][adj] * _B + th[1:][adj]) % np.uint64(N_LM_BUCKETS)).astype(
        np.int64
    )
    return parents[:-1][adj], ub_all[:-1][adj], bb, ub_all


def _count_rows(batch: pa.Table) -> pa.Table:
    """Pass-1 partials: slot = kind * N + bucket (kind 0 = unigram
    occurrences, kind 1 = bigram occurrences), in-batch aggregated."""
    parents, th = _tok_arrays(batch)
    _, _, bb, ub_all = _buckets(parents, th)
    uc = np.bincount(ub_all, minlength=N_LM_BUCKETS)
    bc = np.bincount(bb, minlength=N_LM_BUCKETS)
    slots = np.concatenate(
        [np.flatnonzero(uc), np.flatnonzero(bc) + np.int64(N_LM_BUCKETS)]
    ).astype(np.int64)
    cnts = np.concatenate([uc[uc > 0], bc[bc > 0]]).astype(np.int64)
    return pa.table({"slot": pa.array(slots), "cnt": pa.array(cnts)})


def _score_batch(batch: pa.Table, ref) -> pa.Table:
    """Pass 2: dense (uni, bi) count arrays come from the object store
    (zero-copy per node; doc_rarity's broadcast shape), score per batch."""
    import ray

    uni, bi = ray.get(ref)
    parents, th = _tok_arrays(batch)
    bparent, ub1, bb, _ = _buckets(parents, th)
    n = len(batch)
    # every observed bigram's prefix token occurred, so uni >= 1
    p_milli = (1000 * bi[bb]) // uni[ub1]
    s = np.zeros(n, dtype=np.int64)
    np.add.at(s, bparent, p_milli)
    nb = np.bincount(bparent, minlength=n).astype(np.int64)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_bigrams": pa.array(nb),
            "fluency_milli": pa.array(s // np.maximum(nb, 1)),
        }
    )


def lm_fluency(documents_ds):
    """-> Dataset (doc_id, n_bigrams, fluency_milli) over every doc."""
    import ray
    from ray.data.aggregate import Sum

    docs = documents_ds.select_columns(["doc_id", "text"])
    counts = (
        docs.map_batches(_count_rows, batch_format="pyarrow")
        .groupby("slot")
        .aggregate(Sum("cnt", alias_name="c"))
    ).to_pandas()
    dense = np.zeros(2 * N_LM_BUCKETS, dtype=np.int64)
    dense[counts["slot"].to_numpy(dtype=np.int64)] = counts["c"].to_numpy(
        dtype=np.int64
    )
    ref = ray.put((dense[:N_LM_BUCKETS], dense[N_LM_BUCKETS:]))
    import functools

    return docs.map_batches(
        functools.partial(_score_batch, ref=ref), batch_format="pyarrow"
    )
