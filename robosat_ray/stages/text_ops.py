"""Text-analysis and dedup stages over the `documents` table — the
training-data-pipeline operators the engine adds beyond the reference
(exact dedup, token stats; minhash/simhash live in functions/ and are
wired in later stages). All vectorized or per-row-cheap map_batches.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

_TOKEN_RE = re.compile(r"[A-Za-z0-9]+")  # mirrored by the oracle's regexp_extract_all


def _md5_hex(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def add_text_hash(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    return batch.append_column(
        "text_hash", pa.array([_md5_hex(t) for t in texts], type=pa.string())
    )


def exact_dedup_groups(documents_ds):
    """md5(text) -> (text_hash, keep_id = min doc_id, n_dups). The
    classic exact-dedup shape: hash in map_batches, then an algebraic
    groupby aggregate (no group materialization)."""
    from ray.data.aggregate import Count, Min

    hashed = documents_ds.select_columns(["doc_id", "text"]).map_batches(
        add_text_hash, batch_format="pyarrow"
    )
    return (
        hashed.select_columns(["text_hash", "doc_id"])
        .groupby("text_hash")
        .aggregate(Min("doc_id", alias_name="keep_id"), Count(alias_name="n_dups"))
    )


def token_stats_batch(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    n_tok = np.fromiter(
        (len(_TOKEN_RE.findall(t)) for t in texts), dtype=np.int64, count=len(texts)
    )
    n_chars = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(n_tok),
            "n_chars": pa.array(n_chars),
        }
    )


def token_counts(documents_ds):
    """Per-doc token + char counts (whitespace/alnum tokenizer)."""
    return documents_ds.select_columns(["doc_id", "text"]).map_batches(
        token_stats_batch, batch_format="pyarrow"
    )
