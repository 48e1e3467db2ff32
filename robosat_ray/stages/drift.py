"""Per-source token-distribution drift — the data-mixture diagnostic
(which source's language deviates most from the corpus): tokens
hashed into 256 md5 buckets, per-source share vectors compared to the
global share vector by L1 distance in exact per-million integers.

Spec (mirrored bit-for-bit in oracle.DOMAIN_DRIFT):
- tokens = text split on single spaces (empties kept — the near-dup
  family's convention), bucket = md5_number(token) % 256
- share_milli = count * 1_000_000 // group_total (floor div, both
  engines); drift(source) = sum over all 256 buckets of
  |source_share - global_share|, INCLUDING buckets the source never
  hits (dense 256-vector, so a missing bucket contributes the global
  share). Scale-safe: shares are <= 1e6 regardless of corpus size —
  no count product ever exceeds int64.

Scale shape: per-batch (source, bucket) combiners -> one groupby of a
(sources x 256)-bounded table -> dense finish on the driver (the
table is dimension-bounded, not corpus-bounded).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

DRIFT_BUCKETS = 256
SHARE_SCALE = 1_000_000


def domain_drift(docs_ds) -> pd.DataFrame:
    """documents -> (source, n_tokens, drift_milli) per source."""
    from ray.data.aggregate import Sum

    from robosat_ray.functions.text_hash import _batch_token_hashes

    def partial(b: pa.Table) -> pa.Table:
        texts = b.column("text").to_pylist()
        src = b.column("source").to_numpy(zero_copy_only=False)
        th, doc_off = _batch_token_hashes(texts)
        buckets = (th % np.uint64(DRIFT_BUCKETS)).astype(np.int64)
        doc_idx = np.repeat(
            np.arange(len(texts)), np.diff(doc_off).astype(np.int64)
        )
        codes, uniq = pd.factorize(src, sort=False)
        key = codes[doc_idx] * DRIFT_BUCKETS + buckets
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "source": pa.array(uniq[uk // DRIFT_BUCKETS], pa.string()),
                "b": pa.array(uk % DRIFT_BUCKETS),
                "c": pa.array(cnt.astype(np.int64)),
            }
        )

    def skey(b: pa.Table) -> pa.Table:
        # single composite string key: sources are few, buckets 256
        return pa.table(
            {
                "sb": pa.compute.binary_join_element_wise(
                    b.column("source"),
                    pa.compute.cast(b.column("b"), pa.string()),
                    "\x1f",
                ),
                "c": b.column("c"),
            }
        )

    tiny = (
        docs_ds.select_columns(["source", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .map_batches(skey, batch_format="pyarrow")
        .groupby("sb")
        .aggregate(Sum("c", alias_name="n"))
        .to_pandas()  # sources x 256 rows — dimension-bounded
    )
    parts = tiny["sb"].str.split("\x1f", expand=True)
    tiny["source"] = parts[0]
    tiny["b"] = parts[1].astype(np.int64)
    g = np.zeros(DRIFT_BUCKETS, dtype=np.int64)
    for b_, n_ in zip(tiny["b"], tiny["n"]):
        g[b_] += n_
    n_total = int(g.sum())
    g_share = g * SHARE_SCALE // max(n_total, 1)
    rows = []
    for source, grp in tiny.groupby("source", sort=True):
        d = np.zeros(DRIFT_BUCKETS, dtype=np.int64)
        d[grp["b"].to_numpy()] = grp["n"].to_numpy(np.int64)
        t_s = int(d.sum())
        d_share = d * SHARE_SCALE // max(t_s, 1)
        rows.append(
            (source, t_s, int(np.abs(d_share - g_share).sum()))
        )
    return pd.DataFrame(
        rows, columns=["source", "n_tokens", "drift_milli"]
    ).astype({"n_tokens": np.int64, "drift_milli": np.int64})
