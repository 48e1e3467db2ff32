"""Per-domain contribution capping — the RefinedWeb/C4 curation rule
that no single registered domain dominates the training mix: keep at
most DOMAIN_CAP documents per domain, chosen by a deterministic
uniform hash rank (NOT by doc_id, which would bias toward old crawl
segments).

Spec (mirrored bit-for-bit in oracle.DOMAIN_CAP):
- regdom from the urls.py fixture parse (the chain URL_STATS pins)
- rank hash rh = (doc_id * A + B) mod 2^64 (Knuth MMIX LCG step —
  pure integer arithmetic so the SQL twin computes the identical
  value in HUGEINT; md5 here would cost a per-doc Python call)
- keep iff row_number over (partition by regdom order by rh, doc_id)
  <= DOMAIN_CAP; output (doc_id, regdom, dom_rank)

Scale shape: one streaming parse map, ONE hash-bucket shuffle on
regdom (all of a domain's docs co-locate), per-bucket vectorized
lexsort + run-length rank. Output bounded at domains x CAP rows. A
hot mega-domain makes one heavy bucket — the mitigation at 10^12
rows is a two-level cap (pre-cap per (domain, doc_id-range) salt at
CAP, then the exact cap), same rule both levels.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

DOMAIN_CAP = 3
RANK_A = np.uint64(6364136223846793005)
RANK_B = np.uint64(1442695040888963407)
N_DOMAIN_BUCKETS = 64


def _rank_hash(ids: np.ndarray) -> np.ndarray:
    return ids.astype(np.uint64) * RANK_A + RANK_B  # mod-2^64 wraparound


def _cap_bucket(group: pd.DataFrame) -> pd.DataFrame:
    ids = group["doc_id"].to_numpy(np.int64)
    rh = _rank_hash(ids)
    codes, _ = pd.factorize(group["regdom"], sort=False)
    order = np.lexsort((ids, rh, codes))
    c = codes[order]
    starts = np.concatenate([[0], np.nonzero(np.diff(c))[0] + 1])
    rank = np.arange(len(c)) - np.repeat(starts, np.diff(np.concatenate([starts, [len(c)]])))
    keep = order[rank < DOMAIN_CAP]
    out = group.iloc[keep][["doc_id", "regdom"]].copy()
    out["dom_rank"] = (rank[rank < DOMAIN_CAP] + 1).astype(np.int64)
    return out


def domain_cap(documents_ds):
    """-> (doc_id, regdom, dom_rank) for the kept docs only."""
    from robosat_ray.functions.hashing import key_bucket
    from robosat_ray.stages.urls import parse_urls, rich_urls_batch

    def to_domains(batch: pa.Table) -> pa.Table:
        urls = rich_urls_batch(batch)  # row-aligned with the input
        regdom = parse_urls(urls).column("regdom")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "regdom": regdom,
                "dbucket": pa.array(
                    key_bucket(
                        np.asarray(regdom.to_pandas(), dtype=object),
                        N_DOMAIN_BUCKETS,
                    )
                ),
            }
        )

    return (
        documents_ds.select_columns(["doc_id", "lang"])
        .map_batches(to_domains, batch_format="pyarrow")
        .groupby("dbucket")
        .map_groups(_cap_bucket, batch_format="pandas")
    )
