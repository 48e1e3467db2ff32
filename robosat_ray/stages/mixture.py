"""Temperature-balanced mixture sampling — the corpus-balancing
staple (multilingual sampling p ∝ n^alpha, domain temperature
sampling): draw a FIXED total budget of documents with per-domain
allocations proportional to sqrt(domain size) (alpha = 0.5), so big
domains are tempered and small domains oversampled relative to raw
proportions.

Spec (mirrored bit-for-bit in oracle.MIX_SAMPLE, all integer):
- domains: the urls.py registered-domain fixture (URL_STATS chain)
- weight w_d = isqrt(n_d)  (floor integer sqrt — IEEE sqrt is
  correctly rounded, so FLOOR(sqrt(n)) in SQL is the same integer)
- exact largest-remainder allocation of MIX_BUDGET:
  base_d = B*w_d // W, then +1 to the (B - sum(base)) domains with
  the largest (B*w_d mod W), ties by regdom ascending
- within a domain, keep the docs with hash-rank <= alloc_d (the
  domain_cap LCG rank: uniform deterministic choice, not lowest-id)
- alloc_d caps at n_d (a domain can't give more than it has); the
  undistributed slack is reported, not silently reassigned

Scale shape: pass 1 is a vocabulary-bounded (domain) count groupby;
the allocation is driver arithmetic on |domains| rows; pass 2 is the
domain co-partition rank scan with a per-domain cap broadcast.
Output bounded at MIX_BUDGET rows.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

MIX_BUDGET = 200
N_MIX_BUCKETS = 64


def allocate(counts: dict[str, int], budget: int = MIX_BUDGET) -> dict[str, int]:
    """Exact largest-remainder sqrt-proportional allocation, capped at
    each domain's size."""
    doms = sorted(counts)
    w = {d: math.isqrt(counts[d]) for d in doms}
    W = sum(w.values())
    if W == 0:
        return {d: 0 for d in doms}
    base = {d: budget * w[d] // W for d in doms}
    rem = {d: budget * w[d] % W for d in doms}
    extra = budget - sum(base.values())
    order = sorted(doms, key=lambda d: (-rem[d], d))
    for d in order[:extra]:
        base[d] += 1
    return {d: min(base[d], counts[d]) for d in doms}


def mix_sample(documents_ds, budget: int = MIX_BUDGET):
    """-> (doc_id, regdom, dom_rank) of the sampled docs."""
    import ray
    from ray.data.aggregate import Count

    from robosat_ray.functions.hashing import key_bucket
    from robosat_ray.stages.domain_cap import _rank_hash
    from robosat_ray.stages.urls import parse_urls, rich_urls_batch

    def to_domains(batch: pa.Table) -> pa.Table:
        urls = rich_urls_batch(batch)
        regdom = parse_urls(urls).column("regdom")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "regdom": regdom,
                "mbucket": pa.array(
                    key_bucket(
                        np.asarray(regdom.to_pandas(), dtype=object),
                        N_MIX_BUCKETS,
                    )
                ),
            }
        )

    tagged = documents_ds.select_columns(["doc_id", "lang"]).map_batches(
        to_domains, batch_format="pyarrow"
    )
    cdf = (
        tagged.groupby("regdom").aggregate(Count(alias_name="n")).to_pandas()
    )
    alloc = allocate(dict(zip(cdf["regdom"], cdf["n"].astype(int))), budget)
    ref = ray.put(alloc)

    def sample_bucket(group: pd.DataFrame, _ref=ref) -> pd.DataFrame:
        a = ray.get(_ref)
        ids = group["doc_id"].to_numpy(np.int64)
        rh = _rank_hash(ids)
        codes, uniq = pd.factorize(group["regdom"], sort=False)
        order = np.lexsort((ids, rh, codes))
        c = codes[order]
        starts = np.concatenate([[0], np.nonzero(np.diff(c))[0] + 1])
        sizes = np.diff(np.concatenate([starts, [len(c)]]))
        rank = np.arange(len(c)) - np.repeat(starts, sizes)
        caps = np.array([a[u] for u in uniq], dtype=np.int64)[c]
        keep = order[rank < caps]
        out = group.iloc[keep][["doc_id", "regdom"]].copy()
        out["dom_rank"] = (rank[rank < caps] + 1).astype(np.int64)
        return out

    return (
        tagged.groupby("mbucket")
        .map_groups(sample_bucket, batch_format="pandas")
    )
