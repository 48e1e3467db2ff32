"""Cohort retention analysis — the other product-analytics staple
over the event stream: group users into weekly cohorts by their FIRST
signup week, then for each cohort count how many of its users were
active (any event) k weeks later. The output is the retention
triangle (cohort_week, k, n_users).

Spec (mirrored bit-for-bit in oracle.COHORT):
- week  w = epoch_us(ts) // 604800000000 (7-day buckets from epoch)
- cohort(u) = min week of u's 'signup' events (users who never sign
  up are not in any cohort)
- n_users(cw, k) = distinct cohort-cw users with any activity in week
  cw + k, for k >= 0 (pre-signup activity is not retention)

Scale shape: ONE user_id hash-bucket shuffle does everything — a
user's cohort week and activity weeks live in the same bucket, so
each bucket emits exact partial (cohort_week, k) user-counts
(distinct (user, week) via one lexsort, no per-user Python), and the
final groupby sums tiny weeks x weeks rows. Contrast the SQL twin's
plan: a corpus-scale join of cohorts x activity that the co-partition
avoids shipping twice.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

WEEK_US = 7 * 86400 * 1_000_000
N_COHORT_BUCKETS = 64


def _cohort_bucket(group: pd.DataFrame) -> pd.DataFrame:
    codes, _ = pd.factorize(group["user_id"], sort=False)
    w = group["wk"].to_numpy(np.int64)
    n = codes.max() + 1 if len(codes) else 0
    is_signup = group["event_type"].to_numpy() == "signup"
    cw = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(cw, codes[is_signup], w[is_signup])
    # distinct (user, week) activity pairs via one lexsort
    order = np.lexsort((w, codes))
    cs, ws = codes[order], w[order]
    first = np.ones(len(cs), dtype=bool)
    first[1:] = (cs[1:] != cs[:-1]) | (ws[1:] != ws[:-1])
    cs, ws = cs[first], ws[first]
    have = cw[cs] != np.iinfo(np.int64).max
    k = ws[have] - cw[cs[have]]
    keep = k >= 0
    out = pd.DataFrame({"cohort_week": cw[cs[have]][keep], "k": k[keep]})
    g = out.groupby(["cohort_week", "k"], sort=False).size().reset_index(name="n_users")
    g["n_users"] = g["n_users"].astype(np.int64)
    return g


def cohort_retention(events_ds):
    """-> (cohort_week, k, n_users): the weekly retention triangle."""
    from ray.data.aggregate import Sum

    from robosat_ray.functions.hashing import hash_bucket

    def tag(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy()
        tus = batch.column("ts").cast(pa.int64()).to_numpy()
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "event_type": batch.column("event_type"),
                "wk": pa.array(tus // WEEK_US),
                "cbucket": pa.array(hash_bucket(uid, N_COHORT_BUCKETS)),
            }
        )

    partials = (
        events_ds.select_columns(["user_id", "event_type", "ts"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("cbucket")
        .map_groups(_cohort_bucket, batch_format="pandas")
    )
    return (
        partials.groupby(["cohort_week", "k"])
        .aggregate(Sum("n_users", alias_name="n_users"))
    )
