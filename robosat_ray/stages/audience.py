"""Audience-overlap matrix — pairwise Jaccard of the DISTINCT-user
audiences of each event type (the ads/analytics "segment overlap"
staple, and the set-intersection twin of cohort.py's week x week
retention counts).

Spec (mirrored bit-for-bit in oracle.AUDIENCE_OVERLAP):
- audience(t) = set of distinct user_ids with >= 1 event of type t
- one output row per UNORDERED type pair (ta < tb lexicographically)
  that shares >= 1 user: (ta, tb, inter_users, union_users)

Scale shape: ONE user_id hash-bucket shuffle of the (user, type)
pairs; inside a bucket a lexsort dedups (user, type) and a ragged
triu emits per-user type pairs, pre-counted to (ta, tb, partial)
rows — bucket output is bounded by types^2, NOT users. The final
groupby sums |types|^2-bounded partials; per-type audience sizes ride
the same partials (tb = '' sentinel rows). Nothing is broadcast.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

N_AUD_BUCKETS = 64


def _pair_rows(batch: pa.Table) -> pa.Table:
    from robosat_ray.functions.hashing import hash_bucket

    u = batch.column("user_id").to_numpy()
    t = batch.column("event_type")
    return pa.table(
        {
            "user_id": pa.array(u),
            "event_type": t,
            "abucket": pa.array(hash_bucket(u, N_AUD_BUCKETS)),
        }
    )


def _bucket_partials(g: pd.DataFrame) -> pd.DataFrame:
    """Within one user bucket: dedup (user, type), emit per-pair and
    per-type (tb='') partial counts."""
    codes, types = pd.factorize(g["event_type"], sort=True)
    u = g["user_id"].to_numpy(np.int64)
    order = np.lexsort((codes, u))
    uu, cc = u[order], codes[order].astype(np.int64)
    keep = np.ones(len(uu), dtype=bool)
    keep[1:] = (uu[1:] != uu[:-1]) | (cc[1:] != cc[:-1])
    uu, cc = uu[keep], cc[keep]
    k = len(types)
    if len(uu) == 0:
        return pd.DataFrame(
            {
                "ta": pd.Series([], dtype=object),
                "tb": pd.Series([], dtype=object),
                "cnt": pd.Series([], dtype=np.int64),
            }
        )
    # per-type distinct-user partials
    type_cnt = np.bincount(cc, minlength=k).astype(np.int64)
    # per-user type-pair counts: segments are tiny (<= k types/user),
    # pair matrix accumulated via flattened (ca * k + cb) bincount
    seg_first = np.ones(len(uu), dtype=bool)
    seg_first[1:] = uu[1:] != uu[:-1]
    starts = np.flatnonzero(seg_first)
    lens = np.diff(np.append(starts, len(uu)))
    npairs = lens * (lens - 1) // 2
    total = int(npairs.sum())
    pair_cnt = np.zeros(k * k, dtype=np.int64)
    if total:
        run_of = np.repeat(np.arange(len(lens)), npairs)
        kk = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(npairs[:-1])]), npairs
        )
        L = lens[run_of]
        i = (
            L - 2 - np.floor(np.sqrt(-8.0 * kk + 4.0 * L * (L - 1) - 7) / 2.0 - 0.5)
        ).astype(np.int64)
        j = (kk + i + 1 - L * (L - 1) // 2 + (L - i) * ((L - i) - 1) // 2).astype(
            np.int64
        )
        base = np.repeat(starts, npairs)
        ca, cb = cc[base + i], cc[base + j]  # ca < cb (sorted per user)
        np.add.at(pair_cnt, ca * k + cb, 1)
    tarr = np.asarray(types, dtype=object)
    nz = np.flatnonzero(pair_cnt)
    singles = np.flatnonzero(type_cnt)
    return pd.DataFrame(
        {
            "ta": np.concatenate([tarr[nz // k], tarr[singles]]),
            "tb": np.concatenate(
                [tarr[nz % k], np.full(len(singles), "", dtype=object)]
            ),
            "cnt": np.concatenate([pair_cnt[nz], type_cnt[singles]]).astype(np.int64),
        }
    )


def audience_overlap(events_ds) -> pd.DataFrame:
    """-> (ta, tb, inter_users, union_users), one row per unordered
    event-type pair with a shared user."""
    from ray.data.aggregate import Sum

    parts = (
        events_ds.select_columns(["user_id", "event_type"])
        .map_batches(_pair_rows, batch_format="pyarrow")
        .groupby("abucket")
        .map_groups(_bucket_partials, batch_format="pandas")
    )
    agg = (
        parts.groupby(["ta", "tb"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    singles = agg[agg["tb"] == ""].set_index("ta")["cnt"]
    pairs = agg[agg["tb"] != ""].copy()
    inter = pairs["cnt"].to_numpy(np.int64)
    na = singles.loc[pairs["ta"]].to_numpy(np.int64)
    nb = singles.loc[pairs["tb"]].to_numpy(np.int64)
    out = pd.DataFrame(
        {
            "ta": pairs["ta"].to_numpy(),
            "tb": pairs["tb"].to_numpy(),
            "inter_users": inter,
            "union_users": na + nb - inter,
        }
    )
    return out.sort_values(["ta", "tb"]).reset_index(drop=True)
