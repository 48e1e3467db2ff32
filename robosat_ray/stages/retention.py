"""Sliding-window distinct users — the 7-day rolling active-user
curve (WAU-per-day), the dashboard metric whose naive plan is a
day x user sliding self-join.

Exact distributed plan with NO fact re-shuffle per day:
1. ONE user_id hash-bucket co-partition; per bucket each user's
   distinct active days become coverage intervals [day, day + W-1],
   merged when they chain (next_day <= prev_day + W-1) — a user covers
   day d iff they were active in [d-W+1, d].
2. Each merged run emits two deltas (+1 at start, -1 at end+1); the
   delta table is bounded by runs, and after the per-day groupby-sum
   by the CALENDAR (one row per day), not by users or events.
3. The tiny per-day delta table cumsums on the driver and is
   inner-joined to the distinct event days (also calendar-bounded),
   so the output is (day, dau7) for every day that has events.

Oracle (oracle.SLIDING_DAU) is the brute-force day x user range join
COUNT(DISTINCT) — definition vs algorithm, bit-equal.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

WINDOW_DAYS = 7
N_RET_BUCKETS = 64
US_PER_DAY = 86_400 * 1_000_000


def sliding_dau(events_ds, window: int = WINDOW_DAYS) -> pd.DataFrame:
    """events (user_id, ts) -> (day, dau7): distinct users active in
    the trailing `window` days, for each day with >= 1 event."""
    from ray.data.aggregate import Sum

    from robosat_ray.functions.hashing import hash_bucket

    def to_days(b: pa.Table) -> pa.Table:
        u = b.column("user_id").to_numpy()
        day = b.column("ts").cast(pa.int64()).to_numpy() // US_PER_DAY
        # in-batch (user, day) dedupe — combiner ahead of the shuffle
        key = np.stack([u, day], axis=1)
        uk = np.unique(key, axis=0)
        return pa.table(
            {
                "rbucket": pa.array(hash_bucket(uk[:, 0], N_RET_BUCKETS)),
                "user_id": pa.array(uk[:, 0]),
                "day": pa.array(uk[:, 1]),
            }
        )

    w = int(window)

    def bucket_deltas(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy(np.int64)
        d = g["day"].to_numpy(np.int64)
        order = np.lexsort((d, u))
        u, d = u[order], d[order]
        # distinct (user, day) then run-merge: a new run starts when the
        # user changes or the gap exceeds the window reach
        keep = np.ones(len(u), dtype=bool)
        keep[1:] = (u[1:] != u[:-1]) | (d[1:] != d[:-1])
        u, d = u[keep], d[keep]
        new_run = np.ones(len(u), dtype=bool)
        new_run[1:] = (u[1:] != u[:-1]) | (d[1:] > d[:-1] + (w - 1))
        run_id = np.cumsum(new_run) - 1
        n_runs = int(run_id[-1]) + 1 if len(run_id) else 0
        starts = d[new_run]
        ends = np.zeros(n_runs, dtype=np.int64)
        np.maximum.at(ends, run_id, d + (w - 1))
        day = np.concatenate([starts, ends + 1])
        delta = np.concatenate(
            [np.ones(n_runs, np.int64), -np.ones(n_runs, np.int64)]
        )
        return pd.DataFrame({"day": day, "delta": delta})

    days_pairs = events_ds.map_batches(to_days, batch_format="pyarrow")
    deltas = (
        days_pairs.groupby("rbucket")
        .map_groups(bucket_deltas, batch_format="pandas")
        .groupby("day")
        .aggregate(Sum("delta", alias_name="d"))
        .to_pandas()  # calendar-bounded: one row per day boundary
    )
    deltas = deltas.sort_values("day").reset_index(drop=True)
    cover_days = deltas["day"].to_numpy(np.int64)
    cover = np.cumsum(deltas["d"].to_numpy(np.int64))

    # days that actually have events (distinct, calendar-bounded)
    event_days = np.sort(
        days_pairs.groupby("day").count().to_pandas()["day"].to_numpy(np.int64)
    )
    pos = np.searchsorted(cover_days, event_days, side="right") - 1
    dau = cover[pos]
    return pd.DataFrame(
        {"day": event_days, "dau7": dau.astype(np.int64)}
    )
