"""Stream-shaped operators over the `events` log table (ts-ordered,
keyed by user): tumbling windows and per-key running aggregates.

Ray Data has no event-time watermarks; the engine treats the input as
a partitioned log: `groupby(key)` co-locates a key's events, windowing
/ running state is computed over the sorted group (ray guide pattern).
Ordering assumption: within one user, (ts, event_id) is a total order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

HOUR_US = 3_600_000_000


def add_window(batch: pa.Table, window_us: int = HOUR_US) -> pa.Table:
    ts = batch.column("ts").cast(pa.int64()).to_numpy()
    return batch.append_column("window_id", pa.array(ts // window_us))


def tumbling_window_agg(events_ds, window_us: int = HOUR_US):
    """-> (user_id, window_id, n_events, sum_value, max_value): partial
    window assignment in map_batches, algebraic groupby aggregate."""
    from ray.data.aggregate import Count, Max, Sum

    withw = events_ds.map_batches(
        lambda b: add_window(b, window_us), batch_format="pyarrow"
    )
    return withw.groupby(["user_id", "window_id"]).aggregate(
        Count(alias_name="n_events"),
        Sum("value", alias_name="sum_value"),
        Max("value", alias_name="max_value"),
    )


def _running_bucket(group: pd.DataFrame) -> pd.DataFrame:
    """One user-hash bucket: vectorized per-user cumsum/cumcount over
    the (user, ts, event_id)-sorted rows — pandas' C groupby kernels,
    not a Python loop over thousands of single-user groups."""
    g = group.sort_values(["user_id", "ts", "event_id"], kind="stable")
    by = g.groupby("user_id", sort=False)
    g["running_value"] = by["value"].cumsum()
    g["seq"] = by.cumcount().to_numpy() + 1
    return g[["event_id", "user_id", "running_value", "seq"]]


NUM_USER_BUCKETS = 64


def running_totals(events_ds):
    """-> per-event running sum + sequence number within its user's
    ts-ordered stream. Grouped by a compact user-hash bucket (a raw
    user_id groupby makes millions of tiny pandas groups; 64 buckets
    amortize the per-group overhead while the in-bucket kernels stay
    vectorized)."""

    def bucket(b: pa.Table) -> pa.Table:
        u = b.column("user_id").to_numpy()
        return b.append_column(
            "ubucket",
            pa.array(((u.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(NUM_USER_BUCKETS)).astype(np.int64)),
        )

    return (
        events_ds.select_columns(["event_id", "user_id", "ts", "value"])
        .map_batches(bucket, batch_format="pyarrow")
        .groupby("ubucket")
        .map_groups(_running_bucket, batch_format="pandas")
    )
