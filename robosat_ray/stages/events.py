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

from robosat_ray.functions.hashing import hash_bucket

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
        return b.append_column("ubucket", pa.array(hash_bucket(u, NUM_USER_BUCKETS)))

    return (
        events_ds.select_columns(["event_id", "user_id", "ts", "value"])
        .map_batches(bucket, batch_format="pyarrow")
        .groupby("ubucket")
        .map_groups(_running_bucket, batch_format="pandas")
    )


SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap


def _sessionize_bucket(group: pd.DataFrame, gap_us: int = SESSION_GAP_US) -> pd.DataFrame:
    """One user-hash bucket: vectorized gap-based sessionization over
    the (user, ts, event_id)-sorted rows — pure integer math, no
    per-session Python."""
    g = group.sort_values(["user_id", "ts", "event_id"], kind="stable")
    ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    uid = g["user_id"].to_numpy()
    brk = np.ones(len(g), dtype=bool)
    if len(g) > 1:
        brk[1:] = (uid[1:] != uid[:-1]) | (ts[1:] - ts[:-1] >= gap_us)
    sid = np.cumsum(brk)
    df = pd.DataFrame({"user_id": uid, "ts": ts, "sid": sid})
    out = df.groupby(["user_id", "sid"], sort=False).agg(
        session_start=("ts", "min"),
        session_end=("ts", "max"),
        n_events=("ts", "size"),
    ).reset_index()
    out["duration_us"] = out["session_end"] - out["session_start"]
    return out[["user_id", "session_start", "n_events", "duration_us"]].astype(
        {
            "user_id": np.int64,
            "session_start": np.int64,
            "n_events": np.int64,
            "duration_us": np.int64,
        }
    )


def sessionize(events_ds, gap_us: int = SESSION_GAP_US):
    """Gap-based sessions per user (classic streaming sessionization,
    expressed as a bucketed sorted-group computation): -> (user_id,
    session_start us, n_events, duration_us). All-integer output."""

    def bucket(b: pa.Table) -> pa.Table:
        u = b.column("user_id").to_numpy()
        return b.append_column("ubucket", pa.array(hash_bucket(u, NUM_USER_BUCKETS)))

    return (
        events_ds.select_columns(["event_id", "user_id", "ts"])
        .map_batches(bucket, batch_format="pyarrow")
        .groupby("ubucket")
        .map_groups(lambda g: _sessionize_bucket(g, gap_us), batch_format="pandas")
    )
