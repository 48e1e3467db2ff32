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


def _running(group: pd.DataFrame) -> pd.DataFrame:
    g = group.sort_values(["ts", "event_id"], kind="stable")
    g["running_value"] = g["value"].cumsum()
    g["seq"] = np.arange(1, len(g) + 1, dtype=np.int64)
    return g[["event_id", "user_id", "running_value", "seq"]]


def running_totals(events_ds):
    """-> per-event running sum + sequence number within its user's
    ts-ordered stream (the sorted-group window pattern)."""
    return events_ds.select_columns(["event_id", "user_id", "ts", "value"]).groupby(
        "user_id"
    ).map_groups(_running, batch_format="pandas")
