"""Per-key ordered window functions over the events log: lag / lead /
row_number / rolling-frame sum / rank — the windowed-aggregate family
Ray Data has no native operator for.

Engine shape (same co-partition pattern as events.asof_join /
running_totals): one hash-bucket groupby co-locates each user's rows,
then every window column is computed with pandas' C groupby kernels
(shift / cumcount / cumsum / rank) over the (user, ts, event_id)-sorted
bucket — no per-user Python loop, one shuffle total. Values are
quantized to integer micro-units per row (floor(v*1e6 + 0.5), the
identical IEEE expression the SQL oracle states) so frame sums are
exact int64 arithmetic, order-free across partitionings.

Scale note: buckets are NUM_USER_BUCKETS hash groups, not raw user_id
groups — millions of single-user pandas groups would pay per-group
overhead; 64 buckets amortize it while in-bucket kernels stay
vectorized (same trade documented in events.running_totals).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from robosat_ray.functions.hashing import hash_bucket

NUM_USER_BUCKETS = 64


def _window_bucket(group: pd.DataFrame) -> pd.DataFrame:
    """One user-hash bucket: all window columns in vectorized pandas.

    Frame/order spec mirrored by the oracle:
      w = PARTITION BY user_id ORDER BY ts, event_id
      rn           = ROW_NUMBER() OVER w
      lag_vmicro   = LAG(vmicro, 1, 0)  OVER w
      lead_vmicro  = LEAD(vmicro, 1, 0) OVER w
      roll3_vmicro = SUM(vmicro) OVER (w ROWS BETWEEN 2 PRECEDING
                                       AND CURRENT ROW)
      value_rank   = RANK() OVER (PARTITION BY user_id
                                  ORDER BY vmicro DESC)
    """
    g = group.sort_values(["user_id", "ts", "event_id"], kind="stable").copy()
    by = g.groupby("user_id", sort=False)
    g["rn"] = by.cumcount().to_numpy() + 1
    g["lag_vmicro"] = by["vmicro"].shift(1, fill_value=0)
    g["lead_vmicro"] = by["vmicro"].shift(-1, fill_value=0)
    # rolling 3-row frame sum = cumsum - cumsum shifted by 3 (per user)
    g["_cs"] = by["vmicro"].cumsum()
    by2 = g.groupby("user_id", sort=False)
    g["roll3_vmicro"] = g["_cs"] - by2["_cs"].shift(3, fill_value=0)
    g["value_rank"] = (
        by2["vmicro"].rank(method="min", ascending=False).astype(np.int64)
    )
    out = g[
        [
            "event_id",
            "user_id",
            "rn",
            "lag_vmicro",
            "lead_vmicro",
            "roll3_vmicro",
            "value_rank",
        ]
    ]
    return out.astype(
        {c: np.int64 for c in out.columns}
    )


def window_functions(events_ds):
    """-> Dataset (event_id, user_id, rn, lag_vmicro, lead_vmicro,
    roll3_vmicro, value_rank): ordered window functions within each
    user's (ts, event_id)-ordered event stream."""

    def prep(b: pa.Table) -> pa.Table:
        u = b.column("user_id").to_numpy()
        v = b.column("value").to_numpy()
        # identical IEEE expr as the oracle's CAST(floor(value*1e6+0.5))
        vmicro = np.floor(v * 1e6 + 0.5).astype(np.int64)
        ts = b.column("ts").cast(pa.int64())
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "user_id": b.column("user_id"),
                "ts": ts,
                "vmicro": pa.array(vmicro),
                "ubucket": pa.array(hash_bucket(u, NUM_USER_BUCKETS)),
            }
        )

    return (
        events_ds.select_columns(["event_id", "user_id", "ts", "value"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("ubucket")
        .map_groups(_window_bucket, batch_format="pandas")
    )
