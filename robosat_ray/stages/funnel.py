"""Funnel analysis — the product-analytics staple over the event
stream: how far does each user get through the ordered funnel
signup -> view -> purchase, where each step must happen STRICTLY
after the previous step's matched event and within FUNNEL_HORIZON of
it? The "matched event" is always the EARLIEST qualifying one (the
deterministic greedy matching every funnel tool uses), which is what
makes this a sequential per-user computation rather than three
independent filters.

Spec (mirrored bit-for-bit in oracle.FUNNEL):
- t1 = min ts of 'signup'
- t2 = min ts of 'view'     with t1 < t <= t1 + H
- t3 = min ts of 'purchase' with t2 < t <= t2 + H
- stage = 3 if t3 else 2 if t2 else 1 if t1 else 0; missing times
  are the -1 sentinel (int columns stay hash-exact; no NULL floats)

Scale shape: ONE user_id hash-bucket shuffle; inside a bucket each
step is a vectorized filter + factorized groupby-min + gather (three
passes over the bucket's rows, zero per-user Python). Output is one
row per user.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

FUNNEL_HORIZON_US = 24 * 3600 * 1_000_000
FUNNEL_STEPS = ("signup", "view", "purchase")
N_FUNNEL_BUCKETS = 64


def _step_min(
    g: pd.DataFrame, codes: np.ndarray, n_users: int, step: str, prev: np.ndarray
) -> np.ndarray:
    """min ts of `step` events inside (prev, prev + H] per user code;
    -1 where no event qualifies (or prev itself is -1)."""
    t = g["tus"].to_numpy(np.int64)
    m = (g["event_type"].to_numpy() == step)
    pv = prev[codes]
    m &= (pv >= 0) & (t > pv) & (t <= pv + FUNNEL_HORIZON_US)
    out = np.full(n_users, np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(out, codes[m], t[m])
    out[out == np.iinfo(np.int64).max] = -1
    return out


def _funnel_bucket(group: pd.DataFrame) -> pd.DataFrame:
    codes, users = pd.factorize(group["user_id"], sort=False)
    n = len(users)
    t = group["tus"].to_numpy(np.int64)
    m1 = group["event_type"].to_numpy() == FUNNEL_STEPS[0]
    t1 = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(t1, codes[m1], t[m1])
    t1[t1 == np.iinfo(np.int64).max] = -1
    t2 = _step_min(group, codes, n, FUNNEL_STEPS[1], t1)
    t3 = _step_min(group, codes, n, FUNNEL_STEPS[2], t2)
    stage = (t1 >= 0).astype(np.int64) + (t2 >= 0) + (t3 >= 0)
    return pd.DataFrame(
        {
            "user_id": np.asarray(users, dtype=np.int64),
            "stage": stage,
            "t1_us": t1,
            "t2_us": t2,
            "t3_us": t3,
        }
    )


def funnel(events_ds):
    """-> (user_id, stage, t1_us, t2_us, t3_us), one row per user."""
    from robosat_ray.functions.hashing import hash_bucket

    def tag(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy()
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "event_type": batch.column("event_type"),
                "tus": batch.column("ts").cast(pa.int64()),
                "fbucket": pa.array(hash_bucket(uid, N_FUNNEL_BUCKETS)),
            }
        )

    return (
        events_ds.select_columns(["user_id", "event_type", "ts"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("fbucket")
        .map_groups(_funnel_bucket, batch_format="pandas")
    )
