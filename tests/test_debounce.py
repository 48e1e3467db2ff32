"""Chain-rule debounce: frontier scan semantics and invariances
beyond the oracle parity sweep."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from robosat_ray.stages.debounce import (
    DEBOUNCE_GAP_US,
    _frontier_debounce,
    debounce_counts,
)

S = 1_000_000  # 1 s in us


def test_chain_rule_not_lag_filter():
    """Events at t=0,30,70 s: a LAG-vs-previous-event filter keeps
    only t=0 (70 is just 40 s after 30); the chain rule keeps t=0 AND
    t=70 (70 s since the last KEPT event). This is the semantic the
    oracle's recursive CTE encodes."""
    ts = np.array([0, 30 * S, 70 * S], dtype=np.int64)
    gidx = np.zeros(3, dtype=np.int64)
    kept = _frontier_debounce(ts, gidx)
    assert kept.tolist() == [True, False, True]


def test_exact_gap_boundary_kept():
    """An event exactly DEBOUNCE_GAP after the last kept one is kept
    (>= semantics, mirrored by the oracle's tus >= k.tus + gap)."""
    ts = np.array([0, DEBOUNCE_GAP_US - 1, DEBOUNCE_GAP_US], dtype=np.int64)
    kept = _frontier_debounce(ts, np.zeros(3, dtype=np.int64))
    assert kept.tolist() == [True, False, True]


def test_groups_are_independent():
    """Frontiers of different keys never interact even when their
    timestamps interleave."""
    # key 0: 0, 10s, 61s ; key 1: 5s, 64s, 65s (65-5 = exactly the gap)
    ts = np.array([0, 10 * S, 61 * S, 5 * S, 64 * S, 65 * S], dtype=np.int64)
    gidx = np.array([0, 0, 0, 1, 1, 1], dtype=np.int64)
    kept = _frontier_debounce(ts, gidx)
    assert kept.tolist() == [True, False, True, True, False, True]


def test_frontier_equals_python_loop():
    """Vectorized frontier == the obvious per-event Python scan on a
    random workload (many keys, dense ties)."""
    rng = np.random.default_rng(42)
    rows = []
    for g in range(40):
        n = int(rng.integers(1, 120))
        t = np.sort(rng.integers(0, 900 * S, size=n))
        rows.append((np.full(n, g, dtype=np.int64), t.astype(np.int64)))
    gidx = np.concatenate([r[0] for r in rows])
    ts = np.concatenate([r[1] for r in rows])
    got = _frontier_debounce(ts, gidx)

    want = np.zeros(len(ts), dtype=bool)
    last: dict[int, int] = {}
    for i in range(len(ts)):
        g = int(gidx[i])
        if g not in last or ts[i] >= last[g] + DEBOUNCE_GAP_US:
            want[i] = True
            last[g] = int(ts[i])
    assert (got == want).all()


def test_partition_invariance(ray_session):
    """Output is identical regardless of input block layout (the
    bucket shuffle owns co-location, not the reader)."""
    n = 3000
    rng = np.random.default_rng(7)
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(rng.integers(0, 60, size=n).astype(np.int64)),
            "event_type": pa.array(
                np.array(["a", "b", "c"])[rng.integers(0, 3, size=n)]
            ),
            "ts": pa.array(
                rng.integers(0, 7200 * S, size=n).astype("datetime64[us]")
            ),
        }
    )
    cols = ["user_id", "event_type", "n_events", "n_kept", "kept_id_sum"]

    def run(ds):
        df = debounce_counts(ds).to_pandas()
        return df[cols].sort_values(cols[:2]).reset_index(drop=True)

    a = run(ray.data.from_arrow(tbl))
    b = run(ray.data.from_arrow(tbl).repartition(13))
    pd.testing.assert_frame_equal(a, b)
