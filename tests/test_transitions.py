"""Same-session event transitions (stages/events.event_transitions)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from robosat_ray.stages.events import SESSION_GAP_US, event_transitions


def _ds(rows, blocks=None):
    import ray.data

    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts_us", "event_type"])
    t = pa.table(
        {
            "event_id": pa.array(df.event_id.to_numpy(np.int64)),
            "user_id": pa.array(df.user_id.to_numpy(np.int64)),
            "ts": pa.array(df.ts_us.to_numpy(np.int64)).cast(pa.timestamp("us")),
            "event_type": pa.array(df.event_type, pa.string()),
        }
    )
    ds = ray.data.from_arrow(t)
    return ds.repartition(blocks) if blocks else ds


def test_session_gap_cuts_chains(ray_session):
    g = SESSION_GAP_US
    rows = [
        # user 1: a->b within session, then a gap >= g breaks, then c->a
        (1, 1, 0, "a"),
        (2, 1, 1000, "b"),
        (3, 1, 1000 + g, "c"),  # exactly the gap: break (>= rule)
        (4, 1, 1000 + g + 5, "a"),
        # user 2: single event, no transitions
        (5, 2, 0, "a"),
    ]
    got = event_transitions(_ds(rows)).to_pandas()
    got = got.sort_values(["from_type", "to_type"]).reset_index(drop=True)
    want = pd.DataFrame(
        {"from_type": ["a", "c"], "to_type": ["b", "a"], "n": [1, 1]}
    )
    pd.testing.assert_frame_equal(got.astype({"n": np.int64}), want.astype({"n": np.int64}))


def test_ties_ordered_by_event_id(ray_session):
    # equal timestamps: order is event_id asc, so chain is a->b->c
    rows = [(3, 1, 0, "c"), (1, 1, 0, "a"), (2, 1, 0, "b")]
    got = event_transitions(_ds(rows)).to_pandas()
    got = got.sort_values(["from_type", "to_type"]).reset_index(drop=True)
    assert list(zip(got.from_type, got.to_type)) == [("a", "b"), ("b", "c")]


def test_partition_invariance(ray_session):
    rng = np.random.default_rng(7)
    n = 3000
    rows = list(
        zip(
            range(n),
            rng.integers(0, 40, n),
            rng.integers(0, SESSION_GAP_US * 3, n),
            rng.choice(["x", "y", "z"], n),
        )
    )
    a = (
        event_transitions(_ds(rows))
        .to_pandas()
        .sort_values(["from_type", "to_type"])
        .reset_index(drop=True)
    )
    b = (
        event_transitions(_ds(rows, blocks=11))
        .to_pandas()
        .sort_values(["from_type", "to_type"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
