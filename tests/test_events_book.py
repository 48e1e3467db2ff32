"""Late-arrival accounting + changelog compaction: semantics on
enumerable streams, partition invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from robosat_ray.stages.events import compact_state, late_events

S = 1_000_000


def _events(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
                "ts": pa.array(
                    np.array([r[3] for r in rows], dtype="datetime64[us]")
                ),
                "value": pa.array([float(r[4]) for r in rows], pa.float64()),
            }
        )
    )


def test_late_semantics(ray_session):
    rows = [
        # user 1: arrivals 0,1,2 with event-times 100s, 50s, 150s
        (0, 1, "a", 100 * S, 0.0),   # first arrival: never late
        (1, 1, "a", 50 * S, 0.0),    # 50 s behind the watermark (100)
        (2, 1, "a", 150 * S, 0.0),   # ahead: late 0
        # user 2: single event
        (3, 2, "a", 10 * S, 0.0),
    ]
    out = (
        late_events(_events(rows).select_columns(["event_id", "user_id", "ts"]))
        .to_pandas()
        .set_index("event_id")
    )
    assert out.loc[0, "late_by_us"] == 0
    assert out.loc[1, "late_by_us"] == 50 * S
    assert out.loc[2, "late_by_us"] == 0
    assert out.loc[3, "late_by_us"] == 0


def test_compact_semantics(ray_session):
    rows = [
        (0, 1, "a", 100 * S, 1.5),
        (1, 1, "a", 200 * S, 2.5),   # latest ts -> the survivor
        (2, 1, "a", 200 * S, 3.5),   # same ts, higher id would win...
        (3, 1, "b", 50 * S, 9.0),
    ]
    out = (
        compact_state(_events(rows))
        .to_pandas()
        .set_index(["user_id", "event_type"])
        .sort_index()
    )
    assert out.loc[(1, "a"), "last_event_id"] == 2  # ts tie -> max id
    assert out.loc[(1, "a"), "last_value_micro"] == 3_500_000
    assert out.loc[(1, "b"), "last_event_id"] == 3


def test_partition_invariance(ray_session):
    rng = np.random.default_rng(31)
    types = np.array(["a", "b", "c"])
    rows = [
        (i, int(rng.integers(0, 50)), str(types[rng.integers(0, 3)]),
         int(rng.integers(0, 10_000 * S)), float(rng.normal()))
        for i in range(4000)
    ]

    def run(fn, ds, key):
        df = fn(ds).to_pandas()
        return df.sort_values(key).reset_index(drop=True)

    a1 = run(late_events, _events(rows).select_columns(["event_id", "user_id", "ts"]), "event_id")
    b1 = run(late_events, _events(rows).repartition(13).select_columns(["event_id", "user_id", "ts"]), "event_id")
    pd.testing.assert_frame_equal(a1, b1)
    a2 = run(compact_state, _events(rows), ["user_id", "event_type"])
    b2 = run(compact_state, _events(rows).repartition(13), ["user_id", "event_type"])
    pd.testing.assert_frame_equal(a2, b2)
