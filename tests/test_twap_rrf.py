"""TWAP (stages/events.twap) + RRF fusion (stages/rank.rrf_fusion)."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _ev(rows):
    import ray.data

    e, u, t, v = zip(*rows)
    return ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array(np.asarray(e, np.int64)),
                "user_id": pa.array(np.asarray(u, np.int64)),
                "ts": pa.array(np.asarray(t, np.int64)).cast(pa.timestamp("us")),
                "value": pa.array(np.asarray(v, np.float64)),
            }
        )
    )


def _twap(rows, blocks=None):
    from robosat_ray.stages.events import twap

    ds = _ev(rows)
    if blocks:
        ds = ds.repartition(blocks)
    return twap(ds).to_pandas().sort_values("user_id").reset_index(drop=True)


def test_twap_locf_integral(ray_session):
    # value 10.00 held for 3 us, then 20.00 held for 1 us, then a last
    # event (no weight): num = 3*1000 + 1*2000 = 5000, den = 4
    rows = [(0, 1, 0, 10.0), (1, 1, 3, 20.0), (2, 1, 4, 99.0)]
    out = _twap(rows)
    assert out.twap_num.tolist() == [5000]
    assert out.twap_den.tolist() == [4]
    assert out.n_events.tolist() == [3]


def test_twap_single_event_zero(ray_session):
    out = _twap([(0, 9, 100, 50.0)])
    assert out.twap_num.tolist() == [0]
    assert out.twap_den.tolist() == [0]
    assert out.n_events.tolist() == [1]


def test_twap_equal_ts_ties_are_weightless(ray_session):
    # two events at the same ts: whichever orders first gets dt = 0,
    # so the sums are tie-order-independent
    rows = [(0, 2, 0, 10.0), (1, 2, 0, 70.0), (2, 2, 5, 30.0)]
    out = _twap(rows)
    # dt chain: 0 (tie), 5, last 0 -> num = 5 * 7000, den = 5
    assert out.twap_num.tolist() == [35000]
    assert out.twap_den.tolist() == [5]


def test_twap_partition_invariance(ray_session):
    rng = np.random.default_rng(21)
    rows = [
        (i, int(rng.integers(0, 6)), int(rng.integers(0, 10**7)), float(rng.uniform(0, 100)))
        for i in range(400)
    ]
    a = _twap(rows)
    b = _twap(rows, blocks=9)
    pd.testing.assert_frame_equal(a, b)


def _docs(rows, blocks=None):
    import ray.data

    ids, texts = zip(*rows)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.asarray(ids, np.int64)),
                "text": pa.array(texts, pa.string()),
                "n_chars": pa.array(
                    np.asarray([len(t) for t in texts], np.int64)
                ),
            }
        )
    )
    return ds.repartition(blocks) if blocks else ds


def test_rrf_fuses_both_signals(ray_session):
    from robosat_ray.stages.rank import rrf_fusion

    # doc 0: best quality (all alpha) but shortest; doc 2: worst
    # quality but longest; doc 1: middle on both. 1/(k+r) is convex,
    # so the symmetric extremes tie ABOVE the middle doc (rank sets
    # {1,3} vs {2,2}) and doc_id breaks the tie -> order 0, 2, 1
    rows = [
        (0, "abcdefgh"),
        (1, "abcd 12 " * 4),
        (2, "1234 56781234 5678" * 4),
    ]
    out = rrf_fusion(_docs(rows), top=3)
    assert out.doc_id.tolist() == [0, 2, 1]
    assert out.rrf.iloc[0] == out.rrf.iloc[1]
    # rrf consistency: rrf == scale//(60+rq) + scale//(60+rl)
    for _, r in out.iterrows():
        assert r.rrf == 10**9 // (60 + r.rank_q) + 10**9 // (60 + r.rank_l)


def test_rrf_partition_invariance_and_cut(ray_session):
    from robosat_ray.stages.rank import rrf_fusion

    rng = np.random.default_rng(31)
    rows = []
    for i in range(200):
        n_alpha = int(rng.integers(1, 30))
        n_dig = int(rng.integers(1, 30))
        rows.append((i, "a" * n_alpha + "1" * n_dig))
    a = rrf_fusion(_docs(rows), top=20)
    b = rrf_fusion(_docs(rows, blocks=11), top=20)
    assert len(a) == 20
    pd.testing.assert_frame_equal(a, b)
