"""Interval union (stages/events.interval_union) + edit-distance
near-dup (stages/neardup.edit_dup_pairs_ds) + top_supplier ties."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _ev(rows):
    """rows: (user_id, ts_us, value_seconds)"""
    import ray.data

    u, t, v = zip(*rows)
    return ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array(np.asarray(u, np.int64)),
                "ts": pa.array(np.asarray(t, np.int64)).cast(pa.timestamp("us")),
                "value": pa.array(np.asarray(v, np.float64)),
            }
        )
    )


def _run(rows, blocks=None):
    from robosat_ray.stages.events import interval_union

    ds = _ev(rows)
    if blocks:
        ds = ds.repartition(blocks)
    return (
        interval_union(ds).to_pandas().sort_values("user_id").reset_index(drop=True)
    )


def test_overlap_merges_and_gap_splits(ray_session):
    # user 1: [0, 5s) and [3s, 4s) (contained) and [10s, 11s) -> 2 islands,
    # covered = 5s + 1s
    out = _run([(1, 0, 5.0), (1, 3_000_000, 1.0), (1, 10_000_000, 1.0)])
    assert out.n_islands.tolist() == [2]
    assert out.covered_micro.tolist() == [6_000_000]


def test_running_max_not_prev_row(ray_session):
    # a long first interval swallows a short middle one; the third
    # starts after the SHORT one ends but inside the LONG one -> all
    # one island (prev-row logic would wrongly split)
    out = _run([(7, 0, 10.0), (7, 1_000_000, 1.0), (7, 5_000_000, 1.0)])
    assert out.n_islands.tolist() == [1]
    assert out.covered_micro.tolist() == [10_000_000]


def test_zero_duration_island(ray_session):
    # zero / negative durations clamp to empty [s, s): an isolated one
    # is its own zero-length island
    out = _run([(2, 0, 0.0), (2, 10_000_000, -3.0)])
    assert out.n_islands.tolist() == [2]
    assert out.covered_micro.tolist() == [0]


def test_interval_partition_invariance(ray_session):
    rng = np.random.default_rng(7)
    rows = [
        (int(rng.integers(0, 9)), int(rng.integers(0, 50_000_000)), float(rng.uniform(0, 8)))
        for _ in range(300)
    ]
    a = _run(rows)
    b = _run(rows, blocks=13)
    pd.testing.assert_frame_equal(a, b)


def _docs(rows, blocks=None):
    import ray.data

    ids, langs, texts = zip(*rows)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.asarray(ids, np.int64)),
                "lang": pa.array(langs, pa.string()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    return ds.repartition(blocks) if blocks else ds


def _pairs(rows, **kw):
    from robosat_ray.stages.neardup import edit_dup_pairs_ds

    out = edit_dup_pairs_ds(_docs(rows, **kw)).to_pandas()
    if len(out) == 0:
        return []
    out = out.sort_values(["a", "b"]).reset_index(drop=True)
    return list(zip(out.a, out.b, out.dist))


def test_edit_dup_exact_distance(ray_session):
    base = "aaaabbbb" + "x" * 40
    edit2 = "aaaabbbb" + "x" * 38 + "yy"  # 2 substitutions
    far = "aaaabbbb" + "z" * 40  # 40 substitutions
    assert _pairs([(1, "en", base), (2, "en", edit2), (3, "en", far)]) == [(1, 2, 2)]


def test_edit_dup_blocks_isolate(ray_session):
    t = "prefix00" + "q" * 30
    # same text, different lang or different prefix -> no pair
    assert _pairs([(1, "en", t), (2, "de", t), (3, "en", "prefix01" + "q" * 30)]) == []


def test_edit_dup_insertion_vs_deletion(ray_session):
    a = "zzzzyyyy" + "m" * 20
    b = "zzzzyyyy" + "m" * 23  # 3 insertions
    assert _pairs([(4, "en", a), (5, "en", b)]) == [(4, 5, 3)]


def test_edit_dup_partition_invariance(ray_session):
    rng = np.random.default_rng(11)
    bases = ["".join(rng.choice(list("abcdef"), size=40)) for _ in range(5)]
    rows = []
    for i in range(120):
        body = list(bases[i % 5])
        # mutate 0-12 positions: some pairs land under the distance
        # cutoff, some over
        for p in rng.choice(40, size=int(rng.integers(0, 13)), replace=False):
            body[p] = "z"
        rows.append((i, "en", f"blk{i % 5:05d}" + "".join(body)))
    a = _pairs(rows)
    b = _pairs(rows, blocks=9)
    assert len(a) > 0
    assert a == b


def test_top_supplier_keeps_ties(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from robosat_ray.pipelines.queries import q_top_supplier

    d = str(tmp_path)
    ship = np.datetime64("1996-02-01").astype("datetime64[us]").astype(np.int64)
    out_of_range = np.datetime64("1995-06-01").astype("datetime64[us]").astype(np.int64)
    pq.write_table(
        pa.table(
            {
                "l_suppkey": pa.array(np.array([1, 2, 2, 3, 1], np.int64)),
                "l_extendedprice": pa.array([100.0, 60.0, 40.0, 50.0, 999.0]),
                "l_discount": pa.array([0.0, 0.0, 0.0, 0.0, 0.0]),
                "l_shipdate": pa.array(
                    np.array([ship, ship, ship, ship, out_of_range], np.int64)
                ).cast(pa.timestamp("us")),
            }
        ),
        f"{d}/lineitem.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array(np.array([1, 2, 3], np.int64)),
                "s_name": pa.array(["S1", "S2", "S3"], pa.string()),
            }
        ),
        f"{d}/supplier.parquet",
    )
    out = q_top_supplier(d)
    # suppliers 1 and 2 tie at 10000 cents (the 1995 row is excluded)
    assert out.s_suppkey.tolist() == [1, 2]
    assert out.s_name.tolist() == ["S1", "S2"]
    assert out.total_rev_cents.tolist() == [10_000, 10_000]
