"""Generic join operators vs pandas merge ground truth."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from robosat_ray.stages.join import broadcast_join, copartition_join


def _mk(rng, n, key_lo, key_hi, cols):
    d = {"k": rng.integers(key_lo, key_hi, n)}
    for c in cols:
        d[c] = rng.integers(0, 1000, n)
    return pd.DataFrame(d)


def _sorted(df):
    cols = sorted(df.columns)
    return df[cols].sort_values(cols, kind="stable").reset_index(drop=True)


def test_broadcast_join_inner_and_left():
    rng = np.random.default_rng(5)
    left = _mk(rng, 500, 0, 60, ["lv"])
    # right: unique keys (lookup-table shape)
    rk = rng.permutation(60)[:40]
    right = pd.DataFrame({"k": rk, "rv": rng.integers(0, 1000, len(rk))})
    lds = ray.data.from_pandas(left).repartition(7)
    rds = ray.data.from_pandas(right)

    got_i = _sorted(broadcast_join(lds, rds, on="k", how="inner").to_pandas())
    want_i = _sorted(left.merge(right, on="k", how="inner"))
    pd.testing.assert_frame_equal(got_i.astype(np.int64), want_i.astype(np.int64))

    got_l = _sorted(broadcast_join(lds, rds, on="k", how="left").to_pandas())
    want_l = _sorted(left.merge(right, on="k", how="left"))
    # unmatched right values are null on both sides
    assert got_l["rv"].isna().sum() == want_l["rv"].isna().sum()
    pd.testing.assert_frame_equal(
        got_l.astype({"k": np.int64, "lv": np.int64, "rv": np.float64}),
        want_l.astype({"k": np.int64, "lv": np.int64, "rv": np.float64}),
    )


def test_copartition_join_matches_pandas():
    rng = np.random.default_rng(6)
    left = _mk(rng, 800, 0, 100, ["lv"])
    right = _mk(rng, 300, 50, 150, ["rv"])  # duplicate keys both sides
    lds = ray.data.from_pandas(left).repartition(5)
    rds = ray.data.from_pandas(right).repartition(3)

    got = _sorted(copartition_join(lds, rds, on="k", how="inner").to_pandas())
    want = _sorted(left.merge(right, on="k", how="inner"))
    pd.testing.assert_frame_equal(got.astype(np.int64), want.astype(np.int64))


def test_copartition_join_left_outer():
    rng = np.random.default_rng(7)
    left = _mk(rng, 300, 0, 50, ["lv"])
    right = _mk(rng, 100, 25, 75, ["rv"])
    lds = ray.data.from_pandas(left).repartition(4)
    rds = ray.data.from_pandas(right).repartition(2)

    got = _sorted(copartition_join(lds, rds, on="k", how="left").to_pandas())
    want = _sorted(left.merge(right, on="k", how="left"))
    assert got["rv"].isna().sum() == want["rv"].isna().sum()
    pd.testing.assert_frame_equal(
        got.astype({"k": np.int64, "lv": np.int64, "rv": np.float64}),
        want.astype({"k": np.int64, "lv": np.int64, "rv": np.float64}),
    )


def test_copartition_join_schema_hints():
    """Hinted schemas bypass Dataset.schema() sampling entirely."""
    rng = np.random.default_rng(8)
    left = _mk(rng, 200, 0, 30, ["lv"])
    right = _mk(rng, 80, 0, 30, ["rv"])
    lds = ray.data.from_pandas(left)
    rds = ray.data.from_pandas(right)
    hints = {
        "left": {"k": pa.int64(), "lv": pa.int64()},
        "right": {"k": pa.int64(), "rv": pa.int64()},
    }
    got = _sorted(
        copartition_join(lds, rds, on="k", how="inner", schema_hints=hints).to_pandas()
    )
    want = _sorted(left.merge(right, on="k", how="inner"))
    pd.testing.assert_frame_equal(got.astype(np.int64), want.astype(np.int64))


def test_broadcast_join_empty_right():
    rng = np.random.default_rng(9)
    left = _mk(rng, 50, 0, 10, ["lv"])
    right = pd.DataFrame({"k": pd.Series([], dtype=np.int64), "rv": pd.Series([], dtype=np.int64)})
    lds = ray.data.from_pandas(left)
    rds = ray.data.from_pandas(right)
    got_l = broadcast_join(lds, rds, on="k", how="left").to_pandas()
    assert len(got_l) == len(left) and got_l["rv"].isna().all()
    got_i = broadcast_join(lds, rds, on="k", how="inner").to_pandas()
    assert len(got_i) == 0


def test_semi_anti_join_both_strategies():
    from robosat_ray.stages.join import broadcast_semi_join, copartition_semi_join

    rng = np.random.default_rng(12)
    left = _mk(rng, 600, 0, 80, ["lv", "lw"])
    right = _mk(rng, 150, 40, 120, ["rv"])  # duplicate right keys
    member = left["k"].isin(set(right["k"]))
    want_semi = _sorted(left[member])
    want_anti = _sorted(left[~member])
    lds = ray.data.from_pandas(left).repartition(5)
    rds = ray.data.from_pandas(right).repartition(3)
    hints = {"left": {"k": pa.int64(), "lv": pa.int64(), "lw": pa.int64()}}

    for got, want in [
        (broadcast_semi_join(lds, rds, on="k"), want_semi),
        (broadcast_semi_join(lds, rds, on="k", anti=True), want_anti),
        (copartition_semi_join(lds, rds, on="k", schema_hints=hints), want_semi),
        (copartition_semi_join(lds, rds, on="k", anti=True, schema_hints=hints), want_anti),
    ]:
        pd.testing.assert_frame_equal(
            _sorted(got.to_pandas()), want, check_dtype=False
        )


def test_semi_join_empty_right():
    from robosat_ray.stages.join import broadcast_semi_join

    rng = np.random.default_rng(13)
    left = _mk(rng, 40, 0, 10, ["lv"])
    right = pd.DataFrame({"k": pd.Series([], dtype=np.int64)})
    lds = ray.data.from_pandas(left)
    rds = ray.data.from_pandas(right)
    assert broadcast_semi_join(lds, rds, on="k").count() == 0
    got = broadcast_semi_join(lds, rds, on="k", anti=True).to_pandas()
    pd.testing.assert_frame_equal(_sorted(got), _sorted(left), check_dtype=False)


def test_auto_join_both_strategies_match_pandas():
    from robosat_ray.stages.join import auto_join

    rng = np.random.default_rng(11)
    left = _mk(rng, 400, 0, 50, ["lv"])
    right = _mk(rng, 120, 0, 50, ["rv"])
    want = _sorted(left.merge(right, on="k", how="inner"))
    lds = ray.data.from_pandas(left).repartition(5)
    rds = ray.data.from_pandas(right).repartition(3)
    # right fits under the limit -> broadcast branch
    got_b = _sorted(auto_join(lds, rds, on="k", broadcast_limit=1000).to_pandas())
    pd.testing.assert_frame_equal(got_b, want, check_dtype=False)
    # limit forced below the right size -> co-partition branch
    hints = {
        "left": {"k": pa.int64(), "lv": pa.int64()},
        "right": {"k": pa.int64(), "rv": pa.int64()},
    }
    got_c = _sorted(
        auto_join(lds, rds, on="k", broadcast_limit=10, schema_hints=hints).to_pandas()
    )
    pd.testing.assert_frame_equal(got_c, want, check_dtype=False)


def test_string_key_joins_both_strategies():
    from robosat_ray.stages.join import (
        broadcast_join,
        broadcast_semi_join,
        copartition_join,
        copartition_semi_join,
    )

    rng = np.random.default_rng(21)
    keys = np.array([f"url-{i:04d}" for i in range(80)])
    left = pd.DataFrame(
        {"k": rng.choice(keys, 500), "lv": rng.integers(0, 1000, 500)}
    )
    # duplicate string keys on the right: many-to-many
    right = pd.DataFrame(
        {"k": rng.choice(keys[40:], 120), "rv": rng.integers(0, 1000, 120)}
    )
    want = _sorted(left.merge(right, on="k", how="inner"))
    member = left["k"].isin(set(right["k"]))
    lds = ray.data.from_pandas(left).repartition(5)
    rds = ray.data.from_pandas(right).repartition(3)
    hints = {
        "left": {"k": pa.string(), "lv": pa.int64()},
        "right": {"k": pa.string(), "rv": pa.int64()},
    }
    got_b = _sorted(broadcast_join(lds, rds, on="k", how="inner").to_pandas())
    pd.testing.assert_frame_equal(got_b, want, check_dtype=False)
    got_c = _sorted(
        copartition_join(lds, rds, on="k", schema_hints=hints).to_pandas()
    )
    pd.testing.assert_frame_equal(got_c, want, check_dtype=False)

    want_semi = _sorted(left[member])
    want_anti = _sorted(left[~member])
    shints = {"left": {"k": pa.string(), "lv": pa.int64()}}
    got_s = _sorted(broadcast_semi_join(lds, rds, on="k").to_pandas())
    pd.testing.assert_frame_equal(got_s, want_semi, check_dtype=False)
    got_a = _sorted(
        copartition_semi_join(lds, rds, on="k", anti=True, schema_hints=shints).to_pandas()
    )
    pd.testing.assert_frame_equal(got_a, want_anti, check_dtype=False)


def test_null_keys_never_match():
    """NULL join keys never match (NOT-EXISTS semantics): inner/semi
    drop them, left emits null-extended, anti keeps them — identical
    across both strategies, including a right side holding the literal
    string 'None'."""
    from robosat_ray.stages.join import (
        broadcast_join,
        broadcast_semi_join,
        copartition_join,
        copartition_semi_join,
    )

    left = pd.DataFrame(
        {"k": pd.array(["a", None, "None", "b", None], dtype=object),
         "lv": np.arange(5, dtype=np.int64)}
    )
    right = pd.DataFrame(
        {"k": pd.array(["a", "None", None], dtype=object),
         "rv": np.array([10, 20, 30], dtype=np.int64)}
    )
    lds = ray.data.from_pandas(left)
    rds = ray.data.from_pandas(right)

    got_i = broadcast_join(lds, rds, on="k", how="inner").to_pandas()
    # only 'a' and the literal 'None' string match; null keys don't
    assert sorted(got_i["k"]) == ["None", "a"]
    got_l = broadcast_join(lds, rds, on="k", how="left").to_pandas()
    assert len(got_l) == 5
    assert got_l.loc[got_l["k"].isna(), "rv"].isna().all()

    hints = {
        "left": {"k": pa.string(), "lv": pa.int64()},
        "right": {"k": pa.string(), "rv": pa.int64()},
    }
    got_ci = copartition_join(lds, rds, on="k", schema_hints=hints).to_pandas()
    assert sorted(got_ci["k"]) == ["None", "a"]

    semi = broadcast_semi_join(lds, rds, on="k").to_pandas()
    assert sorted(semi["k"]) == ["None", "a"]
    anti = broadcast_semi_join(lds, rds, on="k", anti=True).to_pandas()
    assert len(anti) == 3 and anti["k"].isna().sum() == 2
    shints = {"left": {"k": pa.string(), "lv": pa.int64()}}
    canti = copartition_semi_join(
        lds, rds, on="k", anti=True, schema_hints=shints
    ).to_pandas()
    assert len(canti) == 3 and canti["k"].isna().sum() == 2


def test_long_outlier_string_key():
    """A single very long key must not blow up the fixed-width unicode
    conversion (falls back to object dtype) and must still join."""
    from robosat_ray.stages.join import broadcast_join

    long_key = "u" * 5000
    left = pd.DataFrame(
        {"k": [long_key, "short", "other"], "lv": np.arange(3, dtype=np.int64)}
    )
    right = pd.DataFrame({"k": [long_key, "short"], "rv": np.array([1, 2], np.int64)})
    got = broadcast_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right), on="k", how="inner"
    ).to_pandas()
    assert sorted(got["rv"]) == [1, 2]


def test_bloom_no_false_negatives_and_fp_rate():
    from robosat_ray.stages.join import (
        BLOOM_BITS_PER_KEY,
        _bloom_positions,
        bloom_contains,
    )

    rng = np.random.default_rng(0)
    keys = np.unique(rng.integers(0, 2**62, 20000).astype(np.int64))
    m = BLOOM_BITS_PER_KEY * len(keys)
    words = (m + 63) // 64
    arr = np.zeros(words, dtype=np.uint64)
    pos = _bloom_positions(keys, m).ravel()
    np.bitwise_or.at(
        arr, (pos >> np.uint64(6)).astype(np.int64), np.uint64(1) << (pos & np.uint64(63))
    )
    assert bloom_contains(arr, m, keys).all()  # NO false negatives, ever
    probe = rng.integers(0, 2**62, 50000).astype(np.int64)
    novel = probe[~np.isin(probe, keys)]
    fp = bloom_contains(arr, m, novel).mean()
    assert fp < 0.03  # ~1% design point at 10 bits/key, K=7


def test_bloom_semi_join_equals_plain_semi(ray_session):
    import ray.data

    from robosat_ray.stages.join import bloom_semi_join, copartition_semi_join

    rng = np.random.default_rng(1)
    left = pa.table(
        {
            "k": pa.array(rng.integers(0, 3000, 20000).astype(np.int64)),
            "v": pa.array(rng.integers(0, 100, 20000).astype(np.int64)),
        }
    )
    right = pa.table({"k": pa.array(np.arange(0, 3000, 7, dtype=np.int64))})
    lds = ray.data.from_arrow(left).repartition(8)
    rds = ray.data.from_arrow(right).repartition(4)
    hints = {"left": {"k": pa.int64(), "v": pa.int64()}}
    a = bloom_semi_join(lds, rds, on="k", num_bits=10 * 3000, schema_hints=hints).to_pandas()
    b = copartition_semi_join(lds, rds, on="k", schema_hints=hints).to_pandas()
    key = lambda df: sorted(zip(df["k"].astype(int), df["v"].astype(int)))
    assert key(a) == key(b)
    assert len(a) > 0


def test_join_family_randomized_vs_pandas(ray_session):
    """Randomized cross-check of every join strategy against pandas
    merge/isin on 40 seeded frames with duplicate keys, null keys,
    disjoint and overlapping ranges — inner/left x broadcast/
    copartition, plus semi/anti both strategies."""
    import ray.data

    from robosat_ray.stages.join import (
        broadcast_join,
        broadcast_semi_join,
        copartition_join,
        copartition_semi_join,
    )

    rng = np.random.default_rng(42)
    for trial in range(10):
        nl = int(rng.integers(1, 400))
        nr = int(rng.integers(1, 120))
        lk = rng.integers(0, 50, nl).astype(np.float64)
        rk = rng.integers(int(rng.integers(0, 40)), 90, nr).astype(np.float64)
        lk[rng.random(nl) < 0.1] = np.nan  # null keys
        rk[rng.random(nr) < 0.1] = np.nan
        left = pd.DataFrame({"k": pd.array(lk).astype("Int64"), "lv": np.arange(nl, dtype=np.int64)})
        right = pd.DataFrame({"k": pd.array(rk).astype("Int64"), "rv": np.arange(nr, dtype=np.int64)})
        lds = ray.data.from_pandas(left).repartition(3)
        rds = ray.data.from_pandas(right).repartition(2)
        hints = {
            "left": {"k": pa.int64(), "lv": pa.int64()},
            "right": {"k": pa.int64(), "rv": pa.int64()},
        }

        for how in ("inner", "left"):
            want = left.merge(right, on="k", how=how)
            # pandas merge matches null==null; the engine (and SQL)
            # never match null keys — align the expectation
            if how == "inner":
                want = want[want["k"].notna()]
            else:
                matched = left.merge(right[right["k"].notna()], on="k", how="inner")
                unmatched = left[~left["lv"].isin(matched["lv"])].copy()
                unmatched["rv"] = pd.NA
                want = pd.concat([matched, unmatched], ignore_index=True)
            for got in (
                broadcast_join(lds, rds, on="k", how=how).to_pandas(),
                copartition_join(lds, rds, on="k", how=how, schema_hints=hints).to_pandas(),
            ):
                key = lambda df: sorted(
                    (int(r.lv), -1 if pd.isna(r.rv) else int(r.rv))
                    for r in df.itertuples()
                )
                assert key(got) == key(want), (trial, how)

        rvalid = set(right["k"].dropna().astype(int))
        lknum = left["k"]
        member = lknum.notna() & lknum.astype("float").isin(rvalid)
        for anti in (False, True):
            expect = left[(~member if anti else member) | (lknum.isna() & anti)]
            a = broadcast_semi_join(lds, rds, on="k", anti=anti).to_pandas()
            b = copartition_semi_join(
                lds, rds, on="k", anti=anti,
                schema_hints={"left": {"k": pa.int64(), "lv": pa.int64()}},
            ).to_pandas()
            assert sorted(a["lv"]) == sorted(expect["lv"]), (trial, anti)
            assert sorted(b["lv"]) == sorted(expect["lv"]), (trial, anti)


def test_local_supplier_revenue_copartition_path(ray_session, monkeypatch):
    """Lowering the customer broadcast cap must flip the orders⋈customer
    join to the distributed co-partition plan WITHOUT changing the
    result (strategy switch correctness)."""
    import robosat_ray.pipelines.queries as Q

    sf = "/root/testdata/sf0.001"
    base = Q.QUERIES["local_supplier_revenue"](sf).to_pandas()
    monkeypatch.setattr(Q, "CUSTOMER_BROADCAST_ROWS", 0)
    flipped = Q.QUERIES["local_supplier_revenue"](sf).to_pandas()
    cols = sorted(base.columns)
    pd.testing.assert_frame_equal(
        base[cols].sort_values(cols).reset_index(drop=True),
        flipped[cols].sort_values(cols).reset_index(drop=True),
    )


def test_bloom_num_bits_clamped_to_cap(ray_session):
    """A num_bits request above BLOOM_MAX_BITS must clamp (bounded
    broadcast by construction) and still return the exact semi-join
    rows — the filter only prunes, never decides."""
    import ray.data

    from robosat_ray.stages.join import (
        BLOOM_MAX_BITS,
        bloom_semi_join,
        copartition_semi_join,
    )

    rng = np.random.default_rng(3)
    left = pa.table(
        {
            "k": pa.array(rng.integers(0, 500, 4000).astype(np.int64)),
            "v": pa.array(np.arange(4000, dtype=np.int64)),
        }
    )
    right = pa.table({"k": pa.array(np.arange(0, 500, 3, dtype=np.int64))})
    lds = ray.data.from_arrow(left).repartition(4)
    rds = ray.data.from_arrow(right).repartition(2)
    hints = {"left": {"k": pa.int64(), "v": pa.int64()}}
    a = bloom_semi_join(
        lds, rds, on="k", num_bits=BLOOM_MAX_BITS * 64, schema_hints=hints
    ).to_pandas()
    b = copartition_semi_join(lds, rds, on="k", schema_hints=hints).to_pandas()
    key = lambda df: sorted(zip(df["k"].astype(int), df["v"].astype(int)))
    assert key(a) == key(b) and len(a) > 0


def test_hot_cell_map_sampled_detection(ray_session):
    """The deterministic 1/mod-sampled hot map finds a genuinely hot
    cell with a k_salt within one of the exact count's, and never
    invents hot cells out of cold ones (cold = well below cap)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from robosat_ray.stages.spatial_join import hot_cell_map

    n_hot, cap = 50_000, 1000
    hot_cell, cold_cells = 7, np.arange(100, 160)
    cells = np.concatenate(
        [np.full(n_hot, hot_cell, np.int64), np.repeat(cold_cells, 20)]
    )
    ids = np.arange(len(cells), dtype=np.int64)
    t = pa.table({"doc_id": pa.array(ids), "cell": pa.array(cells)})
    ds = ray.data.from_arrow(t).repartition(16)
    exact = hot_cell_map(ds, z=12, cap=cap, sample_mod=1)
    sampled = hot_cell_map(ds, z=12, cap=cap)  # auto mod = cap//256 = 3
    assert set(exact) == {hot_cell}
    assert set(sampled) == {hot_cell}
    assert abs(sampled[hot_cell] - exact[hot_cell]) <= max(2, exact[hot_cell] // 5)
