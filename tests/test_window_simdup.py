"""Window functions + simhash hamming-dup: property tests beyond the
oracle parity sweep (partitioning invariance, banded == brute force)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from robosat_ray.stages.neardup import (
    SIMHASH_MAX_HAMMING,
    popcount64,
    simhash_dup_pairs,
    simhash_table,
)
from robosat_ray.stages.window import window_functions

SF = "/root/testdata/sf0.001"


def test_popcount64_matches_python():
    rng = np.random.default_rng(7)
    xs = rng.integers(0, 2**63, size=1000, dtype=np.int64).astype(np.uint64)
    got = popcount64(xs)
    want = np.array([bin(int(x)).count("1") for x in xs])
    assert (got == want).all()


def test_simhash_dup_equals_bruteforce():
    """Banded pigeonhole plan == quadratic scan (exactness, not
    approximation) on the real corpus."""
    docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    got = (
        simhash_dup_pairs(docs)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    sh = simhash_table(docs).to_pandas()
    ids = sh["doc_id"].to_numpy()
    hs = sh["simhash"].to_numpy().astype(np.uint64)
    ii, jj = np.triu_indices(len(ids), k=1)
    h = popcount64(hs[ii] ^ hs[jj])
    keep = h <= SIMHASH_MAX_HAMMING
    want = (
        pd.DataFrame(
            {
                "doc_a": np.minimum(ids[ii[keep]], ids[jj[keep]]),
                "doc_b": np.maximum(ids[ii[keep]], ids[jj[keep]]),
                "hamming": h[keep],
            }
        )
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype(np.int64), want.astype(np.int64))


@pytest.mark.parametrize("nparts", [1, 7])
def test_window_functions_partitioning_invariant(nparts):
    """Same result whatever the input block structure (the co-partition
    groupby must be the only ordering authority)."""
    ev = ray.data.read_parquet(
        f"{SF}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    ).repartition(nparts)
    out = (
        window_functions(ev)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # invariants: rn is 1..n_user contiguous, roll3 of first row = value
    by = out.groupby("user_id")
    assert (by["rn"].min() == 1).all()
    assert (by["rn"].max() == by["rn"].count()).all()
    first = out[out["rn"] == 1]
    assert (first["lag_vmicro"] == 0).all()
    if not hasattr(test_window_functions_partitioning_invariant, "_ref"):
        test_window_functions_partitioning_invariant._ref = out
    else:
        pd.testing.assert_frame_equal(
            test_window_functions_partitioning_invariant._ref, out
        )


def test_window_rank_ties():
    """RANK (method=min with gaps) semantics on a constructed tie."""
    ev = ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4], pa.int64()),
                "user_id": pa.array([5, 5, 5, 5], pa.int64()),
                "ts": pa.array([10, 20, 30, 40], pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "value": pa.array([2.0, 2.0, 1.0, 3.0]),
            }
        )
    )
    out = window_functions(ev).to_pandas().sort_values("event_id")
    assert out["value_rank"].tolist() == [2, 2, 4, 1]
    assert out["roll3_vmicro"].tolist() == [2000000, 4000000, 5000000, 6000000]
    assert out["lead_vmicro"].tolist() == [2000000, 1000000, 3000000, 0]


def test_window_functions_randomized_vs_pandas(ray_session):
    """Randomized cross-check of the ordered window functions against
    pandas groupby transforms, on data dense with (user, ts) ties and
    duplicate vmicro values (RANK tie semantics)."""
    import ray.data

    from robosat_ray.stages.window import window_functions

    rng = np.random.default_rng(11)
    n = 3000
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(
                rng.integers(0, 400, n).astype("datetime64[s]").astype("datetime64[us]")
            ),
            "user_id": pa.array(rng.integers(0, 25, n).astype(np.int64)),
            "value": pa.array(rng.integers(0, 8, n).astype(np.float64) / 4.0),
        }
    )
    got = (
        window_functions(ray.data.from_arrow(tbl).repartition(4))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )

    df = tbl.to_pandas()
    df["ts_us"] = df["ts"].astype("int64")
    df["vmicro"] = np.floor(df["value"].to_numpy() * 1e6 + 0.5).astype(np.int64)
    df = df.sort_values(["user_id", "ts_us", "event_id"]).reset_index(drop=True)
    g = df.groupby("user_id", sort=False)
    df["rn"] = g.cumcount() + 1
    df["lag_vmicro"] = g["vmicro"].shift(1).fillna(0).astype(np.int64)
    df["lead_vmicro"] = g["vmicro"].shift(-1).fillna(0).astype(np.int64)
    df["roll3_vmicro"] = (
        g["vmicro"].rolling(3, min_periods=1).sum().reset_index(drop=True).astype(np.int64)
    )
    df["value_rank"] = (
        df.groupby("user_id")["vmicro"].rank(method="min", ascending=False).astype(np.int64)
    )
    exp = df.sort_values("event_id").reset_index(drop=True)
    for col in ("rn", "lag_vmicro", "lead_vmicro", "roll3_vmicro", "value_rank"):
        assert (got[col].to_numpy() == exp[col].to_numpy()).all(), col


def test_simdup_run_cap_truncates_to_smallest_ids():
    """An equal-band run longer than the cap TRUNCATES to the run's
    smallest doc_ids (the oracle's QUALIFY rule) instead of dropping
    every pair in the run."""
    # 6 identical texts -> identical simhash -> one run of 6 per band;
    # cap 4 keeps doc_ids {1,2,3,4} -> C(4,2)=6 pairs at hamming 0
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(1, 7, dtype=np.int64)),
            "text": pa.array(["the same doc text here"] * 6),
        }
    )
    got = (
        simhash_dup_pairs(ray.data.from_arrow(t), run_cap=4)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    ii, jj = np.triu_indices(4, k=1)
    want = pd.DataFrame(
        {
            "doc_a": (ii + 1).astype(np.int64),
            "doc_b": (jj + 1).astype(np.int64),
            "hamming": np.zeros(len(ii), dtype=np.int64),
        }
    ).sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype(np.int64), want)
