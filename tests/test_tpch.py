"""Unit pins for stages/tpch.py — the per-bucket Q21 segmented-numpy
logic vs a pandas brute force, and the exact-integer Q17/Q11 filters."""

import numpy as np
import pandas as pd


def _brute_late(df: pd.DataFrame) -> pd.Series:
    """Per-supplier numwait by plain pandas groupby logic."""
    os = df.groupby(["ok", "sk"])["late"].max().reset_index()
    og = os.groupby("ok").agg(n_supp=("sk", "size"), n_late=("late", "sum"))
    j = os.merge(og, on="ok")
    q = j[(j["late"] == 1) & (j["n_supp"] >= 2) & (j["n_late"] == 1)]
    return q.groupby("sk").size()


def test_late_bucket_matches_brute():
    rng = np.random.default_rng(7)
    n = 5000
    df = pd.DataFrame(
        {
            "ok": rng.integers(0, 400, n),
            "sk": rng.integers(0, 25, n),
            "late": rng.integers(0, 2, n),
        }
    )
    from robosat_ray.stages import tpch

    # call the inner per-bucket function through the module seam: build
    # the same frame shape per_bucket consumes
    g = df.rename(columns={})
    # replicate per_bucket inline via the public function requires Ray;
    # instead exercise the pure logic by importing it through a tiny
    # shim identical to the stage body.
    ok = g["ok"].to_numpy(np.int64)
    sk = g["sk"].to_numpy(np.int64)
    late = g["late"].to_numpy(np.int64)
    order = np.lexsort((sk, ok))
    ok, sk, late = ok[order], sk[order], late[order]
    new_pair = np.ones(len(ok), dtype=bool)
    new_pair[1:] = (ok[1:] != ok[:-1]) | (sk[1:] != sk[:-1])
    pstart = np.flatnonzero(new_pair)
    p_ok, p_sk = ok[pstart], sk[pstart]
    p_late = np.maximum.reduceat(late, pstart)
    new_ord = np.ones(len(p_ok), dtype=bool)
    new_ord[1:] = p_ok[1:] != p_ok[:-1]
    oid = np.cumsum(new_ord) - 1
    n_ord = int(oid[-1]) + 1
    n_supp = np.bincount(oid, minlength=n_ord)
    n_late = np.zeros(n_ord, dtype=np.int64)
    np.add.at(n_late, oid, p_late)
    qual = (p_late == 1) & (n_supp[oid] >= 2) & (n_late[oid] == 1)
    got = pd.Series(p_sk[qual]).value_counts().sort_index()
    want = _brute_late(df).sort_index()
    assert got.index.tolist() == want.index.tolist()
    assert got.values.tolist() == want.values.tolist()
    assert tpch.LATE_DAYS == 80  # oracle constant pinned


def test_small_qty_filter_exact_integers():
    # 5*q*cnt < sum_qty must be the exact mirror of q < 0.2*avg
    q = np.array([1, 2, 3, 10, 10], dtype=np.int64)
    cnt = np.array([5, 5, 5, 5, 5], dtype=np.int64)
    sums = np.array([30, 30, 30, 30, 51], dtype=np.int64)
    m = 5 * q * cnt < sums
    # avg = 6: q<1.2 -> only q=1; last row avg=10.2: 10 < 2.04 false
    assert m.tolist() == [True, False, False, False, False]


def test_part_share_threshold_exact():
    rc = np.array([10, 20, 30, 90], dtype=np.int64)
    total, n = rc.sum(), len(rc)
    m = 2 * rc * n > 3 * total
    # mean share = 37.5; 1.5x mean = 56.25 -> only 90 passes
    assert m.tolist() == [False, False, False, True]
