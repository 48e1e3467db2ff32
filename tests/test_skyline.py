"""Skyline (Pareto front, max score / max tokens): planted front,
local kernel vs quadratic dominance on random data, distributed run
vs quadratic reference, partition invariance, and a tiny bucket
width forcing the cross-bucket external bound on every group."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from robosat_ray.stages.skyline import _INT64_MAX, _local_skyline, skyline


def _brute(ids, s, t):
    """O(n^2) maximize-both dominance reference."""
    ids = np.asarray(ids, np.int64)
    s = np.asarray(s, np.int64)
    t = np.asarray(t, np.int64)
    dom = np.array(
        [
            np.any(
                (s >= s[i]) & (t >= t[i]) & ((s > s[i]) | (t > t[i]))
            )
            for i in range(len(s))
        ]
    )
    return set(ids[~dom].tolist())


def _local_max_both(ids, s, t):
    """Run the minimize-core kernel in maximize-both orientation."""
    ki, ks, kt = _local_skyline(
        np.asarray(ids, np.int64),
        np.asarray(s, np.int64),
        -np.asarray(t, np.int64),
        _INT64_MAX,
    )
    return set(ki.tolist())


def test_local_kernel_vs_quadratic():
    rng = np.random.RandomState(3)
    for n in (1, 2, 50, 400):
        ids = np.arange(1, n + 1)
        s = rng.randint(0, 40, n)  # small range -> many exact ties
        t = rng.randint(0, 40, n)
        assert _local_max_both(ids, s, t) == _brute(ids, s, t), n


def test_duplicates_all_survive():
    # two identical points on the front: neither dominates the other
    ids = [1, 2, 3]
    s = [10, 10, 5]
    t = [7, 7, 20]
    assert _local_max_both(ids, s, t) == {1, 2, 3}
    # a strictly dominated duplicate pair still dies
    ids = [1, 2, 3]
    s = [10, 4, 4]
    t = [7, 7, 7]
    assert _local_max_both(ids, s, t) == {1}


def _docs_from_metrics(s_vals, t_vals):
    """Construct texts whose metric pair is EXACTLY (score, tokens):
    tokens 'aa' (alpha) and '00' (non-alpha) joined by spaces tune
    n_alpha/n_chars; both engine and brute operate on the real
    extractor, so planted fronts go through the full text path."""
    rows = []
    for i, (sv, tv) in enumerate(zip(s_vals, t_vals)):
        toks = ["aa"] * sv + ["00"] * (tv - sv)
        rows.append({"doc_id": i + 1, "text": " ".join(toks)})
    return pd.DataFrame(rows)


def test_distributed_vs_quadratic_and_partition_invariance():
    rng = np.random.RandomState(9)
    n = 800
    tv = rng.randint(1, 60, n)
    sv = np.array([rng.randint(0, t + 1) for t in tv])
    docs = _docs_from_metrics(sv, tv)
    ds3 = ray.data.from_pandas(docs).repartition(3)
    ds11 = ray.data.from_pandas(docs).repartition(11)

    out3 = skyline(ds3).to_pandas().sort_values("doc_id").reset_index(drop=True)
    out11 = skyline(ds11).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out3, out11)

    # quadratic reference over the REAL extracted metrics
    from robosat_ray.stages.skyline import _metrics

    m = _metrics(pa.Table.from_pandas(docs)).to_pandas()
    expect = _brute(
        m["doc_id"].to_numpy(),
        m["score_micro"].to_numpy(),
        m["n_tokens"].to_numpy(),
    )
    assert set(out3["doc_id"].tolist()) == expect
    assert len(expect) > 3, "front too small to be a meaningful pin"


def test_tiny_bucket_width_forces_external_bound():
    # bucket_w=1: every distinct score is its own bucket, so every
    # group's survival depends on the cross-bucket suffix bound —
    # result must be identical to the default width
    rng = np.random.RandomState(21)
    n = 300
    tv = rng.randint(1, 40, n)
    sv = np.array([rng.randint(0, t + 1) for t in tv])
    docs = _docs_from_metrics(sv, tv)
    ds = ray.data.from_pandas(docs).repartition(5)
    a = skyline(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = (
        skyline(ds, bucket_w=1)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
