"""Exact rank/percentile normalization: distributed two-pass rank ==
naive driver rank, tie semantics, partition invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from robosat_ray.stages.rank import quality_rank


def _docs_with_scores(n, seed=5, n_distinct=40):
    """Texts engineered to produce many exact score ties (few distinct
    alpha ratios), so ties stress the value-bucket co-location."""
    rng = np.random.default_rng(seed)
    texts = []
    for _ in range(n):
        a = int(rng.integers(1, n_distinct))  # alpha chars
        texts.append("a" * a + "1" * (n_distinct - a))  # fixed length
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def test_rank_equals_naive(ray_session):
    n = 1000
    out = (
        quality_rank(_docs_with_scores(n))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    s = out["score"].to_numpy()
    srt = np.sort(s)
    naive_rank = np.searchsorted(srt, s, side="left") + 1  # RANK() ties
    assert (out["rank"].to_numpy() == naive_rank).all()
    assert (
        out["pct_micro"].to_numpy() == (naive_rank - 1) * 1_000_000 // (n - 1)
    ).all()
    # ties really exist and share the rank
    counts = pd.Series(s).value_counts()
    assert (counts > 1).any()
    by_score = out.groupby("score")["rank"].nunique()
    assert (by_score == 1).all()


def test_extremes(ray_session):
    # plant a unique all-alpha max doc: RANK ties share the FIRST rank,
    # so only a singleton max reaches pct_micro == 1e6
    base = _docs_with_scores(500)
    extra = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([10_000], pa.int64()),
                "text": pa.array(["a" * 40], pa.string()),
            }
        )
    )
    out = quality_rank(base.union(extra)).to_pandas()
    assert out.loc[out["score"].idxmin(), "rank"] == 1
    assert out["pct_micro"].min() == 0
    assert out.loc[out["doc_id"] == 10_000, "pct_micro"].iloc[0] == 1_000_000


def test_partition_invariance(ray_session):
    cols = ["doc_id", "score", "rank", "pct_micro"]

    def run(ds):
        df = quality_rank(ds).to_pandas()
        return df[cols].sort_values("doc_id").reset_index(drop=True)

    a = run(_docs_with_scores(600))
    b = run(_docs_with_scores(600).repartition(13))
    pd.testing.assert_frame_equal(a, b)
