"""Mixture sampling: exact sqrt-proportional largest-remainder
allocation + tempering property."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from robosat_ray.stages.mixture import MIX_BUDGET, allocate, mix_sample


def test_allocate_exact_budget():
    counts = {"a": 10_000, "b": 100, "c": 100, "d": 1}
    a = allocate(counts, budget=50)
    assert sum(a.values()) == 50
    # tempering: sqrt weights give the small domains MORE than their
    # raw share (b raw share = 100/10201 * 50 ≈ 0.5; sqrt share =
    # 10/121 * 50 ≈ 4)
    assert a["b"] >= 3
    assert a["a"] < 50 * 10_000 // 10_201  # big domain tempered down


def test_allocate_caps_at_domain_size():
    a = allocate({"a": 2, "b": 10_000}, budget=100)
    assert a["a"] <= 2
    assert sum(a.values()) <= 100


def test_sample_matches_allocation(ray_session):
    n = 3000
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "lang": pa.array(["en"] * n, pa.string()),
            }
        )
    )
    out = mix_sample(docs).to_pandas()
    assert len(out) == MIX_BUDGET
    per = out.groupby("regdom").size()
    # per-domain picks equal the deterministic allocation recomputed
    # from the fixture (115 domains, doc_id % (23*5) decides regdom)
    from collections import Counter

    counts = Counter(i % 115 for i in range(n))
    # every domain has ~26 docs -> equal weights -> near-equal split
    assert per.max() - per.min() <= 1
    assert (out["dom_rank"] <= per.max()).all()


def test_partition_invariance(ray_session):
    n = 2000
    docs = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "lang": pa.array(["en"] * n, pa.string()),
        }
    )
    cols = ["doc_id", "regdom", "dom_rank"]

    def run(ds):
        df = mix_sample(ds).to_pandas()
        return df[cols].sort_values("doc_id").reset_index(drop=True)

    a = run(ray.data.from_arrow(docs))
    b = run(ray.data.from_arrow(docs).repartition(17))
    pd.testing.assert_frame_equal(a, b)
