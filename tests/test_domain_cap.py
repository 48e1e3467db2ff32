"""Per-domain cap: cap semantics and partition invariance beyond the
oracle parity sweep."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from robosat_ray.stages.domain_cap import DOMAIN_CAP, domain_cap


def _docs(n):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "lang": pa.array(["en"] * n, pa.string()),
            }
        )
    )


def test_cap_binds_per_domain(ray_session):
    out = domain_cap(_docs(2000)).to_pandas()
    per = out.groupby("regdom").size()
    assert (per <= DOMAIN_CAP).all()
    # 2000 docs over 115 fixture domains (~17 each): every domain capped
    assert (per == DOMAIN_CAP).all()
    assert set(out["dom_rank"].unique()) == {1, 2, 3}
    # keeper choice is the hash rank, not lowest doc_id: at least one
    # domain's keeper set is not its 3 smallest ids
    smallest = {}
    for i in range(2000):
        d = i % (23 * 5)
        smallest.setdefault(d, []).append(i)
    kept_ids = set(out["doc_id"])
    assert any(
        not set(v[:DOMAIN_CAP]) <= kept_ids for v in smallest.values()
    )


def test_small_domains_keep_all(ray_session):
    # 50 docs over 115 fixture domains: nothing reaches the cap
    out = domain_cap(_docs(50)).to_pandas()
    assert len(out) == 50
    assert (out.groupby("regdom").size() <= DOMAIN_CAP).all()


def test_partition_invariance(ray_session):
    cols = ["doc_id", "regdom", "dom_rank"]

    def run(ds):
        df = domain_cap(ds).to_pandas()
        return df[cols].sort_values("doc_id").reset_index(drop=True)

    a = run(_docs(1500))
    b = run(_docs(1500).repartition(23))
    pd.testing.assert_frame_equal(a, b)
