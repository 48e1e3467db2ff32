"""Incremental snapshot ingestion: acceptance semantics on a corpus
where every case (unchanged / changed / mirrored) is enumerable."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from robosat_ray.stages.ingest import (
    MIRROR_BASE,
    SNAP_BASE,
    ingest_snapshot,
)


def _docs(n):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "text": pa.array([f"unique body {i}" for i in range(n)], pa.string()),
            }
        )
    )


def test_acceptance_cases(ray_session):
    n = 210  # multiple of 21: every fixture case present
    out = ingest_snapshot(_docs(n)).to_pandas()
    ids = set(out["doc_id"])
    # changed pages (% 3 == 1) accepted under their snapshot id
    want = {i + SNAP_BASE for i in range(n) if i % 3 == 1}
    assert ids == want
    # no unchanged page and no mirror id survives
    assert not any(i >= MIRROR_BASE for i in ids)
    assert not any((i - SNAP_BASE) % 3 == 0 for i in ids)
    # mirrored changed pages carry n_shard_dups == 2
    dup = out[out["n_shard_dups"] == 2]
    assert set(dup["doc_id"]) == {
        i + SNAP_BASE for i in range(n) if i % 21 == 1
    }
    assert (out[out["n_shard_dups"] == 1].shape[0] + len(dup)) == len(out)


def test_partition_invariance(ray_session):
    cols = ["doc_id", "text_hash", "n_shard_dups"]

    def run(ds):
        df = ingest_snapshot(ds).to_pandas()
        return df[cols].sort_values("doc_id").reset_index(drop=True)

    a = run(_docs(300))
    b = run(_docs(300).repartition(11))
    pd.testing.assert_frame_equal(a, b)
