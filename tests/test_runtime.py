"""Lineage + checkpoint/resume semantics."""

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest


def test_write_partitioned_and_resume(ray_session, tmp_path):
    from robosat_ray.pipelines.flagship import points_dataset
    from robosat_ray.runtime.resume import (
        done_partitions,
        read_partitioned,
        verify_manifests,
        write_partitioned,
    )

    sf = "/root/testdata/sf0.001"
    root = str(tmp_path / "points_out")
    ds = points_dataset(sf)
    man1 = write_partitioned(ds, root, key_col="doc_id", num_partitions=8)
    assert len(done_partitions(root)) == 8
    assert not man1["skipped"].any()

    # simulate a partial failure: delete two partitions' outputs
    for p in (2, 5):
        for f in ("data.parquet", "_SUCCESS"):
            os.remove(os.path.join(root, f"part={p}", f))
    assert len(done_partitions(root)) == 6

    # resume: only the missing partitions are rewritten
    man2 = write_partitioned(points_dataset(sf), root, key_col="doc_id", num_partitions=8)
    rewritten = set(man2[~man2["skipped"]]["part"].tolist())
    assert rewritten == {2, 5}
    assert len(done_partitions(root)) == 8

    # resumed result identical to a fresh one-shot run
    vm = verify_manifests(root)
    assert vm["rows_ok"].all() and vm["checksum_ok"].all()
    got = read_partitioned(root).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = points_dataset(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[sorted(got.columns)], want[sorted(want.columns)])


def test_lineage_records_and_checksum_stability(ray_session):
    from robosat_ray.pipelines.flagship import points_dataset
    from robosat_ray.runtime.lineage import lineage_table, reset_lineage, with_lineage

    sf = "/root/testdata/sf0.001"
    reset_lineage()
    with_lineage(points_dataset(sf), "points").count()
    t1 = lineage_table()
    assert t1.loc[t1.stage == "points", "rows"].iloc[0] == 500

    # rerun with different parallelism -> same rows and same combined
    # checksum (order-insensitive)
    reset_lineage()
    with_lineage(points_dataset(sf).repartition(7), "points").count()
    t2 = lineage_table()
    assert t2.loc[t2.stage == "points", "rows"].iloc[0] == 500
    assert (
        t1.loc[t1.stage == "points", "checksum"].iloc[0]
        == t2.loc[t2.stage == "points", "checksum"].iloc[0]
    )
    reset_lineage()


def test_flagship_resume_after_partial_failure(ray_session, tmp_path):
    """Full-job checkpointing: kill 3 partitions of a finished run,
    rerun with resume -> only those partitions rewrite, the recovered
    dataset equals a clean run, manifests verify."""
    import os
    import shutil

    from robosat_ray.pipelines.flagship import flagship_to_parquet
    from robosat_ray.runtime.resume import read_partitioned, verify_manifests

    root = str(tmp_path / "flag_out")
    sf = "/root/testdata/sf0.001"
    man1 = flagship_to_parquet(sf, root, num_partitions=16, through_html=False)
    assert not man1["skipped"].any()
    clean = read_partitioned(root).to_pandas()

    # simulate a partial failure: drop 3 of the written partitions
    victims = sorted(man1["part"].tolist())[:3]
    for p in victims:
        shutil.rmtree(os.path.join(root, f"part={p}"), ignore_errors=True)

    man2 = flagship_to_parquet(sf, root, num_partitions=16, through_html=False)
    redone = man2[~man2["skipped"]]["part"].tolist()
    assert sorted(redone) == victims, (redone, victims)
    assert man2["skipped"].sum() == len(man2) - 3

    recovered = read_partitioned(root).to_pandas()
    cols = sorted(clean.columns)
    a = clean[cols].sort_values(cols).reset_index(drop=True)
    b = recovered[cols].sort_values(cols).reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)
    v = verify_manifests(root)
    assert v["rows_ok"].all() and v["checksum_ok"].all()


def test_resume_layout_mismatch_refuses(ray_session, tmp_path):
    """A checkpoint written under a different partition layout must be
    a hard error on resume, not silent row loss."""
    import json
    import os

    import pytest
    import ray.data

    from robosat_ray.runtime.resume import write_partitioned

    root = str(tmp_path / "out")
    ds = ray.data.range(100).map_batches(
        lambda b: {"key": b["id"]}, batch_format="numpy"
    )
    write_partitioned(ds, root, key_col="key", num_partitions=8)
    # simulate an old/foreign layout stamp
    with open(os.path.join(root, "_LAYOUT"), "w") as f:
        json.dump({"layout": "mul-v1", "num_partitions": 8, "key_col": "key"}, f)
    with pytest.raises(ValueError, match="layout mismatch"):
        write_partitioned(ds, root, key_col="key", num_partitions=8)
    # resume=False overwrites and restamps
    write_partitioned(ds, root, key_col="key", num_partitions=8, resume=False)


def test_job_entrypoint_runs_and_resumes(ray_session, tmp_path):
    """The `ray job submit` surface (robosat_ray.job.main): first run
    writes every partition, a re-submission skips them all, and the
    manifest checksums make the two runs comparable."""
    from robosat_ray.job import main

    out = str(tmp_path / "job_out")
    first = main(["--sf", "/root/testdata/sf0.001", "--out", out,
                  "--num-partitions", "16"])
    assert first["parts_written"] > 0 and first["parts_skipped"] == 0
    assert first["rows_written"] > 0 and first["lineage_rows"] >= 2
    second = main(["--sf", "/root/testdata/sf0.001", "--out", out,
                   "--num-partitions", "16"])
    assert second["parts_written"] == 0
    assert second["parts_skipped"] == first["parts_written"]
