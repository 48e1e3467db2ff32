"""`ray job submit` entrypoint — the north rule's cluster-job surface.

On a real multi-node cluster the job agent sets RAY_ADDRESS and this
module connects to the hosting cluster; the SAME command line runs
single-node in this sandbox (address="local"). The job is the full
checkpointed flagship: pages -> extract -> geocode/tile -> PIP spatial
join -> hash-partitioned parquet with per-partition _SUCCESS manifests
and lineage counters. Re-submitting after a partial failure resumes:
completed partitions are skipped and the recovered output is
byte-equivalent to a clean run (manifest checksums are
order-insensitive, so this is verifiable from the manifests alone).

    # cluster (N or 4N nodes — the job itself is size-agnostic):
    ray job submit --working-dir . -- python -m robosat_ray.job \
        --sf /data/sfX --out /shared/join_out --replicas 1000

    # sandbox / laptop:
    python -m robosat_ray.job --sf /root/testdata/sf0.01 \
        --out /tmp/join_out --num-cpus 8

Prints ONE JSON line: rows written, partitions written/skipped,
manifest checksum XOR (run-comparable), lineage rows, wall seconds.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main(argv=None) -> dict:
    p = argparse.ArgumentParser(prog="robosat_ray.job")
    p.add_argument("--sf", required=True, help="input dir with documents/footprints parquet")
    p.add_argument("--out", required=True, help="checkpointed output root")
    p.add_argument("--replicas", type=int, default=1, help="deterministic page-side scale-up")
    p.add_argument("--num-partitions", type=int, default=64)
    p.add_argument("--num-cpus", type=int, default=None,
                   help="only for address=local; a submitted job uses the cluster's size")
    p.add_argument("--no-resume", action="store_true",
                   help="overwrite instead of skipping completed partitions")
    p.add_argument("--no-lineage", action="store_true")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        # inside `ray job submit`, RAY_ADDRESS points at the hosting
        # cluster; standalone it is unset/local and we own a session
        addr = os.environ.get("RAY_ADDRESS", "local")
        kw = {"num_cpus": args.num_cpus} if addr == "local" and args.num_cpus else {}
        ray.init(address=addr, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR", **kw)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from robosat_ray.pipelines.flagship import flagship_to_parquet
    from robosat_ray.runtime.lineage import lineage_table, reset_lineage

    lineage = not args.no_lineage
    if lineage:
        reset_lineage()
    t0 = time.perf_counter()
    manifest = flagship_to_parquet(
        args.sf,
        args.out,
        num_partitions=args.num_partitions,
        resume=not args.no_resume,
        replicas=args.replicas,
        lineage=lineage,
    )
    wall = time.perf_counter() - t0
    written = manifest[~manifest["skipped"]]
    ck = 0
    for v in written["checksum"]:
        ck ^= int(v)
    summary = {
        "metric": "flagship_job",
        "sf": args.sf,
        "out": args.out,
        "rows_written": int(written["rows"].sum()),
        "parts_written": int((~manifest["skipped"]).sum()),
        "parts_skipped": int(manifest["skipped"].sum()),
        "checksum_xor": ck,
        "lineage_rows": int(len(lineage_table())) if lineage else 0,
        "wall_sec": round(wall, 3),
    }
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
