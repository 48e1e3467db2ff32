"""Benchmark runner. Prints ONE JSON line:
{"metric": ..., "value": headline_sec, "unit": "sec",
 "queries": {name: sec, ...}, "sf": ..., "num_cpus": N, ...}

Headline: the flagship pipeline (synthesize pages -> extract_text ->
geocode/tile-assign -> PIP spatial join vs footprints), page side
replicated deterministically to GRAFT_PAGE_REPLICAS x documents rows.

`python bench.py --scaling` runs the headline in two FRESH processes
(num_cpus=8 and num_cpus=32) on identical input and reports throughput
at both plus scaling efficiency (sandbox proxy for the N vs 4N-node
criterion; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPLICAS = int(os.environ.get("GRAFT_PAGE_REPLICAS", "40"))


def _warm_cache():
    for name in ("documents", "part"):
        with open(f"{SF_DIR}/{name}.parquet", "rb") as f:
            f.read()


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NCPU,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from robosat_ray.pipelines.flagship import flagship
    from robosat_ray.pipelines import queries as Q

    _warm_cache()
    num_blocks = NCPU * 4

    # headline: flagship spatial join over replicated pages
    t0 = time.perf_counter()
    joined = flagship(
        SF_DIR, through_html=True, salt=True, replicas=REPLICAS, num_blocks=num_blocks
    )
    n_join = joined.count()
    headline = time.perf_counter() - t0

    import pyarrow.parquet as pq

    n_pages = pq.read_metadata(f"{SF_DIR}/documents.parquet").num_rows * REPLICAS

    qtimes = {}
    for name in ("tile_assign", "cover", "spatial_join", "knn", "exact_dedup", "token_count"):
        t0 = time.perf_counter()
        res = Q.QUERIES[name](SF_DIR)
        if hasattr(res, "count"):
            res.count()
        qtimes[name] = round(time.perf_counter() - t0, 3)

    result = {
        "metric": "flagship_spatial_join_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": qtimes,
        "sf": SF_DIR,
        "num_cpus": NCPU,
        "pages": n_pages,
        "join_rows": n_join,
        "rows_per_sec": round(n_pages / headline, 1),
        "replicas": REPLICAS,
    }
    ray.shutdown()
    return result


def _run_child(ncpu: int) -> dict:
    env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def run_scaling():
    lo, hi = 8, 32
    r_lo = _run_child(lo)
    r_hi = _run_child(hi)
    tp_lo = r_lo["rows_per_sec"]
    tp_hi = r_hi["rows_per_sec"]
    eff = (tp_hi / tp_lo) / (hi / lo)
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency",
                "value": round(eff, 3),
                "unit": "ratio",
                "sec_8": r_lo["value"],
                "sec_32": r_hi["value"],
                "rows_per_sec_8": tp_lo,
                "rows_per_sec_32": tp_hi,
                "pages": r_hi["pages"],
                "sf": SF_DIR,
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_bench()))
