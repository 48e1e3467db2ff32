"""Flagship pipeline: Common-Crawl-style pages -> extract_text ->
geocode + tile-assign -> point-in-polygon spatial join vs footprints.

This is the headline workload of BASELINE.json ("spatial-join +
tile-assignment throughput"): every stage is a streaming Ray Data
transform; the only shuffle is the cell-bucket co-partition groupby of
the join itself.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from robosat_ray import constants as C
from robosat_ray.stages.extract_text import add_extract_text
from robosat_ray.stages.geocode import add_geocode, geocode_batch
from robosat_ray.stages.spatial_join import hot_cell_map, spatial_join
from robosat_ray.synth.footprints import footprints_dataset
from robosat_ray.synth.pages import pages_dataset


def points_dataset(
    sf_dir: str, z: int = C.Z_JOIN, replicas: int = 1, num_blocks: int | None = None
):
    """Narrow derived points table (doc_id, url, lon, my, tiles) without
    html synthesis — used for the cheap hot-cell count pass and for
    queries that don't exercise extraction."""
    from robosat_ray.synth.pages import documents_source, urls_for

    def to_points(batch: pa.Table) -> pa.Table:
        ids_arr = batch.column("doc_id")
        if isinstance(ids_arr, pa.ChunkedArray):
            ids_arr = ids_arr.combine_chunks()
        out = pa.table({"doc_id": ids_arr, "url": urls_for(ids_arr)})
        return geocode_batch(out, z=z)

    ds = documents_source(sf_dir, ["doc_id"], replicas, num_blocks)
    return ds.map_batches(to_points, batch_format="pyarrow")


# below this many footprint rows the join broadcasts the polygon side
# (ray.put once, per-actor index); above it, co-partition shuffle join
BROADCAST_LIMIT = 2_000_000


def flagship(
    sf_dir: str,
    z: int = C.Z_JOIN,
    salt: bool = True,
    salt_cap: int = 20000,
    salt_top_k: int = 65536,
    through_html: bool = True,
    replicas: int = 1,
    num_blocks: int | None = None,
    join_strategy: str = "auto",
    concurrency=(2, 16),
    lineage: bool = False,
):
    """Returns the joined Dataset (url, doc_id, feature_id, kind, cell).

    through_html=True runs the full input path (synthesize html ->
    extract text -> geocode); False starts from the narrow points table.
    replicas/num_blocks scale the page side deterministically (bench).
    join_strategy: 'broadcast' (small polygon side: ray.put + actor-pool
    probe, zero shuffle), 'shuffle' (both sides large: cell co-partition
    groupby with hot-cell salting), or 'auto' (by footprint row count).
    lineage=True records per-batch lineage rows (stage, rows, checksum)
    for the points and join stages into the collector actor.
    """
    import pyarrow.parquet as pq

    from robosat_ray.stages.spatial_join import broadcast_spatial_join
    from robosat_ray.synth.footprints import footprints_table

    if through_html:
        pages = pages_dataset(
            sf_dir, drop_golden_text=True, replicas=replicas, num_blocks=num_blocks
        )
        pages = add_extract_text(pages)  # validates the byte-identical path
        pts = add_geocode(pages, z=z)
        pts = pts.select_columns(["doc_id", "url", "lon", "my", "cell"])
    else:
        pts = points_dataset(sf_dir, z=z, replicas=replicas, num_blocks=num_blocks)
        pts = pts.select_columns(["doc_id", "url", "lon", "my", "cell"])

    if lineage:
        from robosat_ray.runtime.lineage import with_lineage

        pts = with_lineage(pts, "points", checksum_columns=["doc_id", "cell"])

    if join_strategy == "auto":
        n_feet = pq.read_metadata(f"{sf_dir}/part.parquet").num_rows
        join_strategy = "broadcast" if n_feet <= BROADCAST_LIMIT else "shuffle"

    if join_strategy == "broadcast":
        joined = broadcast_spatial_join(
            pts, footprints_table(sf_dir), z=z, concurrency=concurrency
        )
        if lineage:
            from robosat_ray.runtime.lineage import with_lineage

            joined = with_lineage(joined, "joined", checksum_columns=["doc_id", "feature_id"])
        return joined

    feet = footprints_dataset(sf_dir)
    hot = (
        hot_cell_map(
            points_dataset(sf_dir, z=z, replicas=replicas, num_blocks=num_blocks),
            z,
            cap=salt_cap,
            top_k=salt_top_k,
        )
        if salt
        else {}
    )
    joined = spatial_join(pts, feet, z=z, hot=hot)
    if lineage:
        from robosat_ray.runtime.lineage import with_lineage

        joined = with_lineage(joined, "joined", checksum_columns=["doc_id", "feature_id"])
    return joined


def flagship_to_parquet(
    sf_dir: str,
    out_root: str,
    num_partitions: int = 64,
    resume: bool = True,
    **flagship_kwargs,
):
    """The FULL job with checkpointed output (north rule): flagship ->
    hash-partitioned parquet keyed by cell, per-partition _SUCCESS
    manifests (rows + order-insensitive checksum). A rerun after a
    partial failure skips completed partitions; the recovered output
    is byte-equivalent to a single clean run (tested)."""
    from robosat_ray.runtime.resume import write_partitioned

    ds = flagship(sf_dir, **flagship_kwargs)
    return write_partitioned(
        ds, out_root, key_col="cell", num_partitions=num_partitions, resume=resume
    )
