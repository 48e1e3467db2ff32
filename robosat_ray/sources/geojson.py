"""GeoJSON FeatureCollection reader / writer (reference S4/S7:
osm/core.py:27-41 sharded FC writer, tools/cover.py:24-25 &
tools/merge.py:26-27 whole-FC readers).

The reference holds entire FeatureCollections in driver memory; here
an FC is an *ingest/egress boundary format*: reading fans a directory
of sharded FC files out to workers (`read_binary_files` + per-file
parse, one task per shard — the layout robosat's FeatureStorage
produces), and writing hash-partitions features into deterministic
per-partition FC shards (no uuid4, unlike osm/core.py:36). Inside the
engine features always live as Arrow rows; JSON exists only at these
two edges (SURVEY §2.7).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

from robosat_ray.runtime.resume import partition_id

RINGS_TYPE = pa.list_(
    pa.list_(pa.struct([("x", pa.float64()), ("y", pa.float64())]))
)


def _poly_rows(feat: dict, fid_default: int) -> list[tuple[int, str, int, list]]:
    """One GeoJSON feature -> [(feature_id, kind, poly_idx, rings)];
    MultiPolygon normalizes to one row per polygon (the reference's
    feature_to_mercator normalization, tools/rasterize.py:38-61)."""
    geom = feat.get("geometry") or {}
    props = feat.get("properties") or {}
    fid = int(props.get("feature_id", fid_default))
    kind = str(props.get("kind", ""))
    gtype = geom.get("type")
    if gtype == "Polygon":
        polys = [geom["coordinates"]]
    elif gtype == "MultiPolygon":
        polys = list(geom["coordinates"])
    else:
        return []
    out = []
    for pi, rings in enumerate(polys):
        # p[:2]: RFC 7946 positions may carry altitude as a third element
        conv = [
            [{"x": float(p[0]), "y": float(p[1])} for p in ring] for ring in rings
        ]
        out.append((fid, kind, pi, conv))
    return out


def _parse_fc_batch(batch: pa.Table) -> pa.Table:
    fids, kinds, pidx, rings = [], [], [], []
    for blob in batch.column("bytes").to_pylist():
        fc = json.loads(blob)
        for i, feat in enumerate(fc.get("features", [])):
            for row in _poly_rows(feat, i):
                fids.append(row[0])
                kinds.append(row[1])
                pidx.append(row[2])
                rings.append(row[3])
    return pa.table(
        {
            "feature_id": pa.array(fids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "poly_idx": pa.array(pidx, pa.int64()),
            "rings": pa.array(rings, RINGS_TYPE),
        }
    )


def read_feature_collections(path: str):
    """File or directory of FC shards -> features Dataset
    (feature_id, kind, poly_idx, rings). One parse task per shard."""
    import ray.data

    ds = ray.data.read_binary_files(path)
    return ds.map_batches(_parse_fc_batch, batch_format="pyarrow")


def _feature_json(fid: int, kind: str, rings) -> dict:
    coords = [[[pt["x"], pt["y"]] for pt in ring] for ring in rings]
    return {
        "type": "Feature",
        "properties": {"feature_id": int(fid), "kind": kind},
        "geometry": {"type": "Polygon", "coordinates": coords},
    }


def write_feature_collections(
    ds, root: str, num_partitions: int = 16
) -> pd.DataFrame:
    """features Dataset -> `{root}/part={id}.geojson` FC shards,
    hash-partitioned by feature_id with deterministic shard names and
    atomic tmp+rename writes. Returns a manifest (part, features).
    Pre-existing `part=*.geojson` shards in root are removed first —
    a re-write that occupies fewer partitions must not leave stale
    shards for a later read to silently mix in."""
    os.makedirs(root, exist_ok=True)
    for name in os.listdir(root):
        if name.startswith("part=") and name.endswith(".geojson"):
            os.remove(os.path.join(root, name))

    def assign(batch: pa.Table) -> pa.Table:
        keys = batch.column("feature_id").to_numpy()
        return batch.append_column(
            "__part", pa.array(partition_id(keys, num_partitions))
        )

    def write_group(group: pa.Table) -> pa.Table:
        part = int(group.column("__part")[0].as_py())
        feats = [
            json.dumps(_feature_json(f, k, r), sort_keys=True)
            for f, k, r in zip(
                group.column("feature_id").to_pylist(),
                group.column("kind").to_pylist(),
                group.column("rings").to_pylist(),
            )
        ]
        # sort the serialized features: a TOTAL order (sort_by on
        # feature_id alone is stable but leaves duplicate-fid rows in
        # shuffle-arrival order), so shards stay byte-identical
        # whatever the input block structure
        feats.sort()
        body = (
            '{"type": "FeatureCollection", "features": ['
            + ", ".join(feats)
            + "]}"
        )
        final = os.path.join(root, f"part={part}.geojson")
        tmp = final + ".tmp"
        with open(tmp, "w") as f:
            f.write(body)
        os.replace(tmp, final)
        return pa.table(
            {
                "part": pa.array([part], pa.int64()),
                "features": pa.array([len(feats)], pa.int64()),
            }
        )

    manifest = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(write_group, batch_format="pyarrow")
    )
    return manifest.to_pandas().sort_values("part").reset_index(drop=True)
