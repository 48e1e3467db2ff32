"""GeoJSON FC source/sink round-trip (reference S4/S7 parity)."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

from robosat_ray.sources.geojson import (
    read_feature_collections,
    write_feature_collections,
)

SF = "/root/testdata/sf0.001"


def _rings_key(df):
    out = []
    for fid, rings in zip(df["feature_id"], df["rings"]):
        pts = tuple(
            (round(p["x"], 12), round(p["y"], 12)) for ring in rings for p in ring
        )
        out.append((int(fid), pts))
    return sorted(out)


def test_fc_roundtrip_footprints(ray_session, tmp_path):
    from robosat_ray.synth.footprints import footprints_dataset

    feet = footprints_dataset(SF).select_columns(["feature_id", "kind", "rings"])
    root = str(tmp_path / "fc")
    manifest = write_feature_collections(feet, root, num_partitions=4)
    assert manifest["features"].sum() == feet.count()
    assert len(manifest) <= 4
    # shards are valid GeoJSON FeatureCollections
    shard = json.load(open(os.path.join(root, f"part={int(manifest['part'][0])}.geojson")))
    assert shard["type"] == "FeatureCollection"
    assert shard["features"][0]["geometry"]["type"] == "Polygon"

    back = read_feature_collections(root).to_pandas()
    src = feet.to_pandas()
    assert _rings_key(back) == _rings_key(src)
    assert sorted(back["kind"]) == sorted(src["kind"])


def test_fc_writer_deterministic(ray_session, tmp_path):
    from robosat_ray.synth.footprints import footprints_dataset

    feet = footprints_dataset(SF).select_columns(["feature_id", "kind", "rings"])
    r1, r2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_feature_collections(feet, r1, num_partitions=4)
    write_feature_collections(feet.random_shuffle(seed=7), r2, num_partitions=4)
    for name in sorted(os.listdir(r1)):
        b1 = open(os.path.join(r1, name), "rb").read()
        b2 = open(os.path.join(r2, name), "rb").read()
        assert b1 == b2, name  # byte-identical shards whatever the block order


def test_fc_reader_multipolygon_normalization(ray_session, tmp_path):
    fc = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "properties": {"feature_id": 7, "kind": "building"},
                "geometry": {
                    "type": "MultiPolygon",
                    "coordinates": [
                        [[[0, 0], [1, 0], [1, 1], [0, 0]]],
                        [[[5, 5], [6, 5], [6, 6], [5, 5]]],
                    ],
                },
            },
            {
                "type": "Feature",
                "properties": {"feature_id": 8, "kind": "parking"},
                "geometry": {"type": "Point", "coordinates": [1, 2]},
            },
        ],
    }
    p = tmp_path / "one.geojson"
    p.write_text(json.dumps(fc))
    back = read_feature_collections(str(p)).to_pandas().sort_values("poly_idx")
    assert list(back["feature_id"]) == [7, 7]  # Point skipped, MP split
    assert list(back["poly_idx"]) == [0, 1]


def test_fc_reader_altitude_positions(ray_session, tmp_path):
    """RFC 7946 allows [lon, lat, alt] positions; altitude is dropped."""
    fc = {
        "type": "FeatureCollection",
        "features": [{
            "type": "Feature",
            "properties": {"feature_id": 1, "kind": "building"},
            "geometry": {"type": "Polygon",
                         "coordinates": [[[0, 0, 5], [1, 0, 5], [1, 1, 5], [0, 0, 5]]]},
        }],
    }
    p = tmp_path / "alt.geojson"
    p.write_text(json.dumps(fc))
    back = read_feature_collections(str(p)).to_pandas()
    assert len(back) == 1
    assert [(pt["x"], pt["y"]) for pt in back["rings"][0][0]] == [
        (0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 0.0)]


def test_fc_writer_duplicate_fid_deterministic(ray_session, tmp_path):
    """Duplicate feature_ids (MultiPolygon split rows) must still give
    byte-identical shards under any block order: the writer sorts the
    SERIALIZED features (a total order), not just the fid."""
    import ray.data

    rows = []
    for i in range(30):
        for pi in range(3):  # 3 rows per fid, distinct rings
            x = float(pi)
            rows.append({
                "feature_id": i % 5,  # heavy duplication
                "kind": "building",
                "rings": [[{"x": x, "y": 0.0}, {"x": x + 1, "y": 0.0},
                           {"x": x + 1, "y": 1.0}, {"x": x, "y": 0.0}]],
            })
    ds = ray.data.from_items(rows)
    r1, r2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_feature_collections(ds, r1, num_partitions=3)
    write_feature_collections(ds.random_shuffle(seed=3), r2, num_partitions=3)
    for name in sorted(os.listdir(r1)):
        assert open(os.path.join(r1, name), "rb").read() == open(
            os.path.join(r2, name), "rb").read(), name


def test_fc_writer_removes_stale_shards(ray_session, tmp_path):
    import ray.data

    from robosat_ray.synth.footprints import footprints_dataset

    feet = footprints_dataset(SF).select_columns(["feature_id", "kind", "rings"])
    root = str(tmp_path / "fc")
    write_feature_collections(feet, root, num_partitions=16)
    small = ray.data.from_items([{
        "feature_id": 1, "kind": "building",
        "rings": [[{"x": 0.0, "y": 0.0}, {"x": 1.0, "y": 0.0},
                   {"x": 1.0, "y": 1.0}, {"x": 0.0, "y": 0.0}]],
    }])
    write_feature_collections(small, root, num_partitions=4)
    back = read_feature_collections(root).to_pandas()
    assert len(back) == 1  # no stale shards mixed in
