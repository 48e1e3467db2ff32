"""From-scratch OSM PBF reader: wire-format primitives pinned to the
protobuf/PBF specs, file round-trip through REAL .osm.pbf bytes, and
extract→cover parity against the synth-footprint path (the reference
`rs extract` semantics check the VERDICT asked for)."""

import numpy as np
import pyarrow as pa
import pytest

from robosat_ray.sources import osm_pbf as P


def test_varint_spec_values():
    # protobuf spec examples: 1 -> 0x01, 300 -> 0xAC 0x02
    assert P.encode_varints(np.array([1], np.uint64)) == b"\x01"
    assert P.encode_varints(np.array([300], np.uint64)) == b"\xac\x02"
    assert P.decode_varints(b"\xac\x02").tolist() == [300]
    # max uint64 is 10 bytes
    assert len(P.encode_varints(np.array([2**64 - 1], np.uint64))) == 10
    vals = np.array([0, 1, 127, 128, 300, 2**32, 2**63, 2**64 - 1], np.uint64)
    assert (P.decode_varints(P.encode_varints(vals)) == vals).all()
    with pytest.raises(ValueError):
        P.decode_varints(b"\xac")  # truncated (continuation bit set at end)


def test_zigzag_spec_values():
    # protobuf spec: 0->0, -1->1, 1->2, -2->3, 2147483647->4294967294
    s = np.array([0, -1, 1, -2, 2, 2147483647, -2147483648], np.int64)
    z = P.zigzag_encode(s)
    assert z.tolist() == [0, 1, 2, 3, 4, 4294967294, 4294967295]
    assert (P.zigzag_decode(z) == s).all()
    big = np.array([2**62, -(2**62), 2**63 - 1, -(2**63)], np.int64)
    assert (P.zigzag_decode(P.zigzag_encode(big)) == big).all()


def test_primitive_block_roundtrip():
    node_ids = np.array([10, 11, 12, 13], np.int64)
    lons = np.array([1_000_000_000, 2_000_000_000, 2_000_000_000, 1_000_000_000], np.int64)
    lats = np.array([5_000_000, 5_000_000, 6_000_000, 6_000_000], np.int64)
    ways = [
        (7, np.array([10, 11, 12, 13, 10], np.int64), [("building", "yes")]),
        (8, np.array([10, 11], np.int64), [("highway", "residential")]),
    ]
    block = P.build_primitive_block(node_ids, lons, lats, ways)
    nodes, wayt = P.parse_primitive_block(block)
    assert nodes.column("node_id").to_pylist() == [10, 11, 12, 13]
    assert nodes.column("lon").to_pylist() == [1.0, 2.0, 2.0, 1.0]
    np.testing.assert_allclose(
        nodes.column("lat").to_numpy(), [0.005, 0.005, 0.006, 0.006]
    )
    w = wayt.to_pandas()
    w7 = w[w["way_id"] == 7]
    assert w7["ref"].tolist() == [10, 11, 12, 13, 10]
    assert w7["seq"].tolist() == [0, 1, 2, 3, 4]
    assert w7["closed"].all() and (w7["n_refs"] == 5).all()
    assert dict(w7["tags"].iloc[0]) == {"building": "yes"}
    w8 = w[w["way_id"] == 8]
    assert not w8["closed"].any()
    assert dict(w8["tags"].iloc[0]) == {"highway": "residential"}


def test_pbf_file_roundtrip(tmp_path):
    """Real .osm.pbf bytes on disk: OSMHeader + 2 zlib OSMData blobs;
    scan finds the blob extents without inflating, read_pbf returns
    the union of both blocks."""
    b1 = P.build_primitive_block(
        np.array([1, 2, 3, 4], np.int64),
        np.array([0, 1000, 1000, 0], np.int64) * 10**6,
        np.array([0, 0, 1000, 1000], np.int64) * 10**6,
        [(100, np.array([1, 2, 3, 4, 1], np.int64), [("amenity", "parking")])],
    )
    b2 = P.build_primitive_block(
        np.array([5, 6, 7, 8], np.int64),
        np.array([2000, 3000, 3000, 2000], np.int64) * 10**6,
        np.array([0, 0, 1000, 1000], np.int64) * 10**6,
        [(200, np.array([5, 6, 7, 8, 5], np.int64), [("building", "ruins")])],
    )
    path = str(tmp_path / "t.osm.pbf")
    P.write_pbf(path, [b1, b2])
    blobs = P.scan_blobs(path)
    assert [b["kind"] for b in blobs] == ["OSMHeader", "OSMData", "OSMData"]
    nodes, ways = P.read_pbf(path)
    nd = nodes.to_pandas().sort_values("node_id")
    assert nd["node_id"].tolist() == [1, 2, 3, 4, 5, 6, 7, 8]
    wd = ways.to_pandas()
    assert set(wd["way_id"]) == {100, 200}


def test_way_tag_filters_match_reference():
    """building/parking predicates pinned to osm/building.py:15-21 and
    osm/parking.py:15-16 (+ is_polygon from osm/core.py:44-60)."""
    rows = [
        # (way_id, closed, n_refs, tags, keep_as)
        (1, True, 5, {"building": "yes"}, "building"),
        (2, True, 5, {"building": "ruins"}, None),         # building_filter
        (3, True, 5, {"building": "yes", "location": "underground"}, None),
        (4, False, 5, {"building": "yes"}, None),          # not closed
        (5, True, 3, {"building": "yes"}, None),           # < 4 refs
        (6, True, 5, {"amenity": "parking"}, "parking"),
        (7, True, 5, {"amenity": "parking", "parking": "carports"}, None),
        (8, True, 5, {"amenity": "school"}, None),
        (9, True, 5, {"highway": "residential"}, None),
    ]
    t = pa.table(
        {
            "way_id": pa.array([r[0] for r in rows], pa.int64()),
            "seq": pa.array([0] * len(rows), pa.int64()),
            "ref": pa.array([0] * len(rows), pa.int64()),
            "n_refs": pa.array([r[2] for r in rows], pa.int64()),
            "closed": pa.array([r[1] for r in rows]),
            "tags": pa.array(
                [list(r[3].items()) for r in rows], pa.map_(pa.string(), pa.string())
            ),
        }
    )
    kept_b = P.way_tag_filter(t, "building").column("way_id").to_pylist()
    kept_p = P.way_tag_filter(t, "parking").column("way_id").to_pylist()
    assert kept_b == [r[0] for r in rows if r[4] == "building"]
    assert kept_p == [r[0] for r in rows if r[4] == "parking"]


def test_extract_cover_parity_vs_synth_footprints(ray_session, tmp_path):
    """The VERDICT #6 'done' check: synth footprints encoded into a
    REAL multi-blob .osm.pbf, read back through the distributed
    reader + tag filters + node join + ring assembly, covered at
    Z_JOIN — tile-for-tile equal to cover over the synth table
    directly (road/water excluded on both sides: the reference
    building/parking handlers keep only their tag predicate)."""
    import pyarrow.compute as pc

    from robosat_ray import constants as C
    from robosat_ray.geo import tiles as T
    from robosat_ray.synth.footprints import footprints_table

    feet = footprints_table("/root/testdata/sf0.001")
    path = str(tmp_path / "synth.osm.pbf")
    P.write_pbf(path, P.footprints_to_blocks(feet, per_block=80))

    got = P.extract_pbf(path, kinds=("building", "parking")).to_pandas()
    keep = feet.filter(pc.is_in(feet.column("kind"), pa.array(["building", "parking"])))
    assert len(got) == keep.num_rows
    # nano-quantization: the PBF stores floor(x*1e7+0.5)*100 nano-units;
    # compare at that grid on both sides
    g = got.sort_values("feature_id").reset_index(drop=True)
    k = keep.to_pandas().sort_values("feature_id").reset_index(drop=True)
    assert (g["feature_id"].to_numpy() == k["feature_id"].to_numpy()).all()
    assert list(g["kind"]) == list(k["kind"])
    for col in ("minx", "miny", "maxx", "maxy"):
        want = np.floor(k[col].to_numpy() * 1e7 + 0.5)
        have = np.floor(g[col].to_numpy() * 1e7 + 0.5)
        np.testing.assert_array_equal(have, want, err_msg=col)

    # tile-for-tile cover parity at the join zoom
    def tiles_of(df):
        tx0, ty0, tx1, ty1 = T.tile_range(
            df["minx"].to_numpy(), df["miny"].to_numpy(),
            df["maxx"].to_numpy(), df["maxy"].to_numpy(), C.Z_JOIN,
        )
        out = set()
        for a, b, c, d in zip(tx0, ty0, tx1, ty1):
            for x in range(int(a), int(b) + 1):
                for y in range(int(c), int(d) + 1):
                    out.add((x, y))
        return out

    assert tiles_of(g) == tiles_of(k)
    # rings carry the 4 corners in way order (closing ref dropped)
    r0 = g["rings"].iloc[0]
    assert len(r0) == 1 and len(r0[0]) == 4


def test_ways_with_coords_missing_node_fails_loudly(ray_session):
    """A way referencing a node with no carrier row must raise (the
    searchsorted attach would otherwise silently gather a wrong
    node's coordinates)."""
    import ray.data

    nodes = ray.data.from_arrow(
        pa.table(
            {
                "node_id": pa.array([1, 2], pa.int64()),
                "lon": pa.array([0.0, 1.0]),
                "lat": pa.array([0.0, 1.0]),
            }
        )
    )
    ways = ray.data.from_arrow(
        pa.table(
            {
                "way_id": pa.array([9, 9, 9], pa.int64()),
                "seq": pa.array([0, 1, 2], pa.int64()),
                "ref": pa.array([1, 2, 999], pa.int64()),  # 999 missing
                "n_refs": pa.array([3, 3, 3], pa.int64()),
                "kind": pa.array(["building"] * 3),
            }
        )
    )
    with pytest.raises(Exception, match="missing its node row"):
        P.ways_with_coords(nodes, ways).materialize()


def test_extract_rasterize_parity_sf001(ray_session, tmp_path):
    """End-to-end at sf0.01 (round-4 VERDICT #6): synth footprints ->
    REAL multi-blob .osm.pbf (DenseNodes wire format) -> distributed
    extract -> rasterize, mask-for-mask equal to rasterize over the
    synth table directly (synth side quantized with the decoder's exact
    1e-9 * (granularity * raw) arithmetic, so equality is bit-level,
    not approximate)."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray.data

    from robosat_ray.stages.rasterize import rasterize
    from robosat_ray.synth.footprints import footprints_table

    feet = footprints_table("/root/testdata/sf0.01")
    path = str(tmp_path / "synth.osm.pbf")
    P.write_pbf(path, P.footprints_to_blocks(feet, per_block=300))

    got_ds = P.extract_pbf(path, kinds=("building", "parking"))

    keep = feet.filter(
        pc.is_in(feet.column("kind"), pa.array(["building", "parking"]))
    )
    q = lambda c: 1e-9 * (
        np.floor(keep.column(c).to_numpy() * 1e7 + 0.5).astype(np.int64) * 100
    )
    synth_q = ray.data.from_arrow(
        pa.table(
            {
                "feature_id": keep.column("feature_id"),
                "minx": pa.array(q("minx")),
                "miny": pa.array(q("miny")),
                "maxx": pa.array(q("maxx")),
                "maxy": pa.array(q("maxy")),
            }
        )
    )

    def norm(masks_ds):
        df = masks_ds.to_pandas()
        df["data"] = df["data"].map(bytes)
        return df.sort_values(["tile_x", "tile_y"]).reset_index(drop=True)

    a = norm(rasterize(got_ds, size=64))
    b = norm(rasterize(synth_q, size=64))
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0 and (a["fg"] > 0).any()


def test_blob_envelopes_lzma_bzip2(ray_session, tmp_path):
    """PBF blob envelope variants beyond zlib: lzma_data (field 4,
    both .lzma-alone and .xz containers) and the obsolete bzip2_data
    (field 5) decode via the stdlib; lz4/zstd stay a documented seam."""
    import bz2
    import lzma
    import struct

    def blob_bytes(kind, payload, field, comp):
        body = P._vi(2, len(payload)) + P._ld(field, comp)
        header = P._ld(1, kind.encode()) + P._vi(3, len(body))
        return struct.pack(">I", len(header)) + header + body

    b1 = P.build_primitive_block(
        np.array([1, 2, 3, 4], np.int64),
        np.array([0, 1000, 1000, 0], np.int64) * 10**6,
        np.array([0, 0, 1000, 1000], np.int64) * 10**6,
        [(100, np.array([1, 2, 3, 4, 1], np.int64), [("building", "yes")])],
    )
    b2 = P.build_primitive_block(
        np.array([5, 6, 7, 8], np.int64),
        np.array([2000, 3000, 3000, 2000], np.int64) * 10**6,
        np.array([0, 0, 1000, 1000], np.int64) * 10**6,
        [(200, np.array([5, 6, 7, 8, 5], np.int64), [("amenity", "parking")])],
    )
    header_block = P._ld(4, b"OsmSchema-V0.6") + P._ld(4, b"DenseNodes")
    path = str(tmp_path / "mixed.osm.pbf")
    with open(path, "wb") as fp:
        fp.write(blob_bytes("OSMHeader", header_block, 1, header_block))  # raw
        fp.write(
            blob_bytes("OSMData", b1, 4, lzma.compress(b1, format=lzma.FORMAT_ALONE))
        )
        fp.write(blob_bytes("OSMData", b2, 5, bz2.compress(b2)))
    nodes, ways = P.read_pbf(path)
    nd = nodes.to_pandas().sort_values("node_id")
    assert nd["node_id"].tolist() == [1, 2, 3, 4, 5, 6, 7, 8]
    assert set(ways.to_pandas()["way_id"]) == {100, 200}

    # xz container decodes through the same field
    assert P._inflate_blob(
        memoryview(P._vi(2, len(b1)) + P._ld(4, lzma.compress(b1)))
    ) == b1
    # lz4/zstd fields raise at the seam
    with pytest.raises(NotImplementedError, match="lz4"):
        P._inflate_blob(memoryview(P._vi(2, 3) + P._ld(6, b"xyz")))
