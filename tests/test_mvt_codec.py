"""MVT codec: command-word spec values, geometry round trip, cursor
continuation across rings, tags/keys/values tables, seam errors."""

import numpy as np
import pytest

from robosat_ray.codecs import mvt as M


def test_command_integers_spec():
    # spec 4.3.2: MoveTo count 1 -> 9, LineTo count 3 -> 26,
    # ClosePath count 1 -> 15
    assert M._cmd(1, 1) == 9
    assert M._cmd(2, 3) == 26
    assert M._cmd(7, 1) == 15


def test_geometry_roundtrip_single_ring():
    rx = np.array([2, 10, 10, 2], np.int64)
    ry = np.array([2, 2, 10, 10], np.int64)
    words = M.decode_varints(M.encode_geometry([(rx, ry)]))
    out = M.decode_geometry(words)
    assert len(out) == 1
    np.testing.assert_array_equal(out[0][0], rx)
    np.testing.assert_array_equal(out[0][1], ry)


def test_geometry_spec_example():
    """Spec 4.3.5.2 polygon example: MoveTo(3,6), LineTo(8,12),
    LineTo(20,34), ClosePath encodes to
    [9, 6, 12, 18, 10, 12, 24, 44, 15]."""
    rx = np.array([3, 8, 20], np.int64)
    ry = np.array([6, 12, 34], np.int64)
    words = M.decode_varints(M.encode_geometry([(rx, ry)]))
    np.testing.assert_array_equal(
        words.astype(np.int64), [9, 6, 12, 18, 10, 12, 24, 44, 15]
    )


def test_cursor_continues_across_rings():
    outer = (np.array([0, 100, 100, 0], np.int64), np.array([0, 0, 100, 100], np.int64))
    hole = (np.array([20, 20, 80, 80], np.int64), np.array([20, 80, 80, 20], np.int64))
    words = M.decode_varints(M.encode_geometry([outer, hole]))
    out = M.decode_geometry(words)
    assert len(out) == 2
    np.testing.assert_array_equal(out[1][0], hole[0])
    np.testing.assert_array_equal(out[1][1], hole[1])


def test_tile_roundtrip_with_tags():
    feats = [
        {
            "id": 7,
            "rings": [(np.array([0, 10, 10], np.int64), np.array([0, 0, 10], np.int64))],
            "tags": {"kind": "building", "floors": 3},
        },
        {
            "id": 9,
            "rings": [(np.array([5, 8, 8], np.int64), np.array([5, 5, 9], np.int64))],
            "tags": {"kind": "parking"},
        },
    ]
    buf = M.encode_mvt("footprints", feats)
    layers = M.decode_mvt(buf)
    assert len(layers) == 1
    lay = layers[0]
    assert lay["name"] == "footprints" and lay["version"] == 2
    assert lay["extent"] == M.EXTENT
    assert [f["id"] for f in lay["features"]] == [7, 9]
    assert lay["features"][0]["tags"] == {"kind": "building", "floors": 3}
    assert lay["features"][1]["tags"] == {"kind": "parking"}
    np.testing.assert_array_equal(lay["features"][0]["rings"][0][0], [0, 10, 10])
    # shared key 'kind' interned once
    assert buf.count(b"kind") == 1


def test_negative_and_large_coords():
    """Coords outside [0, extent) are legal (unclipped geometry)."""
    rx = np.array([-50, 5000, 5000, -50], np.int64)
    ry = np.array([-10, -10, 4500, 4500], np.int64)
    out = M.decode_geometry(M.decode_varints(M.encode_geometry([(rx, ry)])))
    np.testing.assert_array_equal(out[0][0], rx)
    np.testing.assert_array_equal(out[0][1], ry)


def test_seam_errors():
    with pytest.raises(ValueError, match="3 vertices"):
        M.encode_geometry([(np.array([1, 2], np.int64), np.array([1, 2], np.int64))])
    # unknown geometry command id
    bad = M.encode_varints(np.array([M._cmd(5, 1)], np.uint64))
    with pytest.raises(NotImplementedError, match="seam"):
        M.decode_geometry(M.decode_varints(bad))


def test_slippy_tree_mvt_roundtrip_and_resume(ray_session, tmp_path):
    """Real {z}/{x}/{y}.mvt tree on disk: write from the distributed
    payload pipeline, walk it back, decode every file; a second write
    skips every existing tile (reference file-existence resume)."""
    from robosat_ray import constants as C
    from robosat_ray.runtime.resume import read_slippy_tree, write_slippy_tree
    from robosat_ray.stages.vtiles import mvt_tile_payloads
    from robosat_ray.synth.footprints import footprints_dataset

    sf = "/root/testdata/sf0.001"
    tiles = mvt_tile_payloads(footprints_dataset(sf)).materialize()
    root = str(tmp_path / "vtree")
    man = write_slippy_tree(tiles, root, z=C.Z_JOIN, ext="mvt")
    assert len(man) == tiles.count() and not man["skipped"].any()
    assert (man["n_bytes"] > 0).all()

    back = read_slippy_tree(root, z=C.Z_JOIN, ext="mvt")
    src = tiles.to_pandas().sort_values(["tile_x", "tile_y"]).reset_index(drop=True)
    back = back.sort_values(["tile_x", "tile_y"]).reset_index(drop=True)
    assert len(back) == len(src)
    assert all(bytes(a) == bytes(b) for a, b in zip(back["data"], src["data"]))
    for payload in back["data"].head(5):
        lay = M.decode_mvt(bytes(payload))[0]
        assert lay["name"] == "footprints" and len(lay["features"]) > 0

    man2 = write_slippy_tree(tiles, root, z=C.Z_JOIN, ext="mvt")
    assert man2["skipped"].all()


def test_slippy_tree_png_masks(ray_session, tmp_path):
    """The reference's mask output layout end-to-end: rasterize ->
    paletted PNG bytes -> {z}/{x}/{y}.png tree -> walk + decode ->
    masks bit-equal to the burned originals."""
    import pandas as pd
    import pyarrow as pa

    from robosat_ray import constants as C
    from robosat_ray.codecs.palette import decode_mask_png, encode_mask_png
    from robosat_ray.runtime.resume import read_slippy_tree, write_slippy_tree
    from robosat_ray.stages.rasterize import rasterize
    from robosat_ray.synth.footprints import footprints_dataset

    sf = "/root/testdata/sf0.001"
    masks = rasterize(footprints_dataset(sf), size=64).materialize()

    def to_png(batch: pa.Table) -> pa.Table:
        sizes = batch.column("size").to_numpy()
        out = [
            encode_mask_png(np.frombuffer(d, np.uint8).reshape(int(s), int(s)))
            for s, d in zip(sizes, batch.column("data").to_pylist())
        ]
        return pa.table(
            {
                "tile_x": batch.column("tile_x"),
                "tile_y": batch.column("tile_y"),
                "data": pa.array(out, pa.binary()),
            }
        )

    pngs = masks.map_batches(to_png, batch_format="pyarrow")
    root = str(tmp_path / "masks")
    man = write_slippy_tree(pngs, root, z=C.Z_JOIN, ext="png")
    assert (man["n_bytes"] > 0).all()

    back = read_slippy_tree(root, z=C.Z_JOIN, ext="png")
    src = masks.to_pandas().set_index(["tile_x", "tile_y"])
    assert len(back) == len(src)
    for _, r in back.head(20).iterrows():
        idx, pal = decode_mask_png(bytes(r["data"]))
        want = np.frombuffer(
            src.loc[(r["tile_x"], r["tile_y"])]["data"], np.uint8
        ).reshape(idx.shape)
        np.testing.assert_array_equal(idx, want)
