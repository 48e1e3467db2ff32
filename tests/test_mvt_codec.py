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
