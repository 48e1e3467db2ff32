"""Pure-numpy BMP codec: roundtrip, format-layout pin, seam errors."""

import struct

import numpy as np
import pytest

from robosat_ray.codecs.bmp import decode_bmp_gray8, encode_bmp_gray8


@pytest.mark.parametrize("shape", [(1, 1), (4, 7), (3, 5), (32, 48), (17, 33)])
def test_roundtrip_arbitrary_shapes(shape):
    rng = np.random.default_rng(sum(shape))
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    out = decode_bmp_gray8(encode_bmp_gray8(img))
    np.testing.assert_array_equal(out, img)


def test_layout_is_real_bmp():
    """Pin the on-disk layout against the BMP spec, field by field —
    the payload must be openable by any standard viewer."""
    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    b = encode_bmp_gray8(img)
    assert b[:2] == b"BM"
    file_size, _, _, offset = struct.unpack_from("<IHHI", b, 2)
    assert file_size == len(b)
    assert offset == 14 + 40 + 1024
    (info, w, h, planes, bpp, comp, img_size, _, _, ncol, _) = struct.unpack_from(
        "<IiiHHIIiiII", b, 14
    )
    assert (info, w, h, planes, bpp, comp, ncol) == (40, 4, 3, 1, 8, 0, 256)
    # grayscale palette: entry i = (i, i, i, 0) BGRX
    pal = np.frombuffer(b, np.uint8, 1024, 54).reshape(256, 4)
    assert (pal[:, 0] == np.arange(256)).all() and (pal[:, 3] == 0).all()
    # bottom-up rows: first stored row is the image's LAST row
    assert list(b[offset : offset + 4]) == [8, 9, 10, 11]
    assert img_size == 3 * 4  # stride 4 (already aligned)


def test_row_padding():
    """Width 5 -> stride 8: pad bytes exist and decode ignores them."""
    img = np.arange(10, dtype=np.uint8).reshape(2, 5)
    b = encode_bmp_gray8(img)
    offset = struct.unpack_from("<I", b, 10)[0]
    assert len(b) - offset == 2 * 8
    np.testing.assert_array_equal(decode_bmp_gray8(b), img)


def test_top_down_bmp_decodes():
    """Hand-built top-down variant (negative height) — decoder must
    honor the sign per the spec."""
    img = np.arange(8, dtype=np.uint8).reshape(2, 4)
    b = bytearray(encode_bmp_gray8(img[::-1]))  # stored order == image order
    struct.pack_into("<i", b, 14 + 8, -2)  # height := -2 (top-down)
    np.testing.assert_array_equal(decode_bmp_gray8(bytes(b)), img[::-1][::-1])


def test_non_bmp_and_unsupported_raise():
    with pytest.raises(NotImplementedError):
        decode_bmp_gray8(b"plain text payload")
    img = np.zeros((2, 2), dtype=np.uint8)
    b = bytearray(encode_bmp_gray8(img))
    struct.pack_into("<H", b, 14 + 14, 24)  # bpp := 24
    with pytest.raises(NotImplementedError):
        decode_bmp_gray8(bytes(b))


def test_palette_indirection():
    """Decoder maps through the palette, not raw indices: invert the
    palette and the decoded values must invert."""
    img = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    b = bytearray(encode_bmp_gray8(img))
    pal = np.frombuffer(bytes(b[54 : 54 + 1024]), np.uint8).reshape(256, 4).copy()
    pal[:, :3] = 255 - pal[:, :3]
    b[54 : 54 + 1024] = pal.tobytes()
    np.testing.assert_array_equal(decode_bmp_gray8(bytes(b)), 255 - img)


def test_synth_payloads_are_real_containers():
    """The media table's image payloads (BMP for even ids, PNG for
    odd — see stages/multimodal.synth_media_batch) decode to exactly
    the Weyl pixel tensor the features/oracle chain is built on."""
    import pyarrow as pa

    from robosat_ray.stages.multimodal import (
        decode_raster_gray8,
        fake_decode,
        synth_media_batch,
    )

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 7], pa.int64()),
            "text": pa.array(["a b", "c", "d e f", "ghi"], pa.string()),
        }
    )
    media = synth_media_batch(docs)
    text_by_id = dict(
        zip(docs.column("doc_id").to_pylist(), docs.column("text").to_pylist())
    )
    for r in media.to_pylist():
        want = fake_decode(
            text_by_id[r["media_id"]].encode(), r["width"], r["height"]
        )
        np.testing.assert_array_equal(decode_raster_gray8(r["payload"]), want)
        if r["media_id"] % 2 == 0:  # even ids stay genuine BMP files
            np.testing.assert_array_equal(decode_bmp_gray8(r["payload"]), want)
