"""From-scratch baseline JPEG codec: wire-format structure, lossless
blocky subspace, quant=1 error bound, color/4:2:0 paths, restart
markers, seam errors."""

import numpy as np
import pytest

from robosat_ray.codecs import jpeg as J


def _blocky(h, w, seed=0):
    """8x8-blockwise-constant uint8 image (the lossless subspace)."""
    rng = np.random.default_rng(seed)
    b = rng.integers(0, 256, (h // 8, w // 8), dtype=np.uint8)
    return np.repeat(np.repeat(b, 8, axis=0), 8, axis=1)


def test_marker_structure():
    img = _blocky(16, 24, seed=1)
    buf = J.encode_jpeg_gray(img)
    assert buf[:2] == b"\xff\xd8" and buf[-2:] == b"\xff\xd9"
    # JFIF APP0, DQT, SOF0, DHT, SOS all present in order
    for marker in (b"\xff\xe0", b"\xff\xdb", b"\xff\xc0", b"\xff\xc4", b"\xff\xda"):
        assert marker in buf
    assert buf.index(b"\xff\xdb") < buf.index(b"\xff\xc0") < buf.index(b"\xff\xda")


def test_zigzag_is_involution():
    assert (J.ZIGZAG[J.UNZIGZAG] == np.arange(64)).all()
    # spec spot values: scan position 1 is (0,1), position 2 is (1,0),
    # position 63 is (7,7)
    assert J.ZIGZAG[1] == 1 and J.ZIGZAG[2] == 8 and J.ZIGZAG[63] == 63


def test_dct_matrix_orthonormal():
    M = J._dct_matrix()
    np.testing.assert_allclose(M @ M.T, np.eye(8), atol=1e-12)


def test_huffman_tables_canonical():
    codes = J._build_codes(J.DC_LUMA_BITS, J.DC_LUMA_VALS)
    # Annex K.3.1: category 0 -> code 00 (2 bits), category 11 ->
    # 111111110 (9 bits)
    assert codes[0] == (0b00, 2)
    assert codes[11] == (0b111111110, 9)
    ac = J._build_codes(J.AC_LUMA_BITS, J.AC_LUMA_VALS)
    assert ac[0x00] == (0b1010, 4)  # EOB
    assert ac[0xF0] == (0b11111111001, 11)  # ZRL
    assert ac[0x01] == (0b00, 2)


def test_blocky_roundtrip_exact():
    for h, w, seed in [(16, 16, 0), (32, 48, 1), (64, 80, 2), (8, 8, 3)]:
        img = _blocky(h, w, seed)
        out = J.decode_jpeg(J.encode_jpeg_gray(img))
        np.testing.assert_array_equal(out, img)


def test_arbitrary_quant1_error_bound():
    """quant=1: every coefficient rounds by <=0.5, so the IDCT error is
    small and the Huffman/zigzag layer must be structurally perfect
    (any stream bug scrambles blocks wildly)."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (40, 56), dtype=np.uint8)
    out = J.decode_jpeg(J.encode_jpeg_gray(img))
    assert out.shape == img.shape
    assert np.abs(out.astype(np.int64) - img.astype(np.int64)).max() <= 4


def test_non_multiple_of_8_dims():
    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, (21, 13), dtype=np.uint8)
    out = J.decode_jpeg(J.encode_jpeg_gray(img))
    assert out.shape == (21, 13)
    assert np.abs(out.astype(np.int64) - img.astype(np.int64)).max() <= 4


def test_std_quant_smooth_image_psnr():
    y, x = np.mgrid[0:64, 0:64]
    img = (128 + 80 * np.sin(x / 10.0) * np.cos(y / 13.0)).astype(np.uint8)
    buf = J.encode_jpeg_gray(img, qtab=J.STD_LUMA_QUANT)
    out = J.decode_jpeg(buf)
    mse = np.mean((out.astype(np.float64) - img.astype(np.float64)) ** 2)
    psnr = 10 * np.log10(255.0**2 / mse)
    assert psnr > 30.0
    # lossy table really did quantize: bytes much smaller than quant=1
    assert len(buf) < len(J.encode_jpeg_gray(img))


def test_byte_stuffing_roundtrip():
    """An all-extreme image drives 0xFF bytes into the entropy stream;
    the stuffed stream must still decode exactly."""
    found = False
    for seed in range(12):
        img = _blocky(32, 32, seed)
        buf = J.encode_jpeg_gray(img)
        scan = buf[buf.index(b"\xff\xda") + 2 :]
        if b"\xff\x00" in scan:
            found = True
        np.testing.assert_array_equal(J.decode_jpeg(buf), img)
    assert found  # at least one stream exercised stuffing


def test_restart_markers():
    img = _blocky(48, 64, seed=5)
    buf = J.encode_jpeg_gray(img, restart_interval=3)
    assert b"\xff\xd0" in buf  # RST0 present
    np.testing.assert_array_equal(J.decode_jpeg(buf), img)


def test_color_444_roundtrip():
    """Blockwise-constant RGB through 4:4:4: YCbCr forward+inverse
    rounding costs at most 2 levels per channel."""
    rng = np.random.default_rng(9)
    b = rng.integers(0, 256, (2, 3, 3), dtype=np.uint8)
    img = np.repeat(np.repeat(b, 8, axis=0), 8, axis=1)
    out = J.decode_jpeg(J.encode_jpeg_color(img))
    assert out.shape == img.shape
    assert np.abs(out.astype(np.int64) - img.astype(np.int64)).max() <= 2


def test_color_420_roundtrip_constant_chroma():
    """4:2:0 with 16x16-blockwise-constant color: subsampling is then
    lossless, so the decoded image matches within rounding."""
    rng = np.random.default_rng(10)
    b = rng.integers(0, 256, (2, 2, 3), dtype=np.uint8)
    img = np.repeat(np.repeat(b, 16, axis=0), 16, axis=1)
    buf = J.encode_jpeg_color(img, subsample=True)
    out = J.decode_jpeg(buf)
    assert out.shape == img.shape
    assert np.abs(out.astype(np.int64) - img.astype(np.int64)).max() <= 2
    # the SOF really declares 2x2 luma sampling
    sof = buf[buf.index(b"\xff\xc0") + 4 :]
    assert sof[6] == 1 and sof[7] == 0x22


def test_seam_errors():
    img = _blocky(16, 16)
    buf = bytearray(J.encode_jpeg_gray(img))
    i = bytes(buf).index(b"\xff\xc0")
    buf[i + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="progressive"):
        J.decode_jpeg(bytes(buf))
    with pytest.raises(NotImplementedError, match="seam"):
        J.decode_jpeg(b"not a jpeg")
    # color payload refused by the gray8 entry point
    rgb = np.repeat(np.repeat(np.zeros((1, 1, 3), np.uint8), 8, 0), 8, 1)
    with pytest.raises(NotImplementedError, match="gray8"):
        J.decode_jpeg_gray8(J.encode_jpeg_color(rgb))


def test_extend_spec_values():
    # F.12: size=3, bits 011 (=3) -> -4; bits 100 (=4) -> 4
    assert J._extend(0b011, 3) == -4
    assert J._extend(0b100, 3) == 4
    assert J._extend(0, 0) == 0
    assert J._extend(1, 1) == 1
    assert J._extend(0, 1) == -1
