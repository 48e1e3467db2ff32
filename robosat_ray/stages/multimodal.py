"""Multimodal columns: image/audio/video as opaque `binary` columns
with typed metadata, processed by actor-pool map_batches stages.

The image path is REAL bytes->pixels: the synth side encodes each
deterministic pixel tensor as a genuine raster file — gray8 PNG
(codecs/png.py, from-scratch zlib+numpy container) for odd doc_ids,
8-bpp BMP (codecs/bmp.py) for even — and MediaDecoder parses the
bytes back, magic-dispatched per payload. Pixel VALUES stay the
md5-seeded Weyl sequence so the DuckDB MEDIA_FEATURES oracle
reproduces the whole decode->resize->feature chain exactly. Formats
the numpy codecs can't parse raise NotImplementedError
(mode="strict") — the seam where PIL.Image.open / soundfile.read
drops in at deployment; mode="fake" keeps the hash-derived decode for
payloads that aren't real containers.

Schema (media table):
  media_id: int64, kind: string {image,audio,video},
  payload: binary, width: int32, height: int32, n_frames: int32
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_frames", pa.int32()),
    ]
)


def synth_media_batch(batch: pa.Table) -> pa.Table:
    """documents batch -> deterministic media rows: pixel tensor =
    md5(text)-seeded Weyl sequence (SQL-mirrorable), payload = that
    tensor REALLY ENCODED as a raster container — gray8 PNG for odd
    doc_ids, 8-bpp BMP for even — so the decode stage exercises actual
    container parsing (two formats, magic-dispatched), not a hash
    stand-in. The pixel VALUES are container-independent, so the
    DuckDB oracle is unchanged."""
    from robosat_ray.codecs.bmp import encode_bmp_gray8
    from robosat_ray.codecs.png import encode_png

    ids = batch.column("doc_id").to_numpy()
    texts = batch.column("text").to_pylist()
    kinds = np.asarray(["image", "audio", "video"], dtype=object)[(ids % 3).astype(np.int64)]
    w = (32 + (ids % 4) * 16).astype(np.int32)
    h = (32 + (ids % 3) * 16).astype(np.int32)
    nf = np.where(ids % 3 == 2, 8 + (ids % 5), 1).astype(np.int32)
    payloads = [
        (encode_png if i % 2 else encode_bmp_gray8)(
            fake_decode(t.encode(), int(wi), int(hi))
        )
        for i, t, wi, hi in zip(ids, texts, w, h)
    ]
    return pa.table(
        {
            "media_id": pa.array(ids),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(w),
            "height": pa.array(h),
            "n_frames": pa.array(nf),
        }
    )


_DECODE_MUL = np.uint64(0x9E3779B97F4A7C15)


def fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in decode: md5-seeded Weyl sequence, top
    byte per pixel — chosen to be SQL-expressible (md5_number mod 2^64
    + HUGEINT arithmetic) so the media feature chain has an exact
    DuckDB oracle. Replace with a real codec at deployment."""
    seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "little")
    idx = np.arange(height * width, dtype=np.uint64) + np.uint64(1)
    v = (np.uint64(seed) + idx * _DECODE_MUL) >> np.uint64(56)
    return v.astype(np.uint8).reshape(height, width)


def decode_raster_gray8(payload: bytes) -> np.ndarray:
    """Magic-dispatched bytes -> (h, w) uint8: 'BM' -> the BMP codec,
    PNG signature -> the from-scratch PNG codec (gray or paletted
    indices), FFD8 -> the from-scratch baseline JPEG codec; anything
    else raises NotImplementedError — the seam where a full codec
    stack (PIL/cv2/ffmpeg) drops in."""
    if payload[:2] == b"BM":
        from robosat_ray.codecs.bmp import decode_bmp_gray8

        return decode_bmp_gray8(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        from robosat_ray.codecs.png import decode_png_gray8

        return decode_png_gray8(payload)
    if payload[:2] == b"\xff\xd8":
        from robosat_ray.codecs.jpeg import decode_jpeg_gray8

        return decode_jpeg_gray8(payload)
    raise NotImplementedError("unknown raster container (real codec seam)")


class MediaDecoder:
    """Actor-pool stage: decoder state (codec LUTs / model handles)
    builds once per actor in __init__. mode='container' (alias 'bmp')
    REALLY parses the payload bytes, magic-dispatched across the
    from-scratch BMP and PNG codecs; mode='fake' hashes them into a
    deterministic tensor; mode='strict' raises at the seam where a
    full codec stack (PIL/cv2/ffmpeg) drops in."""

    def __init__(self, mode: str = "container", strict: bool = False):
        self.mode = "strict" if strict else mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.mode == "strict":
            raise NotImplementedError(
                "media decode beyond 8-bpp BMP / 8-bit PNG requires a "
                "codec stack (PIL/cv2/ffmpeg), not available in this "
                "environment"
            )
        payloads = batch.column("payload").to_pylist()
        ws = batch.column("width").to_numpy()
        hs = batch.column("height").to_numpy()
        if self.mode in ("container", "bmp"):
            pixels = [decode_raster_gray8(p).tobytes() for p in payloads]
        else:
            pixels = [fake_decode(p, int(w), int(h)).tobytes() for p, w, h in zip(payloads, ws, hs)]
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "width": batch.column("width"),
                "height": batch.column("height"),
                "n_frames": batch.column("n_frames"),
                "pixels": pa.array(pixels, pa.binary()),
            }
        )


def resize_batch(batch: pa.Table, out_w: int = 16, out_h: int = 16) -> pa.Table:
    """Nearest-neighbor resize of decoded tensors (vectorized index
    gather per row)."""
    ws = batch.column("width").to_numpy()
    hs = batch.column("height").to_numpy()
    pixels = batch.column("pixels").to_pylist()
    out = []
    for p, w, h in zip(pixels, ws, hs):
        img = np.frombuffer(p, dtype=np.uint8).reshape(int(h), int(w))
        yi = (np.arange(out_h) * h // out_h).astype(np.int64)
        xi = (np.arange(out_w) * w // out_w).astype(np.int64)
        out.append(img[yi][:, xi].tobytes())
    t = batch.drop_columns(["pixels"])
    t = t.append_column("pixels", pa.array(out, pa.binary()))
    t = t.set_column(t.schema.get_field_index("width"), "width", pa.array(np.full(len(out), out_w, np.int32)))
    t = t.set_column(t.schema.get_field_index("height"), "height", pa.array(np.full(len(out), out_h, np.int32)))
    return t


def feature_batch(batch: pa.Table) -> pa.Table:
    """Per-media features: mean/std/histogram-entropy of the decoded
    tensor (the stand-in for a model embedding stage)."""
    import math

    pixels = batch.column("pixels").to_pylist()
    means, stds, ents = [], [], []
    for p in pixels:
        v = np.frombuffer(p, dtype=np.uint8).astype(np.int64)
        n = len(v)
        # integer moments -> identical IEEE expressions to the SQL
        # oracle (exact int sums; float ops in the same order)
        sx = int(v.sum())
        sxx = int((v * v).sum())
        mean = sx / n
        var = sxx / n - mean * mean
        means.append(mean)
        stds.append(math.sqrt(max(var, 0.0)))
        cnt = np.bincount(v, minlength=256)
        nz = cnt[cnt > 0] / n
        # log2 differs by 1 ulp numpy<->DuckDB: round to 8dp
        ents.append(float(np.round(-(nz * np.log2(nz)).sum(), 8)))
    return pa.table(
        {
            "media_id": batch.column("media_id"),
            "kind": batch.column("kind"),
            "mean": pa.array(means),
            "std": pa.array(stds),
            "entropy": pa.array(ents),
        }
    )


def frame_sample_batch(batch: pa.Table, every: int = 4) -> pa.Table:
    """Video rows fan out to one row per sampled frame index (flat-map
    shape; images/audio pass through as frame 0)."""
    ids = batch.column("media_id").to_numpy()
    kinds = batch.column("kind").to_pylist()
    nf = batch.column("n_frames").to_numpy()
    out_id, out_frame = [], []
    for i, (mid, kind, n) in enumerate(zip(ids, kinds, nf)):
        frames = range(0, int(n), every) if kind == "video" else [0]
        for f in frames:
            out_id.append(mid)
            out_frame.append(f)
    return pa.table(
        {
            "media_id": pa.array(out_id, pa.int64()),
            "frame": pa.array(out_frame, pa.int64()),
        }
    )


def blocky_fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """Like fake_decode but CONSTANT per 8x8 block: one Weyl value per
    block, replicated — the subspace on which baseline JPEG with an
    all-ones quant table is exactly lossless (only DC energy; see
    codecs/jpeg.py module docstring), so the decoded pixels are
    SQL-replayable while the entropy layer is the real wire format."""
    seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "little")
    nby, nbx = height // 8, width // 8
    idx = np.arange(nby * nbx, dtype=np.uint64) + np.uint64(1)
    v = ((np.uint64(seed) + idx * _DECODE_MUL) >> np.uint64(56)).astype(np.uint8)
    return np.repeat(np.repeat(v.reshape(nby, nbx), 8, axis=0), 8, axis=1)


def synth_jpeg_media_batch(batch: pa.Table) -> pa.Table:
    """documents batch -> media rows whose payload is a REAL baseline
    JPEG of the blocky md5-Weyl tensor (same w/h/kind formulas as
    synth_media_batch; dims are all multiples of 8)."""
    from robosat_ray.codecs.jpeg import encode_jpeg_gray

    ids = batch.column("doc_id").to_numpy()
    texts = batch.column("text").to_pylist()
    kinds = np.asarray(["image", "audio", "video"], dtype=object)[(ids % 3).astype(np.int64)]
    w = (32 + (ids % 4) * 16).astype(np.int32)
    h = (32 + (ids % 3) * 16).astype(np.int32)
    nf = np.where(ids % 3 == 2, 8 + (ids % 5), 1).astype(np.int32)
    payloads = [
        encode_jpeg_gray(blocky_fake_decode(t.encode(), int(wi), int(hi)))
        for t, wi, hi in zip(texts, w, h)
    ]
    return pa.table(
        {
            "media_id": pa.array(ids),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(w),
            "height": pa.array(h),
            "n_frames": pa.array(nf),
        }
    )


def jpeg_media_pipeline(sf_dir: str, concurrency=(1, 4)):
    """documents -> media (real baseline-JPEG payloads) -> decode
    (actor pool, real Huffman/zigzag/IDCT byte parsing) -> resize ->
    features. Same downstream chain as media_pipeline; the oracle
    replays the blocky tensor (JPEG_FEATURES)."""
    import ray.data

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    media = docs.map_batches(synth_jpeg_media_batch, batch_format="pyarrow")
    decoded = media.map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"mode": "container"},
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )
    resized = decoded.map_batches(resize_batch, batch_format="pyarrow")
    return resized.map_batches(feature_batch, batch_format="pyarrow")


def media_pipeline(sf_dir: str, concurrency=(1, 4)):
    """documents -> media (real BMP/PNG payloads) -> decode (actor
    pool, real byte parsing, magic dispatch) -> resize -> features."""
    import ray.data

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    media = docs.map_batches(synth_media_batch, batch_format="pyarrow")
    decoded = media.map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"mode": "container"},
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )
    resized = decoded.map_batches(resize_batch, batch_format="pyarrow")
    return resized.map_batches(feature_batch, batch_format="pyarrow")
