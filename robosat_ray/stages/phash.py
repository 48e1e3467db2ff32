"""Image perceptual-hash dedup — near-duplicate IMAGE detection, the
multimodal counterpart of text near-dup: decode every image payload
(real PNG/BMP container parse), fingerprint it with a 63-bit dHash
(difference hash: does brightness rise left-to-right across a coarse
grid?), and mine all pairs within PHASH_MAX_HAMMING bits through the
SimHash pigeonhole banding machinery (neardup.banded_hamming_pairs).

dHash spec (mirrored bit-for-bit in oracle.PHASH_DUP):
- thumbnail: nearest-neighbor 8x9 grid over the decoded pixels,
  p[y][x] = px[(y*h)//8][(x*w)//9] for y in 0..7, x in 0..8
- bit(y*8 + x) = p[y][x] > p[y][x+1]  (strict >, ties -> 0)
- dhash = sum(bit << (y*8+x)) with bit 63 masked off (the SimHash
  63-bit convention, so banding code is shared unchanged)

Near-dup fixture (the re-encode-with-one-bad-pixel scenario): every
image doc (doc_id % 3 == 0, % 2 == 0 so the corrupted copy is a BMP
re-encode) ALSO ships a copy (media_id + 10M) with ONE pixel bumped
at flat index seed % (w*h), value (v + 7) mod 256. When the bumped
pixel misses the 8x9 grid the copy hashes IDENTICAL (hamming 0);
when it lands on the grid a handful of difference bits flip —
exactly the 0-3 bit spread perceptual dedup exists to catch.

Scale shape: decode + hash is a pure streaming map over payload
bytes; pair mining inherits the banded plan (4 compact band buckets,
run caps, bucketed pair dedup) — nothing here is new shuffle
machinery, which is the point: one fingerprint map adapts the whole
text near-dup stack to images.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

PHASH_MAX_HAMMING = 3
PERTURB_BASE = 10_000_000
_I63 = np.uint64(0x7FFFFFFFFFFFFFFF)


def dhash63(px: np.ndarray) -> int:
    """(h, w) uint8 -> 63-bit dHash (int64-safe)."""
    h, w = px.shape
    ys = (np.arange(8) * h) // 8
    xs = (np.arange(9) * w) // 9
    t = px[np.ix_(ys, xs)].astype(np.int64)
    bits = (t[:, :-1] > t[:, 1:]).ravel()
    val = np.uint64(0)
    val = (bits.astype(np.uint64) << np.arange(64, dtype=np.uint64)[: len(bits)]).sum(
        dtype=np.uint64
    )
    return int(val & _I63)


def synth_image_pairs_batch(batch: pa.Table) -> pa.Table:
    """documents batch -> image media rows + one-bad-pixel copies:
    (media_id, payload). Only doc_id % 6 == 0 (image kind, BMP
    container) to keep the fixture enumerable; the copy re-encodes
    the decoded tensor with one bumped pixel — a REAL corrupted
    re-encode, not a hash tweak."""
    import hashlib

    from robosat_ray.codecs.bmp import encode_bmp_gray8
    from robosat_ray.stages.multimodal import fake_decode

    ids = batch.column("doc_id").to_numpy()
    texts = batch.column("text").to_pylist()
    out_id, out_pay = [], []
    for i, t in zip(ids, texts):
        if i % 6 != 0:
            continue
        w = 32 + (int(i) % 4) * 16
        h = 32 + (int(i) % 3) * 16
        px = fake_decode(t.encode(), w, h)
        out_id.append(int(i))
        out_pay.append(encode_bmp_gray8(px))
        seed = int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little")
        flat = seed % (w * h)
        px2 = px.copy().ravel()
        px2[flat] = (int(px2[flat]) + 7) % 256
        out_id.append(int(i) + PERTURB_BASE)
        out_pay.append(encode_bmp_gray8(px2.reshape(h, w)))
    return pa.table(
        {
            "media_id": pa.array(np.asarray(out_id, dtype=np.int64)),
            "payload": pa.array(out_pay, pa.binary()),
        }
    )


def _hash_batch(batch: pa.Table) -> pa.Table:
    from robosat_ray.stages.multimodal import decode_raster_gray8

    hs = [
        dhash63(decode_raster_gray8(p))
        for p in batch.column("payload").to_pylist()
    ]
    return pa.table(
        {
            "doc_id": batch.column("media_id"),
            "simhash": pa.array(np.asarray(hs, dtype=np.int64)),
        }
    )


def phash_dup_pairs(documents_ds, max_hamming: int = PHASH_MAX_HAMMING):
    """-> (doc_a, doc_b, hamming): image pairs within max_hamming
    dHash bits (media ids; doc_b = doc_a + PERTURB_BASE for the
    planted copies unless a natural collision joins in)."""
    from robosat_ray.stages.neardup import banded_hamming_pairs

    hashed = (
        documents_ds.select_columns(["doc_id", "text"])
        .map_batches(synth_image_pairs_batch, batch_format="pyarrow")
        .map_batches(_hash_batch, batch_format="pyarrow")
    )
    return banded_hamming_pairs(hashed, max_hamming)
