"""From-scratch Mapbox Vector Tile (MVT 2.1) encoder/decoder.

The reference ecosystem's native vector tile format (the Mapbox
vector-tile-spec, public at github.com/mapbox/vector-tile-spec;
robosat's pipeline feeds exactly this kind of slippy-map stack).
Built on the same protobuf wire primitives as the OSM PBF codec
(sources/osm_pbf.py: varint / zigzag / length-delimited fields):

  Tile    := {3: repeated Layer}
  Layer   := {15: version (=2), 1: name, 2: repeated Feature,
              3: repeated key (string), 4: repeated Value, 5: extent}
  Value   := {1: string_value | 4: int_value | ...}
  Feature := {1: id, 2: packed tags (key/value index pairs),
              3: geom_type (1 POINT, 2 LINESTRING, 3 POLYGON),
              4: packed geometry commands}
  geometry: CommandInteger = (id & 0x7) | (count << 3); MoveTo=1,
            LineTo=2, ClosePath=7; parameters are zigzag-encoded
            cursor deltas in tile-local integer coordinates.

Scope: POLYGON and LINESTRING/POINT geometry command streams, string
and int attribute values, multi-ring features (cursor continues across
rings per spec). Unknown Value variants and geometry types raise
NotImplementedError — the documented seam.
"""

from __future__ import annotations

import numpy as np

from robosat_ray.sources.osm_pbf import (
    _ld,
    _vi,
    _walk_fields,
    decode_varints,
    encode_varints,
    zigzag_decode,
    zigzag_encode,
)

EXTENT = 4096


def _cmd(cmd_id: int, count: int) -> int:
    return (cmd_id & 0x7) | (count << 3)


def encode_geometry(rings: list[tuple[np.ndarray, np.ndarray]]) -> bytes:
    """Rings of tile-local int coords (NOT closed: first vertex once)
    -> packed polygon command stream. The cursor carries across rings
    (spec 4.3.5.3): deltas of each MoveTo are relative to the previous
    ring's last LineTo vertex."""
    words: list[np.ndarray] = []
    cx = cy = np.int64(0)
    for rx, ry in rings:
        rx = np.asarray(rx, np.int64)
        ry = np.asarray(ry, np.int64)
        n = len(rx)
        if n < 3:
            raise ValueError("polygon ring needs >= 3 vertices")
        dx = np.diff(rx, prepend=cx)
        dy = np.diff(ry, prepend=cy)
        words.append(np.array([_cmd(1, 1)], np.uint64))
        words.append(zigzag_encode(np.array([dx[0], dy[0]], np.int64)))
        words.append(np.array([_cmd(2, n - 1)], np.uint64))
        inter = np.empty(2 * (n - 1), np.int64)
        inter[0::2] = dx[1:]
        inter[1::2] = dy[1:]
        words.append(zigzag_encode(inter))
        words.append(np.array([_cmd(7, 1)], np.uint64))
        cx, cy = rx[-1], ry[-1]
    return encode_varints(np.concatenate(words))


def decode_geometry(words: np.ndarray) -> list[tuple[np.ndarray, np.ndarray]]:
    """Packed polygon command words -> rings of absolute tile-local
    int coords (un-closed, matching encode_geometry's input)."""
    rings = []
    i = 0
    cx = cy = np.int64(0)
    cur_x: list[int] = []
    cur_y: list[int] = []
    n = len(words)
    while i < n:
        w = int(words[i])
        cmd_id, count = w & 0x7, w >> 3
        i += 1
        if cmd_id in (1, 2):  # MoveTo / LineTo
            params = zigzag_decode(words[i : i + 2 * count])
            i += 2 * count
            if cmd_id == 1 and cur_x:
                raise ValueError("MoveTo inside an open ring")
            dx = params[0::2]
            dy = params[1::2]
            ax = cx + np.cumsum(dx)
            ay = cy + np.cumsum(dy)
            cur_x.extend(int(v) for v in ax)
            cur_y.extend(int(v) for v in ay)
            cx, cy = np.int64(ax[-1]), np.int64(ay[-1])
        elif cmd_id == 7:  # ClosePath
            rings.append(
                (np.array(cur_x, np.int64), np.array(cur_y, np.int64))
            )
            cur_x, cur_y = [], []
        else:
            raise NotImplementedError(f"geometry command {cmd_id} (seam)")
    if cur_x:
        raise ValueError("unterminated ring in geometry stream")
    return rings


def encode_mvt(
    layer_name: str,
    features: list[dict],
    extent: int = EXTENT,
) -> bytes:
    """features: [{'id': int, 'rings': [(xs, ys), ...],
    'tags': {str: str | int}}] -> one-layer MVT bytes."""
    keys: list[str] = []
    kidx: dict[str, int] = {}
    vals: list[tuple] = []
    vidx: dict[tuple, int] = {}

    def intern_k(k: str) -> int:
        if k not in kidx:
            kidx[k] = len(keys)
            keys.append(k)
        return kidx[k]

    def intern_v(v) -> int:
        t = ("s", v) if isinstance(v, str) else ("i", int(v))
        if t not in vidx:
            vidx[t] = len(vals)
            vals.append(t)
        return vidx[t]

    feats = b""
    for f in features:
        tag_pairs = []
        for k, v in f.get("tags", {}).items():
            tag_pairs.extend([intern_k(k), intern_v(v)])
        body = _vi(1, int(f["id"]))
        if tag_pairs:
            body += _ld(2, encode_varints(np.array(tag_pairs, np.uint64)))
        body += _vi(3, 3)  # POLYGON
        body += _ld(4, encode_geometry(f["rings"]))
        feats += _ld(2, body)

    layer = _vi(15, 2) + _ld(1, layer_name.encode())
    layer += feats
    for k in keys:
        layer += _ld(3, k.encode())
    for t, v in vals:
        layer += _ld(4, _ld(1, v.encode()) if t == "s" else _vi(4, v))
    layer += _vi(5, extent)
    return _ld(3, layer)


def decode_mvt(payload: bytes) -> list[dict]:
    """MVT bytes -> [{'name', 'extent', 'version', 'features':
    [{'id', 'type', 'rings', 'tags'}]}]."""
    layers = []
    for field, wt, val in _walk_fields(memoryview(payload)):
        if field != 3 or wt != 2:
            continue
        name = ""
        version = 1
        extent = EXTENT
        keys: list[str] = []
        vals: list = []
        raw_feats = []
        for f2, w2, v2 in _walk_fields(val):
            if f2 == 15 and w2 == 0:
                version = v2
            elif f2 == 1 and w2 == 2:
                name = bytes(v2).decode()
            elif f2 == 2 and w2 == 2:
                raw_feats.append(v2)
            elif f2 == 3 and w2 == 2:
                keys.append(bytes(v2).decode())
            elif f2 == 4 and w2 == 2:
                got = None
                for f3, w3, v3 in _walk_fields(v2):
                    if f3 == 1 and w3 == 2:
                        got = bytes(v3).decode()
                    elif f3 == 4 and w3 == 0:
                        got = v3
                    else:
                        raise NotImplementedError(
                            f"MVT value variant {f3} (seam)"
                        )
                vals.append(got)
            elif f2 == 5 and w2 == 0:
                extent = v2
        features = []
        for rf in raw_feats:
            fid = 0
            ftype = 0
            tags: dict = {}
            rings = []
            for f3, w3, v3 in _walk_fields(rf):
                if f3 == 1 and w3 == 0:
                    fid = v3
                elif f3 == 2 and w3 == 2:
                    pairs = decode_varints(v3).astype(np.int64)
                    for ki, vi in zip(pairs[0::2], pairs[1::2]):
                        tags[keys[ki]] = vals[vi]
                elif f3 == 3 and w3 == 0:
                    ftype = v3
                elif f3 == 4 and w3 == 2:
                    rings = decode_geometry(decode_varints(v3))
            if ftype != 3:
                raise NotImplementedError("non-polygon MVT feature (seam)")
            features.append(
                {"id": fid, "type": ftype, "rings": rings, "tags": tags}
            )
        layers.append(
            {
                "name": name,
                "version": version,
                "extent": extent,
                "features": features,
            }
        )
    return layers
