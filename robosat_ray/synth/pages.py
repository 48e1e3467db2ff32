"""Synthesize the `pages` input table (BASELINE.json input_hint schema:
url:string, warc_ts:timestamp, html:binary, text:string, lang:string)
deterministically from the driver's `documents` table.

The synthesis runs as a streaming Ray Data `map_batches` over the
documents parquet — never a driver-side loop — so it scales with the
input. The geo coordinates of each page are a pure function of doc_id
(integer hash chain, mirrored in the DuckDB oracle).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from robosat_ray import constants as C


def _hash32(ids: np.ndarray, mul: int, add: int = 0) -> np.ndarray:
    h = (ids.astype(np.uint64) * np.uint64(mul) + np.uint64(add)) % np.uint64(C.MOD32)
    return h


def page_coords(doc_id: np.ndarray):
    """doc_id -> (lon, my) in the engine plane. 60% of docs cluster into
    8 hot 'cities' (skew), the rest are uniform background.

    Exact-op chain (mirrored in SQL, see robosat_ray/oracle.py):
      h1 = (doc_id * H1_MUL) % 2^32 ;  u1 = h1 / 2^32
      h2 = (doc_id * H2_MUL + H2_ADD) % 2^32 ;  u2 = h2 / 2^32
      city rows  (doc_id % 10 < 6):  lon = CITY_LON[doc_id % 8] + (u1 - 0.5) * 0.2
                                     my  = CITY_MY[doc_id % 8] + (u2 - 0.5) * 0.0005
      background:                    lon = u1 * 360.0 - 180.0
                                     my  = 0.2 + u2 * 0.6
    """
    ids = np.asarray(doc_id, dtype=np.int64)
    u1 = _hash32(ids, C.H1_MUL).astype(np.float64) / float(C.MOD32)
    u2 = _hash32(ids, C.H2_MUL, C.H2_ADD).astype(np.float64) / float(C.MOD32)
    is_city = (ids % 10) < 6
    city = (ids % 8).astype(np.int64)
    clon = np.asarray(C.CITY_LON, dtype=np.float64)[city]
    cmy = np.asarray(C.CITY_MY, dtype=np.float64)[city]
    lon = np.where(is_city, clon + (u1 - 0.5) * C.CITY_LON_SPAN, u1 * 360.0 - 180.0)
    my = np.where(is_city, cmy + (u2 - 0.5) * C.CITY_MY_SPAN, C.BG_MY_LO + u2 * C.BG_MY_RANGE)
    return lon, my


def render_html(url: str, text: str, lang: str, lon: float, my: float) -> bytes:
    """Pure function (url, text, lang, coords) -> html bytes. The geo
    position is embedded as a meta tag; `text` is recoverable
    byte-identically from the <article> element (the invariant from
    BASELINE.json: byte-identical extracted text per url)."""
    return (
        '<html><head><meta charset="utf-8">'
        f'<meta name="geo.position" content="{lon!r};{my!r}">'
        f'<meta http-equiv="content-language" content="{lang}">'
        f"<title>{url}</title></head>"
        f"<body><nav>boilerplate nav {lang}</nav><article>{text}</article>"
        "<footer>footer boilerplate</footer></body></html>"
    ).encode("utf-8")


def _cc(*parts):
    """Element-wise string concat (separator '')."""
    import pyarrow.compute as pc

    return pc.binary_join_element_wise(*parts, "")


def urls_for(ids_arr: pa.Array) -> pa.Array:
    import pyarrow.compute as pc

    return _cc(pa.scalar(C.URL_PREFIX), pc.cast(ids_arr, pa.string()))


def make_pages_batch(batch: pa.Table) -> pa.Table:
    """documents batch (doc_id, text, lang) -> pages batch.

    Fully vectorized in Arrow C++ kernels (no per-row Python): the html
    is assembled with element-wise binary joins, mirroring render_html's
    template (render_html stays as the per-row reference impl used by
    tests; float formatting of the geo meta differs — repr vs Arrow
    cast — which is fine: the byte-identical invariant covers `text`,
    recovered from between the <article> tags)."""
    import pyarrow.compute as pc

    ids_arr = batch.column("doc_id")
    if isinstance(ids_arr, pa.ChunkedArray):
        ids_arr = ids_arr.combine_chunks()
    ids = ids_arr.to_numpy()
    texts = batch.column("text")
    langs = batch.column("lang")
    lon, my = page_coords(ids)
    urls = urls_for(ids_arr)
    html = _cc(
        pa.scalar('<html><head><meta charset="utf-8"><meta name="geo.position" content="'),
        pc.cast(pa.array(lon), pa.string()),
        pa.scalar(";"),
        pc.cast(pa.array(my), pa.string()),
        pa.scalar('"><meta http-equiv="content-language" content="'),
        langs,
        pa.scalar('"><title>'),
        urls,
        pa.scalar("</title></head><body><nav>boilerplate nav "),
        langs,
        pa.scalar("</nav><article>"),
        texts,
        pa.scalar("</article><footer>footer boilerplate</footer></body></html>"),
    )
    ts = pa.array(C.WARC_EPOCH_US + ids * 1_000_000, type=pa.timestamp("us"))
    return pa.table(
        {
            "url": urls,
            "warc_ts": ts,
            "html": pc.cast(html, pa.binary()),
            "text": texts,
            "lang": langs,
            "doc_id": ids_arr,
        }
    )


REPLICA_OFFSET = 1 << 24  # replica r gets doc_id + r * 2^24 (ids stay distinct)


def replicate_documents_batch(batch: pa.Table, replicas: int) -> pa.Table:
    """Deterministic scale-up for benchmarks: R copies of each document
    with offset doc_ids (=> different hash-derived coordinates per
    copy, same text payload). Pure function — both parallelism levels
    of the scaling run see identical bytes."""
    if replicas <= 1:
        return batch
    parts = []
    for r in range(replicas):
        ids = pa.compute.add(batch.column("doc_id"), r * REPLICA_OFFSET)
        parts.append(batch.set_column(batch.schema.get_field_index("doc_id"), "doc_id", ids))
    return pa.concat_tables(parts)


_DOC_CACHE: dict = {}


def _cached_documents(sf_dir: str, columns: tuple) -> pa.Table:
    key = (sf_dir, columns)
    t = _DOC_CACHE.get(key)
    if t is None:
        import pyarrow.parquet as pq

        t = pq.read_table(f"{sf_dir}/documents.parquet", columns=list(columns))
        _DOC_CACHE.clear()
        _DOC_CACHE[key] = t
    return t


def documents_source(sf_dir: str, columns, replicas: int = 1, num_blocks: int | None = None):
    """Streaming documents source. With replicas>1 + num_blocks, the
    source is a range-of-block-ids generator: each task materializes
    its slice of the replicated id space from a per-worker cached
    parquet table — no repartition barrier, no input shuffle, blocks
    are born parallel. (Plain read + repartition otherwise; NOTE:
    read_parquet(override_num_blocks=N) is 2.5x slower here because
    the testdata is one single-row-group file, so N read tasks each
    decode the whole file.)"""
    import ray.data

    if replicas > 1 and num_blocks:
        cols = tuple(columns)
        total = None  # resolved lazily inside tasks

        import pyarrow.parquet as pq

        n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
        total_rows = n_docs * replicas
        chunk = (total_rows + num_blocks - 1) // num_blocks

        def gen(batch: pa.Table) -> pa.Table:
            docs = _cached_documents(sf_dir, cols)
            idc = docs.schema.get_field_index("doc_id")
            out = []
            for bid in batch.column("id").to_pylist():
                lo = bid * chunk
                hi = min(lo + chunk, total_rows)
                if hi <= lo:
                    continue
                r = np.arange(lo, hi, dtype=np.int64)
                doc_idx = r % n_docs
                replica = r // n_docs
                part = docs.take(pa.array(doc_idx))
                ids = pa.compute.add(
                    part.column("doc_id"),
                    pa.array(replica * REPLICA_OFFSET),
                )
                out.append(part.set_column(idc, "doc_id", ids))
            return pa.concat_tables(out) if out else docs.slice(0, 0)

        base = ray.data.range(num_blocks, override_num_blocks=num_blocks)
        return base.map_batches(gen, batch_format="pyarrow")

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)
    if num_blocks:
        ds = ds.repartition(num_blocks)
    if replicas > 1:
        ds = ds.map_batches(
            lambda b: replicate_documents_batch(b, replicas), batch_format="pyarrow"
        )
    return ds


def pages_dataset(
    sf_dir: str,
    drop_golden_text: bool = False,
    replicas: int = 1,
    num_blocks: int | None = None,
):
    """Streaming pages Dataset from `{sf_dir}/documents.parquet`.

    drop_golden_text=True removes the golden `text` column so pipelines
    must re-derive it from `html` (exercises the extract stage)."""
    ds = documents_source(sf_dir, ["doc_id", "text", "lang"], replicas, num_blocks)
    ds = ds.map_batches(make_pages_batch, batch_format="pyarrow")
    if drop_golden_text:
        ds = ds.drop_columns(["text"])
    return ds
