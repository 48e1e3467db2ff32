"""HTML -> text extraction stage (graft op M23 in SURVEY.md §2.2).

A pure function of the `html` bytes — no locale, no dict order — so the
extracted `text` is byte-identical per url (BASELINE.json invariant).
The reference analog is robosat's deterministic per-record transforms
(e.g. robosat/tools/features.py:46-47 thresholding); content extraction
itself has no reference counterpart.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_OPEN = b"<article>"
_CLOSE = b"</article>"


def extract_text_bytes(html: bytes) -> str:
    """Extract main content: bytes between the first <article> and the
    last </article>. Returns '' when no article element exists."""
    i = html.find(_OPEN)
    if i < 0:
        return ""
    j = html.rfind(_CLOSE)
    if j < 0 or j < i:
        return ""
    return html[i + len(_OPEN) : j].decode("utf-8")


def _gather_ranges(data: np.ndarray, start: np.ndarray, lens: np.ndarray):
    """Copy [start[i], start[i]+lens[i]) byte ranges out of `data` into
    one contiguous buffer; returns (out_bytes, out_offsets int32)."""
    out_off = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=out_off[1:])
    tot = int(out_off[-1])
    idx = np.repeat(start, lens) + (
        np.arange(tot, dtype=np.int64) - np.repeat(out_off[:-1], lens)
    )
    return data[idx], out_off.astype(np.int32)


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """Fully vectorized extraction: Arrow find_substring locates the
    tags, a numpy byte-range gather slices the content — no per-row
    Python. Assumes a single <article> element per document (true for
    the synthetic corpus; extract_text_bytes with find/rfind is the
    general per-row reference). Rows without an article get ''."""
    harr = batch.column("html")
    if isinstance(harr, pa.ChunkedArray):
        harr = harr.combine_chunks()
    n = len(harr)
    p1 = pc.find_substring(harr, _OPEN.decode()).to_numpy().astype(np.int64)
    p2 = pc.find_substring(harr, _CLOSE.decode()).to_numpy().astype(np.int64)
    off = np.frombuffer(harr.buffers()[1], dtype=np.int32)[
        harr.offset : harr.offset + n + 1
    ].astype(np.int64)
    data = np.frombuffer(harr.buffers()[2], dtype=np.uint8)
    valid = (p1 >= 0) & (p2 > p1)
    start = off[:-1] + np.where(valid, p1 + len(_OPEN), 0)
    lens = np.where(valid, off[:-1] + p2 - start, 0)
    out_data, out_off = _gather_ranges(data, start, lens)
    texts = pa.StringArray.from_buffers(
        n, pa.py_buffer(out_off.tobytes()), pa.py_buffer(out_data.tobytes())
    )
    if "text" in batch.column_names:
        batch = batch.drop_columns(["text"])
    return batch.append_column("text", texts)


def add_extract_text(ds, drop_html: bool = True):
    """pages Dataset (with html) -> same + text column. Drops the wide
    `html` binary column right after extraction by default so shuffle
    payloads stay narrow (SURVEY.md §7.4)."""
    ds = ds.map_batches(extract_text_batch, batch_format="pyarrow")
    if drop_html:
        ds = ds.drop_columns(["html"])
    return ds
