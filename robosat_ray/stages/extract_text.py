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


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """Vectorized-ish extraction over an Arrow batch: the byte scan is
    per row (content extraction is inherently per-document), everything
    else stays Arrow. Adds/replaces the `text` column."""
    htmls = batch.column("html")
    texts = pa.array(
        [extract_text_bytes(h) for h in htmls.to_pylist()], type=pa.string()
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
