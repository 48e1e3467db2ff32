"""PII scrubbing — the redaction pass every web-scale training-data
pipeline runs before tokenization (strip emails / phone numbers from
crawled text). Fully vectorized: both the match counting and the
replacement run in Arrow's RE2 kernels (`count_substring_regex`,
`replace_substring_regex`), so the stage is a pure streaming map with
no per-row Python. DuckDB's regexp functions are RE2 too, which makes
the oracle comparison byte-exact rather than merely "close" — the
same pattern string drives both engines.

The synthetic `documents` corpus contains no organic PII, so the
query deterministically plants one email + one phone per document
(pure function of doc_id, mirrored in the oracle SQL) before
scrubbing; the parity check then covers the planted matches AND the
no-match fast path over the body text.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# RE2-safe patterns (no backrefs / lookahead), shared verbatim with
# the DuckDB oracle. Char-class '-' is last so both parsers read it
# literally.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+1-[0-9]{3}-[0-9]{4}"
EMAIL_TOKEN = "<EMAIL>"
PHONE_TOKEN = "<PHONE>"


def _cc(*parts):
    return pc.binary_join_element_wise(*parts, "")


def plant_contacts_batch(batch: pa.Table) -> pa.Table:
    """Append a deterministic contact line to each document:
    ' Contact: user{doc_id}@example.com or +1-555-{doc_id%10000:04d}.'
    Pure Arrow kernels; the oracle builds the identical string with
    || / lpad."""
    ids = batch.column("doc_id")
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    ids_str = pc.cast(ids, pa.string())
    # pyarrow.compute has no mod kernel; the % runs in numpy and goes
    # straight back into an Arrow array (same int64 semantics)
    last4 = pc.utf8_lpad(
        pc.cast(pa.array(ids.to_numpy() % 10000), pa.string()), width=4, padding="0"
    )
    planted = _cc(
        batch.column("text"),
        pa.scalar(" Contact: user"),
        ids_str,
        pa.scalar("@example.com or +1-555-"),
        last4,
        pa.scalar("."),
    )
    return pa.table({"doc_id": ids, "t": planted})


def scrub_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, t) -> (doc_id, scrubbed, n_emails, n_phones). Counts
    are taken on the pre-redaction text; emails are redacted first so
    the phone pass never sees digits inside an already-replaced
    span (order mirrored in the oracle's nested regexp_replace)."""
    t = batch.column("t")
    n_emails = pc.cast(pc.count_substring_regex(t, EMAIL_RE), pa.int64())
    n_phones = pc.cast(pc.count_substring_regex(t, PHONE_RE), pa.int64())
    scrubbed = pc.replace_substring_regex(t, EMAIL_RE, EMAIL_TOKEN)
    scrubbed = pc.replace_substring_regex(scrubbed, PHONE_RE, PHONE_TOKEN)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "scrubbed": scrubbed,
            "n_emails": n_emails,
            "n_phones": n_phones,
        }
    )


def pii_scrub(documents_ds):
    """Plant deterministic contacts, then redact them: the standard
    pre-tokenization scrubbing stage as a streaming two-map pipeline
    (no shuffle, no state — scale-free)."""
    return (
        documents_ds.select_columns(["doc_id", "text"])
        .map_batches(plant_contacts_batch, batch_format="pyarrow")
        .map_batches(scrub_batch, batch_format="pyarrow")
    )
