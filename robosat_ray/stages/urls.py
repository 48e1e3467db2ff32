"""URL parsing + registered-domain aggregation — the web-corpus
curation step every Common-Crawl-style pipeline runs before
per-domain quotas / blocklists (cf. refinedweb/c4 URL filtering).

The corpus fixture (`rich_urls_batch`) synthesizes a deterministic URL
per document (scheme/host/tld/path-depth/query all pure functions of
doc_id and lang, mirrored expression-for-expression in oracle.URL_STATS),
because the flagship pages table uses a single constant host. The
OPERATOR is the parse + aggregate:

- parse: ONE vectorized RE2 `extract_regex` over the url column
  (scheme, host, path, query as a struct array — no Python per row),
- registered domain: second anchored RE2 over the de-www'd host with
  an explicit two-level-suffix alternation (the public-suffix-list
  shape, `co.uk` in the fixture),
- aggregate per registered domain: page count, https count, query
  count, max path depth, distinct language count.

Scale shape: in-batch (domain, lang) pre-aggregation bounds the
shuffle rows by (domains x langs) per block, then ONE groupby. At
10^12 pages the shuffle volume is the domain vocabulary, not the
corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

URL_TLDS = (".com", ".org", ".net", ".io", ".co.uk")
_URL_RX = r"^(?P<scheme>https?)://(?P<host>[^/?]+)(?P<path>/[^?]*)?(?:\?(?P<query>.*))?$"
_REGDOM_RX = r"(?P<regdom>[^.]+\.co\.uk|[^.]+\.[^.]+)$"


def rich_urls_batch(batch: pa.Table) -> pa.Table:
    """documents batch -> (url, lang): the deterministic URL fixture.

    scheme = http iff doc_id % 11 == 0 else https
    host   = ['' | 'www.'][doc_id % 3 == 0] + 'site<doc_id % 23>' + tld[doc_id % 5]
    path   = (doc_id % 4) segments '/p<(doc_id + i) % 17>'
    query  = '?q=<lang>&p=<doc_id % 13>' iff doc_id % 7 == 0
    """
    ids = batch.column("doc_id").to_numpy().astype(np.int64)
    langs = np.asarray(batch.column("lang").to_pandas(), dtype="U8")
    scheme = np.where(ids % 11 == 0, "http", "https")
    www = np.where(ids % 3 == 0, "www.", "")
    tld = np.asarray(URL_TLDS, dtype="U8")[ids % 5]
    host_core = np.char.add("site", (ids % 23).astype("U4"))
    depth = ids % 4
    path = np.full(len(ids), "", dtype="U24")
    for i in range(3):  # 3 fixed segment slots, not a per-row loop
        seg = np.char.add("/p", ((ids + i) % 17).astype("U4"))
        path = np.where(depth > i, np.char.add(path, seg), path)
    q = np.where(
        ids % 7 == 0,
        np.char.add(np.char.add("?q=", langs), np.char.add("&p=", (ids % 13).astype("U4"))),
        "",
    )
    url = np.char.add(scheme, "://")
    for part in (www, host_core, tld, path, q):
        url = np.char.add(url, part)
    return pa.table(
        {"url": pa.array(url.tolist(), pa.string()), "lang": batch.column("lang")}
    )


def parse_urls(batch: pa.Table) -> pa.Table:
    """url -> (regdom, is_https, has_query, path_depth, lang): one RE2
    pass for the URL grammar, one for the registered domain."""
    import pyarrow.compute as pc

    parts = pc.extract_regex(batch.column("url"), _URL_RX)
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    scheme = parts.field("scheme")
    host = parts.field("host")
    path = parts.field("path")
    # Arrow fills non-participating optional groups with '' (not null),
    # so query presence is a match test on the url itself
    has_q = pc.match_substring_regex(batch.column("url"), r"\?")
    dewww = pc.replace_substring_regex(host, r"^www\.", "")
    reg = pc.extract_regex(dewww, _REGDOM_RX)
    if isinstance(reg, pa.ChunkedArray):
        reg = reg.combine_chunks()
    depth = pc.count_substring(pc.coalesce(path, pa.scalar("")), "/")
    return pa.table(
        {
            "regdom": reg.field("regdom"),
            "is_https": pc.cast(pc.equal(scheme, "https"), pa.int64()),
            "has_query": pc.cast(has_q, pa.int64()),
            "path_depth": pc.cast(depth, pa.int64()),
            "lang": batch.column("lang"),
        }
    )


def url_stats(pages_ds):
    """-> (domain, n_pages, n_https, n_query, max_depth, n_langs),
    one row per registered domain."""
    from ray.data.aggregate import Count, Max, Sum

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        p = parse_urls(batch).to_pandas()
        g = (
            p.groupby(["regdom", "lang"], sort=False)
            .agg(
                n_pages=("is_https", "size"),
                n_https=("is_https", "sum"),
                n_query=("has_query", "sum"),
                max_depth=("path_depth", "max"),
            )
            .reset_index()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    # (domain, lang) partials -> exact per-pair rows, then one small
    # groupby per domain; distinct-lang count = Count of the pairs
    pairs = (
        pages_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["regdom", "lang"])
        .aggregate(
            Sum("n_pages", alias_name="n_pages"),
            Sum("n_https", alias_name="n_https"),
            Sum("n_query", alias_name="n_query"),
            Max("max_depth", alias_name="max_depth"),
        )
    )
    return (
        pairs.groupby("regdom")
        .aggregate(
            Sum("n_pages", alias_name="n_pages"),
            Sum("n_https", alias_name="n_https"),
            Sum("n_query", alias_name="n_query"),
            Max("max_depth", alias_name="max_depth"),
            Count(alias_name="n_langs"),
        )
        .map_batches(
            lambda b: b.rename_columns(
                ["domain", "n_pages", "n_https", "n_query", "max_depth", "n_langs"]
            ),
            batch_format="pyarrow",
        )
    )
