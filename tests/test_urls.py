"""URL parser spec tests (oracle parity covers the aggregate chain)."""

import pyarrow as pa

from robosat_ray.stages.urls import parse_urls


def _parse(urls, langs=None):
    langs = langs or ["en"] * len(urls)
    return parse_urls(pa.table({"url": urls, "lang": langs})).to_pydict()


def test_registered_domain_two_level_suffix():
    got = _parse(
        [
            "https://www.site1.co.uk/p1",
            "http://site2.co.uk",
            "https://a.b.site3.com/x/y?q=1",
        ]
    )
    assert got["regdom"] == ["site1.co.uk", "site2.co.uk", "site3.com"]


def test_www_stripped_only_as_prefix():
    got = _parse(["https://wwwsite.com", "https://www.www2.org"])
    assert got["regdom"] == ["wwwsite.com", "www2.org"]


def test_scheme_depth_query():
    got = _parse(["http://x.io/p1/p2/p3", "https://x.io", "https://x.io?q=a"])
    assert got["is_https"] == [0, 1, 1]
    assert got["path_depth"] == [3, 0, 0]
    assert got["has_query"] == [0, 0, 1]
