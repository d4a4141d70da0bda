"""Sitemap source (sources/sitemap.py): urlset/sitemapindex parse,
entity escaping, optional fields, gzip, batch stage."""

import zlib

import pyarrow as pa

from pdf_table_extractor_ray.sources.sitemap import (
    parse_sitemap,
    parse_sitemap_batches,
    write_sitemap_index,
    write_sitemap_xml,
)


def test_urlset_roundtrip_with_entities_and_optionals():
    entries = [
        ("https://a.test/p?x=1&y=2", "2025-03-01", "daily", "0.8"),
        ("https://a.test/<odd>", None, None, None),
    ]
    got = parse_sitemap(write_sitemap_xml(entries))
    assert got == [
        ("url", "https://a.test/p?x=1&y=2", "2025-03-01", "daily", "0.8"),
        ("url", "https://a.test/<odd>", None, None, None),
    ]


def test_sitemapindex_kind():
    data = write_sitemap_index([("https://a.test/s1.xml", "2025-01-02"),
                                ("https://a.test/s2.xml", None)])
    got = parse_sitemap(data)
    assert [(k, l, m) for k, l, m, _, _ in got] == [
        ("sitemap", "https://a.test/s1.xml", "2025-01-02"),
        ("sitemap", "https://a.test/s2.xml", None),
    ]


def test_gzip_and_corrupt_gzip():
    data = write_sitemap_xml([("https://a.test/g", None, None, None)])
    co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
    gz = co.compress(data) + co.flush()
    assert parse_sitemap(gz) == parse_sitemap(data)
    assert parse_sitemap(b"\x1f\x8b\x08junk") == []


def test_block_without_loc_skipped():
    xml = (b'<?xml version="1.0"?><urlset>'
           b"<url><lastmod>2025-01-01</lastmod></url>"
           b"<url><loc>https://a.test/ok</loc></url></urlset>")
    got = parse_sitemap(xml)
    assert len(got) == 1 and got[0][1] == "https://a.test/ok"


def test_parse_sitemap_batches(ray_session):
    import ray.data

    blobs = [
        write_sitemap_xml([("https://a.test/1", "2025-01-01", None, None)]),
        write_sitemap_index([("https://a.test/s.xml", None)]),
        None,
    ]
    ds = ray.data.from_arrow(pa.table({"sitemap": pa.array(blobs, pa.binary())}))
    rows = sorted(parse_sitemap_batches(ds).take_all(), key=lambda r: r["loc"])
    assert [(r["kind"], r["loc"]) for r in rows] == [
        ("url", "https://a.test/1"),
        ("sitemap", "https://a.test/s.xml"),
    ]
