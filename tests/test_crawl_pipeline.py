"""WARC→extract→WET composite (pipelines/crawl.py): archive routing
parity — extraction over the archived corpus must be byte-identical to
extraction over the original page table."""

import pyarrow as pa
import pytest

from pdf_table_extractor_ray.pipelines.crawl import (
    crawl_extract,
    crawl_extract_wet,
    demux_warc_pages,
    pages_to_warc,
)
from pdf_table_extractor_ray.sources.warc import parse_wet_batches


@pytest.fixture(scope="module")
def fixture_pages_dir():
    import __ray_entry__ as entry

    return entry._fixture_pages("/root/testdata/sf0.001")


def _by_url(rows):
    return {
        r["url"]: (r["strategy"], r["extracted_text"], r["status"]) for r in rows
    }


def test_crawl_extraction_matches_direct(ray_session, fixture_pages_dir):
    from pdf_table_extractor_ray.pipelines.extract import (
        build_extracted_dataset,
        read_pages,
    )

    pages = read_pages(fixture_pages_dir)
    direct = _by_url(
        build_extracted_dataset(pages, shard_keys=False)
        .select_columns(["url", "strategy", "extracted_text", "status"])
        .take_all()
    )
    shards = pages_to_warc(read_pages(fixture_pages_dir), gzip_members=True)
    crawled = _by_url(
        crawl_extract(shards)
        .select_columns(["url", "strategy", "extracted_text", "status"])
        .take_all()
    )
    assert set(direct) == set(crawled)
    mismatches = {u: (direct[u], crawled[u]) for u in direct if direct[u] != crawled[u]}
    assert mismatches == {}


def test_crawl_wet_carries_extracted_text(ray_session, fixture_pages_dir):
    from pdf_table_extractor_ray.pipelines.extract import (
        build_extracted_dataset,
        read_pages,
    )

    direct = {
        r["url"]: r["extracted_text"] or ""
        for r in build_extracted_dataset(read_pages(fixture_pages_dir), shard_keys=False)
        .select_columns(["url", "extracted_text"])
        .take_all()
    }
    wet = parse_wet_batches(
        crawl_extract_wet(pages_to_warc(read_pages(fixture_pages_dir)))
    ).take_all()
    got = {r["url"]: r["text"] for r in wet}
    assert got == direct


def test_demux_media_types(ray_session):
    import ray

    rows = pa.table(
        {
            "url": pa.array(["u1", "u2"], pa.string()),
            "warc_ts": pa.array([0, 0], pa.timestamp("us")),
            "html": pa.array([b"plain body", b"<p>markup</p>"], pa.binary()),
            "content_type": pa.array(
                ["text/plain; charset=utf-8", "text/html; charset=utf-8"], pa.string()
            ),
        }
    )
    out = demux_warc_pages(ray.data.from_arrow(rows)).take_all()
    by = {r["url"]: r for r in out}
    assert by["u1"]["text"] == "plain body" and by["u1"]["html"] == b""
    assert by["u2"]["html"] == b"<p>markup</p>" and by["u2"]["text"] is None
