"""WARC-in → extraction → WET-out: the Common-Crawl-shaped composite
pipeline. A crawl archive stores ONE payload per response; the
engine's page rows carry a dual (html, text) surface where exactly one
field is semantically consumed per document (strategy families split
into ``_html_strategy`` / ``_text_strategy`` wrappers,
``stages/registry.py``). The archive writer therefore runs the SAME
``detect_format`` the extractor runs and stores the consumed field,
tagged with a faithful media type; the demux on the read side
reconstructs the dual surface, so extraction over the archived corpus
is byte-identical to extraction over the original page table (pinned
by tests/test_crawl_pipeline.py).

Scale shape: writer, demux and extraction are all ``map_batches``
stages — the whole composite is shuffle-free; WET export shards within
each batch like ``wet_from_pages``.
"""

from __future__ import annotations

import zlib
from typing import List, Optional

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from pdf_table_extractor_ray.sources.warc import (
    _EPOCH_US,
    parse_warc_batches,
    wet_from_pages,
    write_warc_bytes,
)

# strategy keys whose extractor consumes doc["text"] (the
# _text_strategy wrappers in registry.make_strategies); every other
# strategy consumes doc["html"]
TEXT_STRATEGIES = frozenset(
    """
    regex_listing santander_merge bb1_buffer bb2_nextdate sicoob1_lines
    sicoob2_blocks c6_date_context inter_months cef_simple
    pagbank_findall bradesco_triples ofx
    """.split()
)

_PLAIN_CTYPE = "text/plain; charset=utf-8"


def _payload_for(html: Optional[bytes], text: Optional[str]):
    """(payload, content_type) for one page row — the consumed field
    per the extractor's own detection."""
    from pdf_table_extractor_ray.stages.registry import detect_format

    html = bytes(html) if html else b""
    key = detect_format(html, text)
    if key in TEXT_STRATEGIES:
        return (text or "").encode("utf-8"), _PLAIN_CTYPE
    if html[:5] == b"%PDF-":
        return html, "application/pdf"
    if key == "encrypted":
        return html, "application/octet-stream"
    return html, "text/html; charset=utf-8"


def pages_to_warc(
    ds: "ray.data.Dataset",
    records_per_shard: int = 128,
    gzip_members: bool = False,
) -> "ray.data.Dataset":
    """Page rows (url, html, text[, warc_ts]) → WARC shard blobs
    (one blob per ``records_per_shard`` rows within each batch —
    shard-parallel and layout-deterministic, like
    ``wet_from_pages``)."""

    def per_batch(b: pa.Table) -> pa.Table:
        urls = b.column("url").to_pylist()
        htmls = b.column("html").to_pylist()
        texts = b.column("text").to_pylist()
        if "warc_ts" in b.column_names:
            tss = pc.cast(b.column("warc_ts"), pa.int64()).to_pylist()
        else:
            tss = [None] * b.num_rows
        blobs: List[bytes] = []
        for start in range(0, len(urls), records_per_shard):
            recs = []
            for u, h, t, ts in zip(
                urls[start : start + records_per_shard],
                htmls[start : start + records_per_shard],
                texts[start : start + records_per_shard],
                tss[start : start + records_per_shard],
            ):
                if u is None:
                    continue
                payload, ctype = _payload_for(h, t)
                if ts is None:
                    ts = _EPOCH_US + (zlib.crc32(u.encode()) % 1_000_000) * 1_000_000
                recs.append((u, int(ts), payload, 200, ctype))
            if not recs:
                continue
            shard_id = zlib.crc32(recs[0][0].encode()) & 0x7FFFFFFF
            blobs.append(
                write_warc_bytes(recs, shard_id=shard_id, gzip_members=gzip_members)
            )
        return pa.table({"warc": pa.array(blobs, pa.binary())})

    return ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)


def demux_warc_pages(pages: "ray.data.Dataset") -> "ray.data.Dataset":
    """Parsed WARC rows → extractor page rows: text/plain payloads
    decode into the ``text`` column (empty html), every other media
    type stays binary in ``html`` (empty text) — reconstructing the
    dual surface ``WarmExtractor`` detects on."""

    def per_batch(b: pa.Table) -> pa.Table:
        ctypes = b.column("content_type").to_pylist()
        payloads = b.column("html").to_pylist()
        htmls: List[bytes] = []
        texts: List[Optional[str]] = []
        for ct, p in zip(ctypes, payloads):
            p = p or b""
            if (ct or "").startswith("text/plain"):
                htmls.append(b"")
                texts.append(p.decode("utf-8", "replace"))
            else:
                htmls.append(p)
                texts.append(None)
        return pa.table(
            {
                "url": b.column("url"),
                "warc_ts": b.column("warc_ts"),
                "html": pa.array(htmls, pa.binary()),
                "text": pa.array(texts, pa.string()),
            }
        )

    return pages.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)


def crawl_extract(shards: "ray.data.Dataset", **kwargs) -> "ray.data.Dataset":
    """WARC shard blobs → extracted table (EXTRACTED_SCHEMA), via
    parse → demux → the standard warm-actor extraction plan."""
    from pdf_table_extractor_ray.pipelines.extract import build_extracted_dataset

    pages = demux_warc_pages(parse_warc_batches(shards))
    return build_extracted_dataset(pages, shard_keys=False, **kwargs)


def crawl_extract_wet(shards: "ray.data.Dataset", **kwargs) -> "ray.data.Dataset":
    """WARC shard blobs → WET shard blobs of the extracted text — the
    full archive-to-archive composite (what Common Crawl's WET
    generation does, with this engine's extractor in the middle).
    Timestamps re-derive from the url hash (the extraction plan keeps
    payload columns only)."""
    extracted = crawl_extract(shards, **kwargs)

    def to_wet_rows(b: pa.Table) -> pa.Table:
        urls = b.column("url").to_pylist()
        ts = [
            _EPOCH_US + (zlib.crc32((u or "").encode()) % 1_000_000) * 1_000_000
            for u in urls
        ]
        return pa.table(
            {
                "url": b.column("url"),
                "warc_ts": pa.array(ts, pa.timestamp("us")),
                "text": pc.fill_null(b.column("extracted_text"), ""),
            }
        )

    rows = extracted.map_batches(to_wet_rows, batch_format="pyarrow", zero_copy_batch=True)
    return wet_from_pages(rows)
