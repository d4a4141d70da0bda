"""Outlink / anchor-text extraction over crawled HTML payloads — the
link-structure half of a web-extraction pipeline (the text half is
``stages/boilerplate.py``; Arc90/Boilerpipe treat link density as the
boilerplate signal, this module keeps the links themselves: host
graphs, anchor corpora and nav-vs-content link stats all start here).

The reference has no link surface (per-file PDF extractor); this
belongs to the engine's web family next to ``stages/boilerplate.py``.

Scale shape: pure map — one compiled-regex pass per document inside
``map_batches`` (document parsing is inherently per-doc; this is the
same compute-bound-actor contract as the extraction pipeline), zero
shuffle. Non-HTML payloads (PDF magic, encrypted blobs, no markup in
the sniff window) contribute zero rows in-band — no task failures.
Downstream reductions (target counts) are slim-string groupbys.
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_A_RE = re.compile(
    rb"<a\b[^>]*?\bhref\s*=\s*(?:\"([^\"]*)\"|'([^']*)')[^>]*>(.*?)</a>",
    re.I | re.S,
)
_TAG_RE = re.compile(rb"<[^>]+>")
_WS_RE = re.compile(rb"\s+")


def _looks_like_html(payload: bytes) -> bool:
    head = payload[:256]
    return not head.startswith(b"%PDF") and b"<" in head


def extract_outlinks(
    ds: "ray.data.Dataset",
    html_col: str = "html",
    url_col: str = "url",
) -> "ray.data.Dataset":
    """One row per ``<a href>`` occurrence: (url, href, target_host,
    anchor). Relative hrefs resolve to the page's own host; anchors
    are tag-stripped and whitespace-collapsed. Duplicate links are
    kept — they are the edge weights of the link graph."""

    def per_batch(batch: pa.Table) -> pa.Table:
        urls = batch.column(url_col).to_pylist()
        payloads = batch.column(html_col).to_pylist()
        out_url, out_href, out_thost, out_anchor = [], [], [], []
        for url, payload in zip(urls, payloads):
            if payload is None or url is None:
                continue
            if isinstance(payload, str):
                payload = payload.encode("utf-8", "replace")
            if not _looks_like_html(payload):
                continue
            page_host = urlsplit(url).netloc
            for m in _A_RE.finditer(payload):
                href = (m.group(1) or m.group(2) or b"").decode("utf-8", "replace")
                anchor = _WS_RE.sub(b" ", _TAG_RE.sub(b"", m.group(3))).strip()
                if "://" in href:
                    thost = urlsplit(href).netloc
                else:
                    thost = page_host
                out_url.append(url)
                out_href.append(href)
                out_thost.append(thost)
                out_anchor.append(anchor.decode("utf-8", "replace"))
        return pa.table(
            {
                "url": pa.array(out_url, pa.string()),
                "href": pa.array(out_href, pa.string()),
                "target_host": pa.array(out_thost, pa.string()),
                "anchor": pa.array(out_anchor, pa.string()),
            }
        )

    return ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)


def link_target_counts(
    links: "ray.data.Dataset", k: int = 20
) -> "ray.data.Dataset":
    """Top-``k`` (target_host, href) by in-link count — the inverted
    view of the link graph (what everybody points at). Per-batch
    Arrow pre-count combiner, one slim groupby-Sum, partial top-k
    merge (no global sort)."""
    from ray.data.aggregate import Sum

    from pdf_table_extractor_ray.stages.topk import global_top_k

    def precount(b: pa.Table) -> pa.Table:
        t = (
            b.select(["target_host", "href"])
            .group_by(["target_host", "href"])
            .aggregate([("href", "count")])
        )
        return pa.table(
            {
                "target_host": t.column("target_host"),
                "href": t.column("href"),
                "n_part": pc.cast(t.column("href_count"), pa.int64()),
            }
        )

    agg = (
        links.map_batches(precount, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["target_host", "href"])
        .aggregate(Sum("n_part"))
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "target_host": b.column("target_host"),
                "href": b.column("href"),
                "n": pc.cast(b.column("sum(n_part)"), pa.int64()),
            }
        )

    counted = agg.map_batches(finish, batch_format="pyarrow")
    return global_top_k(
        counted,
        [("n", "descending"), ("target_host", "ascending"), ("href", "ascending")],
        k,
    )
