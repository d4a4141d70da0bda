"""Sitemap source (sitemaps.org XML) — crawl-frontier seeding, the
discovery-side complement to the robots.txt admission gate
(``stages/robots.py``). Handles both document kinds: ``<urlset>``
(page entries with lastmod/changefreq/priority) and ``<sitemapindex>``
(pointers to child sitemaps — the fan-out shape large sites publish).

Parsing is a compiled-regex walk over ``<url>``/``<sitemap>`` blocks
with XML entity decoding — the same per-document map contract as
``stages/links.py`` (one pass, zero shuffle, malformed blocks skipped
in-band). Gzipped payloads (``sitemap.xml.gz``) inflate first.

The writer is deterministic (byte-identical for identical input) and
exists for round-trip verification and fixtures, like
``sources/warc.write_warc_bytes``.
"""

from __future__ import annotations

import re
from typing import List, Optional, Sequence, Tuple

import pyarrow as pa

import ray.data

_URL_RE = re.compile(rb"<url>(.*?)</url>", re.S)
_SM_RE = re.compile(rb"<sitemap>(.*?)</sitemap>", re.S)
_LOC_RE = re.compile(rb"<loc>(.*?)</loc>", re.S)
_LASTMOD_RE = re.compile(rb"<lastmod>(.*?)</lastmod>", re.S)
_CHANGEFREQ_RE = re.compile(rb"<changefreq>(.*?)</changefreq>", re.S)
_PRIORITY_RE = re.compile(rb"<priority>(.*?)</priority>", re.S)

_XML_HEADER = b'<?xml version="1.0" encoding="UTF-8"?>\n'
_NS = b' xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'


def _esc(s: str) -> str:
    return (
        s.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace("'", "&apos;")
        .replace('"', "&quot;")
    )


def _unesc(b: bytes) -> str:
    import html as _html

    return _html.unescape(b.decode("utf-8", "replace")).strip()


def write_sitemap_xml(
    entries: Sequence[Tuple[str, Optional[str], Optional[str], Optional[str]]],
) -> bytes:
    """(loc, lastmod, changefreq, priority) rows → one ``<urlset>``
    document; None fields are omitted (all three are optional per the
    protocol)."""
    parts = [_XML_HEADER, b"<urlset", _NS, b">\n"]
    for loc, lastmod, changefreq, priority in entries:
        parts.append(b"<url><loc>" + _esc(loc).encode() + b"</loc>")
        if lastmod is not None:
            parts.append(b"<lastmod>" + lastmod.encode() + b"</lastmod>")
        if changefreq is not None:
            parts.append(b"<changefreq>" + changefreq.encode() + b"</changefreq>")
        if priority is not None:
            parts.append(b"<priority>" + priority.encode() + b"</priority>")
        parts.append(b"</url>\n")
    parts.append(b"</urlset>\n")
    return b"".join(parts)


def write_sitemap_index(sitemaps: Sequence[Tuple[str, Optional[str]]]) -> bytes:
    """(loc, lastmod) rows → one ``<sitemapindex>`` document."""
    parts = [_XML_HEADER, b"<sitemapindex", _NS, b">\n"]
    for loc, lastmod in sitemaps:
        parts.append(b"<sitemap><loc>" + _esc(loc).encode() + b"</loc>")
        if lastmod is not None:
            parts.append(b"<lastmod>" + lastmod.encode() + b"</lastmod>")
        parts.append(b"</sitemap>\n")
    parts.append(b"</sitemapindex>\n")
    return b"".join(parts)


def parse_sitemap(
    data: bytes,
) -> List[Tuple[str, str, Optional[str], Optional[str], Optional[str]]]:
    """One sitemap document → (kind, loc, lastmod, changefreq,
    priority) tuples; kind is ``"url"`` for urlset entries and
    ``"sitemap"`` for index entries. Gzip inflates first; blocks
    without a ``<loc>`` are skipped in-band."""
    if data[:2] == b"\x1f\x8b":
        import zlib

        try:
            data = zlib.decompress(data, 16 + zlib.MAX_WBITS)
        except zlib.error:
            return []
    out: List[Tuple[str, str, Optional[str], Optional[str], Optional[str]]] = []

    def field(rx, block) -> Optional[str]:
        m = rx.search(block)
        return _unesc(m.group(1)) if m else None

    for kind, rx in (("url", _URL_RE), ("sitemap", _SM_RE)):
        for m in rx.finditer(data):
            block = m.group(1)
            loc = field(_LOC_RE, block)
            if not loc:
                continue
            out.append(
                (
                    kind,
                    loc,
                    field(_LASTMOD_RE, block),
                    field(_CHANGEFREQ_RE, block) if kind == "url" else None,
                    field(_PRIORITY_RE, block) if kind == "url" else None,
                )
            )
    return out


def parse_sitemap_batches(
    ds: "ray.data.Dataset", blob_col: str = "sitemap"
) -> "ray.data.Dataset":
    """Dataset of sitemap blobs → entry rows
    (kind, loc, lastmod, changefreq, priority) — all strings, lastmod
    kept verbatim (W3C datetime allows date-only and full timestamps;
    the consumer decides the precision it needs)."""

    def per_batch(b: pa.Table) -> pa.Table:
        kinds, locs, mods, freqs, prios = [], [], [], [], []
        for blob in b.column(blob_col).to_pylist():
            if blob is None:
                continue
            for kind, loc, mod, freq, prio in parse_sitemap(blob):
                kinds.append(kind)
                locs.append(loc)
                mods.append(mod)
                freqs.append(freq)
                prios.append(prio)
        return pa.table(
            {
                "kind": pa.array(kinds, pa.string()),
                "loc": pa.array(locs, pa.string()),
                "lastmod": pa.array(mods, pa.string()),
                "changefreq": pa.array(freqs, pa.string()),
                "priority": pa.array(prios, pa.string()),
            }
        )

    return ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)
