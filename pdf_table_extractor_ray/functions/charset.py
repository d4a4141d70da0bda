"""Charset sniffing for crawled HTML payloads.

A Common-Crawl-style ``html:binary`` column is NOT uniformly UTF-8:
real crawls carry latin-1/windows-1252 long tails, UTF-16 exports and
BOM'd UTF-8. The reference never faces this (pdfplumber hands it
decoded text), so this is engine-side input hardening for the web
corpus: the WHATWG-style sniff order — BOM first, then a declared
``<meta charset>`` / ``<meta http-equiv Content-Type>`` / ``<?xml
encoding>`` inside the head window, else UTF-8.

Pure per-payload function (no state, no I/O) — runs inside the
extraction actors' decode step; cost is one regex scan over ≤2 KiB.
"""

from __future__ import annotations

import codecs
import re

# HTML5 requires the meta charset within the first 1024 bytes; use a
# 2 KiB window to tolerate sloppy real-world head sections.
_SNIFF_LEN = 2048

_META_CHARSET_RE = re.compile(
    rb"<meta[^>]+charset\s*=\s*[\"']?\s*([A-Za-z0-9][A-Za-z0-9_\-\.:]*)", re.I
)
_XML_ENC_RE = re.compile(
    rb"<\?xml[^>]*encoding\s*=\s*[\"']([A-Za-z0-9][A-Za-z0-9_\-\.:]*)[\"']", re.I
)

# BOM table, longest first (UTF-32 BOMs contain the UTF-16 ones).
_BOMS = (
    (codecs.BOM_UTF32_LE, "utf-32-le"),
    (codecs.BOM_UTF32_BE, "utf-32-be"),
    (codecs.BOM_UTF8, "utf-8-sig"),
    (codecs.BOM_UTF16_LE, "utf-16-le"),
    (codecs.BOM_UTF16_BE, "utf-16-be"),
)


def sniff_charset(payload: bytes) -> str:
    """Return the codec name to decode ``payload`` with.

    Order: BOM → ``<meta charset>`` / ``<?xml encoding>`` in the first
    2 KiB (validated against the codec registry; unknown names are
    ignored, not trusted) → ``utf-8``. BOM'd UTF-8 returns
    ``utf-8-sig`` so the BOM never leaks into extracted text.
    """
    head = bytes(payload[:_SNIFF_LEN])
    for bom, name in _BOMS:
        if head.startswith(bom):
            return name
    m = _META_CHARSET_RE.search(head) or _XML_ENC_RE.search(head)
    if m:
        declared = m.group(1).decode("ascii", "ignore").strip().lower()
        try:
            codec = codecs.lookup(declared)
        except LookupError:
            return "utf-8"
        # a UTF-16/32 declaration without a BOM is unreliable on real
        # crawls (the meta itself was readable as ASCII) — keep utf-8
        if codec.name.startswith("utf-16") or codec.name.startswith("utf-32"):
            return "utf-8"
        return codec.name
    return "utf-8"


def decode_html(payload) -> str:
    """bytes-ish → str via the sniffed charset, never raising
    (errors='replace' — malformed byte runs surface as U+FFFD, the
    in-band convention of the extraction pipeline)."""
    if payload is None:
        return ""
    if isinstance(payload, str):
        return payload
    raw = bytes(payload)
    return raw.decode(sniff_charset(raw), errors="replace")
