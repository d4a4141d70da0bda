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


# ---------------------------------------------------------------------------
# mojibake repair (ftfy-style, the latin-1/utf-8 double-decode case)

# a latin-1-decoded UTF-8 sequence: 2-byte lead U+00C2-U+00DF,
# 3-byte lead U+00E0-U+00EF, or 4-byte lead U+00F0-U+00F4 (emoji /
# astral plane) followed by continuation chars U+0080-U+00BF (e.g. "Ã©" for é, "â" for ').
# Natural Latin-script text never places C1 controls (U+0080-U+009F)
# after an accented letter, and the strict round-trip below rejects
# the rare U+00A0-U+00BF false positives.
_MOJIBAKE_RE_STR = (
    "[\u00c2-\u00df][\u0080-\u00bf]"
    "|[\u00e0-\u00ef][\u0080-\u00bf]{2}"
    "|[\u00f0-\u00f4][\u0080-\u00bf]{3}"
)
_MOJIBAKE_RE = re.compile(_MOJIBAKE_RE_STR)


def fix_mojibake_str(s: str, max_passes: int = 3) -> str:
    """Undo latin-1-as-utf-8 double decoding: while the string carries
    a mojibake signature AND survives a STRICT latin-1 encode →
    strict utf-8 decode round trip, apply it (multiply-encoded text
    unwinds one layer per pass). Any failure leaves the input
    untouched — the repair can never corrupt clean text that merely
    contains an accented character."""
    for _ in range(max_passes):
        if not _MOJIBAKE_RE.search(s):
            return s
        try:
            fixed = s.encode("latin-1").decode("utf-8")
        except (UnicodeEncodeError, UnicodeDecodeError):
            return s
        s = fixed
    return s


def repair_mojibake(
    ds,
    text_col: str = "text",
    flag_col: str = "was_broken",
):
    """Map-only corpus repair: ONE vectorized RE2 scan flags candidate
    rows (clean corpora: ~0 rows), Python repairs only the flagged
    ones with a per-batch memo over unique strings. Output replaces
    ``text_col`` and appends ``flag_col`` (1 = repair applied)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    def fix(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        mask = pc.fill_null(
            pc.match_substring_regex(col, _MOJIBAKE_RE_STR), False
        ).to_numpy(zero_copy_only=False)
        texts = col.to_pylist()
        changed = np.zeros(len(texts), dtype=bool)
        memo = {}
        for i in np.flatnonzero(mask):
            t = texts[i]
            f = memo.get(t)
            if f is None:
                f = fix_mojibake_str(t)
                memo[t] = f
            if f != t:
                texts[i] = f
                changed[i] = True
        out = batch.set_column(
            batch.schema.get_field_index(text_col),
            text_col,
            pa.array(texts, pa.string()),
        )
        return out.append_column(
            flag_col, pa.array(changed.astype(np.int64), pa.int64())
        )

    return ds.map_batches(fix, batch_format="pyarrow", zero_copy_batch=True)
