"""Text / identifier normalization kernels (P10, P12, F8 in SURVEY §2)."""

from __future__ import annotations

import re
import unicodedata
from typing import Optional


def ascii_fold(text: str) -> str:
    """ASCII transliteration for Latin scripts.

    Stand-in for ``unidecode`` (conversor_itau.py:133) built on NFKD
    decomposition + combining-mark removal — identical behaviour for the
    Portuguese accents the data contains.
    """
    decomposed = unicodedata.normalize("NFKD", text)
    return "".join(c for c in decomposed if not unicodedata.combining(c))


_NONWORD_RE = re.compile(r"[^\w\s]")


def sanitize_column_name(name: str) -> str:
    """Column-name sanitization of conversor_itau.py:131-137:
    transliterate → strip non-word chars → spaces→'_' → lowercase."""
    out = ascii_fold(str(name))
    out = _NONWORD_RE.sub("", out)
    out = out.replace(" ", "_")
    return out.lower()


_NFKD_STRIP_RE = re.compile(r"[^\w\s,/.-]")


def nfkd_clean(text: str) -> str:
    """NFKD normalize + symbol strip of conversor_pagbank.py:9-12."""
    out = unicodedata.normalize("NFKD", text)
    return _NFKD_STRIP_RE.sub("", out).strip()


# F9: page-range parser, semantics of conversor_itau.py:88-97
# ("1,2,4-6" → ['1','2','4','5','6']) — job-arg parsing on the driver side.
def parse_page_ranges(pages: str) -> list:
    out = []
    for part in pages.split(","):
        part = part.strip()
        if "-" in part:
            start, end = map(int, part.split("-"))
            out.extend(map(str, range(start, end + 1)))
        else:
            out.append(part)
    return out


# F8: document-number extraction, semantics of conversor_santander.py:28-29:
# a >=6-digit run adjacent to the value token.
def extract_doc_number(line: str, value_token: str) -> str:
    rx = re.compile(r"(\d{6,})(?:\s+|\s*-\s*)?" + re.escape(value_token))
    m = rx.search(line)
    return m.group(1) if m else ""
