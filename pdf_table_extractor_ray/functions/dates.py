"""Date kernels: pattern auto-detection, multi-format parse, completion
(F5-F7 in SURVEY §2.4).
"""

from __future__ import annotations

import re
from datetime import datetime
from typing import Optional

# --- F5: date-pattern auto-detection -----------------------------------------
# Semantics of conversor_caixa.py:46-67 (identify_date_pattern): probe in
# order; DD/MM/YYYY wins over ISO forms; returns the regex source or None.
PATTERN_DMY_SLASH = r"\d{2}/\d{2}/\d{4}"
PATTERN_ISO_DASH = r"\d{4}-\d{2}-\d{2}"
PATTERN_YMD_SLASH = r"\d{4}/\d{2}/\d{2}"
PATTERN_DMY_DOT = r"\d{2}\.\d{2}\.\d{4}"

_PROBE_ORDER = (
    PATTERN_DMY_SLASH,
    PATTERN_ISO_DASH,
    PATTERN_YMD_SLASH,
    PATTERN_DMY_DOT,
)
_COMPILED_PROBES = [(p, re.compile(p)) for p in _PROBE_ORDER]


def identify_date_pattern(text: str) -> Optional[str]:
    for src, rx in _COMPILED_PROBES:
        if rx.search(text):
            return src
    return None


# --- F6: multi-format parse --------------------------------------------------
# Semantics of conversor_caixa.py:70-95 (parse_date): strptime by detected
# pattern, then a fallback cascade over common formats; failure → None.
_FMT_BY_PATTERN = {
    PATTERN_DMY_SLASH: "%d/%m/%Y",
    PATTERN_ISO_DASH: "%Y-%m-%d",
    PATTERN_YMD_SLASH: "%Y/%m/%d",
    PATTERN_DMY_DOT: "%d.%m.%Y",
}
_FALLBACK_FMTS = ("%d/%m/%Y", "%m/%d/%Y", "%Y-%m-%d", "%Y/%m/%d", "%d.%m.%Y")


def parse_date(date_str: str, date_pattern: Optional[str]) -> Optional[datetime]:
    fmt = _FMT_BY_PATTERN.get(date_pattern) if date_pattern else None
    if fmt is not None:
        try:
            return datetime.strptime(date_str, fmt)
        except ValueError:
            return None
    for fallback in _FALLBACK_FMTS:
        try:
            return datetime.strptime(date_str, fallback)
        except ValueError:
            continue
    return None


# --- F7: date completion (year / month inference) ----------------------------

# PT month-name map of conversor_inter.py:21-25; unknown months map to "00"
# exactly like meses.get(mes, "00").
PT_MONTHS = {
    "Janeiro": "01",
    "Fevereiro": "02",
    "Março": "03",
    "Abril": "04",
    "Maio": "05",
    "Junho": "06",
    "Julho": "07",
    "Agosto": "08",
    "Setembro": "09",
    "Outubro": "10",
    "Novembro": "11",
    "Dezembro": "12",
}

# Year scraped from the document header, semantics of conversor_c6.py:38-44:
# 'Período N de <mes> de YYYY' or 'exportado no dia N de <mes> de YYYY'.
_C6_YEAR_RES = (
    re.compile(r"Período \d{1,2} de \w+ de (\d{4})"),
    re.compile(r"exportado no dia \d{1,2} de \w+ de (\d{4})"),
)

# Year scraped from 'PERÍODO: DD/MM/YYYY', semantics of
# conversor_sicoobmod2.py:10-20.
_SICOOB_YEAR_RE = re.compile(r"PERÍODO: \d{2}/\d{2}/(\d{4})")


def infer_year_c6(text: str) -> Optional[str]:
    for rx in _C6_YEAR_RES:
        m = rx.search(text)
        if m:
            return m.group(1)
    return None


def infer_year_sicoob(text: str) -> Optional[str]:
    m = _SICOOB_YEAR_RE.search(text)
    return m.group(1) if m else None


def valid_day_month(dm: str) -> bool:
    """'DD/MM' plausibility guard of conversor_c6.py:64-70."""
    try:
        dia, mes = dm.split("/")
        return 1 <= int(mes) <= 12 and 1 <= int(dia) <= 31
    except (ValueError, IndexError):
        return False
