"""OFX statement reader (S7 in SURVEY §2.1).

The reference feeds OFX files through ofxparse after a regex repair of
the decimal separator (conversor_ofx.py:29-50, Conversor.py:176-191);
here a minimal SGML-ish ``<STMTTRN>`` block parser reproduces the
fields the reference consumes (DTPOSTED → Data dd/mm/YYYY, MEMO →
Descrição, TRNAMT → Valor), including the F10 pre-parse rewrite
(``<TRNAMT>-123.45`` → ``-123,45``, conversor_ofx.py:36-39).

Cheap stateless parse → task-based ``map_batches`` (no warm state
needed, per SURVEY §2.1 S7).
"""

from __future__ import annotations

import re

from pdf_table_extractor_ray.stages.result import ExtractResult, Record, render_records

# F10: decimal repair applied to the raw content before parsing
_TRNAMT_FIX_RE = re.compile(r"(<TRNAMT>)(-?[\d]+)\.(\d{2})")

_STMTTRN_RE = re.compile(r"<STMTTRN>(.*?)(?:</STMTTRN>|(?=<STMTTRN>)|$)", re.DOTALL)
_FIELD_RE = re.compile(r"<(TRNTYPE|DTPOSTED|TRNAMT|FITID|MEMO|NAME)>([^<\r\n]*)")


def repair_trnamt(content: str) -> str:
    """conversor_ofx.py:39 — exact semantics of the reference rewrite."""
    return _TRNAMT_FIX_RE.sub(r"\1\2,\3", content)


def _parse_amount(raw: str) -> float:
    # after the repair the separator is ','; ofxparse-style decimal read
    try:
        return float(raw.replace(",", "."))
    except ValueError:
        return 0.0


def _fmt_date(dtposted: str) -> str:
    """OFX DTPOSTED (YYYYMMDD[HHMMSS...]) → dd/mm/YYYY, the strftime of
    conversor_ofx.py:50."""
    d = dtposted.strip()[:8]
    if len(d) != 8 or not d.isdigit():
        return dtposted.strip()
    return f"{d[6:8]}/{d[4:6]}/{d[0:4]}"


def extract_ofx(text: str) -> ExtractResult:
    content = repair_trnamt(text)
    rows = []
    records = []
    for m in _STMTTRN_RE.finditer(content):
        fields = dict(_FIELD_RE.findall(m.group(1)))
        if "TRNAMT" not in fields and "DTPOSTED" not in fields:
            continue
        date = _fmt_date(fields.get("DTPOSTED", ""))
        memo = (fields.get("MEMO") or fields.get("NAME") or "").strip()
        amount = _parse_amount(fields.get("TRNAMT", "0"))
        doc = (fields.get("FITID") or "").strip()
        rows.append((date, memo, repr(amount).replace(".", ","), doc))
        records.append(Record(date=date, description=memo, amount=amount, doc=doc))
    if not rows:
        return ExtractResult(status="empty", error="no transactions")
    res = render_records(rows, kinds=("date", "description", "amount", "doc"))
    res.records = records
    return res
