"""Extraction result model shared by the golden oracle and Ray stages.

One ``ExtractResult`` per document row; the engine carries failures
in-band (``status`` / ``error`` columns) instead of raising — the
generalization of the reference's per-file try/except accumulation
(conversor_bbmod1.py:154-169): a malformed payload must never fail a
10^12-row job.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional


@dataclass
class Record:
    """Logical output row, mirroring the reference's transaction record
    shape {Data, Lançamento/Histórico, Valor, [Documento]}
    (conversor_bbmod1.py:93-97, conversor_santander.py:48)."""

    date: str
    description: str
    amount: Optional[float]
    doc: str = ""


@dataclass
class ExtractResult:
    extracted_text: str = ""
    spans: List[tuple] = field(default_factory=list)  # (start, end, kind)
    records: List[Record] = field(default_factory=list)
    status: str = "ok"  # ok | empty | error
    error: Optional[str] = None


def render_records(
    rows: List[tuple],
    kinds: tuple = ("date", "description", "amount"),
) -> ExtractResult:
    """Render records to the canonical ``extracted_text`` and spans.

    Canonical form: one line per record, fields joined with ';' —
    the reference's universal CSV shape (sep=';', e.g.
    conversor_santander.py:161). ``rows`` are tuples of string fields
    aligned with ``kinds``; byte-identity of this rendering is the
    parity target.
    """
    lines = []
    spans: List[tuple] = []
    add_span = spans.append
    add_line = lines.append
    offset = 0
    for row in rows:
        # the zip-derived offset arithmetic below is only exact when
        # every row is aligned with kinds; a longer/shorter row would
        # silently shift every later span against extracted_text
        # (byte-parity of spans is the contract — ADVICE r3)
        if len(row) != len(kinds):
            raise ValueError(
                f"render_records: row has {len(row)} fields, kinds has {len(kinds)}"
            )
        pos = offset
        for kind, fieldval in zip(kinds, row):
            end = pos + len(fieldval)
            add_span((pos, end, kind))
            pos = end + 1  # skip ';'
        # pos now == offset + len(line) + 1 (the trailing '+1' covers '\n')
        offset = pos
        add_line(";".join(row))
    res = ExtractResult(extracted_text="\n".join(lines), spans=spans)
    return res
