"""Sinks beyond the primary partitioned-parquet layout (SURVEY §2.2).

The reference writes one `;`-separated, utf-8-sig, decimal-comma CSV
per document (K1: conversor_santander.py:160-161 et al.) and XLS/XLSX
workbooks (K2: conversor_bradesco.py:167-228; K3 sheet-per-file:
conversor_ofx.py:44-55). The engine's analogs, written distributed:

- ``write_records_csv``: records CSV per partition, same cell
  semantics (`;`, BOM, decimal comma).
- ``write_records_xlsx``: one minimal OOXML workbook per partition
  (stdlib ``zipfile`` + hand-built sheet XML — no openpyxl in this
  environment; inline strings, ISO dates, native numbers). The
  reference's one-file-per-document maps to one-file-per-partition —
  at 10^12 docs per-document files are a filesystem DoS.
"""

from __future__ import annotations

import math

import pyarrow as pa

import ray.data


def _csv_cell(v) -> str:
    if v is None:
        return ""
    if isinstance(v, float):
        # pandas to_csv(decimal=',') semantics: repr-style shortest float
        return repr(v).replace(".", ",")
    return str(v)


def write_records_csv(records: "ray.data.Dataset", out_dir: str) -> None:
    """Flat records table → `;`-separated CSV shards with utf-8-sig BOM
    per file (Excel-compatible like the reference's output)."""

    def render(batch: pa.Table) -> pa.Table:
        cols = batch.column_names
        lines = []
        pylists = [batch.column(c).to_pylist() for c in cols]
        for row in zip(*pylists):
            lines.append(";".join(_csv_cell(v) for v in row))
        return pa.table({"line": pa.array(lines, pa.string()), "_header": [";".join(cols)] * len(lines)})

    import os

    os.makedirs(out_dir, exist_ok=True)

    class CSVShardWriter:
        def __call__(self, batch: pa.Table) -> pa.Table:
            import uuid

            path = os.path.join(out_dir, f"records-{uuid.uuid4().hex[:12]}.csv")
            header = batch.column("_header")[0].as_py() if batch.num_rows else ""
            with open(path, "w", encoding="utf-8-sig") as f:
                f.write(header + "\n")
                for line in batch.column("line").to_pylist():
                    f.write(line + "\n")
            return pa.table({"path": pa.array([path], pa.string()), "rows": pa.array([batch.num_rows], pa.int64())})

    rendered = records.map_batches(render, batch_format="pyarrow", zero_copy_batch=True)
    # one writer task per block; consume the tiny manifest
    rendered.map_batches(CSVShardWriter(), batch_size=None, batch_format="pyarrow").materialize()


# ---------------------------------------------------------------------------
# XLSX sink (K2/K3) — stdlib-only minimal OOXML writer


def _xml_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace('"', "&quot;")
    )


# XML 1.0 forbids these code points even escaped; OOXML's convention is
# the _xHHHH_ encoding (ECMA-376 §22.4.2.4). Literal "_xHHHH_" text must
# itself be escaped (_x005F_xHHHH_) so decoding is unambiguous.
import re as _re

_XML_INVALID_RE = _re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f￾￿]")
_X_LITERAL_RE = _re.compile(r"_(?=x[0-9A-Fa-f]{4}_)")
_X_DECODE_RE = _re.compile(r"_x([0-9A-Fa-f]{4})_")


def _ooxml_encode(s: str) -> str:
    s = _X_LITERAL_RE.sub("_x005F_", s)
    return _XML_INVALID_RE.sub(lambda m: f"_x{ord(m.group()):04X}_", s)


def _ooxml_decode(s: str) -> str:
    return _X_DECODE_RE.sub(lambda m: chr(int(m.group(1), 16)), s)


_XLSX_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
    "</Types>"
)
_XLSX_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    "</Relationships>"
)
_XLSX_WB = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
    'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
    '<sheets><sheet name="%s" sheetId="1" r:id="rId1"/></sheets></workbook>'
)
_XLSX_WB_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
    "</Relationships>"
)


def _sheet_xml(header, rows) -> str:
    """Worksheet XML: inline strings for text, native numerics for
    int/float (the reference's fixed-header tabular layout)."""
    parts = ['<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
             '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
             "<sheetData>"]

    def cell(v) -> str:
        if v is None:
            return "<c/>"
        if isinstance(v, bool):
            return f'<c t="b"><v>{int(v)}</v></c>'
        if isinstance(v, float) and not math.isfinite(v):
            # Excel has no NaN/inf numeric cell — <v>nan</v> is rejected
            # by Excel/LibreOffice/openpyxl; keep the info as text
            return f'<c t="inlineStr"><is><t>{str(v)}</t></is></c>'
        if isinstance(v, (int, float)):
            return f"<c><v>{v!r}</v></c>"
        return f'<c t="inlineStr"><is><t>{_xml_escape(_ooxml_encode(str(v)))}</t></is></c>'

    parts.append("<row>" + "".join(cell(h) for h in header) + "</row>")
    for row in rows:
        parts.append("<row>" + "".join(cell(v) for v in row) + "</row>")
    parts.append("</sheetData></worksheet>")
    return "".join(parts)


def write_xlsx_file(path: str, header, rows, sheet_name: str = "Sheet1") -> None:
    """One workbook, one sheet (stdlib zipfile; no styles/sharedStrings
    — readable by Excel/LibreOffice/openpyxl)."""
    import zipfile

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _XLSX_CONTENT_TYPES)
        z.writestr("_rels/.rels", _XLSX_RELS)
        z.writestr("xl/workbook.xml", _XLSX_WB % _xml_escape(sheet_name[:31]))
        z.writestr("xl/_rels/workbook.xml.rels", _XLSX_WB_RELS)
        z.writestr("xl/worksheets/sheet1.xml", _sheet_xml(header, rows))


def read_xlsx_file(path: str) -> tuple:
    """(header, rows) back from a workbook written above — the test
    oracle (values come back as strings/floats per cell type)."""
    import re
    import zipfile

    with zipfile.ZipFile(path) as z:
        xml = z.read("xl/worksheets/sheet1.xml").decode()
    rows = []
    for row_xml in re.findall(r"<row>(.*?)</row>", xml, re.S):
        vals = []
        for c in re.findall(r"(<c/>|<c.*?</c>)", row_xml, re.S):
            if c == "<c/>":
                vals.append(None)
            elif 't="inlineStr"' in c:
                m = re.search(r"<t>(.*?)</t>", c, re.S)
                s = m.group(1) if m else ""
                s = (
                    s.replace("&lt;", "<").replace("&gt;", ">")
                    .replace("&quot;", '"').replace("&amp;", "&")
                )
                vals.append(_ooxml_decode(s))
            else:
                m = re.search(r"<v>(.*?)</v>", c)
                vals.append(float(m.group(1)) if m else None)
        rows.append(vals)
    return rows[0], rows[1:]


def write_records_xlsx(records: "ray.data.Dataset", out_dir: str) -> list:
    """Records table → one XLSX workbook per block (K3 sheet-per-file
    semantics at partition granularity). Returns the written manifest
    [(path, rows)]."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    class XLSXShardWriter:
        def __call__(self, batch: pa.Table) -> pa.Table:
            import uuid

            path = os.path.join(out_dir, f"records-{uuid.uuid4().hex[:12]}.xlsx")
            header = batch.column_names
            pylists = [batch.column(c).to_pylist() for c in header]
            write_xlsx_file(path, header, list(zip(*pylists)), sheet_name="records")
            return pa.table(
                {"path": pa.array([path], pa.string()), "rows": pa.array([batch.num_rows], pa.int64())}
            )

    manifest = records.map_batches(
        XLSXShardWriter(), batch_size=None, batch_format="pyarrow"
    ).take_all()
    return [(r["path"], r["rows"]) for r in manifest]
