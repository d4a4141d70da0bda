"""HTML ``<table>`` extraction — the markup twin of the PDF lattice
reader (``stages/layout.py:186``, S3) and the engine's answer to the
north star's "unified document extractor": the same grid-reconstruct +
header-promote (P8) + column-sanitize (P10) semantics the reference
applies to ruled PDF tables (`/root/reference/conversor_itau.py:99`,
table rows from word boxes), applied to crawled HTML payloads.

Scale shape: pure map — one compiled-regex pass per document inside
``map_batches`` (document parsing is inherently per-doc, the same
compute-bound contract as ``stages/links.py``), zero shuffle. A page's
cells are reconstructed entirely within the batch that holds the page,
so header promotion never needs a (url, table, row) shuffle. Non-HTML
payloads (PDF magic, no markup) contribute zero rows in-band.

Parser coverage: nested inline markup is stripped, ``<br>`` becomes a
space, entities (named + numeric) are decoded, ``colspan``/``rowspan``
are expanded by replicating the cell value into every grid position it
covers (the markup analogue of the lattice reader's merged-cell fill,
T3/T4 ffill in ``stages/layout.py:199``). Declared limits: no support
for tables nested inside table cells (the inner table's cells surface
as text fragments of the outer cell), and malformed markup degrades to
best-effort row splits rather than failing the task.
"""

from __future__ import annotations

import html as _html
import re
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa

import ray.data

from pdf_table_extractor_ray.functions.textnorm import sanitize_column_name

_TABLE_RE = re.compile(r"<table\b[^>]*>(.*?)</table\s*>", re.I | re.S)
_TR_RE = re.compile(r"<tr\b[^>]*>(.*?)</tr\s*>", re.I | re.S)
_CELL_RE = re.compile(r"<t([hd])\b([^>]*)>(.*?)</t[hd]\s*>", re.I | re.S)
_COLSPAN_RE = re.compile(r"colspan\s*=\s*[\"']?(\d+)", re.I)
_ROWSPAN_RE = re.compile(r"rowspan\s*=\s*[\"']?(\d+)", re.I)
_BR_RE = re.compile(r"<br\s*/?\s*>", re.I)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")


def _clean_cell(inner: str) -> str:
    """Inner markup → cell text: <br>→space, strip tags, decode
    entities, collapse whitespace (mirrors the anchor cleanup in
    ``stages/links.py``)."""
    s = _BR_RE.sub(" ", inner)
    s = _TAG_RE.sub("", s)
    s = _html.unescape(s)
    return _WS_RE.sub(" ", s).strip()


def _span(attrs: str, pattern: re.Pattern) -> int:
    m = pattern.search(attrs)
    if not m:
        return 1
    try:
        return max(1, min(int(m.group(1)), 1000))
    except ValueError:
        return 1


def table_grid(table_inner: str) -> List[List[Tuple[str, bool]]]:
    """Reconstruct the cell grid of one ``<table>`` body: a list of
    rows, each a list of ``(text, is_header)``. colspan/rowspan expand
    by value replication into every covered position."""
    rows: List[List[Tuple[str, bool]]] = []
    # pending rowspans: col index -> [text, is_header, remaining rows]
    pending: Dict[int, List] = {}
    for tr in _TR_RE.finditer(table_inner):
        cells = _CELL_RE.findall(tr.group(1))
        row: List[Tuple[str, bool]] = []
        col = 0
        i = 0
        while i < len(cells) or any(c >= col for c in pending):
            if col in pending:
                text, is_hdr, rem = pending[col]
                row.append((text, is_hdr))
                if rem <= 1:
                    del pending[col]
                else:
                    pending[col][2] = rem - 1
                col += 1
                continue
            if i >= len(cells):
                if any(c > col for c in pending):
                    row.append(("", False))  # gap before a later rowspan
                    col += 1
                    continue
                break
            kind, attrs, inner = cells[i]
            i += 1
            text = _clean_cell(inner)
            is_hdr = kind.lower() == "h"
            cs = _span(attrs, _COLSPAN_RE)
            rs = _span(attrs, _ROWSPAN_RE)
            for _ in range(cs):
                row.append((text, is_hdr))
                if rs > 1:
                    pending[col] = [text, is_hdr, rs - 1]
                col += 1
        if row:
            rows.append(row)
    return rows


def _looks_like_html(payload: bytes) -> bool:
    head = payload[:256]
    return not head.startswith(b"%PDF") and b"<" in head


def _page_tables(payload, url) -> List[List[List[Tuple[str, bool]]]]:
    if payload is None or url is None:
        return []
    if isinstance(payload, str):
        payload = payload.encode("utf-8", "replace")
    if not _looks_like_html(payload):
        return []
    text = payload.decode("utf-8", "replace")
    return [table_grid(m.group(1)) for m in _TABLE_RE.finditer(text)]


def extract_html_tables(
    ds: "ray.data.Dataset",
    html_col: str = "html",
    url_col: str = "url",
) -> "ray.data.Dataset":
    """Cell-level extraction: one output row per grid position —
    ``(url, table_idx, row_idx, col_idx, cell, is_header)``."""

    def per_batch(batch: pa.Table) -> pa.Table:
        urls = batch.column(url_col).to_pylist()
        payloads = batch.column(html_col).to_pylist()
        o_url, o_t, o_r, o_c, o_cell, o_hdr = [], [], [], [], [], []
        for url, payload in zip(urls, payloads):
            for t_idx, grid in enumerate(_page_tables(payload, url)):
                for r_idx, row in enumerate(grid):
                    for c_idx, (cell, is_hdr) in enumerate(row):
                        o_url.append(url)
                        o_t.append(t_idx)
                        o_r.append(r_idx)
                        o_c.append(c_idx)
                        o_cell.append(cell)
                        o_hdr.append(is_hdr)
        return pa.Table.from_arrays(
            [
                pa.array(o_url, pa.string()),
                pa.array(o_t, pa.int32()),
                pa.array(o_r, pa.int32()),
                pa.array(o_c, pa.int32()),
                pa.array(o_cell, pa.string()),
                pa.array(o_hdr, pa.bool_()),
            ],
            names=["url", "table_idx", "row_idx", "col_idx", "cell", "is_header"],
        )

    return ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)


def records_from_html_tables(
    ds: "ray.data.Dataset",
    columns: Sequence[str],
    html_col: str = "html",
    url_col: str = "url",
) -> "ray.data.Dataset":
    """Record-level extraction with header promotion (P8): the first
    all-``<th>`` grid row of each table names the columns (sanitized
    per P10, ``functions/textnorm.py:24``); every later grid row
    becomes one record. ``columns`` fixes the output schema — tables
    whose promoted header does not cover a requested column yield null
    for it; extra columns are dropped (projection, P11). All values
    are strings; cast downstream.
    """
    want = [sanitize_column_name(c) for c in columns]

    def per_batch(batch: pa.Table) -> pa.Table:
        urls = batch.column(url_col).to_pylist()
        payloads = batch.column(html_col).to_pylist()
        out: Dict[str, List[Optional[str]]] = {c: [] for c in want}
        o_urls: List[str] = []
        for url, payload in zip(urls, payloads):
            for grid in _page_tables(payload, url):
                if not grid:
                    continue
                header_i = next(
                    (i for i, row in enumerate(grid) if row and all(h for _, h in row)),
                    None,
                )
                if header_i is None:
                    continue
                names = [sanitize_column_name(c) for c, _ in grid[header_i]]
                idx = {n: j for j, n in enumerate(names)}
                for row in grid[header_i + 1 :]:
                    if all(h for _, h in row):  # a repeated header row
                        continue
                    o_urls.append(url)
                    for c in want:
                        j = idx.get(c)
                        out[c].append(row[j][0] if j is not None and j < len(row) else None)
        arrays = [pa.array(o_urls, pa.string())]
        names = ["url"]
        for c in want:
            arrays.append(pa.array(out[c], pa.string()))
            names.append(c)
        return pa.Table.from_arrays(arrays, names=names)

    return ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# deterministic renderer (fixture-side): records → quirky HTML pages


_STYLE_NOISE = ("", ' style="border:1px solid #ccc"', ' align="left"', ' valign="top"')


def _esc(s: str) -> str:
    return (
        s.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def render_html_table_page(
    headers: Sequence[str],
    rows: Sequence[Sequence[str]],
    keys: Sequence[int],
) -> bytes:
    """Render one page holding one ``<table>`` with per-row quirks
    keyed deterministically on ``keys[i]`` (an integer per row): tag
    case, attribute noise, inter-tag whitespace, inline markup inside
    cells, numeric character references. Escaping is lossless — the
    extractor must round-trip every cell byte-identically."""
    parts = ["<html><body><h1>catalog</h1>\n<table border=1 class=data>"]
    parts.append("<tr>" + "".join(f"<th>{_esc(h)}</th>" for h in headers) + "</tr>")
    for row, k in zip(rows, keys):
        tr, td = ("TR", "TD") if k % 3 == 0 else ("tr", "td")
        sep = "\n  " if k % 2 == 0 else ""
        cells = []
        for j, v in enumerate(row):
            e = _esc(v)
            if k % 5 == 0 and j == 1:
                e = f"<b>{e}</b>"
            if k % 4 == 0 and j == 2 and e:
                # first char as a numeric character reference
                e = f"&#{ord(e[0])};" + e[1:]
            if k % 7 == 0 and j == 3:
                e = e.replace(" ", "<br>", 1)
            attrs = _STYLE_NOISE[(k + j) % len(_STYLE_NOISE)]
            cells.append(f"<{td}{attrs}>{e}</{td}>")
        parts.append(f"<{tr} class=r{k % 9}>{sep}" + sep.join(cells) + f"{sep}</{tr}>")
    parts.append("</table>\n<p>footer &amp; legal</p></body></html>")
    return "\n".join(parts).encode("utf-8")


def render_pages_from_batch(
    batch: pa.Table,
    headers: Sequence[str],
    key_col: str,
    rows_per_page: int = 64,
    url_prefix: str = "synth://table/",
) -> pa.Table:
    """Batch of records → pages (url, html), ``rows_per_page`` records
    per page. Column order follows ``headers`` (which must name the
    batch's columns); values are rendered with ``str()``."""
    n = batch.num_rows
    cols = [batch.column(h).to_pylist() for h in headers]
    keys = batch.column(key_col).to_pylist()
    urls, payloads = [], []
    for start in range(0, n, rows_per_page):
        end = min(start + rows_per_page, n)
        rows = [
            ["" if cols[j][i] is None else str(cols[j][i]) for j in range(len(headers))]
            for i in range(start, end)
        ]
        urls.append(f"{url_prefix}{keys[start]}")
        payloads.append(
            render_html_table_page(headers, rows, [int(k) for k in keys[start:end]])
        )
    return pa.Table.from_arrays(
        [pa.array(urls, pa.string()), pa.array(payloads, pa.binary())],
        names=["url", "html"],
    )
