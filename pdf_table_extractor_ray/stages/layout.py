"""Layout-aware extraction strategies over structured HTML payloads.

Two families:

- ``coordinate_columns``: positioned word boxes → y-clustered lines →
  x-threshold column assignment (semantics of
  conversor_banestes.py:23-91 — the "column-boundary inference via
  x-coordinate clustering" the north star names).
- ``lattice_table``: markup table grids → header promotion, cleanup,
  ffill/bfill, hyphen fix, delimiter collapse (semantics of
  conversor_itau.py:15-178 and conversor_stone.py:4-23, with
  camelot's grid replaced by a ruling-line/markup table parser).

Both are pure per-document functions run inside Ray ``map_batches``.
"""

from __future__ import annotations

import re
from collections import defaultdict
from html.parser import HTMLParser
from typing import List, Optional

from pdf_table_extractor_ray.functions.money import fix_hyphen, clean_monetary_value, to_decimal_comma
from pdf_table_extractor_ray.functions.textnorm import sanitize_column_name
from pdf_table_extractor_ray.stages.result import ExtractResult, Record, render_records

# =========================================================================
# coordinate_columns
# =========================================================================

# Layout parameters of conversor_banestes.py:30-31.
COLUMN_DATE_END_X = 75.0
COLUMN_VALUE_START_X = 480.0

_WORDBOX_RE = re.compile(
    r'<span data-x0="([0-9.]+)" data-top="([0-9.]+)">([^<]*)</span>'
)
_PAGE_SPLIT_RE = re.compile(r'<div class="page">')
_DAY_RE = re.compile(r"^\d{2}$")
_DIGIT_RE = re.compile(r"[\d]")
_VALUE_CLEAN_RE = re.compile(r"[^\d,-]")

_DEBIT_KEYWORDS = ("Pix Enviado", "Pagamento", "Tarifa", "Cesta")


def extract_coordinate_columns(
    html: str,
    date_end_x: float = COLUMN_DATE_END_X,
    value_start_x: float = COLUMN_VALUE_START_X,
) -> ExtractResult:
    """Word boxes clustered into lines by round(top), sorted by x0,
    assigned to date/description/value columns by x thresholds; carried
    2-digit day context; keyword-driven negation
    (conversor_banestes.py:23-91). The thresholds are per-strategy
    config (``StrategyConfig``) — the reference hardcodes them per
    converter (conversor_banestes.py:30-31, conversor_itau.py:187-199)."""
    pages = (
        [(float(x0_s), float(top_s), text) for x0_s, top_s, text in _WORDBOX_RE.findall(page_html)]
        for page_html in _PAGE_SPLIT_RE.split(html)
    )
    return cluster_words_to_result(pages, date_end_x, value_start_x)


def cluster_words_to_result(
    pages,
    date_end_x: float = COLUMN_DATE_END_X,
    value_start_x: float = COLUMN_VALUE_START_X,
) -> ExtractResult:
    """Shared core of S2/P7 over any word-box source (markup spans or
    the native PDF parser, ``pdf_native.parse_pdf_words``): ``pages``
    is an iterable of per-page ``(x0, top, text)`` lists; day context
    is carried across pages."""
    transacoes = []
    dia_atual = ""
    for words in pages:
        if not words:
            continue
        linhas = defaultdict(list)
        for x0, top, text in words:
            # round(word['top'], 0) of conversor_banestes.py:43
            linhas[round(top, 0)].append((x0, text))

        for y in sorted(linhas.keys()):
            palavras = sorted(linhas[y], key=lambda w: w[0])
            col_data, col_desc, col_valor = "", "", ""
            for x0, text in palavras:
                if x0 < date_end_x:
                    col_data += text
                elif x0 > value_start_x:
                    col_valor += text
                else:
                    col_desc += text + " "
            col_data, col_desc, col_valor = col_data.strip(), col_desc.strip(), col_valor.strip()

            if _DAY_RE.match(col_data):
                dia_atual = col_data
            if col_desc and col_valor and _DIGIT_RE.search(col_valor):
                if "lançamento" in col_desc.lower():
                    continue
                try:
                    valor = float(
                        _VALUE_CLEAN_RE.sub("", col_valor).replace(".", "").replace(",", ".")
                    )
                except ValueError:
                    continue
                if any(k in col_desc for k in _DEBIT_KEYWORDS) and valor > 0:
                    valor = -valor
                # hardcoded month/year context of conversor_banestes.py:79
                transacoes.append((f"{dia_atual}/JUN/25", col_desc, valor))

    if not transacoes:
        return ExtractResult(status="empty", error="no transactions")
    rows = [(d, desc, to_decimal_comma(v)) for d, desc, v in transacoes]
    res = render_records(rows)
    res.records = [Record(date=d, description=desc, amount=v) for d, desc, v in transacoes]
    return res


# =========================================================================
# lattice_table
# =========================================================================


class _TableGridParser(HTMLParser):
    """Markup-table grid reader: the engine's stand-in for a
    ruling-line ("lattice") table detector — cell grids per table in
    reading order (pdfplumber ``extract_tables`` analog,
    conversor_stone.py:7-15)."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.tables: List[List[List[str]]] = []
        self._rows: Optional[List[List[str]]] = None
        self._cells: Optional[List[str]] = None
        self._buf: Optional[List[str]] = None

    def handle_starttag(self, tag, attrs):
        if tag == "table":
            self._rows = []
        elif tag == "tr" and self._rows is not None:
            self._cells = []
        elif tag in ("td", "th") and self._cells is not None:
            self._buf = []

    def handle_endtag(self, tag):
        if tag in ("td", "th") and self._buf is not None:
            self._cells.append("".join(self._buf))
            self._buf = None
        elif tag == "tr" and self._cells is not None:
            self._rows.append(self._cells)
            self._cells = None
        elif tag == "table" and self._rows is not None:
            if self._rows:
                self.tables.append(self._rows)
            self._rows = None

    def handle_data(self, data):
        if self._buf is not None:
            self._buf.append(data)


_PLAIN_TABLE_GUARD_RE = re.compile(r"<(?:table|tr|td|th)\s|&")
_TABLE_BODY_RE = re.compile(r"<table>(.*?)</table>", re.DOTALL)
_TR_RE = re.compile(r"<tr>(.*?)</tr>", re.DOTALL)
_CELL_RE = re.compile(r"<t[dh]>(.*?)</t[dh]>", re.DOTALL)


def _parse_tables_fast(html: str):
    """Regex tokenizer for strictly plain markup (no tag attributes, no
    entities, no nested tables) — ~10× the stdlib HTMLParser. Returns
    None when the markup is not plain; caller falls back."""
    if _PLAIN_TABLE_GUARD_RE.search(html):
        return None
    tables = []
    for t in _TABLE_BODY_RE.finditer(html):
        body = t.group(1)
        if "<table" in body:
            return None
        rows = [_CELL_RE.findall(r.group(1)) for r in _TR_RE.finditer(body)]
        if rows:
            tables.append(rows)
    return tables


def parse_tables(html: str) -> List[List[List[str]]]:
    fast = _parse_tables_fast(html)
    if fast is not None:
        return fast
    parser = _TableGridParser()
    parser.feed(html)
    return parser.tables


_UNNAMED_RE = re.compile(r"^Unnamed:\s*\d+")
_SEMI_COLLAPSE_RE = re.compile(r";{2,}")


class _Grid:
    """Column-named string grid with the pandas-ish ops the lattice
    pipeline needs (dedup columns, ffill/bfill, render)."""

    def __init__(self, columns: List[str], rows: List[List[str]]):
        self.columns = columns
        self.rows = [list(r) + [""] * (len(columns) - len(r)) for r in rows]

    def drop_duplicate_columns(self):
        # df.loc[:, ~df.columns.duplicated()] (conversor_itau.py:49)
        seen = set()
        keep = []
        for i, c in enumerate(self.columns):
            if c not in seen:
                seen.add(c)
                keep.append(i)
        self._select(keep)

    def _select(self, idxs: List[int]):
        self.columns = [self.columns[i] for i in idxs]
        self.rows = [[r[i] for i in idxs] for r in self.rows]

    def strip_column_names(self):
        self.columns = [c.strip() for c in self.columns]

    def map_all(self, fn):
        self.rows = [[fn(v) for v in r] for r in self.rows]

    def col_index(self, name: str) -> Optional[int]:
        try:
            return self.columns.index(name)
        except ValueError:
            return None

    def strip_column(self, name: str):
        i = self.col_index(name)
        if i is not None:
            for r in self.rows:
                r[i] = r[i].strip()

    def ffill_column(self, name: str):
        # fill_empty_dates (conversor_itau.py:146-152): ''→NA then ffill
        i = self.col_index(name)
        if i is None:
            return
        last = ""
        for r in self.rows:
            if r[i] == "" and last != "":
                r[i] = last
            elif r[i] != "":
                last = r[i]

    def bfill_column(self, name: str):
        # remove_credit_debit_repeats (conversor_itau.py:154-167)
        i = self.col_index(name)
        if i is None:
            return
        nxt = ""
        for r in reversed(self.rows):
            if r[i] == "" and nxt != "":
                r[i] = nxt
            elif r[i] != "":
                nxt = r[i]

    def render_csv(self) -> str:
        lines = [";".join(self.columns)]
        lines.extend(";".join(r) for r in self.rows)
        return "\n".join(lines) + "\n"


def extract_lattice_table(html: str) -> ExtractResult:
    """Lattice pipeline: per-table header promotion (fix_header,
    conversor_itau.py:125-129) → cleanup + hyphen fix (clean_data,
    :47-66) → concat (T1) → column-name sanitization (:131-144) →
    date ffill (:146-152) → credit/debit bfill (:154-167) → ';'-CSV
    render with delimiter collapse (finalize_csv, :169-178)."""
    tables = parse_tables(html)
    if not tables:
        return ExtractResult(status="empty", error="no tables")

    grids = []
    for t in tables:
        if not t or len(t) < 1:
            continue
        header, rows = t[0], t[1:]
        g = _Grid([str(c) for c in header], rows)
        # clean_data: dedup columns, strip names, strip 'data', fix_hyphen
        g.drop_duplicate_columns()
        g.strip_column_names()
        g.strip_column("data")
        g.map_all(fix_hyphen)
        grids.append(g)
    if not grids:
        return ExtractResult(status="empty", error="no tables")

    # concat on the first grid's column set (pd.concat aligns by name;
    # fixture tables share the header across pages)
    main = grids[0]
    for g in grids[1:]:
        idxs = [g.col_index(c) for c in main.columns]
        for r in g.rows:
            main.rows.append([r[i] if i is not None else "" for i in idxs])

    main.columns = [sanitize_column_name(c) for c in main.columns]
    main.drop_duplicate_columns()
    keep = [i for i, c in enumerate(main.columns) if not _UNNAMED_RE.match(c)]
    main._select(keep)
    if "data_de_insercao" in main.columns:
        main._select([i for i, c in enumerate(main.columns) if c != "data_de_insercao"])

    main.ffill_column("data")
    main.bfill_column("credito")
    main.bfill_column("debito")

    csv_text = _SEMI_COLLAPSE_RE.sub(";", main.render_csv())

    # records: one per data row using the familiar column names
    di = main.col_index("data")
    hi = main.col_index("historico")
    if hi is None:
        hi = main.col_index("lancamento")
    vi = main.col_index("valor")
    ci, bi = main.col_index("credito"), main.col_index("debito")
    records = []
    for r in main.rows:
        date = r[di] if di is not None else ""
        desc = r[hi] if hi is not None else ""
        amount = None
        if vi is not None and r[vi]:
            amount = clean_monetary_value(r[vi])
        elif ci is not None and r[ci]:
            amount = clean_monetary_value(r[ci])
        elif bi is not None and r[bi]:
            amt = clean_monetary_value(r[bi])
            amount = -amt if amt is not None and amt > 0 else amt
        records.append(Record(date=date, description=desc, amount=amount))

    res = ExtractResult(extracted_text=csv_text)
    res.records = records
    # spans: one line span per row of the rendered CSV
    offset = 0
    for line in csv_text.split("\n"):
        if line:
            res.spans.append((offset, offset + len(line), "row"))
        offset += len(line) + 1
    return res
