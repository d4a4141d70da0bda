"""Statement-format extraction strategies over pre-extracted page text.

Each strategy is a pure per-document function (text → ExtractResult)
reproducing one reference converter's record-segmentation semantics
(P1-P6, L1-L4, F1-F8 of SURVEY §2). Pages in the input ``text`` are
separated by ``\\f`` (form feed) — the analog of pdfplumber's per-page
iteration.

These functions run inside Ray ``map_batches`` UDFs (one call per row,
state strictly row-scoped) and inside the driver-side golden oracle;
they never touch Ray APIs.
"""

from __future__ import annotations

import re
from typing import List, Optional

from pdf_table_extractor_ray.functions.money import (
    br_format,  # noqa: F401  (used by fixtures)
    clean_monetary_value,
    parse_cd_suffix,
    parse_currency_prefixed,
    parse_paren_signed,
    format_cd_string,
    to_decimal_comma,
)
from pdf_table_extractor_ray.functions.dates import (
    identify_date_pattern,
    parse_date,
    infer_year_c6,
    infer_year_sicoob,
    valid_day_month,
    PT_MONTHS,
)
from pdf_table_extractor_ray.stages.result import ExtractResult, Record, render_records

PAGE_SEP = "\f"


def _pages(text: str) -> List[str]:
    return text.split(PAGE_SEP)


def _join_pages_nl(text: str) -> str:
    """All pages concatenated with '\\n' — the common reference idiom
    (conversor_caixa.py:23-28, conversor_bbmod1.py:54-60)."""
    return "\n".join(p for p in _pages(text)) + "\n" if text else ""


def _amount_str(value: Optional[float]) -> str:
    return "" if value is None else to_decimal_comma(value)


# =========================================================================
# regex_listing — semantics of conversor_caixa.py:98-271
# =========================================================================

_CAIXA_SKIP_WORDS = ("SALDO DIA", "SALDO ANTERIOR", "TOTAL", "Data Mov", "Histórico", "Valor")
_TRAILING_BAL_RE = re.compile(r"([\d\.,]+\s*[DC]?)\s*$")

from functools import lru_cache  # noqa: E402


@lru_cache(maxsize=8)  # only the handful of auto-detected date patterns
def _caixa_patterns(date_pattern: str):
    date_rx = re.compile(date_pattern)
    patterns = (
        re.compile(rf"({date_pattern})\s+(\d+|\w+)\s+(.*?)\s+([\d\.,]+\s*[DC]?)\s+([\d\.,]+\s*[DC]?)"),
        re.compile(rf"({date_pattern})\s+(.*?)\s+([\d\.,]+\s*[DC]?)\s+([\d\.,]+\s*[DC]?)"),
        re.compile(rf"({date_pattern})(.+)"),
    )
    return date_rx, patterns


def extract_regex_listing(text: str) -> ExtractResult:
    """Date-anchored line scan with a 3-pattern cascade and skip-word
    filter (conversor_caixa.py:98-192), then date parse + money
    normalization with keep-on-failure (conversor_caixa.py:232-271)."""
    full = _join_pages_nl(text)
    date_pattern = identify_date_pattern(full)
    if not date_pattern:
        return ExtractResult(status="empty", error="no date pattern")

    date_rx, patterns = _caixa_patterns(date_pattern)

    transactions = []
    for line in full.split("\n"):
        line = line.strip()
        if not line or not date_rx.search(line):
            continue
        for pattern_index, pattern in enumerate(patterns):
            match = pattern.search(line)
            if not match:
                continue
            if pattern_index == 0:
                date, description, balance = match.group(1), match.group(3).strip(), match.group(5).strip()
            elif pattern_index == 1:
                date, description, balance = match.group(1), match.group(2).strip(), match.group(4).strip()
            else:
                date = match.group(1)
                remaining = match.group(2).strip()
                bal_m = _TRAILING_BAL_RE.search(remaining)
                if bal_m:
                    balance = bal_m.group(1).strip()
                    description = remaining.rsplit(balance, 1)[0].strip()
                else:
                    description = remaining
                    balance = "Não identificado"
            if any(word in description for word in _CAIXA_SKIP_WORDS):
                # skip-word hit: the reference 'continue's to the next
                # pattern, not the next line (conversor_caixa.py:173-176)
                continue
            transactions.append((date, description, balance))
            break

    if not transactions:
        return ExtractResult(status="empty", error="no transactions")

    rows, records = [], []
    for date, description, balance in transactions:
        dt = parse_date(date, date_pattern)
        date_out = dt.strftime("%Y-%m-%d") if dt is not None else date
        amount = clean_monetary_value(balance)
        rows.append((date_out, description, _amount_str(amount) if amount is not None else balance))
        records.append(Record(date=date, description=description, amount=amount))
    res = render_records(rows)
    res.records = records
    return res


# =========================================================================
# santander_merge — semantics of conversor_santander.py:18-153
# =========================================================================

_STD_VALUE_RE = re.compile(r"(\d{1,3}(?:\.\d{3})*,\d{2}-?)")
_STD_DATE_RE = re.compile(r"^(\d{2}/\d{2}(?:/\d{2,4})?)\b")
_STD_DOCVAL_SPACE_RE = re.compile(r"(\d{6,})(\d{1,3}(?:\.\d{3})*,\d{2}-?)")
_STD_NEG_WORDS = (
    "boleto", "outros bancos", "aplicacao", "pix enviado", "transferência enviada",
    "tarifa", "comercial", "tributo", "estadual", "esgoto", "telefone", "devolvido",
    "cancelado", "estorno", "distribuidora", "fornecedores", "darf", "celular",
)
_STD_SALDO_SKIP_RE = re.compile(r"^\s*SALDO (ANTERIOR|EM \d{2}/\d{2}/\d{4})")
_STD_SALDO_EM_RE = re.compile(r"^\s*SALDO EM \d{2}/\d{2}(?:/\d{2,4})?\s*$", re.IGNORECASE)
_STD_END_MARK = "EXTRATO CONSOLIDADO"


# doc-number lookup, end-anchored against the text preceding a value
# occurrence. Equivalent to the reference's per-value compiled pattern
# r"(\d{6,})(?:\s+|\s*-\s*)?" + re.escape(valor_raw) — which would
# compile a FRESH regex per record (the values differ), thrashing the
# re cache and dominating large-document wall time.
_STD_DOC_BEFORE_RE = re.compile(r"(\d{6,})(?:\s+|\s*-\s*)?$")


def _std_find_doc(linha: str, valor_raw: str) -> str:
    j = linha.find(valor_raw)
    while j != -1:
        m = _STD_DOC_BEFORE_RE.search(linha, 0, j)
        if m:
            return m.group(1)
        j = linha.find(valor_raw, j + 1)
    return ""


def _std_extract_fields(linha: str, data_corrente: str):
    """conversor_santander.py:18-48 (extrair_dados)."""
    match_valor = _STD_VALUE_RE.search(linha)
    if not match_valor:
        return None
    valor_raw = match_valor.group(1)
    valor_index = linha.rfind(valor_raw)
    lancamento = linha[:valor_index].strip()

    documento = _std_find_doc(linha, valor_raw)

    lower = lancamento.lower()
    for palavra in _STD_NEG_WORDS:
        if palavra in lower:
            valor_final = "-" + valor_raw.replace("-", "")
            break
    else:
        valor_final = "-" + valor_raw[:-1] if valor_raw.endswith("-") else valor_raw
    return [data_corrente, lancamento, valor_final, documento]


def _std_prepare_line(linhas: List[str], idx: int):
    """conversor_santander.py:50-73 (preparar_linha): merge up to two
    continuation lines iff the current line has no money value and the
    next line does not open a new dated record.

    ``linhas`` must be pre-stripped and tab-normalized (the caller does
    it once per page — a per-call strip would re-process every line up
    to 3× as base + lookahead, measurably dominating this parser)."""
    linha = linhas[idx]
    linhas_usadas = 1
    for offset in range(1, 3):
        if idx + offset >= len(linhas):
            break
        extra = linhas[idx + offset]
        if (
            not _STD_VALUE_RE.search(linha)
            and not _STD_DATE_RE.match(extra)
            and extra
        ):
            linha += " " + extra
            linhas_usadas += 1
        else:
            break
    linha = _STD_DOCVAL_SPACE_RE.sub(r"\1 \2", linha)
    return linha, linhas_usadas


def extract_santander(text: str) -> ExtractResult:
    """Lookahead line merging with guards + keyword-driven negation +
    doc-number capture (conversor_santander.py:76-153), then exact
    dedup and SALDO-row filters."""
    data: List[list] = []
    current_date = ""
    start_extract = False

    for page_text in _pages(text):
        if not page_text:
            continue
        # two views of each line: ``raw`` is strip-only — the reference
        # (conversor_santander.py processar_pdf) applies ONLY .strip()
        # to linha_base, so the trigger/terminator checks must not see
        # tab-normalization (a header like 'EXTRATO\tCONSOLIDADO' must
        # NOT match, ADVICE r3); ``linhas`` is additionally
        # tab-normalized ONCE for field assembly by _std_prepare_line
        raw = [l.strip() for l in page_text.split("\n")]
        linhas = [l.replace("\t", " ") for l in raw]
        idx = 0
        while idx < len(linhas):
            linha_base = raw[idx]
            if "Movimentação" in linha_base:
                start_extract = True
                for skip_idx in range(idx + 1, min(idx + 4, len(linhas))):
                    if _STD_SALDO_SKIP_RE.match(raw[skip_idx].upper()):
                        idx = skip_idx + 1
                        break
                    if _STD_DATE_RE.match(raw[skip_idx]):
                        idx = skip_idx
                        break
                else:
                    idx += 2
                continue
            if not start_extract or (_STD_END_MARK in linha_base and not _STD_DATE_RE.match(linha_base)):
                idx += 1
                continue

            linha_completa, usadas = _std_prepare_line(linhas, idx)
            match_data = _STD_DATE_RE.match(linha_completa)
            if match_data:
                current_date = match_data.group(1)
                # the pattern is ^-anchored, so sub(count=1) == slice
                linha_completa = linha_completa[match_data.end() :].strip()
            if current_date:
                entrada = _std_extract_fields(linha_completa, current_date)
                if entrada:
                    data.append(entrada)
            idx += usadas

    if not data:
        return ExtractResult(status="empty", error="no transactions")

    # numeric conversion (conversor_santander.py:139-148), exact dedup
    # (:149) and SALDO filters (:152-153), order-preserving
    seen = set()
    rows, records = [], []
    for entrada in data:
        date_s, lanc, valor_s, doc = entrada
        key = (date_s, lanc, valor_s, doc)
        if key in seen:
            continue
        seen.add(key)
        if "saldo anterior" in lanc.lower():
            continue
        if _STD_SALDO_EM_RE.match(lanc):
            continue
        try:
            valor = float(valor_s.replace(".", "").replace(",", "."))
        except ValueError:
            valor = None
        rows.append((date_s, lanc, _amount_str(valor), doc))
        records.append(Record(date=date_s, description=lanc, amount=valor, doc=doc))

    if not rows:
        return ExtractResult(status="empty", error="no transactions after cleanup")
    res = render_records(rows, kinds=("date", "description", "amount", "doc"))
    res.records = records
    return res


# =========================================================================
# bb1_buffer — semantics of conversor_bbmod1.py:37-103
# =========================================================================

_BB1_DATE_RE = re.compile(r"^\d{2}/\d{2}/\d{2,4}")
_BB1_VALUE_RE = re.compile(r"([\d\.,\s]+\(\s*[-+]\s*\))$")
_BB1_IGNORE_RE = re.compile(
    r"^(Lançamentos|Histórico|Saldo Anterior|Dia\s+Lote|Extrato de Conta Corrente|Cliente\s|Agência:|Total Aplicações|Informações Adicionais|SALDO|Informações Complementares)",
    re.IGNORECASE,
)
_BB1_DOCNUM_RE = re.compile(r"^\s*\d+\s+[\d\w]+\s*")
_WS_RE = re.compile(r"\s+")


def extract_bb1(text: str) -> ExtractResult:
    """Buffered continuation merge: description lines accumulate until
    the '(±)'-signed value appears at the buffer tail, then emit
    (conversor_bbmod1.py:42-103)."""
    full = _join_pages_nl(text)
    linhas = full.split("\n")

    transacoes = []
    buffer_data = None
    buffer_desc: List[str] = []
    for linha in linhas:
        linha = linha.strip()
        if not linha or _BB1_IGNORE_RE.search(linha):
            continue
        data_match = _BB1_DATE_RE.search(linha)
        if data_match:
            buffer_data = data_match.group(0)
            descricao = _BB1_DATE_RE.sub("", linha).strip()
            descricao = _BB1_DOCNUM_RE.sub("", descricao)
            buffer_desc = [descricao]
        elif buffer_data:
            buffer_desc.append(linha)

        if buffer_data:
            joined = " ".join(buffer_desc)
            valor_match = _BB1_VALUE_RE.search(joined)
            if valor_match:
                valor_str = valor_match.group(1)
                desc = _BB1_VALUE_RE.sub("", joined).strip()
                desc = _WS_RE.sub(" ", desc)
                valor = parse_paren_signed(valor_str)
                if valor != 0.0:
                    transacoes.append((buffer_data, desc, valor))
                buffer_data = None
                buffer_desc = []

    if not transacoes:
        return ExtractResult(status="empty", error="no transactions")
    rows = [(d, desc, to_decimal_comma(v)) for d, desc, v in transacoes]
    res = render_records(rows)
    res.records = [Record(date=d, description=desc, amount=v) for d, desc, v in transacoes]
    return res


# =========================================================================
# bb2_nextdate — semantics of conversor_bbmod2.py:24-73
# =========================================================================

_BB2_DATE_RE = re.compile(r"^\d{2}/\d{2}/\d{2,4}")
_BB2_VALUE_RE = re.compile(r"([\d\.,]+\s[CD])")
_BB2_IGNORE_RE = re.compile(r"(Lançamentos|Histórico|Saldo Anterior|SALDO|G336)")


def extract_bb2(text: str) -> ExtractResult:
    """Emit-on-next-date continuation merge with C/D-suffixed values
    (conversor_bbmod2.py:24-73); drops 'Saldo Anterior' rows and zero
    values at the table level."""
    linhas_texto: List[str] = []
    for page_text in _pages(text):
        if page_text:
            linhas_texto.extend(page_text.split("\n"))

    transacoes = []
    atual = None
    for linha in linhas_texto:
        if _BB2_DATE_RE.search(linha):
            if atual is not None:
                desc = _WS_RE.sub(" ", " ".join(atual["desc"]).strip())
                transacoes.append((atual["data"], desc, atual["valor"]))
            data = linha.split()[0]
            valores = _BB2_VALUE_RE.findall(linha)
            valor_str = valores[0] if valores else None
            descricao = linha.replace(data, "", 1).strip()
            if valor_str:
                for v in valores:
                    descricao = descricao.replace(v, "").strip()
            atual = {"data": data, "desc": [descricao], "valor": parse_cd_suffix(valor_str)}
        elif atual is not None:
            if not _BB2_IGNORE_RE.search(linha):
                atual["desc"].append(linha.strip())
    if atual is not None:
        desc = _WS_RE.sub(" ", " ".join(atual["desc"]).strip())
        transacoes.append((atual["data"], desc, atual["valor"]))

    kept = [(d, desc, v) for d, desc, v in transacoes if "Saldo Anterior" not in desc and v != 0.0]
    if not kept:
        return ExtractResult(status="empty", error="no transactions")
    rows = [(d, desc, to_decimal_comma(v)) for d, desc, v in kept]
    res = render_records(rows)
    res.records = [Record(date=d, description=desc, amount=v) for d, desc, v in kept]
    return res


# =========================================================================
# sicoob1 — semantics of conversor_sicoobmod1.py:9-77
# =========================================================================

_SIC1_DATE_RE = re.compile(r"^(\d{2}\/\d{2}\/\d{4})")
_SIC1_VALUE_RE = re.compile(r"([\d\.,]+)([CD])$")
_SIC1_DOC_RE = re.compile(r"^\S+\s")
_SIC1_SKIP = ("SALDO ANTERIOR", "SALDO DO DIA", "EXTRATO CONTA CORRENTE")


def extract_sicoob1(text: str) -> ExtractResult:
    """Per-line scan with carried current-date and a C/D value anchored
    at line end; value kept as a BR-format string with the 'D' folded
    into a leading '-' (conversor_sicoobmod1.py:9-77)."""
    transacoes = []
    data_atual = None
    for page_text in _pages(text):
        if not page_text:
            continue
        for linha in page_text.split("\n"):
            if any(s in linha for s in _SIC1_SKIP):
                continue
            match_data = _SIC1_DATE_RE.search(linha)
            if match_data:
                data_atual = match_data.group(1)
            match_valor = _SIC1_VALUE_RE.search(linha.strip())
            if match_valor and data_atual:
                valor_original = f"{match_valor.group(1)}{match_valor.group(2)}"
                lancamento = linha[: match_valor.start()].strip()
                if match_data:
                    lancamento = lancamento[match_data.end():].strip()
                lancamento = _SIC1_DOC_RE.sub("", lancamento, count=1)
                if lancamento:
                    transacoes.append((data_atual, lancamento.strip(), valor_original))

    if not transacoes:
        return ExtractResult(status="empty", error="no transactions")
    rows = [(d, l, format_cd_string(v)) for d, l, v in transacoes]
    res = render_records(rows)
    res.records = [
        Record(date=d, description=l, amount=parse_cd_suffix(v)) for d, l, v in transacoes
    ]
    return res


# =========================================================================
# sicoob2_blocks — semantics of conversor_sicoobmod2.py:10-73
# =========================================================================

_SIC2_HEAD_MARK = "HISTÓRICO DE MOVIMENTAÇÃO\n"
_SIC2_SALDO_RE = re.compile(r"SALDO ANTERIOR.*?\n", re.DOTALL)
_SIC2_RESUMO_RE = re.compile(r"\nRESUMO.*", re.DOTALL)
_SIC2_BLOCK_SPLIT_RE = re.compile(r"\n(?=\d{2}/\d{2})")
_SIC2_VALUE_RE = re.compile(r"(\d{1,3}(?:\.\d{3})*,\d{2}|\d+,\d{2}|\d+\.\d{2})\s*([CD])")
_SIC2_DATE_RE = re.compile(r"(\d{2}/\d{2})")
_SIC2_MULTIWS_RE = re.compile(r"\s{2,}")


def extract_sicoob2(text: str) -> ExtractResult:
    """Block segmentation by date lookahead split with section strips
    and year inference from the header (conversor_sicoobmod2.py:10-73)."""
    pages = _pages(text)
    ano = infer_year_sicoob(pages[0]) if pages else None
    if ano is None:
        ano = "1970"  # deterministic default; the reference falls back to 'now'
    texto_completo = "\n".join(pages)

    # equivalent of re.sub(r".*HISTÓRICO DE MOVIMENTAÇÃO\n", "", t, DOTALL)
    # (conversor_sicoobmod2.py:34): greedy '.*' strips through the LAST
    # occurrence — rfind gives identical output in O(n) instead of the
    # regex engine's O(n²) restart-per-position scan on big documents.
    head_idx = texto_completo.rfind(_SIC2_HEAD_MARK)
    if head_idx != -1:
        texto_completo = texto_completo[head_idx + len(_SIC2_HEAD_MARK):]
    texto_completo = _SIC2_SALDO_RE.sub("", texto_completo)
    texto_completo = _SIC2_RESUMO_RE.sub("", texto_completo)

    blocos = _SIC2_BLOCK_SPLIT_RE.split(texto_completo.strip())
    transacoes = []
    for bloco in blocos:
        texto_bloco = _SIC2_MULTIWS_RE.sub(" ", bloco.replace("\n", " ").strip())
        if "SALDO DO DIA" in texto_bloco:
            continue
        match_valor = _SIC2_VALUE_RE.search(texto_bloco)
        data_match = _SIC2_DATE_RE.match(texto_bloco)
        if data_match and match_valor:
            data = f"{data_match.group(1)}/{ano}"
            valor = float(match_valor.group(1).replace(".", "").replace(",", "."))
            if match_valor.group(2) == "D":
                valor = -valor
            descricao = re.sub(r"^\d{2}/\d{2}\s*", "", texto_bloco).strip()
            descricao = descricao.replace(match_valor.group(0), "", 1).strip()
            descricao = _SIC2_MULTIWS_RE.sub(" ", descricao).strip()
            if descricao:
                transacoes.append((data, descricao, valor))

    if not transacoes:
        return ExtractResult(status="empty", error="no transactions")
    rows = [(d, desc, to_decimal_comma(v)) for d, desc, v in transacoes]
    res = render_records(rows)
    res.records = [Record(date=d, description=desc, amount=v) for d, desc, v in transacoes]
    return res


# =========================================================================
# c6_date_context — semantics of conversor_c6.py:30-94
# =========================================================================

_C6_DM_RE = re.compile(r"(\d{2}/\d{2})")
_C6_TXN_RE = re.compile(r"^(.*?)\s+(-?R\$\s?[\d\.,]+)$")
_C6_LEAD_DM_RE = re.compile(r"^\d{2}/\d{2}\s*")


def extract_c6(text: str) -> ExtractResult:
    """Carried DD/MM date context completed with a header-scraped year,
    R$-prefixed trailing values, exact dedup (conversor_c6.py:30-94)."""
    pages = _pages(text)
    ano = infer_year_c6("".join(pages))
    if ano is None:
        return ExtractResult(status="error", error="year not found in header")

    transacoes = []
    data_atual = None
    for page_text in pages:
        if not page_text:
            continue
        for linha in page_text.split("\n"):
            linha_limpa = linha.strip()
            if not linha_limpa or "Saldo do dia" in linha_limpa or "Data Lançamento" in linha_limpa:
                continue
            dm = _C6_DM_RE.match(linha_limpa)
            if dm and valid_day_month(dm.group(1)):
                data_atual = f"{dm.group(1)}/{ano}"
            txn = _C6_TXN_RE.search(linha_limpa)
            if data_atual and txn:
                descricao, valor_str = txn.groups()
                descricao = _C6_LEAD_DM_RE.sub("", descricao.strip()).strip()
                valor = parse_currency_prefixed(valor_str)
                if descricao and valor != 0.0:
                    transacoes.append((data_atual, descricao, valor))

    # exact dedup, order-preserving (conversor_c6.py:94 drop_duplicates)
    seen = set()
    kept = []
    for t in transacoes:
        if t not in seen:
            seen.add(t)
            kept.append(t)
    if not kept:
        return ExtractResult(status="empty", error="no transactions")
    rows = [(d, desc, to_decimal_comma(v)) for d, desc, v in kept]
    res = render_records(rows)
    res.records = [Record(date=d, description=desc, amount=v) for d, desc, v in kept]
    return res


# =========================================================================
# inter_months — semantics of conversor_inter.py:8-56
# =========================================================================

_INTER_DATE_RE = re.compile(r"(\d{1,2}) de (\w+) de (\d{4})")
_INTER_VALUE_RE = re.compile(r"(-?)R\$\s*(\d{1,3}(?:\.\d{3})*,\d{2})")
_INTER_THOUSANDS_RE = re.compile(r"\.(?=\d{3},)")


def extract_inter(text: str) -> ExtractResult:
    """PT month-name date context carried across lines; value kept as a
    BR string with thousands dots stripped (conversor_inter.py:27-53)."""
    rows_raw = []
    ultima_data = "01/01/2000"
    for page_text in _pages(text):
        if not page_text:
            continue
        for line in page_text.split("\n"):
            date_match = _INTER_DATE_RE.search(line)
            if date_match:
                dia, mes, ano = date_match.groups()
                ultima_data = f"{dia}/{PT_MONTHS.get(mes, '00')}/{ano}"
            match = _INTER_VALUE_RE.search(line)
            if match:
                sinal, valor = match.group(1), match.group(2)
                historico = line[: match.start()].strip()
                valor = f"-{valor}" if sinal == "-" else valor
                valor = _INTER_THOUSANDS_RE.sub("", valor)
                historico = historico.replace('"', "").replace("'", "")
                rows_raw.append((ultima_data, historico, valor))

    if not rows_raw:
        return ExtractResult(status="empty", error="no transactions")
    res = render_records(rows_raw)
    res.records = [
        Record(date=d, description=h, amount=float(v.replace(",", "."))) for d, h, v in rows_raw
    ]
    return res


# =========================================================================
# cef_simple — semantics of conversor_cef.py:8-39
# =========================================================================

_CEF_DATE_RE = re.compile(r"(\d{2}/\d{2}/\d{4})")


def extract_cef(text: str) -> ExtractResult:
    """Naive whitespace split: first token = date, last = value, middle
    = description (conversor_cef.py:23-32). Values stay raw strings."""
    full = _join_pages_nl(text)
    transactions = []
    for line in full.split("\n"):
        if _CEF_DATE_RE.search(line):
            parts = line.split()
            if len(parts) > 2:
                transactions.append((parts[0], " ".join(parts[1:-1]), parts[-1]))
    if not transactions:
        return ExtractResult(status="empty", error="no transactions")
    res = render_records(transactions)
    res.records = [
        Record(date=d, description=desc, amount=clean_monetary_value(v))
        for d, desc, v in transactions
    ]
    return res


# =========================================================================
# pagbank_findall — semantics of conversor_pagbank.py:30-48
# =========================================================================

_PAGBANK_RE = re.compile(r"(\d{2}/\d{2}/\d{4})\s+(.+?)\s+(-?R?\$\s?[\d\.]+,\d{2})")


def extract_pagbank(text: str) -> ExtractResult:
    """Whole-text findall of (date, desc, value) triples
    (conversor_pagbank.py:38-39)."""
    full = "\n".join(p for p in _pages(text) if p)
    matches = _PAGBANK_RE.findall(full)
    if not matches:
        return ExtractResult(status="empty", error="no transactions")
    res = render_records(matches)
    res.records = [
        Record(date=d, description=desc, amount=parse_currency_prefixed(v))
        for d, desc, v in matches
    ]
    return res


# =========================================================================
# bradesco_triples — semantics of conversor_bradesco.py:33-228
# =========================================================================

_BRA_NUMTRIPLE_ANCH_RE = re.compile(
    r"^(\d+)\s+(-?\d{1,3}(?:\.\d{3})*(?:,\d{2})?)\s+(-?\d{1,3}(?:\.\d{3})*(?:,\d{2})?)$"
)
_BRA_NUMTRIPLE_TAIL_RE = re.compile(
    r"(\d+)\s+(-?\d{1,3}(?:\.\d{3})*(?:,\d{2})?)\s+(-?\d{1,3}(?:\.\d{3})*(?:,\d{2})?)$"
)
_BRA_DESC_STRIP_RE = re.compile(
    r"\s+\d+\s+[-+]?\d{1,3}(?:\.\d{3})*(?:,\d{2})?\s+[-+]?\d{1,3}(?:\.\d{3})*(?:,\d{2})?$"
)
_BRA_DATE_ANCH_RE = re.compile(r"^(\d{2}/\d{2}/\d{4})")
_BRA_DATE_ANY_RE = re.compile(r"(\d{2}/\d{2}/\d{4})")
_BRA_NUMERIC_RE = re.compile(r"^-?[\d.,]+$")


def extract_bradesco(text: str) -> ExtractResult:
    """The six disk-staged rewrite passes of conversor_bradesco.py:33-164
    fused into one pure in-memory function, plus the last-3-tokens value
    split of txt_to_xls (:167-228). Stage-to-stage state never touches
    the filesystem here — the fusion called out in SURVEY §2.2 K4."""
    # extract_pdf_to_text writes pages separated by blank lines (:19-31);
    # every stage drops blank lines on read, so plain line collection is
    # equivalent.
    lines = [l.strip() for l in _join_pages_nl(text).split("\n") if l.strip()]

    # clean_statement (:33-50)
    lines = lines[5:] if len(lines) > 5 else []
    for i, line in enumerate(lines):
        if "total" in line.lower():
            lines = lines[:i]
            break

    # mark_all_transaction_blocks (:52-74)
    marked = []
    i = 0
    while i < len(lines):
        if i + 2 < len(lines) and _BRA_NUMTRIPLE_ANCH_RE.match(lines[i + 1]):
            marked.append(f"*{lines[i]}")
            marked.append(lines[i + 1])
            marked.append(f"{lines[i + 2]}*")
            i += 3
        else:
            marked.append(lines[i])
            i += 1

    # process_marked_blocks (:76-96)
    processed = []
    i = 0
    while i < len(marked):
        cur = marked[i]
        if cur.startswith("*") and i + 2 < len(marked) and marked[i + 2].endswith("*"):
            processed.append(f"*{cur[1:]} {marked[i + 2][:-1]} {marked[i + 1]}*")
            i += 3
        else:
            processed.append(cur)
            i += 1

    # first_exception (:98-119)
    out1 = []
    i = 0
    while i < len(processed):
        cur = processed[i]
        if (
            not cur.startswith("*")
            and i + 1 < len(processed)
            and not processed[i + 1].startswith("*")
        ):
            m1 = _BRA_NUMTRIPLE_TAIL_RE.search(cur)
            m2 = _BRA_NUMTRIPLE_TAIL_RE.search(processed[i + 1])
            if m1 and not m2:
                desc_part = _BRA_DESC_STRIP_RE.sub("", cur)
                out1.append(f"{desc_part} {processed[i + 1]} {m1.group(0)}")
                i += 2
                continue
        out1.append(cur)
        i += 1

    # second_exception (:121-140)
    out2 = []
    i = 0
    while i < len(out1):
        cur = out1[i]
        if not cur.startswith("*") and i + 1 < len(out1) and not out1[i + 1].startswith("*"):
            m1 = _BRA_NUMTRIPLE_TAIL_RE.search(cur)
            m2 = _BRA_NUMTRIPLE_TAIL_RE.search(out1[i + 1])
            if not m1 and m2:
                out2.append(f"{cur} {out1[i + 1]}")
                i += 2
                continue
        out2.append(cur)
        i += 1

    # propagate_and_format (:142-164)
    cleaned = [l.strip("*").strip() for l in out2]
    propagated = []
    current_date = None
    for line in cleaned:
        m = _BRA_DATE_ANCH_RE.match(line)
        if m:
            current_date = m.group(1)
            propagated.append(line)
        elif current_date:
            propagated.append(f"{current_date} {line}")
        else:
            propagated.append(line)

    # txt_to_xls value split (:167-228)
    rows, records = [], []
    last_valid_date = None
    for line in propagated:
        current_line_date = ""
        remaining = line
        m = _BRA_DATE_ANY_RE.search(line)
        if m:
            current_line_date = m.group(1)
            last_valid_date = current_line_date
            remaining = line.replace(current_line_date, "", 1).strip()
        elif last_valid_date:
            current_line_date = last_valid_date
        parts = remaining.split()
        valores = []
        for part in parts[-3:]:
            if _BRA_NUMERIC_RE.match(part):
                clean_val = part.replace(".", "").replace(",", ".")
                try:
                    valores.append(float(clean_val) if "." in clean_val else int(clean_val))
                except ValueError:
                    valores.append(part)
            else:
                valores.append(part)
        historico = " ".join(parts[:-3]) if len(parts) > 3 else ""

        def _fmt(v):
            if isinstance(v, float):
                return to_decimal_comma(v)
            return str(v)

        cells = [_fmt(valores[c]) if c < len(valores) else "" for c in range(3)]
        rows.append((current_line_date, historico, cells[0], cells[1], cells[2]))
        amount = valores[1] if len(valores) > 1 and isinstance(valores[1], float) else None
        doc = str(valores[0]) if valores and isinstance(valores[0], int) else ""
        records.append(Record(date=current_line_date, description=historico, amount=amount, doc=doc))

    if not rows:
        return ExtractResult(status="empty", error="no transactions")
    res = render_records(rows, kinds=("date", "description", "doc", "amount", "balance"))
    res.records = records
    return res
