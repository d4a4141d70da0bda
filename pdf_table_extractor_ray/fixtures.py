"""Deterministic synthetic fixture corpus (FIXTURES.md §1-2).

One row = one Common-Crawl-style page in the ``input_hint`` schema
``(url, warc_ts, html, text, lang)``; payloads embed the reference's
format families (statement listings, continuation merges, coordinate
word boxes, lattice tables, boilerplate-wrapped articles, malformed
junk). Generation is seeded per document id — ``doc(i)`` is pure — so
the corpus can be minted identically by the driver-side oracle and by
a Ray ``range → map_batches`` pipeline at any scale.

Size classes per FIXTURES.md: small ≈1 KB (80%), medium ≈32 KB (18%),
large ≈1 MB (2%) — the long-tail skew the engine's size-class
bucketing must defeat.
"""

from __future__ import annotations

import random
from typing import Dict, List, Tuple

import numpy as np
import pyarrow as pa

from pdf_table_extractor_ray.functions.money import br_format

SEED = 42
PAGE_SEP = "\f"
EPOCH_US = 1_735_689_600_000_000  # 2025-01-01T00:00:00Z in microseconds

FAMILIES = (
    "regex_listing",
    "santander_merge",
    "bb1_buffer",
    "bb2_nextdate",
    "sicoob1_lines",
    "sicoob2_blocks",
    "c6_date_context",
    "inter_months",
    "cef_simple",
    "pagbank_findall",
    "bradesco_triples",
    "coordinate_columns",
    "lattice_table",
    "boilerplate_strip",
    "ofx",
    "malformed",
)

# families that can appear in generated corpora: the rotation above
# plus the sub-families carved out of it — encrypted (from
# lattice_table docs) and pdf_native (real binary PDFs carved from
# coordinate_columns docs)
ALL_FAMILIES = FAMILIES + ("encrypted", "pdf_native")

# bump when generator output changes — cached corpora key on it
FIXTURE_VERSION = 10  # r5: encrypted sub-family covers PDF 1.5 (ObjStm) layouts too

_WORDS = (
    "PAGAMENTO TRANSFERENCIA RECEBIDO ENVIADO COMPRA CARTAO MERCADO LOJA "
    "SERVICO ENERGIA AGUA INTERNET ALUGUEL SALARIO DEPOSITO SAQUE JUROS "
    "RENDIMENTO SEGURO PLANO ASSINATURA RESTAURANTE FARMACIA POSTO PADARIA "
    "SUPERMERCADO TRANSPORTE APLICATIVO CONSULTA EXAME ESCOLA CURSO LIVRO"
).split()

_DEBIT_WORDS = ("boleto", "tarifa", "tributo", "telefone", "estorno", "darf", "celular")

_EN_WORDS = (
    "the quick brown fox jumps over a lazy dog while carefully watching "
    "distant mountains under bright evening skies and thinking about how "
    "rivers shape valleys through patient centuries of steady flow carrying "
    "sediment toward wide deltas where birds gather each spring to nest"
).split()


def _size_class(rng: random.Random) -> str:
    r = rng.random()
    if r < 0.80:
        return "small"
    if r < 0.98:
        return "medium"
    return "large"


def _n_lines(size: str, rng: random.Random) -> int:
    if size == "small":
        return rng.randint(8, 30)
    if size == "medium":
        return rng.randint(400, 600)
    return rng.randint(12_000, 16_000)


def _amount(rng: random.Random) -> float:
    return rng.randint(100, 9_999_999) / 100.0


def _desc(rng: random.Random, n=None) -> str:
    n = n or rng.randint(1, 4)
    return " ".join(rng.choice(_WORDS) for _ in range(n))


def _date_dmy(rng: random.Random) -> str:
    return f"{rng.randint(1, 28):02d}/{rng.randint(1, 12):02d}/{rng.randint(2020, 2025)}"


def _paginate(lines: List[str], per_page: int = 80) -> str:
    pages = ["\n".join(lines[i : i + per_page]) for i in range(0, len(lines), per_page)]
    return PAGE_SEP.join(pages)


# ---------------------------------------------------------------------------
# per-family payload generators: rng → (text, html_bytes)


def _gen_regex_listing(rng, size):
    lines = ["EXTRATO BANCARIO CONSOLIDADO", "Data Mov Historico Valor Saldo"]
    for _ in range(_n_lines(size, rng)):
        kind = rng.random()
        date = _date_dmy(rng)
        if kind < 0.2:
            lines.append(f"{date} SALDO DIA {br_format(_amount(rng))}")
        elif kind < 0.5:
            sign = rng.choice(["D", "C", ""])
            lines.append(
                f"{date} {rng.randint(100, 999999)} {_desc(rng)} "
                f"{br_format(_amount(rng))} {br_format(_amount(rng))}{sign}"
            )
        elif kind < 0.8:
            lines.append(f"{date} {_desc(rng)} {br_format(_amount(rng))} {br_format(_amount(rng))}D")
        else:
            lines.append(f"{date} {_desc(rng)} {br_format(_amount(rng))}")
    text = _paginate(lines)
    return text, text.encode()


def _gen_santander(rng, size):
    lines = ["Banco Santander S.A.", "Agencia 1234 Conta 56789-0", "Movimentação", "SALDO ANTERIOR"]
    for _ in range(_n_lines(size, rng)):
        r = rng.random()
        date = f"{rng.randint(1, 28):02d}/{rng.randint(1, 12):02d}" + (
            f"/{rng.randint(2022, 2025)}" if rng.random() < 0.5 else ""
        )
        hyphen = "-" if rng.random() < 0.4 else ""
        val = br_format(_amount(rng)) + hyphen
        if r < 0.15:
            desc = rng.choice(_DEBIT_WORDS) + " " + _desc(rng, 2)
        else:
            desc = _desc(rng)
        if r < 0.6:
            doc = f"{rng.randint(100000, 99999999)}"
            lines.append(f"{date} {desc} {doc} {val}")
        elif r < 0.85:
            # continuation: description wraps, value on the next line
            lines.append(f"{date} {desc}")
            lines.append(f"{_desc(rng, 2)} {val}")
        else:
            lines.append(f"SALDO EM {_date_dmy(rng)}")
    lines.append("EXTRATO CONSOLIDADO")
    lines.append("informacoes gerais sobre tarifas")
    text = _paginate(lines)
    return text, text.encode()


def _gen_bb1(rng, size):
    lines = ["Extrato de Conta Corrente", "Dia  Lote Historico Valor"]
    for _ in range(_n_lines(size, rng) // 2):
        date = _date_dmy(rng)
        sign = rng.choice(["+", "-"])
        lines.append(f"{date} {rng.randint(1, 999)} {rng.randint(1000, 9999)}X {_desc(rng)}")
        if rng.random() < 0.5:
            lines.append(f"{_desc(rng, 2)}")
        lines.append(f"{_desc(rng, 1)} {br_format(_amount(rng))} ({sign})")
        if rng.random() < 0.1:
            lines.append("SALDO " + br_format(_amount(rng)))
    text = _paginate(lines)
    return text, text.encode()


def _gen_bb2(rng, size):
    lines = ["Extrato de conta corrente G336", "Data Historico Valor"]
    for _ in range(_n_lines(size, rng) // 2):
        date = _date_dmy(rng)
        cd = rng.choice(["C", "D"])
        lines.append(f"{date} {rng.randint(1, 9999):04d} {_desc(rng)} {br_format(_amount(rng))} {cd}")
        if rng.random() < 0.5:
            lines.append(f"{_desc(rng, 2)}")
        if rng.random() < 0.15:
            lines.append("SALDO PARCIAL")
    text = _paginate(lines)
    return text, text.encode()


def _gen_sicoob1(rng, size):
    lines = ["EXTRATO CONTA CORRENTE COOPERATIVA", "DATA DOCUMENTO HISTORICO VALOR"]
    for _ in range(_n_lines(size, rng)):
        r = rng.random()
        if r < 0.1:
            lines.append(f"SALDO DO DIA ===> {br_format(_amount(rng))}C")
        else:
            cd = rng.choice(["C", "D"])
            lines.append(
                f"{_date_dmy(rng)} {rng.randint(100, 999999)} {_desc(rng)} {br_format(_amount(rng))}{cd}"
            )
    text = _paginate(lines)
    return text, text.encode()


def _gen_sicoob2(rng, size):
    year = rng.randint(2021, 2025)
    lines = [
        f"PERÍODO: 01/06/{year} A 30/06/{year}",
        "COOPERATIVA DE CREDITO",
        "HISTÓRICO DE MOVIMENTAÇÃO",
        f"SALDO ANTERIOR {br_format(_amount(rng))}",
    ]
    for _ in range(_n_lines(size, rng) // 2):
        dm = f"{rng.randint(1, 28):02d}/{rng.randint(1, 12):02d}"
        cd = rng.choice(["C", "D"])
        if rng.random() < 0.1:
            lines.append(f"{dm} SALDO DO DIA {br_format(_amount(rng))} {cd}")
        else:
            lines.append(f"{dm} {_desc(rng)}")
            lines.append(f"{_desc(rng, 2)} {br_format(_amount(rng))} {cd}")
    lines.append("RESUMO")
    lines.append(f"TOTAL {br_format(_amount(rng))}")
    text = _paginate(lines)
    return text, text.encode()


_PT_MONTH_NAMES = (
    "Janeiro", "Fevereiro", "Março", "Abril", "Maio", "Junho",
    "Julho", "Agosto", "Setembro", "Outubro", "Novembro", "Dezembro",
)


def _gen_c6(rng, size):
    year = rng.randint(2021, 2025)
    month = rng.choice(_PT_MONTH_NAMES)
    lines = [
        f"Período 1 de {month} de {year}",
        "Data Lançamento Descrição Valor",
    ]
    for _ in range(_n_lines(size, rng)):
        r = rng.random()
        dm = f"{rng.randint(1, 28):02d}/{rng.randint(1, 12):02d}"
        neg = "-" if rng.random() < 0.5 else ""
        if r < 0.1:
            lines.append(f"Saldo do dia {br_format(_amount(rng))}")
        elif r < 0.7:
            lines.append(f"{dm} {_desc(rng)} {neg}R$ {br_format(_amount(rng))}")
        else:
            lines.append(f"{_desc(rng)} {neg}R$ {br_format(_amount(rng))}")
    text = _paginate(lines)
    return text, text.encode()


def _gen_inter(rng, size):
    lines = ["Banco Inter Extrato"]
    for _ in range(_n_lines(size, rng) // 2):
        lines.append(f"{rng.randint(1, 28)} de {rng.choice(_PT_MONTH_NAMES)} de {rng.randint(2021, 2025)}")
        for _ in range(rng.randint(1, 3)):
            neg = "-" if rng.random() < 0.5 else ""
            lines.append(f"{_desc(rng)} {neg}R$ {br_format(_amount(rng))}")
    text = _paginate(lines)
    return text, text.encode()


def _gen_cef(rng, size):
    lines = ["CAIXA ECONOMICA FEDERAL", "Extrato por periodo"]
    for _ in range(_n_lines(size, rng)):
        lines.append(f"{_date_dmy(rng)} {_desc(rng)} {br_format(_amount(rng))}{rng.choice(['D', 'C'])}")
    text = _paginate(lines)
    return text, text.encode()


def _gen_pagbank(rng, size):
    lines = ["PagBank Extrato de movimentacoes"]
    for _ in range(_n_lines(size, rng)):
        neg = "-" if rng.random() < 0.4 else ""
        lines.append(f"{_date_dmy(rng)} {_desc(rng)} {neg}R$ {br_format(_amount(rng))}")
    text = _paginate(lines)
    return text, text.encode()


def _gen_bradesco(rng, size):
    lines = [
        "Bradesco Internet Banking",
        "Extrato de: Conta Corrente",
        "Agencia: 1234 | Conta: 0056789-0",
        "Data: solicitado em " + _date_dmy(rng),
        "Data Histórico Dcto. Crédito Débito Saldo",
    ]
    for _ in range(_n_lines(size, rng) // 3):
        r = rng.random()
        date = _date_dmy(rng)
        doc = rng.randint(100, 999999)
        v1 = br_format(_amount(rng))
        v2 = br_format(_amount(rng))
        if r < 0.5:
            # 3-line marked block: desc / numbers / desc2
            lines.append(f"{date} {_desc(rng)}")
            lines.append(f"{doc} {v1} {v2}")
            lines.append(f"{_desc(rng, 2)}")
        elif r < 0.75:
            # first_exception shape: desc+numbers then trailing desc line
            lines.append(f"{date} {_desc(rng)} {doc} {v1} {v2}")
            lines.append(f"{_desc(rng, 2)}")
        else:
            # second_exception shape: desc line then numbers-tailed line
            lines.append(f"{date} {_desc(rng)}")
            lines.append(f"{_desc(rng, 1)} {doc} {v1} {v2}")
    lines.append(f"Total {br_format(_amount(rng))}")
    text = _paginate(lines, per_page=60)
    return text, text.encode()


def _gen_coordinate(rng, size):
    pages = []
    texts = []
    n = _n_lines(size, rng)
    per_page = 40
    for start in range(0, n, per_page):
        spans = []
        y = 40.0
        spans.append(f'<span data-x0="100.0" data-top="{y:.1f}">Lançamentos</span>')
        spans.append(f'<span data-x0="500.0" data-top="{y:.1f}">Valor</span>')
        for _ in range(min(per_page, n - start)):
            y += 12.0 + rng.random() * 0.3
            day = f"{rng.randint(1, 28):02d}"
            if rng.random() < 0.5:
                spans.append(f'<span data-x0="{30 + rng.random():.1f}" data-top="{y:.1f}">{day}</span>')
            x = 100.0
            words = [rng.choice(_WORDS) for _ in range(rng.randint(1, 3))]
            if rng.random() < 0.25:
                words.insert(0, rng.choice(["Pix Enviado", "Pagamento", "Tarifa", "Cesta"]))
            for w in words:
                spans.append(f'<span data-x0="{x:.1f}" data-top="{y:.1f}">{w}</span>')
                x += 8.0 * (len(w) + 1)
            neg = "-" if rng.random() < 0.3 else ""
            spans.append(
                f'<span data-x0="{500 + rng.random():.1f}" data-top="{y:.1f}">{neg}{br_format(_amount(rng))}</span>'
            )
            texts.append(f"{day} {' '.join(words)} {neg}")
        pages.append('<div class="page">' + "".join(spans) + "</div>")
    html = "<html><body>" + "".join(pages) + "</body></html>"
    return "\n".join(texts), html.encode()


def _gen_lattice(rng, size):
    n = _n_lines(size, rng) // 2
    header = ["data", "histórico", "dcto.", "crédito", "débito", "saldo"]
    pages = []
    text_lines = []
    rows_per_page = 30
    all_rows = []
    for i in range(n):
        date = _date_dmy(rng) if (i == 0 or rng.random() < 0.4) else ""
        desc = _desc(rng)
        doc = str(rng.randint(1000, 999999))
        credito = br_format(_amount(rng)) if rng.random() < 0.4 else ""
        debito = (br_format(_amount(rng)) + "-") if rng.random() < 0.4 and not credito else ""
        saldo = br_format(_amount(rng)) + ("-" if rng.random() < 0.2 else "")
        all_rows.append([date, desc, doc, credito, debito, saldo])
        text_lines.append(" ".join(v for v in all_rows[-1] if v))
    for start in range(0, len(all_rows), rows_per_page):
        cells = "".join(f"<th>{c}</th>" for c in header)
        body = ""
        for row in all_rows[start : start + rows_per_page]:
            body += "<tr>" + "".join(f"<td>{v}</td>" for v in row) + "</tr>"
        pages.append(f"<table><tr>{cells}</tr>{body}</table>")
    html = "<html><body>" + "".join(pages) + "</body></html>"
    return "\n".join(text_lines), html.encode()


def _en_sentence(rng, n_words):
    words = [rng.choice(_EN_WORDS) for _ in range(n_words)]
    return (" ".join(words)).capitalize() + "."


def _gen_boilerplate(rng, size):
    n_paras = max(2, _n_lines(size, rng) // 6)
    nav = "".join(f'<a href="/{w}">{w}</a> ' for w in rng.sample(_EN_WORDS, 8))
    promos = "".join(
        f'<div class="promo"><a href="/x">{_en_sentence(rng, 3)}</a></div>' for _ in range(4)
    )
    paras = []
    expected = []
    for _ in range(n_paras):
        sent = " ".join(_en_sentence(rng, rng.randint(8, 20)) for _ in range(rng.randint(2, 5)))
        if rng.random() < 0.3:
            # inline link inside content (low link density → still content)
            word = rng.choice(_EN_WORDS)
            sent += f' See <a href="/ref">{word}</a> for details.'
        paras.append(f"<p>{sent}</p>")
        expected.append(sent)
    footer = "".join(f'<a href="/{w}">{w}</a>' for w in rng.sample(_EN_WORDS, 6))
    html = (
        "<html><head><title>Fixture Page</title><script>var x=1;</script></head>"
        f"<body><nav>{nav}</nav>{promos}<article><h1>Note</h1>"
        + "".join(paras)
        + f"</article><footer>{footer}</footer></body></html>"
    )
    text = "\n".join(" ".join(p.split()) for p in expected)
    return text, html.encode()


def _gen_ofx(rng, size):
    n = max(2, _n_lines(size, rng) // 4)
    parts = ["OFXHEADER:100", "<OFX>", "<BANKMSGSRSV1>", "<STMTTRNRS>", "<BANKTRANLIST>"]
    for _ in range(n):
        amt = _amount(rng) * (1 if rng.random() < 0.5 else -1)
        d = f"{rng.randint(2021, 2025)}{rng.randint(1, 12):02d}{rng.randint(1, 28):02d}"
        parts.append("<STMTTRN>")
        parts.append(f"<TRNTYPE>{'CREDIT' if amt > 0 else 'DEBIT'}")
        parts.append(f"<DTPOSTED>{d}120000[-3:BRT]")
        # OFX carries '.' decimals — exercises the F10 TRNAMT repair
        parts.append(f"<TRNAMT>{amt:.2f}")
        parts.append(f"<FITID>{rng.randint(10**8, 10**9)}")
        parts.append(f"<MEMO>{_desc(rng)}")
        parts.append("</STMTTRN>")
    parts.extend(["</BANKTRANLIST>", "</STMTTRNRS>", "</BANKMSGSRSV1>", "</OFX>"])
    text = "\n".join(parts)
    return text, text.encode()


def _gen_malformed(rng, size):
    kind = rng.random()
    if kind < 0.3:
        return "", b""
    if kind < 0.6:
        text = " ".join(rng.choice(_WORDS) for _ in range(20))
        return text, text.encode()
    return "\x00\x01junk", bytes(rng.getrandbits(8) for _ in range(64))


_GENERATORS = {
    "regex_listing": _gen_regex_listing,
    "santander_merge": _gen_santander,
    "bb1_buffer": _gen_bb1,
    "bb2_nextdate": _gen_bb2,
    "sicoob1_lines": _gen_sicoob1,
    "sicoob2_blocks": _gen_sicoob2,
    "c6_date_context": _gen_c6,
    "inter_months": _gen_inter,
    "cef_simple": _gen_cef,
    "pagbank_findall": _gen_pagbank,
    "bradesco_triples": _gen_bradesco,
    "coordinate_columns": _gen_coordinate,
    "lattice_table": _gen_lattice,
    "boilerplate_strip": _gen_boilerplate,
    "ofx": _gen_ofx,
    "malformed": _gen_malformed,
}


def _html_wordboxes_to_pdf(html: str) -> bytes:
    """Re-serialize a coordinate-columns markup doc as a real PDF with
    the identical word boxes (page per ``<div class="page">``).

    The serialization sub-family is a pure function of the content
    (crc32 mod 5): classic absolute-``Tm`` PDF 1.4, relative-``Td``
    multi-op lines, PDF 1.5 (object stream + xref stream) with
    relative positioning, a CID-keyed font whose hex show strings only
    decode through the /ToUnicode CMap, or whole-line ``TJ`` arrays
    whose word positions only recover through Helvetica glyph metrics
    + kerning numbers — so the golden gate exercises all five shapes
    the native parser supports."""
    import zlib as _zlib

    from pdf_table_extractor_ray.stages.layout import _PAGE_SPLIT_RE, _WORDBOX_RE
    from pdf_table_extractor_ray.stages.pdf_native import build_pdf

    pages = []
    for page_html in _PAGE_SPLIT_RE.split(html):
        words = [
            (float(x0), float(top), text)
            for x0, top, text in _WORDBOX_RE.findall(page_html)
        ]
        if words:
            pages.append(words)
    variant = _zlib.crc32(html.encode()) % 5
    positioning = {0: "tm", 1: "td", 2: "td", 3: "tm", 4: "line"}[variant]
    return build_pdf(
        pages,
        positioning=positioning,
        pdf15=(variant == 2),
        encoding="cid" if variant == 3 else "latin1",
    )


def generate_doc(i: int, seed: int = SEED) -> Dict:
    """Pure per-id page-row generator (url, warc_ts, html, text, lang)."""
    family = FAMILIES[i % len(FAMILIES)]
    rng = random.Random((seed << 32) ^ i)
    size = _size_class(rng)
    text, html = _GENERATORS[family](rng, size)
    if family == "coordinate_columns" and rng.random() < 0.30:
        # ~a third of the word-box docs ship as REAL binary PDFs (the
        # conversor_banestes.py:23 pdfplumber shape): same word boxes,
        # serialized through the deterministic stdlib PDF writer; no
        # plaintext text channel, like a real crawl PDF capture
        html = _html_wordboxes_to_pdf(bytes(html).decode())
        text = ""
        family = "pdf_native"
        if rng.random() < 0.25 and len(html) <= 64_000:
            # r5: a quarter of the fixture PDFs ship genuinely
            # password-protected through the SPEC standard security
            # handler (conversor_c6.py:36 pikepdf shape) — RC4 and
            # AES-128 /AESV2 alternating, over BOTH serializations
            # (classic xref and PDF 1.5 object-stream layouts; the
            # encryptor drops the never-encrypted XRef stream and the
            # ObjStm stays packed and encrypted). Size-capped at
            # 64 KB: real protected bank statements are KB-scale, and
            # the cap keeps the serial scalar ENCRYPT (mint-time only)
            # off the large-size-class tail (decrypt is vectorized)
            from pdf_table_extractor_ray.stages.config import DEFAULT_CREDENTIALS
            from pdf_table_extractor_ray.stages.pdf_crypt import encrypt_pdf

            method = "aesv2" if rng.random() < 0.5 else "rc4"
            html = encrypt_pdf(html, DEFAULT_CREDENTIALS["default"], method=method)
            family = "encrypted"
    if family == "lattice_table" and rng.random() < 0.25:
        # a quarter of the lattice docs ship password-protected (the
        # conversor_c6.py:36 shape): payload encrypted with the default
        # fixture credential, no plaintext text channel
        from pdf_table_extractor_ray.stages.config import DEFAULT_CREDENTIALS
        from pdf_table_extractor_ray.stages.encrypted import encrypt_payload

        html = encrypt_payload(bytes(html), DEFAULT_CREDENTIALS["default"])
        text = ""
        family = "encrypted"
    return {
        "url": f"https://fixtures.test/{family}/{i:08d}",
        "warc_ts": EPOCH_US + i * 1_000_000,
        "html": html,
        "text": text,
        "lang": "en" if family == "boilerplate_strip" else "pt",
        "family": family,
        "size_cls": size,
    }


PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("family", pa.string()),
        ("size_cls", pa.string()),
    ]
)


def docs_to_table(ids: List[int], seed: int = SEED) -> pa.Table:
    docs = [generate_doc(i, seed) for i in ids]
    if not docs:
        return PAGES_SCHEMA.empty_table()
    return pa.Table.from_pylist(docs).cast(PAGES_SCHEMA)


def build_pages_dataset(n_docs: int, seed: int = SEED, parallelism: int | None = None):
    """Distributed fixture build: ``ray.data.range`` → ``map_batches``
    (generation itself streams; no driver-side materialization)."""
    import ray.data

    def gen_batch(batch: Dict[str, np.ndarray]) -> pa.Table:
        return docs_to_table([int(x) for x in batch["id"]], seed)

    ds = ray.data.range(n_docs, override_num_blocks=parallelism)
    return ds.map_batches(gen_batch, batch_size=64, batch_format="numpy")


def write_pages_parquet(path: str, n_docs: int, seed: int = SEED, parallelism: int | None = None):
    """Mint the corpus at ``path`` (directory of parquet shards)."""
    ds = build_pages_dataset(n_docs, seed, parallelism)
    ds.write_parquet(path)
    return path
