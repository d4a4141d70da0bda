"""Strategy-level tests: handcrafted payloads with hand-checked
expectations, plus detection/extraction sweep over all fixture
families."""

from collections import Counter

import pytest

from pdf_table_extractor_ray.fixtures import FAMILIES, generate_doc
from pdf_table_extractor_ray.stages import statements as st
from pdf_table_extractor_ray.stages.boilerplate import extract_boilerplate
from pdf_table_extractor_ray.stages.layout import (
    extract_coordinate_columns,
    extract_lattice_table,
)
from pdf_table_extractor_ray.stages.registry import detect_format, extract_document


class TestRegexListing:
    def test_pattern_cascade_and_skip_words(self):
        text = (
            "EXTRATO\n"
            "01/02/2023 100 PAG BOLETO 1.234,56D 2.345,67C\n"
            "02/02/2023 SALDO DIA 9.999,99\n"
            "03/02/2023 PIX RECEBIDO 500,00 3.000,10\n"
        )
        r = st.extract_regex_listing(text)
        assert r.status == "ok"
        assert r.extracted_text == "2023-02-01;PAG BOLETO;2345,67\n2023-02-03;RECEBIDO;3000,1"
        assert [x.amount for x in r.records] == [2345.67, 3000.1]

    def test_no_date_pattern(self):
        r = st.extract_regex_listing("nothing here")
        assert r.status == "empty"


class TestSantander:
    def test_merge_negation_docnum(self):
        text = (
            "Movimentação\n"
            "01/02/2023 PIX ENVIADO FULANO 1234567 1.234,56-\n"
            "02/02 TED RECEBIDA\n"
            "EMPRESA X 150,00\n"
        )
        r = st.extract_santander(text)
        assert r.extracted_text == (
            "01/02/2023;PIX ENVIADO FULANO 1234567;-1234,56;1234567\n"
            "02/02;TED RECEBIDA EMPRESA X;150,0;"
        )
        # keyword negation: 'pix enviado' forces the sign
        assert r.records[0].amount == -1234.56
        assert r.records[0].doc == "1234567"

    def test_requires_section_start(self):
        # no 'Movimentação' header → nothing extracted
        r = st.extract_santander("01/02/2023 PIX 1.234,56\n")
        assert r.status == "empty"

    def test_saldo_rows_filtered(self):
        text = "Movimentação\n01/02/2023 SALDO ANTERIOR 1,00\n01/02/2023 PIX X 2,00\n"
        r = st.extract_santander(text)
        assert all("SALDO ANTERIOR" not in x.description for x in r.records)


class TestBB:
    def test_bb1_buffer(self):
        text = "Extrato de Conta Corrente\n05/03/2024 12 0001X Compra\ncartao mercado 1.234,56 (-)\n"
        r = st.extract_bb1(text)
        assert r.extracted_text == "05/03/2024;Compra cartao mercado;-1234,56"

    def test_bb2_nextdate(self):
        text = (
            "Extrato de conta corrente G336\n"
            "05/03/2024 0001 Pix recebido 1.234,56 C\ncliente fulano\n"
            "06/03/2024 0002 Tarifa 10,00 D\n"
        )
        r = st.extract_bb2(text)
        assert r.records[0].amount == 1234.56
        assert "cliente fulano" in r.records[0].description
        assert r.records[1].amount == -10.0


class TestSicoob:
    def test_sicoob1(self):
        text = "EXTRATO CONTA CORRENTE\n01/02/2023 000123 PIX RECEBIDO 1.234,56C\n"
        r = st.extract_sicoob1(text)
        assert r.extracted_text == "01/02/2023;PIX RECEBIDO;1234,56"
        assert r.records[0].amount == 1234.56

    def test_sicoob2(self):
        text = (
            "PERÍODO: 01/06/2022 A 30/06/2022\n"
            "HISTÓRICO DE MOVIMENTAÇÃO\n"
            "03/06 PIX RECEBIDO\nFULANO 1.234,56 C\n"
            "04/06 SALDO DO DIA 5,00 C\n"
            "RESUMO\nTOTAL 9,99\n"
        )
        r = st.extract_sicoob2(text)
        assert r.extracted_text == "03/06/2022;PIX RECEBIDO FULANO;1234,56"


class TestC6Inter:
    def test_c6_year_and_sign(self):
        text = (
            "Período 1 de Junho de 2023\n"
            "Data Lançamento Descrição Valor\n"
            "05/06 Compra cartao -R$ 50,25\n"
        )
        r = st.extract_c6(text)
        assert r.extracted_text == "05/06/2023;Compra cartao;-50,25"

    def test_c6_missing_year_is_error(self):
        r = st.extract_c6("05/06 Compra -R$ 1,00\n")
        assert r.status == "error"

    def test_inter_month_names(self):
        text = "7 de Março de 2024\nPix recebido Fulano R$ 1.234,56\n"
        r = st.extract_inter(text)
        assert r.extracted_text == "7/03/2024;Pix recebido Fulano;1234,56"


class TestSimpleFamilies:
    def test_cef(self):
        r = st.extract_cef("CAIXA\n01/02/2023 COMPRA PADARIA 123,45D\n")
        assert r.extracted_text == "01/02/2023;COMPRA PADARIA;123,45D"
        assert r.records[0].amount == -123.45

    def test_pagbank(self):
        r = st.extract_pagbank("01/02/2023 Pagamento recebido -R$ 1.234,56\n")
        assert r.extracted_text == "01/02/2023;Pagamento recebido;-R$ 1.234,56"
        assert r.records[0].amount == -1234.56


class TestBradesco:
    def test_triple_block(self):
        lines = [
            "Bradesco", "h2", "h3", "h4", "h5",  # dropped (first 5)
            "01/02/2023 COMPRA CARTAO",
            "123456 1.234,56 7.890,12",
            "LOJA CENTRO",
            "Total 9.999,99",
        ]
        r = st.extract_bradesco("\n".join(lines))
        assert r.extracted_text == "01/02/2023;COMPRA CARTAO LOJA CENTRO;123456;1234,56;7890,12"
        rec = r.records[0]
        assert rec.amount == 1234.56 and rec.doc == "123456"


class TestLayout:
    def test_coordinate_columns(self):
        html = (
            '<div class="page">'
            '<span data-x0="30.0" data-top="50.0">04</span>'
            '<span data-x0="100.0" data-top="50.0">Pix</span>'
            '<span data-x0="140.0" data-top="50.0">Enviado</span>'
            '<span data-x0="500.0" data-top="50.2">1.234,56</span>'
            "</div>"
        )
        r = extract_coordinate_columns(html)
        # x<75 → date col, x>480 → value col; 'Pix Enviado' keyword negates
        assert r.extracted_text == "04/JUN/25;Pix Enviado;-1234,56"

    def test_lattice_ffill_bfill_hyphen(self):
        html = (
            "<table>"
            "<tr><th>data</th><th>histórico</th><th>crédito</th><th>débito</th></tr>"
            "<tr><td>01/02/2023</td><td>A</td><td></td><td>1.234,56-</td></tr>"
            "<tr><td></td><td>B</td><td>10,00</td><td></td></tr>"
            "</table>"
        )
        r = extract_lattice_table(html)
        lines = r.extracted_text.strip().split("\n")
        assert lines[0] == "data;historico;credito;debito"
        # hyphen fix moved sign; bfill pulled credit up; ffill pulled date down
        assert lines[1] == "01/02/2023;A;10,00;-1234,56"
        assert lines[2] == "01/02/2023;B;10,00;"


class TestBoilerplate:
    def test_strips_nav_and_footer(self):
        para = "This is a long enough paragraph of running text that should survive the filter."
        html = (
            "<html><body><nav><a href='/a'>home</a> <a href='/b'>about</a></nav>"
            f"<article><p>{para}</p></article>"
            "<footer><a href='/c'>contact</a></footer></body></html>"
        )
        r = extract_boilerplate(html)
        assert r.extracted_text == para

    def test_inline_links_survive(self):
        para = (
            "A paragraph with substantial text content where only a small part "
            "is a link to elsewhere."
        )
        html = f"<body><p>{para} See <a href='/x'>ref</a>.</p></body>"
        r = extract_boilerplate(html)
        assert r.status == "ok"
        assert "substantial text content" in r.extracted_text


class TestOFX:
    def test_trnamt_repair_and_parse(self):
        from pdf_table_extractor_ray.stages.ofx import extract_ofx, repair_trnamt

        assert repair_trnamt("<TRNAMT>-1234.56") == "<TRNAMT>-1234,56"
        text = (
            "<OFX>\n<STMTTRN>\n<TRNTYPE>DEBIT\n<DTPOSTED>20240607120000[-3:BRT]\n"
            "<TRNAMT>-1234.56\n<FITID>900000001\n<MEMO>PIX ENVIADO MERCADO\n</STMTTRN>\n</OFX>"
        )
        r = extract_ofx(text)
        assert r.extracted_text == "07/06/2024;PIX ENVIADO MERCADO;-1234,56;900000001"
        assert r.records[0].amount == -1234.56

    def test_empty(self):
        from pdf_table_extractor_ray.stages.ofx import extract_ofx

        assert extract_ofx("<OFX></OFX>").status == "empty"


class TestDetectionSweep:
    def test_all_families_detect_and_extract(self):
        stats = Counter()
        for i in range(len(FAMILIES) * 12):
            d = generate_doc(i)
            key, res = extract_document(d)
            if d["family"] == "malformed":
                assert res.status in ("error", "empty")
            else:
                assert key == d["family"], (d["url"], key)
                assert res.status == "ok", (d["url"], res.error)
                assert res.extracted_text
            stats[d["family"]] += 1
        from pdf_table_extractor_ray.fixtures import ALL_FAMILIES

        assert set(stats) == set(ALL_FAMILIES)

    def test_detect_unknown(self):
        assert detect_format(b"", "") is None

    def test_c6_routing_requires_rs_values(self):
        # regression for the `A or (B and C)` precedence bug: a document
        # carrying the C6 header marker but NO R$ value must not route
        # to c6_date_context
        with_values = "Data Lançamento\n01/02/2023 Compra R$ 1.234,56"
        assert detect_format(b"", with_values) == "c6_date_context"
        periodo = "Período 01/02/2023 a 28/02/2023\nPix R$ 10,00"
        assert detect_format(b"", periodo) == "c6_date_context"
        # header only, no values → falls through to the date-listing family
        no_values = "Data Lançamento\n01/02/2023 Compra sem valor"
        assert detect_format(b"", no_values) == "regex_listing"
        # header only, no values, no dates → undetected
        assert detect_format(b"", "Data Lançamento apenas") is None


class TestEncryptedAndConfig:
    def test_encrypted_roundtrip_and_wrong_password(self):
        from pdf_table_extractor_ray.stages.encrypted import (
            WrongPassword,
            decrypt_payload,
            encrypt_payload,
            is_encrypted,
        )

        plain = b"<html><table><tr><td>x</td></tr></table></html>"
        enc = encrypt_payload(plain, "sekret")
        assert is_encrypted(enc) and not is_encrypted(plain)
        assert decrypt_payload(enc, "sekret") == plain
        with pytest.raises(WrongPassword):
            decrypt_payload(enc, "nope")
        with pytest.raises(WrongPassword):
            decrypt_payload(enc, None)

    def test_encrypted_detection_and_extraction(self):
        from pdf_table_extractor_ray.fixtures import generate_doc
        from pdf_table_extractor_ray.stages.config import StrategyConfig
        from pdf_table_extractor_ray.stages.registry import make_strategies

        d = next(
            generate_doc(i)
            for i in range(400)
            if generate_doc(i)["family"] == "encrypted"
        )
        assert detect_format(d["html"], d["text"]) == "encrypted"
        key, res = extract_document(d)  # default config has the credential
        assert key == "encrypted" and res.status == "ok" and res.extracted_text
        # wrong credential → in-band row error, never a raise
        bad = make_strategies(StrategyConfig(credentials={"default": "wrong"}))
        key, res = extract_document(d, bad)
        assert key == "encrypted" and res.status == "error"
        assert "credential" in (res.error or "")

    def test_custom_column_config_changes_layout_parse(self, ray_session):
        """A strategy with NON-DEFAULT config (shifted column x
        thresholds, the conversor_itau table_areas analog) through the
        real actor-pool pipeline: a word box at x=90 is description
        under the default config but date under x_date_end=120."""
        import ray.data

        from pdf_table_extractor_ray.pipelines.extract import build_extracted_dataset
        from pdf_table_extractor_ray.stages.config import StrategyConfig

        html = (
            '<div class="page">'
            '<span data-x0="90.0" data-top="10">05</span>'
            '<span data-x0="200.0" data-top="10">PAGAMENTO CONTA</span>'
            '<span data-x0="500.0" data-top="10">123,45</span>'
            "</div>"
        ).encode()
        ds = ray.data.from_items([{"url": "u1", "html": html, "text": ""}])
        cfg = StrategyConfig(column_date_end_x=120.0)
        out_custom = build_extracted_dataset(
            ds, config=cfg, shard_keys=False, concurrency=(1, 1), batch_size=4
        ).take_all()
        assert out_custom[0]["strategy"] == "coordinate_columns"
        assert out_custom[0]["status"] == "ok"
        rec = out_custom[0]["records"][0]
        assert rec["date"].startswith("05/")  # x=90 classified as date column
        out_default = build_extracted_dataset(
            ds, shard_keys=False, concurrency=(1, 1), batch_size=4
        ).take_all()
        # default thresholds: the 05 box lands in the description column
        # → no day context → record with empty day prefix
        rec_d = out_default[0]["records"][0]
        assert rec_d["date"] == "/JUN/25"
        assert rec_d["description"].startswith("05")


class TestTableParserEquivalence:
    def test_fast_path_matches_htmlparser(self):
        from pdf_table_extractor_ray.fixtures import generate_doc
        from pdf_table_extractor_ray.stages.layout import (
            _TableGridParser,
            _parse_tables_fast,
        )

        checked = 0
        for i in range(0, 480):
            d = generate_doc(i)
            if d["family"] != "lattice_table":
                continue
            html = d["html"].decode()
            fast = _parse_tables_fast(html)
            assert fast is not None
            slow = _TableGridParser()
            slow.feed(html)
            assert fast == slow.tables
            checked += 1
        assert checked >= 10

    def test_fast_path_rejects_attributes_and_entities(self):
        from pdf_table_extractor_ray.stages.layout import _parse_tables_fast, parse_tables

        assert _parse_tables_fast('<table class="x"><tr><td>a</td></tr></table>') is None
        assert _parse_tables_fast("<table><tr><td>a&amp;b</td></tr></table>") is None
        # fallback still parses them
        assert parse_tables('<table class="x"><tr><td>a</td></tr></table>') == [[["a"]]]
        assert parse_tables("<table><tr><td>a&amp;b</td></tr></table>") == [[["a&b"]]]


class TestPdfNative:
    """The real pdf_bytes → word boxes seam (stages/pdf_native.py)."""

    def test_writer_parser_roundtrip(self):
        from pdf_table_extractor_ray.stages.pdf_native import build_pdf, parse_pdf_words

        pages = [
            [(30.7, 52.3, "05"), (100.0, 52.3, "Pix Enviado"), (500.4, 52.3, "1.234,56")],
            [(30.0, 40.0, "ç(par)\\esc"), (501.0, 40.0, "-9,99")],
        ]
        got = parse_pdf_words(build_pdf(pages))
        assert len(got) == 2
        for orig, page in zip(pages, got):
            assert [t for _, _, t in page] == [t for _, _, t in orig]
            for (x, top, _), (gx, gtop, _) in zip(orig, page):
                assert abs(x - gx) < 1e-6 and abs(top - gtop) < 1e-6

    def test_uncompressed_and_text_operators(self):
        """Hand-written content stream exercising Td/TD/T*/'/TJ (not
        just the writer's absolute-Tm shape)."""
        import zlib
        from pdf_table_extractor_ray.stages.pdf_native import parse_pdf_words

        content = (
            b"BT /F1 10 Tf 12 TL 1 0 0 1 50 800 Tm (first) Tj "
            b"10 -20 TD (second) Tj T* (third) Tj (fourth) ' "
            b"[(a) -120 (b)] TJ ET"
        )
        pdf = (
            b"%PDF-1.4\n"
            b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
            b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 842] >> endobj\n"
            b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
            b"4 0 obj << /Length " + str(len(content)).encode() + b" >>\nstream\n"
            + content + b"\nendstream endobj\n"
            b"trailer << /Size 5 /Root 1 0 R >>\n%%EOF\n"
        )
        (page,) = parse_pdf_words(pdf)
        texts = [t for _, _, t in page]
        assert texts == ["first", "second", "third", "fourth", "a", "b"]
        xs = [x for x, _, _ in page]
        tops = [t for _, t, _ in page]
        assert (xs[0], tops[0]) == (50.0, 42.0)           # Tm absolute
        assert (xs[1], tops[1]) == (60.0, 62.0)           # TD translate
        assert (xs[2], tops[2]) == (60.0, 82.0)           # T* uses TL=20 (set by TD)
        assert tops[3] == 102.0                            # ' advances a line

    def test_flate_stream_containing_endobj_token(self):
        """The /Length-based scanner must not tear a compressed stream
        whose bytes happen to contain 'endobj'."""
        from pdf_table_extractor_ray.stages.pdf_native import build_pdf, parse_pdf_words

        # craft words until the compressed payload contains the token
        for salt in range(2000):
            pages = [[(10.0, 10.0, f"endobj {salt} " * 3)]]
            pdf = build_pdf(pages)
            body = pdf[pdf.find(b"stream") : pdf.find(b"endstream")]
            if b"endobj" in body:
                break
        (page,) = parse_pdf_words(pdf)
        assert page[0][2] == f"endobj {salt} " * 3

    def test_strategy_parity_with_markup_twin(self):
        """A pdf_native doc and its word-box-markup twin must produce
        byte-identical ExtractResults (shared cluster core)."""
        import random
        from pdf_table_extractor_ray.fixtures import _gen_coordinate, _html_wordboxes_to_pdf
        from pdf_table_extractor_ray.stages.pdf_native import extract_pdf_native

        rng = random.Random(7)
        _, html = _gen_coordinate(rng, "small")
        a = extract_coordinate_columns(html.decode())
        b = extract_pdf_native(_html_wordboxes_to_pdf(html.decode()))
        assert a.extracted_text == b.extracted_text
        assert a.spans == b.spans
        assert [(r.date, r.description, r.amount) for r in a.records] == [
            (r.date, r.description, r.amount) for r in b.records
        ]

    def test_detection_and_extraction_in_corpus(self):
        from pdf_table_extractor_ray.fixtures import generate_doc

        docs = [
            generate_doc(i)
            for i in range(480)
        ]
        pdf_docs = [d for d in docs if d["family"] == "pdf_native"]
        assert len(pdf_docs) >= 3
        for d in pdf_docs:
            assert detect_format(d["html"], d["text"]) == "pdf_native"
            key, res = extract_document(d)
            assert key == "pdf_native" and res.status == "ok" and res.extracted_text

    def test_malformed_pdf_is_inband_error(self):
        key, res = extract_document({"url": "u", "html": b"%PDF-1.4 garbage", "text": ""})
        assert key == "pdf_native" and res.status == "error"


class TestPdfNativeVariants:
    """Round-4 sub-families: relative-Td positioning and PDF 1.5
    (object stream + xref stream) serialization."""

    PAGES = [
        [(30.7, 52.3, "05"), (100.0, 52.3, "Pix Enviado"), (500.4, 52.3, "1.234,56")],
        [(30.0, 40.0, "ç(par)\\esc"), (501.0, 40.0, "-9,99")],
    ]

    def test_all_variant_roundtrips(self):
        from pdf_table_extractor_ray.stages.pdf_native import build_pdf, parse_pdf_words

        for pos in ("tm", "td"):
            for p15 in (False, True):
                for enc in ("latin1", "cid"):
                    got = parse_pdf_words(
                        build_pdf(self.PAGES, positioning=pos, pdf15=p15, encoding=enc)
                    )
                    assert len(got) == len(self.PAGES)
                    for orig, page in zip(self.PAGES, got):
                        assert [t for _, _, t in page] == [t for _, _, t in orig]
                        for (x, top, _), (gx, gtop, _) in zip(orig, page):
                            assert abs(x - gx) < 1e-6 and abs(top - gtop) < 1e-6

    def test_filter_chain_roundtrips(self):
        """ASCII85/ASCIIHex + Flate filter CHAINS (``/Filter [/A /B]``)
        decode in declared order, in both classic and PDF-1.5 layouts."""
        from pdf_table_extractor_ray.stages.pdf_native import build_pdf, parse_pdf_words

        for cf in ("a85", "ahx"):
            for p15 in (False, True):
                got = parse_pdf_words(
                    build_pdf(self.PAGES, content_filter=cf, pdf15=p15)
                )
                for orig, page in zip(self.PAGES, got):
                    assert [t for _, _, t in page] == [t for _, _, t in orig]

    def test_filter_kernels(self):
        import base64

        from pdf_table_extractor_ray.stages.pdf_native import (
            _ascii85_decode,
            _ascii_hex_decode,
            _run_length_decode,
        )

        assert _ascii_hex_decode(b"48 65 6C 6C 6F 7>") == b"Hellop"  # odd digit pads 0
        assert _ascii85_decode(base64.a85encode(b"xy z") + b"~>") == b"xy z"
        assert _ascii85_decode(b"<~" + base64.a85encode(b"xy z") + b"~>") == b"xy z"
        assert (
            _run_length_decode(bytes([2]) + b"abc" + bytes([253]) + b"z" + bytes([128]))
            == b"abczzzz"
        )

    def test_inline_image_is_stripped(self):
        """A BI/ID/EI inline raster whose binary payload contains
        text-operator bytes must not surface phantom words."""
        from pdf_table_extractor_ray.stages.pdf_native import build_pdf, parse_pdf_words

        got = parse_pdf_words(build_pdf(self.PAGES, inline_image=True))
        texts = [[t for _, _, t in p] for p in got]
        assert texts == [[t for _, _, t in p] for p in self.PAGES]
        assert not any("FAKE" in t for p in texts for t in p)

    def test_cid_font_beyond_latin1(self):
        """CID text can carry characters the Latin-1 writer cannot
        (the whole point of /ToUnicode): round-trip a euro sign and a
        CJK char, and check the CMap parse covers both bfchar and
        bfrange shapes."""
        from pdf_table_extractor_ray.stages.pdf_native import (
            _BFCHAR_RE,
            _BFRANGE_RE,
            _parse_tounicode,
            _tounicode_cmap,
            build_pdf,
            parse_pdf_words,
        )

        pages = [[(10.0, 20.0, "caf€ 東京 abcdef")]]
        (page,) = parse_pdf_words(build_pdf(pages, encoding="cid"))
        assert page[0][2] == "caf€ 東京 abcdef"
        # consecutive codepoints (abcdef) become a bfrange; isolated
        # ones (€, the CJK pair) become bfchars
        cmap_src = _tounicode_cmap(
            {c: i + 1 for i, c in enumerate(sorted(set("caf€ 東京 abcdef")))}
        )
        assert _BFRANGE_RE.search(cmap_src) and _BFCHAR_RE.search(cmap_src)
        parsed = _parse_tounicode(cmap_src)
        assert parsed[1] == " " and "€" in parsed.values() and "東" in parsed.values()

    def test_cid_array_cmap_end_to_end(self):
        """A PDF whose /ToUnicode writes runs in ARRAY form must decode
        word-for-word identically to its scalar-form twin."""
        from pdf_table_extractor_ray.stages.pdf_native import build_pdf, parse_pdf_words

        pages = [[(10.0, 20.0, "caf€ 東京 abcdef"), (10.0, 40.0, "saldo 1.234,56")]]
        scalar = parse_pdf_words(build_pdf(pages, encoding="cid"))
        arr = parse_pdf_words(build_pdf(pages, encoding="cid", cmap_style="array"))
        assert arr == scalar
        assert arr[0][0][2] == "caf€ 東京 abcdef"

    def test_line_mode_tj_metrics(self):
        """Whole-line TJ arrays: per-word boxes recover through
        Helvetica glyph advance + kerning numbers (both previously
        declared limitations)."""
        from pdf_table_extractor_ray.stages.pdf_native import (
            _text_width,
            build_pdf,
            parse_pdf_words,
        )

        import zlib

        words = [(30.7, 52.3, "05"), (100.0, 52.3, "Pix Enviado"), (500.4, 52.3, "1.234,56")]
        pdf = build_pdf([words], positioning="line")
        # exactly one show op per LINE in the content stream
        assert zlib.decompress(
            pdf[pdf.find(b"stream\n") + 7 : pdf.find(b"\nendstream")]
        ).count(b"TJ") == 1
        (page,) = parse_pdf_words(pdf)
        assert len(page) == len(words)
        for (x, t, s), (wx, wt, ws) in zip(page, sorted(words)):
            assert s == ws and abs(x - wx) < 1e-3 and abs(t - wt) < 1e-6
        assert _text_width("05", 10.0) == (556 + 556) / 100.0

    def test_tj_advance_without_tf_is_legacy(self):
        """No Tf seen → size 0 → TJ strings emit at the matrix origin
        (the conservative legacy behavior)."""
        from pdf_table_extractor_ray.stages.pdf_native import _interpret_text

        ws = _interpret_text("BT 1 0 0 1 10 100 Tm [(a) -120 (b)] TJ ET", 842.0)
        assert [(x, s) for x, _, s in ws] == [(10.0, "a"), (10.0, "b")]
        ws = _interpret_text(
            "BT /F1 10 Tf 1 0 0 1 10 100 Tm [(a) -120 (b)] TJ ET", 842.0
        )
        assert ws[0][2] == "a" and ws[0][0] == 10.0
        # b advances by width('a')·10/1000 = 5.56 plus −(−120)/1000·10 = 1.2
        assert abs(ws[1][0] - (10.0 + 5.56 + 1.2)) < 1e-9

    def test_cid_unmapped_and_array_bfrange(self):
        from pdf_table_extractor_ray.stages.pdf_native import (
            _decode_hex_cids,
            _parse_tounicode,
        )

        m = _parse_tounicode(
            b"1 beginbfchar\n<0001> <0041>\nendbfchar\n"
            b"1 beginbfrange\n<0002> <0003> [<0042> <0043>]\nendbfrange\n"
        )
        # array-form bfrange: one explicit destination per code
        assert m == {1: "A", 2: "B", 3: "C"}
        assert _decode_hex_cids("<00010002>", m) == "AB"
        # unmapped CID still surfaces as U+FFFD, never misread
        assert _decode_hex_cids("<00010009>", m) == "A�"
        # mixed block: scalar run + array entry + short array tail
        m2 = _parse_tounicode(
            b"3 beginbfrange\n"
            b"<0010> <0012> <0061>\n"
            b"<0020> <0021> [<0058> <0059>]\n"
            b"<0030> <0032> [<005A>]\n"
            b"endbfrange\n"
        )
        assert m2[0x10] == "a" and m2[0x11] == "b" and m2[0x12] == "c"
        assert m2[0x20] == "X" and m2[0x21] == "Y"
        assert m2[0x30] == "Z" and 0x31 not in m2 and 0x32 not in m2

    def test_xref_stream_locator(self):
        from pdf_table_extractor_ray.stages.pdf_native import (
            _parse_xref_streams,
            build_pdf,
        )

        xr = _parse_xref_streams(build_pdf(self.PAGES, pdf15=True))
        # catalog/pages/font/page dicts live in the object stream;
        # content streams are top-level offsets
        assert xr[1][0] == "stm" and xr[2][0] == "stm" and xr[4][0] == "stm"
        assert xr[5][0] == "off" and xr[7][0] == "off"
        # classic 1.4 file has no xref stream
        assert _parse_xref_streams(build_pdf(self.PAGES)) is None

    def test_png_predictor_up(self):
        """Hand-encode an Up-filtered (PNG predictor 12) xref stream —
        the most common real-world encoding — and check decode."""
        import zlib
        from pdf_table_extractor_ray.stages.pdf_native import _apply_png_predictor

        rows = [bytes([1, 0, 0, 0, 17, 0, 0]), bytes([1, 0, 0, 0, 42, 0, 0])]
        enc = bytearray()
        prev = bytes(7)
        for r in rows:
            enc.append(2)  # Up filter
            enc.extend((r[i] - prev[i]) & 0xFF for i in range(7))
            prev = r
        assert _apply_png_predictor(bytes(enc), 7) == b"".join(rows)

    def test_td_accumulation_is_exact_on_grid(self):
        """Relative advances must land on the same 2-decimal grid the
        absolute writer uses (no drift over a long line)."""
        from pdf_table_extractor_ray.stages.pdf_native import build_pdf, parse_pdf_words

        words = [(10.0 + 7.03 * i, 50.0, f"w{i}") for i in range(200)]
        (page,) = parse_pdf_words(build_pdf([words], positioning="td"))
        for (x, _, _), (gx, _, _) in zip(words, page):
            assert abs(round(x, 2) - gx) < 1e-9

    def test_extraction_parity_across_serializations(self):
        """The SAME word boxes must extract byte-identically whatever
        the serialization sub-family (shared cluster core)."""
        import random
        from pdf_table_extractor_ray.fixtures import _gen_coordinate
        from pdf_table_extractor_ray.stages.layout import _PAGE_SPLIT_RE, _WORDBOX_RE
        from pdf_table_extractor_ray.stages.pdf_native import build_pdf, extract_pdf_native

        rng = random.Random(11)
        _, html = _gen_coordinate(rng, "small")
        pages = []
        for ph in _PAGE_SPLIT_RE.split(html.decode()):
            ws = [(float(x), float(t), s) for x, t, s in _WORDBOX_RE.findall(ph)]
            if ws:
                pages.append(ws)
        results = [
            extract_pdf_native(build_pdf(pages, positioning=pos, pdf15=p15, encoding=enc))
            for pos in ("tm", "td", "line")
            for p15 in (False, True)
            for enc in ("latin1", "cid")
        ]
        base = results[0]
        assert base.extracted_text
        for r in results[1:]:
            assert r.extracted_text == base.extracted_text
            assert r.spans == base.spans
