"""Charset sniffing + decode hardening for crawled HTML payloads."""

import codecs

from pdf_table_extractor_ray.functions.charset import decode_html, sniff_charset
from pdf_table_extractor_ray.stages.registry import extract_document


def test_sniff_bom_priority():
    assert sniff_charset(codecs.BOM_UTF8 + b"<html>") == "utf-8-sig"
    assert sniff_charset(codecs.BOM_UTF16_LE + "hi".encode("utf-16-le")) == "utf-16-le"
    assert sniff_charset(codecs.BOM_UTF16_BE + "hi".encode("utf-16-be")) == "utf-16-be"
    # UTF-32-LE BOM starts with the UTF-16-LE BOM bytes — longest wins
    assert sniff_charset(codecs.BOM_UTF32_LE + "hi".encode("utf-32-le")) == "utf-32-le"


def test_sniff_meta_and_xml_declarations():
    assert sniff_charset(b'<meta charset="ISO-8859-1"><p>x</p>') == "iso8859-1"
    assert (
        sniff_charset(
            b'<meta http-equiv="Content-Type" content="text/html; charset=windows-1252">'
        )
        == "cp1252"
    )
    assert sniff_charset(b"<?xml version='1.0' encoding='latin-1'?><page/>") == "iso8859-1"
    # unknown declared name → not trusted
    assert sniff_charset(b'<meta charset="no-such-enc"><p>') == "utf-8"
    # BOM-less utf-16 declaration is unreliable → utf-8
    assert sniff_charset(b'<meta charset="utf-16">') == "utf-8"
    assert sniff_charset(b"<html><p>plain") == "utf-8"


def test_decode_strips_bom_and_replaces_garbage():
    assert decode_html(codecs.BOM_UTF8 + "café".encode("utf-8")) == "café"
    assert decode_html(None) == ""
    assert decode_html("already str") == "already str"
    # invalid utf-8 without a declaration → U+FFFD, never an exception
    out = decode_html(b"ok \xff\xfe\xfa bytes")
    assert "ok" in out and "�" in out


def test_latin1_table_extracts_accented_text():
    html = (
        '<meta charset="ISO-8859-1">'
        "<table><tr><th>Data</th><th>Histórico</th><th>Valor</th></tr>"
        "<tr><td>01/02/2024</td><td>Transferência</td><td>10,00</td></tr></table>"
    ).encode("iso8859-1")
    key, res = extract_document({"url": "u", "html": html, "text": ""})
    assert key == "lattice_table"
    assert res.status == "ok"
    assert "Transferência" in res.extracted_text


def test_bom_utf16_boilerplate_page_extracts():
    body = (
        "<html><body><article><p>"
        + "Real content sentence with many informative words present here. " * 3
        + "</p></article></body></html>"
    )
    payload = codecs.BOM_UTF16_LE + body.encode("utf-16-le")
    key, res = extract_document({"url": "u", "html": payload, "text": ""})
    assert key == "boilerplate_strip"
    assert res.status == "ok"
    assert "Real content sentence" in res.extracted_text
    assert "�" not in res.extracted_text
