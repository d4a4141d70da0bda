"""Extraction-strategy registry + content-based format detection.

Generalizes the reference's converter registry + dynamic dispatch
(Conversor.py:20-47, :153-230): where the desktop app asks the user to
pick a bank, the engine sniffs the payload (markup shape, header
markers, value-sign conventions) and routes each row to a strategy —
the per-row ``detect(payload) -> format_key`` step of SURVEY §2.8.

Strategies are plain callables ``(doc: dict) -> ExtractResult`` so new
formats register without touching the engine.
"""

from __future__ import annotations

import re
from typing import Callable, Dict, Optional

from pdf_table_extractor_ray.stages import statements as st
from pdf_table_extractor_ray.stages.layout import (
    extract_coordinate_columns,
    extract_lattice_table,
)
from pdf_table_extractor_ray.functions.charset import decode_html
from pdf_table_extractor_ray.stages.boilerplate import extract_boilerplate
from pdf_table_extractor_ray.stages.dom import extract_dom_density
from pdf_table_extractor_ray.stages.ofx import extract_ofx
from pdf_table_extractor_ray.stages.result import ExtractResult

# ---------------------------------------------------------------------------
# registry


def _text_strategy(fn):
    def wrapper(doc: dict) -> ExtractResult:
        return fn(doc.get("text") or "")

    wrapper.__name__ = fn.__name__
    wrapper.__doc__ = fn.__doc__
    return wrapper


def _html_strategy(fn):
    def wrapper(doc: dict) -> ExtractResult:
        html = doc.get("html") or b""
        if isinstance(html, (bytes, bytearray, memoryview)):
            html = decode_html(html)  # charset-sniffed (BOM / meta / utf-8)
        return fn(html)

    wrapper.__name__ = fn.__name__
    wrapper.__doc__ = fn.__doc__
    return wrapper


def make_strategies(
    config: Optional["StrategyConfig"] = None,
) -> Dict[str, Callable[[dict], ExtractResult]]:
    """Build the strategy table for one job's ``StrategyConfig``.

    Config-sensitive strategies close over the config values ONCE here
    (the warm actor calls this in ``__init__``); config-free strategies
    are shared plain callables. The encrypted strategy (S6) decrypts
    with the config credential, then routes the plaintext through
    normal detection — the conversor_c6.py:36 open-then-parse shape."""
    from pdf_table_extractor_ray.stages.config import DEFAULT_CONFIG

    cfg = config or DEFAULT_CONFIG

    def coordinate_with_config(doc: dict) -> ExtractResult:
        html = doc.get("html") or b""
        if isinstance(html, (bytes, bytearray, memoryview)):
            html = decode_html(html)
        return extract_coordinate_columns(
            html, cfg.column_date_end_x, cfg.column_value_start_x
        )

    def pdf_with_config(doc: dict) -> ExtractResult:
        # raw bytes, never decoded — the S2 native-PDF path
        from pdf_table_extractor_ray.stages.pdf_native import extract_pdf_native

        return extract_pdf_native(
            bytes(doc.get("html") or b""), cfg.column_date_end_x, cfg.column_value_start_x
        )

    strategies: Dict[str, Callable[[dict], ExtractResult]] = {
        "regex_listing": _text_strategy(st.extract_regex_listing),
        "santander_merge": _text_strategy(st.extract_santander),
        "bb1_buffer": _text_strategy(st.extract_bb1),
        "bb2_nextdate": _text_strategy(st.extract_bb2),
        "sicoob1_lines": _text_strategy(st.extract_sicoob1),
        "sicoob2_blocks": _text_strategy(st.extract_sicoob2),
        "c6_date_context": _text_strategy(st.extract_c6),
        "inter_months": _text_strategy(st.extract_inter),
        "cef_simple": _text_strategy(st.extract_cef),
        "pagbank_findall": _text_strategy(st.extract_pagbank),
        "bradesco_triples": _text_strategy(st.extract_bradesco),
        "coordinate_columns": coordinate_with_config,
        "pdf_native": pdf_with_config,
        "lattice_table": _html_strategy(extract_lattice_table),
        "boilerplate_strip": _html_strategy(extract_boilerplate),
        "dom_density": _html_strategy(extract_dom_density),
        "ofx": _text_strategy(extract_ofx),
    }

    def encrypted_strategy(doc: dict) -> ExtractResult:
        from pdf_table_extractor_ray.stages.encrypted import decrypt_payload

        plain = decrypt_payload(doc.get("html"), cfg.password_for(doc.get("url")))
        inner = {"url": doc.get("url"), "html": plain, "text": doc.get("text")}
        key = detect_format(inner["html"], inner["text"])
        if key is None or key == "encrypted":
            return ExtractResult(status="error", error="no strategy for decrypted payload")
        return strategies[key](inner)

    strategies["encrypted"] = encrypted_strategy
    strategies.update(_USER_STRATEGIES)  # registered extensions win
    return strategies


# user-registered strategies, merged into every make_strategies() table
# (so warm actors built AFTER registration see them, with any config)
_USER_STRATEGIES: Dict[str, Callable[[dict], ExtractResult]] = {}

STRATEGIES: Dict[str, Callable[[dict], ExtractResult]] = make_strategies()


def register_strategy(key: str, fn: Callable[[dict], ExtractResult]) -> None:
    """User-extension point (≈ adding an entry to CONVERTERS,
    Conversor.py:20-47). Takes effect in the module-level ``STRATEGIES``
    immediately and in every subsequently built per-config table
    (``make_strategies`` / ``WarmExtractor.__init__``)."""
    _USER_STRATEGIES[key] = fn
    STRATEGIES[key] = fn


# ---------------------------------------------------------------------------
# detection

_PAREN_SIGN_RE = re.compile(r"\(\s*[-+]\s*\)")
_CD_SUFFIX_EOL_RE = re.compile(r"[\d\.,]+\s?[CD]\s*$", re.MULTILINE)
_PT_LONG_DATE_RE = re.compile(r"\d{1,2} de \w+ de \d{4}")
_RS_VALUE_RE = re.compile(r"-?R\$\s?[\d\.]+,\d{2}")
_TRAILING_HYPHEN_VALUE_RE = re.compile(r"\d{1,3}(?:\.\d{3})*,\d{2}-")
_DMY_RE = re.compile(r"\d{2}/\d{2}/\d{4}")
_ANY_DATE_RE = re.compile(r"\d{2}[/.]\d{2}[/.]\d{2,4}|\d{4}-\d{2}-\d{2}")


def detect_format(html, text: Optional[str]) -> Optional[str]:
    """Sniff the payload and return a strategy key, or None when no
    strategy applies (→ status='error', in-band).

    Ordered decision list: structural markup cues first (word boxes,
    table grids, content-page markup), then the statement families'
    distinctive header markers and value-sign conventions.
    """
    if isinstance(html, (bytes, bytearray, memoryview)):
        from pdf_table_extractor_ray.stages.encrypted import is_encrypted
        from pdf_table_extractor_ray.stages.pdf_native import is_pdf

        if is_pdf(html):
            from pdf_table_extractor_ray.stages.pdf_crypt import pdf_is_encrypted

            # a password-protected PDF must hit the credential seam
            # BEFORE the parser (the conversor_c6 pikepdf.open shape)
            return "encrypted" if pdf_is_encrypted(html) else "pdf_native"
        if is_encrypted(html):
            return "encrypted"
        html = decode_html(html)
    html = html or ""
    text = text or ""

    if "<OFX>" in text or "<STMTTRN>" in text:
        return "ofx"
    if '<span data-x0="' in html:
        return "coordinate_columns"
    if "<table" in html:
        return "lattice_table"
    if "<p>" in html or "<article" in html or "<nav" in html:
        return "boilerplate_strip"

    if "Movimentação" in text and _TRAILING_HYPHEN_VALUE_RE.search(text):
        return "santander_merge"
    if _PAREN_SIGN_RE.search(text):
        return "bb1_buffer"
    if "HISTÓRICO DE MOVIMENTAÇÃO" in text:
        return "sicoob2_blocks"
    if "EXTRATO CONTA CORRENTE" in text:
        return "sicoob1_lines"
    if ("Data Lançamento" in text or "Período" in text) and _RS_VALUE_RE.search(text):
        return "c6_date_context"
    if _PT_LONG_DATE_RE.search(text) and _RS_VALUE_RE.search(text):
        return "inter_months"
    if _RS_VALUE_RE.search(text) and _DMY_RE.search(text):
        return "pagbank_findall"
    if _CD_SUFFIX_EOL_RE.search(text) and _BB2_HEADER_RE.search(text):
        return "bb2_nextdate"
    if _BRADESCO_HEADER_RE.search(text):
        return "bradesco_triples"
    if "CAIXA" in text and _DMY_RE.search(text):
        return "cef_simple"
    if _ANY_DATE_RE.search(text):
        return "regex_listing"
    return None


_BB2_HEADER_RE = re.compile(r"Extrato de conta corrente|G336")
_BRADESCO_HEADER_RE = re.compile(r"Bradesco|Data Histórico Dcto")


def extract_document(doc: dict, strategies: Optional[Dict] = None) -> tuple:
    """Detect + extract one document with in-band fault capture.

    Returns ``(strategy_key, ExtractResult)``; never raises — the
    generalization of the reference's per-file try/except accumulation
    (conversor_bbmod1.py:154-169). ``strategies`` lets a warm actor
    pass its config-bound table (``make_strategies(cfg)``).
    """
    table = strategies if strategies is not None else STRATEGIES
    key = None
    try:
        key = detect_format(doc.get("html"), doc.get("text"))
        if key is None:
            return "unknown", ExtractResult(status="error", error="no strategy detected")
        result = table[key](doc)
        return key, result
    except Exception as exc:  # noqa: BLE001 — in-band fault isolation
        return key or "unknown", ExtractResult(
            status="error", error=f"{type(exc).__name__}: {exc}"
        )
