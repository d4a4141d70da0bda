"""JSON-LD structured-data extraction — the schema.org blocks
(``<script type="application/ld+json">``) that product/article pages
embed; Common Crawl publishes exactly this surface as its WAT
derivative, and it is the highest-precision metadata a crawl yields
(no DOM heuristics — publishers state the fields).

Scale shape: compiled-regex script-block scan + stdlib ``json`` parse
per document inside ``map_batches`` (same per-doc compute contract as
``stages/links.py``; JSON-LD blocks are small — the parse cost is
bounded by block size, not page size), zero shuffle. Non-HTML
payloads, non-JSON-LD scripts, and malformed JSON all contribute zero
rows in-band. Top-level arrays and ``@graph`` containers explode to
one row per entity, preserving order via ``block_idx``/``entity_idx``.
"""

from __future__ import annotations

import json
import re
from typing import List

import pyarrow as pa

import ray.data

_SCRIPT_RE = re.compile(
    rb"<script\b[^>]*type\s*=\s*[\"']application/ld\+json[\"'][^>]*>(.*?)</script\s*>",
    re.I | re.S,
)


def _looks_like_html(payload: bytes) -> bool:
    head = payload[:256]
    return not head.startswith(b"%PDF") and b"<" in head


def _entities(block: bytes) -> List[dict]:
    try:
        doc = json.loads(block.decode("utf-8", "replace"))
    except (ValueError, UnicodeDecodeError):
        return []
    if isinstance(doc, dict) and isinstance(doc.get("@graph"), list):
        doc = doc["@graph"]
    if isinstance(doc, dict):
        doc = [doc]
    if not isinstance(doc, list):
        return []
    return [e for e in doc if isinstance(e, dict)]


def extract_jsonld(
    ds: "ray.data.Dataset",
    html_col: str = "html",
    url_col: str = "url",
) -> "ray.data.Dataset":
    """One row per JSON-LD entity:
    (url, block_idx, entity_idx, jtype, payload) — ``jtype`` is the
    entity's ``@type`` ("" when absent), ``payload`` the entity
    re-serialized canonically (sorted keys, no whitespace) so equal
    entities are byte-equal regardless of source formatting."""

    def per_batch(b: pa.Table) -> pa.Table:
        urls = b.column(url_col).to_pylist()
        payloads = b.column(html_col).to_pylist()
        o_url, o_bi, o_ei, o_type, o_payload = [], [], [], [], []
        for url, payload in zip(urls, payloads):
            if payload is None or url is None:
                continue
            if isinstance(payload, str):
                payload = payload.encode("utf-8", "replace")
            if not _looks_like_html(payload):
                continue
            for bi, m in enumerate(_SCRIPT_RE.finditer(payload)):
                for ei, ent in enumerate(_entities(m.group(1))):
                    t = ent.get("@type")
                    o_url.append(url)
                    o_bi.append(bi)
                    o_ei.append(ei)
                    o_type.append(t if isinstance(t, str) else "")
                    o_payload.append(
                        json.dumps(ent, sort_keys=True, separators=(",", ":"))
                    )
        return pa.table(
            {
                "url": pa.array(o_url, pa.string()),
                "block_idx": pa.array(o_bi, pa.int32()),
                "entity_idx": pa.array(o_ei, pa.int32()),
                "jtype": pa.array(o_type, pa.string()),
                "payload": pa.array(o_payload, pa.string()),
            }
        )

    return ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)


def project_jsonld_fields(
    ds: "ray.data.Dataset",
    fields,
    jtype: str = None,
) -> "ray.data.Dataset":
    """Entity rows → (url, <fields...>) string columns (missing or
    non-scalar fields → null), optionally filtered to one ``@type``.
    Parsing the canonical payload per row is bounded by entity size —
    the page bytes are long gone."""
    fields = list(fields)

    def per_batch(b: pa.Table) -> pa.Table:
        if jtype is not None:
            import pyarrow.compute as pc

            b = b.filter(pc.equal(b.column("jtype"), jtype))
        ents = [json.loads(p) for p in b.column("payload").to_pylist()]
        cols = {"url": b.column("url")}
        for f in fields:
            vals = []
            for e in ents:
                v = e.get(f)
                if isinstance(v, (str, int, float, bool)):
                    vals.append(str(v))
                else:
                    vals.append(None)
            cols[f] = pa.array(vals, pa.string())
        return pa.table(cols)

    return ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)


def render_jsonld_page(entities, noise_script: str = "") -> bytes:
    """Deterministic fixture page embedding each entity as its own
    JSON-LD block (plus a non-JSON-LD noise script the extractor must
    skip), for round-trip verification."""
    parts = ["<html><head>"]
    if noise_script:
        parts.append(f'<script type="application/javascript">{noise_script}</script>')
    for ent in entities:
        parts.append(
            '<script type="application/ld+json">'
            + json.dumps(ent, indent=1)
            + "</script>"
        )
    parts.append("</head><body><p>content</p></body></html>")
    return "".join(parts).encode("utf-8")
