"""Driver-side golden oracle: straight-line, single-process extraction
used ONLY to mint golden fixtures and to cross-check the Ray pipeline
(SURVEY §5). Shares the per-document strategy functions with the Ray
stages — the parity target is that the distributed plumbing (batching,
actor pools, partitioning, explode) preserves these bytes exactly.
"""

from __future__ import annotations

from typing import Dict, Iterable, List

import pyarrow as pa

from pdf_table_extractor_ray.stages.registry import extract_document
from pdf_table_extractor_ray.schemas import EXTRACTED_SCHEMA
from pdf_table_extractor_ray.pipelines.keys import part_id_for_url, size_class_for_len


def oracle_extract_row(doc: Dict, num_partitions: int = 64) -> Dict:
    """Extract one page row → one output row (plain dicts, no Ray)."""
    key, res = extract_document(doc)
    html = doc.get("html") or b""
    return {
        "url": doc["url"],
        "strategy": key,
        "extracted_text": res.extracted_text,
        "spans": [{"start": s, "end": e, "kind": k} for s, e, k in res.spans],
        "records": [
            {"date": r.date, "description": r.description, "amount": r.amount, "doc": r.doc}
            for r in res.records
        ],
        "n_records": len(res.records),
        "n_chars": len(res.extracted_text),
        "status": res.status,
        "error": res.error,
        "part_id": part_id_for_url(doc["url"], num_partitions),
        "size_class": size_class_for_len(len(html) + len(doc.get("text") or "")),
    }


def oracle_extract_table(docs: Iterable[Dict], num_partitions: int = 64) -> pa.Table:
    rows: List[Dict] = [oracle_extract_row(d, num_partitions) for d in docs]
    return pa.Table.from_pylist(rows, schema=EXTRACTED_SCHEMA)
