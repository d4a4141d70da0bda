"""Semi-structured (JSON-ish) field extraction and pattern scrubbing.

Web/event pipelines carry per-row payload strings (the ``props``
column of the events table: flat JSON like ``{"k": 87}``). These
stages pull typed fields out of such payloads and rewrite/redact
patterns in text — both fully vectorized through Arrow's RE2 kernels
(``pc.extract_regex`` / ``pc.replace_substring_regex``), so the same
regex runs identically in the DuckDB oracle (also RE2): no per-row
Python, no JSON parser allocation per row.

At 100 TB both stages are embarrassingly parallel map_batches with
column pruning at the read; nothing shuffles.

Reference parity: the reference engine's field pulls are row-loop
``re.search`` over pandas rows (e.g. conversor_generico.py's
per-line captures); here the capture is one RE2 pass per batch.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def json_int_field_batch(
    batch: pa.Table,
    col: str = "props",
    field: str = "k",
    out: str = "k",
    id_cols: tuple = ("event_id",),
) -> pa.Table:
    """Extract integer ``field`` from a flat-JSON string column.

    Vectorized: one ``pc.extract_regex`` with a named group over the
    batch. Rows where the field is absent/malformed yield null (same
    semantics as SQL ``NULLIF(regexp_extract(...), '')``).
    """
    pattern = rf'"{field}": (?P<v>\d+)'
    ex = pc.extract_regex(batch.column(col), pattern)
    v = pc.cast(pc.struct_field(ex, "v"), pa.int64())
    cols = [batch.column(c) for c in id_cols] + [v]
    return pa.Table.from_arrays(cols, names=list(id_cols) + [out])


def scrub_batch(
    batch: pa.Table,
    col: str = "text",
    pattern: str = r"\b(?:customer|user)\b",
    replacement: str = "<PII>",
    out: str = "scrubbed",
    count_out: str = "n_redactions",
    id_cols: tuple = ("doc_id",),
) -> pa.Table:
    """PII-style pattern scrub: globally rewrite ``pattern`` →
    ``replacement`` and count the redactions per row.

    One RE2 replace + one RE2 count per batch (global replace is
    Arrow's default, matching DuckDB ``regexp_replace(..., 'g')``).
    Swap ``pattern`` for email/phone/SSN regexes on real corpora.
    """
    text = batch.column(col)
    scrubbed = pc.replace_substring_regex(text, pattern, replacement)
    n = pc.cast(pc.count_substring_regex(text, pattern), pa.int64())
    cols = [batch.column(c) for c in id_cols] + [scrubbed, n]
    return pa.Table.from_arrays(cols, names=list(id_cols) + [out, count_out])


def normalize_text_batch(
    batch: pa.Table,
    col: str = "text",
    out: str = "norm_text",
) -> pa.Table:
    """Canonical text form for normalization-insensitive dedup:
    lowercase, collapse whitespace runs to one space, trim. All Arrow
    kernels; byte-identical to DuckDB
    ``trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))``.
    """
    t = pc.utf8_lower(batch.column(col))
    t = pc.replace_substring_regex(t, r"\s+", " ")
    # trim ASCII space ONLY: Arrow's utf8_trim_whitespace strips Unicode
    # whitespace (\x0b,  , ...) that RE2's \s and DuckDB trim() do
    # not touch, which would silently diverge from the oracle form
    t = pc.utf8_trim(t, " ")
    return batch.append_column(out, t)
