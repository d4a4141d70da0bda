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

import numpy as np
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


def pii_inventory(
    ds: "ray.data.Dataset",
    pattern: str = r"\b(?:customer|user)\b",
    text_col: str = "text",
    key_col: str = "source",
) -> "ray.data.Dataset":
    """Per-group PII incidence report — the audit table a scrub run
    starts from: (key, n_docs, n_docs_with_hits, n_hits). One
    ``pc.count_substring_regex`` RE2 pass per batch (the same regex
    the scrubber and the SQL oracle run), per-batch Arrow group
    combiner, one slim groupby-Sum."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        txt = pc.fill_null(pc.cast(batch.column(text_col), pa.string()), "")
        hits = pc.count_substring_regex(txt, pattern)
        t = pa.table(
            {
                "key": batch.column(key_col),
                "d": pa.array(np.ones(batch.num_rows, np.int64)),
                "dh": pc.cast(pc.greater(hits, 0), pa.int64()),
                "h": pc.cast(hits, pa.int64()),
            }
        )
        g = t.group_by("key").aggregate([("d", "sum"), ("dh", "sum"), ("h", "sum")])
        return pa.table(
            {
                "key": g.column("key"),
                "n_docs_part": pc.cast(g.column("d_sum"), pa.int64()),
                "n_hit_docs_part": pc.cast(g.column("dh_sum"), pa.int64()),
                "n_hits_part": pc.cast(g.column("h_sum"), pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("key")
        .aggregate(Sum("n_docs_part"), Sum("n_hit_docs_part"), Sum("n_hits_part"))
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": b.column("key"),
                "n_docs": pc.cast(b.column("sum(n_docs_part)"), pa.int64()),
                "n_docs_with_hits": pc.cast(
                    b.column("sum(n_hit_docs_part)"), pa.int64()
                ),
                "n_hits": pc.cast(b.column("sum(n_hits_part)"), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")
