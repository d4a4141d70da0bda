"""Fixed Arrow schemas — the engine's explicit contract (the reference
has only implicit per-converter schemas, SURVEY §1.3)."""

import pyarrow as pa

# input_hint shape (BASELINE.json): one row = one web page/document.
PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

# int32 offsets: a single document's text never nears 2^31 chars, and
# spans dominate output bytes — halving them cuts parquet encode cost
SPAN_TYPE = pa.struct([("start", pa.int32()), ("end", pa.int32()), ("kind", pa.string())])
RECORD_TYPE = pa.struct(
    [
        ("date", pa.string()),
        ("description", pa.string()),
        ("amount", pa.float64()),
        ("doc", pa.string()),
    ]
)

# flagship output: per-document extraction result with in-band faults
# plus the partitioning keys (part_id for lineage/resume, size_cls for
# skew bucketing).
EXTRACTED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("strategy", pa.string()),
        ("extracted_text", pa.string()),
        ("spans", pa.list_(SPAN_TYPE)),
        ("records", pa.list_(RECORD_TYPE)),
        ("n_records", pa.int64()),
        ("n_chars", pa.int64()),
        ("status", pa.string()),
        ("error", pa.string()),
        ("part_id", pa.int64()),
        ("size_class", pa.int32()),
    ]
)

# exploded per-record table (flat_map analog of the reference's final
# CSV rows)
RECORDS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("record_idx", pa.int64()),
        ("date", pa.string()),
        ("description", pa.string()),
        ("amount", pa.float64()),
        ("doc", pa.string()),
    ]
)
