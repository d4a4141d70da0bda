"""JSONL (newline-delimited JSON) source + sink — the interchange
format training-data pipelines actually trade in (every public corpus
release ships .jsonl/.jsonl.gz shards alongside parquet).

- writer: one shard file per batch, one JSON object per line, keys in
  column order, floats via ``repr``-shortest round-trip (parse back to
  the identical float64 bit pattern), timestamps as ISO-8601 strings.
  Map-only, embarrassingly parallel; per-row ``json.dumps`` is the
  sink's I/O boundary (same contract as the CSV/XLSX writers — the
  payload leaves the columnar world here by definition).
- reader: one shard = one ``pyarrow.json.read_json`` call (the C++
  block parser — no Python per line) with an EXPLICIT schema, so
  types never drift with file contents (inference on a shard of all-
  null or all-int values would change the schema shard to shard).
  Parallelism unit = file, like the WARC reader; gzip shards
  (``.jsonl.gz``) inflate in-stage.
"""

from __future__ import annotations

import gzip
import io
import json
import os
import uuid
from typing import List, Optional

import pyarrow as pa

import ray.data


def _json_cell(v):
    if hasattr(v, "isoformat"):
        return v.isoformat(sep=" ")
    return v


def batch_to_jsonl_bytes(batch: pa.Table) -> bytes:
    cols = batch.column_names
    pylists = [batch.column(c).to_pylist() for c in cols]
    out = io.StringIO()
    for row in zip(*pylists):
        json.dump(
            {c: _json_cell(v) for c, v in zip(cols, row)},
            out,
            ensure_ascii=False,
            separators=(",", ":"),
        )
        out.write("\n")
    return out.getvalue().encode("utf-8")


def write_jsonl_shards(
    ds: "ray.data.Dataset",
    out_dir: str,
    columns: Optional[List[str]] = None,
    compress: bool = False,
) -> None:
    """Dataset → ``out_dir/part-*.jsonl[.gz]``, one shard per batch.
    Consumes the stream distributed (no driver materialization)."""
    os.makedirs(out_dir, exist_ok=True)
    ext = ".jsonl.gz" if compress else ".jsonl"

    def write_shard(batch: pa.Table) -> pa.Table:
        if columns:
            batch = batch.select(columns)
        payload = batch_to_jsonl_bytes(batch)
        if compress:
            payload = gzip.compress(payload, mtime=0)
        path = os.path.join(out_dir, f"part-{uuid.uuid4().hex[:12]}{ext}")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.rename(tmp, path)  # atomic publish — a killed task leaves no torn shard
        return pa.table({"path": pa.array([path]), "rows": pa.array([batch.num_rows])})

    # count() drives the lazy plan to completion without collecting rows
    ds.map_batches(write_shard, batch_format="pyarrow", zero_copy_batch=True).count()


def read_jsonl(
    path: str,
    schema: pa.Schema,
) -> "ray.data.Dataset":
    """``path`` (dir or single file) → Dataset with EXACTLY ``schema``.
    One C++ JSON parse per shard; shard = the parallelism unit."""
    from pyarrow import json as pa_json

    files = ray.data.read_binary_files(path)

    def parse(batch: pa.Table) -> pa.Table:
        tables = []
        for blob in batch.column("bytes").to_pylist():
            # gate on the magic, not the filename: read_binary_files
            # already auto-inflates *.gz via the Arrow filesystem layer
            if blob[:2] == b"\x1f\x8b":
                blob = gzip.decompress(blob)
            if not blob:
                continue
            t = pa_json.read_json(
                io.BytesIO(blob),
                parse_options=pa_json.ParseOptions(explicit_schema=schema),
            )
            tables.append(t.select(schema.names))
        if not tables:
            return schema.empty_table()
        return pa.concat_tables(tables)

    return files.map_batches(
        parse, batch_format="pyarrow", zero_copy_batch=True, batch_size=1
    )
