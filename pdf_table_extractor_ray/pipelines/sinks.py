"""Sinks beyond the primary partitioned-parquet layout (SURVEY §2.2).

The reference writes one `;`-separated, utf-8-sig, decimal-comma CSV
per document (K1: conversor_santander.py:160-161 et al.). The engine's
analog is a records CSV per partition — same cell semantics, written
distributed. XLS/XLSX sinks (K2/K3) are out of scope as formats; their
semantics (fixed headers, sheet-per-file) map to columns + partition
dirs here.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data


def _csv_cell(v) -> str:
    if v is None:
        return ""
    if isinstance(v, float):
        # pandas to_csv(decimal=',') semantics: repr-style shortest float
        return repr(v).replace(".", ",")
    return str(v)


def write_records_csv(records: "ray.data.Dataset", out_dir: str) -> None:
    """Flat records table → `;`-separated CSV shards with utf-8-sig BOM
    per file (Excel-compatible like the reference's output)."""

    def render(batch: pa.Table) -> pa.Table:
        cols = batch.column_names
        lines = []
        pylists = [batch.column(c).to_pylist() for c in cols]
        for row in zip(*pylists):
            lines.append(";".join(_csv_cell(v) for v in row))
        return pa.table({"line": pa.array(lines, pa.string()), "_header": [";".join(cols)] * len(lines)})

    import os

    os.makedirs(out_dir, exist_ok=True)

    class CSVShardWriter:
        def __call__(self, batch: pa.Table) -> pa.Table:
            import uuid

            path = os.path.join(out_dir, f"records-{uuid.uuid4().hex[:12]}.csv")
            header = batch.column("_header")[0].as_py() if batch.num_rows else ""
            with open(path, "w", encoding="utf-8-sig") as f:
                f.write(header + "\n")
                for line in batch.column("line").to_pylist():
                    f.write(line + "\n")
            return pa.table({"path": pa.array([path], pa.string()), "rows": pa.array([batch.num_rows], pa.int64())})

    rendered = records.map_batches(render, batch_format="pyarrow", zero_copy_batch=True)
    # one writer task per block; consume the tiny manifest
    rendered.map_batches(CSVShardWriter(), batch_size=None, batch_format="pyarrow").materialize()
