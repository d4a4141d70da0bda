"""Zone-map data skipping — file-level min/max pruning for clustered
Parquet layouts, the scan-side payoff of clustering (``stages/zorder.py``
certifies locality; this module converts that locality into skipped
I/O).

At 100 TB a table is tens of thousands of Parquet files; a range
predicate over a clustered column should read only the files whose
``[min, max]`` envelope intersects the band. Parquet footers carry
those envelopes per row group, so the zone map costs METADATA-ONLY
I/O (a few KB per file), and pruning happens before a single data
byte moves. Row-group-level pushdown inside the surviving files is
then Ray's normal ``filter=`` path (the ``urgent_bigticket`` plan) —
this module adds the file-level dimension above it.

Scale shape: footer reads are distributed via ``ray.data`` over the
path list above a driver-side cutoff (the extraction lineage-stats
pattern, ``pipelines/extract.py``); the zone map itself is one slim
row per file — bounded by the file count, never the row count. The
pruning decision returns an explicit CERTIFICATE (files total / read
/ skipped) so jobs can assert their layout actually prunes instead of
silently scanning everything.

The reference has no columnar-scan surface at all (per-file PDF
reads); this belongs to the engine's layout/partitioning family next
to ``stages/zorder.py``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Optional, Tuple

import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq

import ray.data

_DRIVER_FOOTER_CUTOFF = 256  # above this, footer reads go through Ray


def _file_envelope(path: str, column: str) -> Tuple[Optional[object], Optional[object], int]:
    """(min, max, rows) of one file from footer metadata only.
    Files with missing stats return (None, None, rows) — never
    prunable, always read (correctness over skipping)."""
    md = pq.ParquetFile(path).metadata
    idx = md.schema.to_arrow_schema().get_field_index(column)
    lo = hi = None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            return None, None, md.num_rows
        lo = st.min if lo is None or st.min < lo else lo
        hi = st.max if hi is None or st.max > hi else hi
    return lo, hi, md.num_rows


def build_zone_map(paths: List[str], column: str) -> List[dict]:
    """One ``{path, min, max, rows}`` row per file. Metadata-only; the
    footer reads are distributed when the file list is long."""
    paths = sorted(paths)
    if len(paths) <= _DRIVER_FOOTER_CUTOFF:
        rows = [_file_envelope(p, column) for p in paths]
    else:
        def batch_env(b: pa.Table) -> pa.Table:
            ps = b.column("path").to_pylist()
            env = [_file_envelope(p, column) for p in ps]
            return pa.table(
                {
                    "path": pa.array(ps, pa.string()),
                    "lo": pa.array([e[0] for e in env]),
                    "hi": pa.array([e[1] for e in env]),
                    "rows": pa.array([e[2] for e in env], pa.int64()),
                }
            )

        out = (
            ray.data.from_items([{"path": p} for p in paths])
            .map_batches(batch_env, batch_format="pyarrow")
            .take_all()
        )
        by_path = {r["path"]: (r["lo"], r["hi"], r["rows"]) for r in out}
        rows = [by_path[p] for p in paths]
    return [
        {"path": p, "min": lo, "max": hi, "rows": n}
        for p, (lo, hi, n) in zip(paths, rows)
    ]


@dataclass(frozen=True)
class PruneCertificate:
    files_total: int
    files_read: int
    rows_total: int
    rows_read: int

    @property
    def files_skipped(self) -> int:
        return self.files_total - self.files_read


def pruned_read(
    paths: List[str],
    column: str,
    lo,
    hi,
    columns: Optional[List[str]] = None,
) -> Tuple["ray.data.Dataset", PruneCertificate]:
    """Dataset of rows with ``lo <= column <= hi`` reading ONLY the
    files whose zone-map envelope intersects the band (files without
    stats are conservatively read). The residual row filter still
    applies inside survivors — pruning is an I/O optimization, never
    a semantics change. Returns (dataset, certificate)."""
    zmap = build_zone_map(paths, column)
    keep = [
        z
        for z in zmap
        if z["min"] is None or not (z["max"] < lo or z["min"] > hi)
    ]
    cert = PruneCertificate(
        files_total=len(zmap),
        files_read=len(keep),
        rows_total=sum(z["rows"] for z in zmap),
        rows_read=sum(z["rows"] for z in keep),
    )
    expr = (pads.field(column) >= lo) & (pads.field(column) <= hi)
    if not keep:  # empty band: an empty dataset with the right schema
        ds = ray.data.read_parquet(
            [zmap[0]["path"]], columns=columns, filter=expr
        ).limit(0)
        return ds, cert
    ds = ray.data.read_parquet([z["path"] for z in keep], columns=columns, filter=expr)
    return ds, cert


def _file_bloom(path: str, column: str, m_bits: int, k: int):
    """(packed bloom bytes, rows) for one file — ONE slim projected
    column read (the index build's data cost, paid once per layout)."""
    from pdf_table_extractor_ray.stages.bloom import bloom_from_values

    t = pq.read_table(path, columns=[column])
    return bloom_from_values(t.column(column), m_bits, k).tobytes(), t.num_rows


def build_bloom_index(
    paths: List[str],
    column: str,
    m_bits: int = 1 << 17,
    k: int = 5,
) -> List[dict]:
    """Per-file Bloom filters over ``column`` — the POINT-membership
    sibling of the zone map (which skips by range): a probe key can
    skip every file whose filter definitely lacks it, whatever the
    layout's sort order. One ``{path, bits, rows}`` row per file;
    16 KiB per file at the default m — file-count-bounded, never
    row-count-bounded. Builds are distributed above the same driver
    cutoff as the zone map."""
    paths = sorted(paths)
    if len(paths) <= _DRIVER_FOOTER_CUTOFF:
        built = [_file_bloom(p, column, m_bits, k) for p in paths]
    else:
        def batch_bloom(b: pa.Table) -> pa.Table:
            ps = b.column("path").to_pylist()
            out = [_file_bloom(p, column, m_bits, k) for p in ps]
            return pa.table(
                {
                    "path": pa.array(ps, pa.string()),
                    "bits": pa.array([o[0] for o in out], pa.binary()),
                    "rows": pa.array([o[1] for o in out], pa.int64()),
                }
            )

        got = (
            ray.data.from_items([{"path": p} for p in paths])
            .map_batches(batch_bloom, batch_format="pyarrow")
            .take_all()
        )
        by_path = {r["path"]: (r["bits"], r["rows"]) for r in got}
        built = [by_path[p] for p in paths]
    return [
        {"path": p, "bits": bits, "rows": n}
        for p, (bits, n) in zip(paths, built)
    ]


def bloom_pruned_read(
    paths: List[str],
    column: str,
    probe_values,
    columns: Optional[List[str]] = None,
    m_bits: int = 1 << 17,
    k: int = 5,
    index: Optional[List[dict]] = None,
) -> Tuple["ray.data.Dataset", PruneCertificate]:
    """Point-lookup scan: rows whose ``column`` is in ``probe_values``,
    reading ONLY the files whose Bloom filter possibly contains at
    least one probe key (false positives read harmlessly; false
    negatives are impossible, so pruning never changes semantics — the
    residual IN filter still applies inside survivors). Pass a
    prebuilt ``index`` to amortize the build across lookups. Returns
    (dataset, certificate)."""
    import numpy as np

    from pdf_table_extractor_ray.stages.bloom import bloom_contains

    idx = index if index is not None else build_bloom_index(paths, column, m_bits, k)
    probe = pa.array(list(probe_values))
    keep = []
    for z in idx:
        bits = np.frombuffer(z["bits"], np.uint8)
        if bool(bloom_contains(probe, bits, m_bits, k).any()):
            keep.append(z)
    cert = PruneCertificate(
        files_total=len(idx),
        files_read=len(keep),
        rows_total=sum(z["rows"] for z in idx),
        rows_read=sum(z["rows"] for z in keep),
    )
    expr = pads.field(column).isin(probe)
    if not keep:
        ds = ray.data.read_parquet(
            [idx[0]["path"]], columns=columns, filter=expr
        ).limit(0)
        return ds, cert
    ds = ray.data.read_parquet([z["path"] for z in keep], columns=columns, filter=expr)
    return ds, cert
