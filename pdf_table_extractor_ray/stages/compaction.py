"""Small-file compaction — the table-maintenance operator every
long-lived Parquet layout needs: streaming/extraction sinks produce
many small files (one per partition wave — the resumable layout of
``pipelines/extract.py`` is deliberately file-per-partition), and scan
efficiency at 100 TB wants few large files (footer and open() overhead
is per-file; object stores throttle per-request). Compaction rewrites
a directory of small files into ≈target-size files WITHOUT changing a
single row.

Shape: the PLAN is driver-side first-fit-decreasing bin packing over
the (path, bytes) list — file-count-bounded metadata, never row data
(the ``zonemap`` scale contract). The REWRITE is one Ray task per
output bin (``from_items(bins) → map_batches(num_cpus=1)``): each task
reads only its own bin's files and writes exactly one output file, so
the job is embarrassingly parallel, needs no shuffle, and a failed run
can re-execute per bin idempotently (output names are bin-indexed).
Row order inside a bin follows the sorted input paths — deterministic
for a fixed input set.

The reference has no storage-maintenance surface (per-file PDFs);
this belongs to the engine's layout family next to ``zonemap.py`` /
``zorder.py``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Optional

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data


def plan_compaction(paths: List[str], target_bytes: int) -> List[List[str]]:
    """First-fit-decreasing bin packing of files into ≈``target_bytes``
    bins (a file larger than the target gets its own bin — compaction
    never splits files; splitting is ``repartition``'s job). Input
    order is normalized (sorted paths) so the plan is deterministic."""
    sized = sorted(
        ((os.path.getsize(p), p) for p in set(paths)),
        key=lambda t: (-t[0], t[1]),
    )
    bins: List[List[str]] = []
    room: List[int] = []
    for size, path in sized:
        for i in range(len(bins)):
            if room[i] >= size:
                bins[i].append(path)
                room[i] -= size
                break
        else:
            bins.append([path])
            room.append(max(0, target_bytes - size))
    return [sorted(b) for b in bins]


@dataclass(frozen=True)
class CompactionCertificate:
    files_in: int
    files_out: int
    bytes_in: int
    bytes_out: int
    rows: int


def compact_shards(
    paths: List[str],
    out_dir: str,
    target_bytes: int = 128 * 1024 * 1024,
    compression: str = "zstd",
    columns: Optional[List[str]] = None,
) -> CompactionCertificate:
    """Rewrite ``paths`` into ``out_dir/compact-XXXX.parquet`` files of
    ≈``target_bytes`` each (one Ray task per output file; no shuffle)
    and return a certificate. Row-preserving by construction: every
    input file lands wholly in exactly one output file. ``columns``
    optionally projects (a schema-evolution compaction); default keeps
    everything."""
    os.makedirs(out_dir, exist_ok=True)
    bins = plan_compaction(paths, target_bytes)
    bytes_in = sum(os.path.getsize(p) for b in bins for p in b)

    def rewrite(batch: pa.Table) -> pa.Table:
        out_rows = []
        for bin_id, blob in zip(
            batch.column("bin_id").to_pylist(), batch.column("paths").to_pylist()
        ):
            ps = list(blob)
            t = pa.concat_tables(
                [pq.read_table(p, columns=columns) for p in ps], promote_options="default"
            )
            out = os.path.join(out_dir, f"compact-{bin_id:04d}.parquet")
            pq.write_table(t, out, compression=compression)
            out_rows.append((bin_id, t.num_rows, os.path.getsize(out)))
        return pa.table(
            {
                "bin_id": pa.array([r[0] for r in out_rows], pa.int64()),
                "rows": pa.array([r[1] for r in out_rows], pa.int64()),
                "bytes_out": pa.array([r[2] for r in out_rows], pa.int64()),
            }
        )

    stats = (
        ray.data.from_items(
            [{"bin_id": i, "paths": b} for i, b in enumerate(bins)]
        )
        .map_batches(rewrite, batch_format="pyarrow", batch_size=1, num_cpus=1)
        .take_all()
    )  # bounded: one counter row per output bin (audit: compaction)
    return CompactionCertificate(
        files_in=sum(len(b) for b in bins),
        files_out=len(bins),
        bytes_in=bytes_in,
        bytes_out=sum(int(r["bytes_out"]) for r in stats),
        rows=sum(int(r["rows"]) for r in stats),
    )
