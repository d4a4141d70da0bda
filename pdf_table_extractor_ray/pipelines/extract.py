"""Flagship extraction pipeline (SURVEY §7.1 step 2, scaled out).

    list shards → prune finished at the READ →
    read_parquet(unfinished, columns pruned, include_paths)
      → map_batches(add keys: part_id = shard id, size_class)
      → map_batches(WarmExtractor, fixed actor pool)
      → write_parquet(out, partition_cols=["part_id"])
      → per-partition lineage records + counters

Partitioning is INPUT-SHARD-ALIGNED: ``part_id = crc32(basename of the
source parquet file)``. One input shard → one output partition dir →
one lineage record. No shuffle anywhere in the flagship path (rows
never change shards), write tasks touch one directory each, and a
resumed run filters the *file list* — finished shards are never read
again, let alone reprocessed. Corpus-level hash partitioning by url
(for dedup-style flows) lives in ``pipelines.keys``.

Waves: shards are processed in waves of ``wave_size``; lineage commits
after each wave, bounding redo-work after a crash to one wave. One
wave == max throughput for small jobs; at 10^12-doc scale thousands of
shards amortize the per-wave execution startup.

Streaming end-to-end: no stage materializes the corpus; the object
store provides backpressure. Failure rows ride in-band
(status/error columns) and never fail the job.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import zlib
from typing import Dict, List, Optional, Sequence

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from pdf_table_extractor_ray.pipelines.keys import SIZE_CLASS_BOUNDS
from pdf_table_extractor_ray.stages.warm_parser import WarmExtractor

LINEAGE_DIR = "_lineage"

# batch sizes tuned so (batch × payload × concurrency) stays well inside a
# worker heap: median fixture payloads are KB-scale, large ones ~1-3 MB
# (SURVEY §4.2); 16 docs/batch bounds a worst-case all-large batch at
# ~50 MB and keeps task granularity fine enough that a run of 1 MB
# documents cannot straggle the stage tail.
DEFAULT_BATCH_SIZE = 16
DEFAULT_WAVE_SIZE = 256


def shard_part_id(path: str) -> int:
    """Stable shard id from the source file name (crc32 — process- and
    node-independent; a rare collision merges two shards into one
    resume unit, which is harmless)."""
    return zlib.crc32(os.path.basename(path).encode())


def list_shards(input_path: str) -> List[str]:
    """Sorted parquet fragment paths for a file or directory."""
    if os.path.isfile(input_path):
        return [input_path]
    out = []
    for name in sorted(os.listdir(input_path)):
        if name.endswith(".parquet"):
            out.append(os.path.join(input_path, name))
    return out


def shard_fingerprint(path: str, tail_bytes: int = 65536) -> str:
    """Content fingerprint of an input shard at metadata-scale I/O
    cost: md5 over (file size, last ``tail_bytes`` of the file). The
    tail of a parquet file is its footer — row-group offsets, page
    indexes and column statistics — so ANY rewrite that changes data
    changes the fingerprint, without reading the (payload-dominated)
    body. A crafted same-size same-footer collision is possible but
    not a failure mode of re-crawled corpora; callers needing
    adversarial robustness can fingerprint full content offline and
    seed lineage themselves."""
    import hashlib

    size = os.path.getsize(path)
    h = hashlib.md5(str(size).encode())
    with open(path, "rb") as f:
        if size > tail_bytes:
            f.seek(size - tail_bytes)
        h.update(f.read(tail_bytes))
    return h.hexdigest()


def _fingerprints(shards: Sequence[str]) -> Dict[int, str]:
    """part_id → fingerprint for every input shard; thread pool because
    at 10^5-shard scale these are small remote-storage reads that
    overlap perfectly (GIL released in file I/O)."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=16) as ex:
        fps = list(ex.map(shard_fingerprint, shards))
    return {shard_part_id(p): fp for p, fp in zip(shards, fps)}


def _add_shard_keys(batch: pa.Table) -> pa.Table:
    """part_id from the carried file path + payload size class.
    Blocks are file-aligned, so the path column is near-constant —
    crc32 computed once per distinct value."""
    import numpy as np

    paths = batch.column("path")
    ids = {p: shard_part_id(p) for p in paths.unique().to_pylist()}
    part = pa.array([ids[p] for p in paths.to_pylist()], pa.int64())
    html_len = pc.binary_length(batch.column("html")).to_numpy(zero_copy_only=False)
    text_len = pc.utf8_length(batch.column("text")).to_numpy(zero_copy_only=False)
    sz = np.digitize(html_len + text_len, SIZE_CLASS_BOUNDS).astype(np.int32)
    out = batch.select(["url", "html", "text"])  # late projection (see read_pages)
    out = out.append_column("part_id", part)
    out = out.append_column("size_class", pa.array(sz, pa.int32()))
    return out


def default_concurrency() -> int:
    import ray

    return int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8


def build_extracted_dataset(
    ds: "ray.data.Dataset",
    *,
    batch_size: int = DEFAULT_BATCH_SIZE,
    concurrency=None,
    strategy_key: Optional[str] = None,
    config=None,
    extra_strategies=None,
    shard_keys: bool = True,
    actor_num_cpus: Optional[float] = None,
) -> "ray.data.Dataset":
    """Lazy extraction plan over a pages Dataset.

    ``shard_keys=True`` expects the dataset to carry Ray's runtime
    ``path`` column (``read_pages(..., include_paths=True)``) and adds
    part_id/size_class from it. (The flag is explicit because
    ``ds.schema()`` reflects parquet metadata only and cannot see the
    runtime path column.)
    """
    n = default_concurrency()
    if concurrency is None:
        # fixed full-size pool (min == max): autoscaling pools dither
        # and measured ~25% slower at the same resources
        concurrency = (n, n)
    if actor_num_cpus is None:
        # fractional CPUs per actor leave scheduling slots for the
        # read/write tasks sharing the cluster — a pool of n×1.0 on an
        # n-CPU cluster deadlocks the stream. Guard small clusters so at
        # least one full task slot stays free.
        actor_num_cpus = min(0.7, max(0.4, (n - 1.2) / max(n, 1)))
    if shard_keys:
        ds = ds.map_batches(_add_shard_keys, batch_format="pyarrow", zero_copy_batch=True)
    return ds.map_batches(
        WarmExtractor,
        fn_constructor_kwargs={
            "strategy_key": strategy_key,
            "config": config,
            "extra_strategies": extra_strategies,
        },
        batch_size=batch_size,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        num_cpus=actor_num_cpus,
    )


def read_pages(input_path, columns=("url", "html", "text"), include_paths: bool = False):
    """Pages scan. Without ``include_paths``: column-pruned — only the
    payload columns leave storage. With it: Ray's path column cannot
    coexist with a projection pushdown, so the scan is unpruned and the
    first map stage projects instead — acceptable because the payload
    columns (html, text) dominate row width by orders of magnitude."""
    if include_paths:
        return ray.data.read_parquet(input_path, include_paths=True)
    return ray.data.read_parquet(input_path, columns=list(columns))


# ---------------------------------------------------------------------------
# lineage + resume


def lineage_path(out_path: str, part_id: int) -> str:
    return os.path.join(out_path, LINEAGE_DIR, f"part_id={part_id}.json")


def finished_partitions(out_path: str) -> set:
    d = os.path.join(out_path, LINEAGE_DIR)
    if not os.path.isdir(d):
        return set()
    out = set()
    for name in os.listdir(d):
        if name.startswith("part_id=") and name.endswith(".json"):
            out.add(int(name[len("part_id="): -len(".json")]))
    return out


def clear_unfinished_partitions(out_path: str, finished: set) -> None:
    """Idempotent-resume guarantee: partition dirs without a lineage
    record are partial output of an interrupted run — drop them before
    re-extracting those shards."""
    if not os.path.isdir(out_path):
        return
    for name in os.listdir(out_path):
        if not name.startswith("part_id="):
            continue
        pid = int(name.split("=", 1)[1])
        if pid not in finished:
            shutil.rmtree(os.path.join(out_path, name), ignore_errors=True)


_DRIVER_STAT_FILES_MAX = int(os.environ.get("PDFX_DRIVER_STAT_FILES_MAX", "256"))


def _aggregate_partition_stats(out_path: str, part_ids: Sequence[int]) -> List[dict]:
    """Per-partition counters: a task per output file reads ONLY the
    metric columns (pruned) and emits one partial-sum row; partials
    combine driver-side (≤ wave_size rows — trivially small)."""
    items = []
    for p in part_ids:
        d = os.path.join(out_path, f"part_id={p}")
        if os.path.isdir(d):
            for f in sorted(os.listdir(d)):
                if f.endswith(".parquet"):
                    items.append({"part_id": p, "file": os.path.join(d, f)})
    if not items:
        return []

    if len(items) <= _DRIVER_STAT_FILES_MAX:
        # driver-side thread pool: pruned per-file stats are ~1 ms each
        # locally (parquet reads release the GIL); spinning a Ray
        # execution for a handful of files costs more than the work.
        # The cutoff is low (256) because on a real cluster the driver
        # reads these over object storage, not a local disk — beyond a
        # few hundred files the distributed path below wins (VERDICT
        # r3 #6); PDFX_DRIVER_STAT_FILES_MAX overrides for tuning.
        from concurrent.futures import ThreadPoolExecutor

        import pyarrow.parquet as pq

        def one(item):
            t = pq.read_table(item["file"], columns=["n_records", "n_chars", "status"])
            return (
                item["part_id"],
                t.num_rows,
                pc.sum(t.column("n_records")).as_py() or 0,
                pc.sum(t.column("n_chars")).as_py() or 0,
                pc.sum(pc.cast(pc.equal(t.column("status"), "error"), pa.int64())).as_py() or 0,
            )

        with ThreadPoolExecutor(max_workers=8) as ex:
            rows = list(ex.map(one, items))
        by_pid: Dict[int, dict] = {}
        for pid, docs, recs, chars, errs in rows:
            agg = by_pid.setdefault(
                pid,
                {"part_id": pid, "count()": 0, "sum(n_records)": 0, "sum(n_chars)": 0, "sum(is_error)": 0},
            )
            agg["count()"] += docs
            agg["sum(n_records)"] += recs
            agg["sum(n_chars)"] += chars
            agg["sum(is_error)"] += errs
        return list(by_pid.values())

    def stats_of(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        pids, docs, recs, chars, errs = [], [], [], [], []
        for pid, f in zip(batch.column("part_id").to_pylist(), batch.column("file").to_pylist()):
            t = pq.read_table(f, columns=["n_records", "n_chars", "status"])
            pids.append(pid)
            docs.append(t.num_rows)
            recs.append(pc.sum(t.column("n_records")).as_py() or 0)
            chars.append(pc.sum(t.column("n_chars")).as_py() or 0)
            errs.append(pc.sum(pc.cast(pc.equal(t.column("status"), "error"), pa.int64())).as_py() or 0)
        return pa.Table.from_arrays(
            [
                pa.array(pids, pa.int64()),
                pa.array(docs, pa.int64()),
                pa.array(recs, pa.int64()),
                pa.array(chars, pa.int64()),
                pa.array(errs, pa.int64()),
            ],
            names=["part_id", "docs", "records", "chars", "errors"],
        )

    partials = (
        ray.data.from_items(items)
        .map_batches(stats_of, batch_format="pyarrow", batch_size=8)
        .take_all()
    )
    by_pid: Dict[int, dict] = {}
    for r in partials:
        agg = by_pid.setdefault(
            r["part_id"],
            {"part_id": r["part_id"], "count()": 0, "sum(n_records)": 0, "sum(n_chars)": 0, "sum(is_error)": 0},
        )
        agg["count()"] += r["docs"]
        agg["sum(n_records)"] += r["records"]
        agg["sum(n_chars)"] += r["chars"]
        agg["sum(is_error)"] += r["errors"]
    return list(by_pid.values())


def write_lineage(
    out_path: str,
    part_ids: Sequence[int],
    shard_of: Optional[Dict[int, str]] = None,
    run_seconds: Optional[float] = None,
    fingerprint_of: Optional[Dict[int, str]] = None,
) -> dict:
    """Persist one lineage record per finished partition (north rule:
    per-partition lineage + metrics)."""
    stats = _aggregate_partition_stats(out_path, part_ids)
    # a shard with zero output rows produces no partition dir; it is
    # still FINISHED — record it, or resume would redo it forever
    seen = {int(r["part_id"]) for r in stats}
    for pid in part_ids:
        if pid not in seen:
            stats.append(
                {"part_id": pid, "count()": 0, "sum(n_records)": 0, "sum(n_chars)": 0, "sum(is_error)": 0}
            )
    os.makedirs(os.path.join(out_path, LINEAGE_DIR), exist_ok=True)
    finished_at = time.time()
    totals = {"docs": 0, "records": 0, "chars": 0, "errors": 0, "partitions": len(stats)}
    for row in stats:
        pid = int(row["part_id"])
        rec = {
            "part_id": pid,
            "input_shard": (shard_of or {}).get(pid),
            "input_fingerprint": (fingerprint_of or {}).get(pid),
            "docs": int(row["count()"]),
            "records": int(row["sum(n_records)"]),
            "chars": int(row["sum(n_chars)"]),
            "parse_failures": int(row["sum(is_error)"]),
            "finished_at": finished_at,
            "run_seconds": run_seconds,
        }
        with open(lineage_path(out_path, pid), "w") as f:
            json.dump(rec, f)
        totals["docs"] += rec["docs"]
        totals["records"] += rec["records"]
        totals["chars"] += rec["chars"]
        totals["errors"] += rec["parse_failures"]
    return totals


def run_extraction(
    input_path: str,
    out_path: str,
    *,
    batch_size: int = DEFAULT_BATCH_SIZE,
    concurrency=None,
    resume: bool = True,
    wave_size: int = DEFAULT_WAVE_SIZE,
    num_partitions: Optional[int] = None,  # kept for API compat; unused
) -> dict:
    """End-to-end extraction job with shard-aligned resumable output.

    Returns lineage totals. Re-running after an interruption never
    re-reads finished shards; redo-work is bounded by one wave.
    """
    t0 = time.time()
    shards = list_shards(input_path)
    shard_of = {shard_part_id(p): os.path.basename(p) for p in shards}
    fp_of = _fingerprints(shards)

    finished = finished_partitions(out_path) if resume else set()
    re_extracted, dropped = [], []
    if resume:
        # incremental delta detection: a FINISHED shard stays skipped
        # only while its recorded input fingerprint still matches the
        # input file — a re-crawled/rewritten shard is re-extracted, a
        # disappeared shard's output is dropped, so the output mirrors
        # the CURRENT input, not the input of the first run. Lineage
        # records predating fingerprints (None) are trusted as-is.
        for pid in sorted(finished):
            try:
                with open(lineage_path(out_path, pid)) as f:
                    rec = json.load(f)
                prev_fp = rec.get("input_fingerprint")
            except (OSError, json.JSONDecodeError):
                prev_fp = None
            stale = pid not in shard_of
            changed = (
                not stale and prev_fp is not None and prev_fp != fp_of.get(pid)
            )
            if stale or changed:
                shutil.rmtree(
                    os.path.join(out_path, f"part_id={pid}"), ignore_errors=True
                )
                try:
                    os.remove(lineage_path(out_path, pid))
                except OSError:
                    pass
                finished.discard(pid)
                (dropped if stale else re_extracted).append(pid)
        clear_unfinished_partitions(out_path, finished)
    elif os.path.isdir(out_path):
        shutil.rmtree(out_path, ignore_errors=True)

    todo = [p for p in shards if shard_part_id(p) not in finished]
    totals = {"docs": 0, "records": 0, "chars": 0, "errors": 0, "partitions": len(finished)}
    totals["re_extracted"] = re_extracted
    totals["dropped_stale"] = dropped
    if not todo:
        totals["skipped"] = True
        totals["resumed_skipping"] = sorted(finished)
        return totals

    for w in range(0, len(todo), wave_size):
        wave = todo[w : w + wave_size]
        ds = read_pages(wave, include_paths=True)
        extracted = build_extracted_dataset(
            ds, batch_size=batch_size, concurrency=concurrency
        )
        # zstd: measured both faster to encode and ~20% smaller than the
        # snappy default on this nested schema
        extracted.write_parquet(out_path, partition_cols=["part_id"], compression="zstd")
        wave_parts = [shard_part_id(p) for p in wave]
        sub = write_lineage(
            out_path,
            wave_parts,
            shard_of,
            run_seconds=time.time() - t0,
            fingerprint_of=fp_of,
        )
        for k in ("docs", "records", "chars", "errors", "partitions"):
            totals[k] += sub[k]

    totals["resumed_skipping"] = sorted(finished)
    totals["run_seconds"] = time.time() - t0
    return totals


# ---------------------------------------------------------------------------
# records explosion (flat records table ≈ the reference's final CSV rows)


def explode_records(extracted: "ray.data.Dataset") -> "ray.data.Dataset":
    def explode(batch: pa.Table) -> pa.Table:
        from pdf_table_extractor_ray.schemas import RECORDS_SCHEMA

        rec = batch.column("records").combine_chunks()
        if isinstance(rec, pa.ChunkedArray):
            rec = rec.combine_chunks()
        flat = rec.flatten()  # StructArray of all records
        counts = pc.list_value_length(rec).to_numpy(zero_copy_only=False)
        import numpy as np

        urls = pa.array(
            np.repeat(batch.column("url").to_numpy(zero_copy_only=False), counts), pa.string()
        )
        idx = pa.array(
            np.concatenate([np.arange(c) for c in counts]) if len(counts) else np.array([], np.int64),
            pa.int64(),
        )
        return pa.Table.from_arrays(
            [
                urls,
                idx,
                flat.field("date"),
                flat.field("description"),
                flat.field("amount"),
                flat.field("doc"),
            ],
            schema=RECORDS_SCHEMA,
        )

    return extracted.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
