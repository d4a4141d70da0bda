"""Flagship extraction pipeline (SURVEY §7.1 step 2, scaled out).

    read_parquet(pages, columns pruned)
      → map_batches(add keys: part_id, size_class)       [stateless tasks]
      → map_batches(WarmExtractor, actor pool)           [stateful, warm]
      → write_parquet(out, partition_cols=["part_id"])   [resume unit]
      → per-partition lineage records + counters

Streaming end-to-end: no stage materializes the corpus; the object
store provides backpressure. Failure rows ride in-band
(status/error columns) and never fail the job.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from functools import partial
from typing import Optional, Set

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from pdf_table_extractor_ray.pipelines.keys import (
    DEFAULT_NUM_PARTITIONS,
    add_keys_batch,
)
from pdf_table_extractor_ray.stages.warm_parser import WarmExtractor

LINEAGE_DIR = "_lineage"

# batch sizes tuned so (batch × payload × concurrency) stays well inside a
# worker heap: median fixture payloads are KB-scale, large ones ~1-3 MB
# (SURVEY §4.2); 32 docs/batch bounds a worst-case all-large batch at
# ~100 MB while keeping per-task overhead amortized.
DEFAULT_BATCH_SIZE = 32


def _add_keys_and_skip(
    batch: pa.Table,
    num_partitions: int,
    finished: frozenset,
) -> pa.Table:
    out = add_keys_batch(batch, num_partitions)
    if finished:
        mask = pc.invert(
            pc.is_in(out.column("part_id"), value_set=pa.array(sorted(finished), pa.int32()))
        )
        out = out.filter(mask)
    return out


def build_extracted_dataset(
    ds: "ray.data.Dataset",
    *,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    batch_size: int = DEFAULT_BATCH_SIZE,
    concurrency=None,
    finished: Optional[Set[int]] = None,
    strategy_key: Optional[str] = None,
) -> "ray.data.Dataset":
    """Lazy extraction plan over a pages Dataset (url/html/text [+...])."""
    if concurrency is None:
        # autoscaling actor pool sized to the cluster: 1 CPU per parser
        # actor (SURVEY §4.2)
        import ray

        n_cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        concurrency = (1, max(2, n_cpus))
    keyed = ds.map_batches(
        partial(
            _add_keys_and_skip,
            num_partitions=num_partitions,
            finished=frozenset(finished or ()),
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return keyed.map_batches(
        WarmExtractor,
        fn_constructor_kwargs={"strategy_key": strategy_key},
        batch_size=batch_size,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        num_cpus=1,
    )


def read_pages(input_path: str, columns=("url", "html", "text")) -> "ray.data.Dataset":
    """Column-pruned scan: only the payload columns leave storage
    (warc_ts/lang stay behind unless asked for)."""
    return ray.data.read_parquet(input_path, columns=list(columns))


# ---------------------------------------------------------------------------
# lineage + resume


def lineage_path(out_path: str, part_id: int) -> str:
    return os.path.join(out_path, LINEAGE_DIR, f"part_id={part_id}.json")


def finished_partitions(out_path: str) -> Set[int]:
    d = os.path.join(out_path, LINEAGE_DIR)
    if not os.path.isdir(d):
        return set()
    out = set()
    for name in os.listdir(d):
        if name.startswith("part_id=") and name.endswith(".json"):
            out.add(int(name[len("part_id="): -len(".json")]))
    return out


def clear_unfinished_partitions(out_path: str, finished: Set[int]) -> None:
    """Idempotent-resume guarantee: partition dirs without a lineage
    record are partial output of an interrupted run — drop them before
    re-extracting those partitions."""
    if not os.path.isdir(out_path):
        return
    for name in os.listdir(out_path):
        if not name.startswith("part_id="):
            continue
        pid = int(name.split("=", 1)[1])
        if pid not in finished:
            shutil.rmtree(os.path.join(out_path, name), ignore_errors=True)


def write_lineage(out_path: str, run_seconds: Optional[float] = None) -> dict:
    """Aggregate per-partition counters from the written output and
    persist one lineage record per partition (north rule: per-partition
    lineage + metrics). Reads only the metric columns back."""
    from ray.data.aggregate import Count, Sum

    ds = ray.data.read_parquet(out_path, columns=["part_id", "n_records", "n_chars", "status"])

    def add_err(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "is_error",
            pc.cast(pc.equal(batch.column("status"), "error"), pa.int64()),
        )

    stats = (
        ds.map_batches(add_err, batch_format="pyarrow")
        .groupby("part_id")
        .aggregate(Count(), Sum("n_records"), Sum("n_chars"), Sum("is_error"))
    ).take_all()  # small: one row per partition

    os.makedirs(os.path.join(out_path, LINEAGE_DIR), exist_ok=True)
    finished_at = time.time()
    totals = {"docs": 0, "records": 0, "chars": 0, "errors": 0, "partitions": len(stats)}
    for row in stats:
        pid = int(row["part_id"])
        rec = {
            "part_id": pid,
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
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    batch_size: int = DEFAULT_BATCH_SIZE,
    concurrency=None,
    resume: bool = True,
) -> dict:
    """End-to-end extraction job with resumable partitioned output.

    Returns lineage totals. Re-running after an interruption skips
    partitions whose lineage record exists and redoes the rest.
    """
    t0 = time.time()
    finished = finished_partitions(out_path) if resume else set()
    if resume:
        clear_unfinished_partitions(out_path, finished)
    elif os.path.isdir(out_path):
        shutil.rmtree(out_path, ignore_errors=True)

    if len(finished) == num_partitions:
        return {"skipped": True, "partitions": num_partitions}

    ds = read_pages(input_path)
    extracted = build_extracted_dataset(
        ds,
        num_partitions=num_partitions,
        batch_size=batch_size,
        concurrency=concurrency,
        finished=finished,
    )
    extracted.write_parquet(out_path, partition_cols=["part_id"])
    totals = write_lineage(out_path, run_seconds=time.time() - t0)
    totals["resumed_skipping"] = sorted(finished)
    return totals


# ---------------------------------------------------------------------------
# records explosion (flat records table ≈ the reference's final CSV rows)


def explode_records(extracted: "ray.data.Dataset") -> "ray.data.Dataset":
    def explode(batch: pa.Table) -> pa.Table:
        urls, idxs, dates, descs, amounts, docs = [], [], [], [], [], []
        rec_col = batch.column("records").to_pylist()
        url_col = batch.column("url").to_pylist()
        for url, recs in zip(url_col, rec_col):
            for i, r in enumerate(recs or ()):
                urls.append(url)
                idxs.append(i)
                dates.append(r["date"])
                descs.append(r["description"])
                amounts.append(r["amount"])
                docs.append(r["doc"])
        from pdf_table_extractor_ray.schemas import RECORDS_SCHEMA

        return pa.Table.from_arrays(
            [
                pa.array(urls, pa.string()),
                pa.array(idxs, pa.int64()),
                pa.array(dates, pa.string()),
                pa.array(descs, pa.string()),
                pa.array(amounts, pa.float64()),
                pa.array(docs, pa.string()),
            ],
            schema=RECORDS_SCHEMA,
        )

    return extracted.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
