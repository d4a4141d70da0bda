"""Storage-bucketed (SMB-style) co-located join — shuffle-free joins
over pre-bucketed Parquet layouts.

At 100 TB the dominant cost of a fact x fact join is the all-to-all
exchange. Hive/Spark bucketing and Iceberg bucket transforms amortize
it: pay ONE layout shuffle when the table is written (rows routed to
``hash(key) % B`` bucket directories), then every subsequent join on
that key is embarrassingly parallel — task *i* reads bucket *i* from
BOTH sides and joins locally, zero data movement between tasks. This
module provides both halves:

- :func:`write_bucketed` — the layout writer, a streaming Ray pipeline
  (``map_batches`` bucket stamp -> ``write_parquet(partition_cols=
  ["bucket"])``); the one-time co-locating exchange.
- :func:`bucketed_join` — the shuffle-free join: a Dataset of bucket
  ids fans out one task per bucket; each task reads its bucket's files
  from both layouts and joins them with Arrow's native hash join. No
  ``groupby``, no ``repartition``, no Ray shuffle anywhere in the plan.

Both sides MUST be bucketed with the same ``n_buckets`` and the same
hash (enforced via a tiny ``_BUCKETS`` manifest written next to the
data; the join refuses mismatched layouts — a silent mismatch would
drop matches, not error). Null join keys are routed to bucket 0 at
write time and never match (inner-join semantics, same as SQL).

Skew caveat (documented contract): buckets are hash-balanced over
KEYS, not rows — one pathological hot key still lands in one bucket
and bounds that task's memory. Choose ``n_buckets`` so the largest
expected bucket (rows/B x skew factor) fits a worker heap; hot-key
salting is deliberately NOT applied because the layout must stay
consistent across tables.

The reference has no join surface at all (SURVEY §2.6 T5 is a
broadcast of header info, conversor_itau.py:119-123); this extends the
engine's join family (``stages/joins.py``) with the layout-aware
strategy the other two (broadcast, hash-shuffle) can't provide.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

_MANIFEST = "_BUCKETS"

# splitmix64 finalizer — avalanching int64 -> uint64 mix so sequential
# keys (orderkeys are dense) spread uniformly over buckets.
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)


def bucket_of(keys: np.ndarray, n_buckets: int) -> np.ndarray:
    """Vectorized splitmix64 bucket id for an int64 key array."""
    with np.errstate(over="ignore"):
        z = keys.astype(np.int64).view(np.uint64).copy()
        z ^= z >> np.uint64(30)
        z *= _MIX1
        z ^= z >> np.uint64(27)
        z *= _MIX2
        z ^= z >> np.uint64(31)
    return (z % np.uint64(n_buckets)).astype(np.int64)


def write_bucketed(
    ds: "ray.data.Dataset",
    key: str,
    n_buckets: int,
    out_dir: str,
) -> str:
    """Write ``ds`` as a bucketed Parquet layout under ``out_dir``.

    Streaming: one vectorized bucket-stamp ``map_batches`` then Ray's
    partitioned parquet writer (``partition_cols=["bucket"]``) — the
    write-side exchange is Ray's normal block routing, and each bucket
    becomes a ``bucket=i/`` directory. A ``_BUCKETS`` manifest records
    (key, n_buckets) so joins can verify layout compatibility.
    """

    def stamp(b: pa.Table) -> pa.Table:
        col = b.column(key)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        keys = col.cast(pa.int64()).to_numpy(zero_copy_only=False)
        bk = bucket_of(keys, n_buckets)
        if col.null_count:
            bk[~pc.is_valid(col).to_numpy(zero_copy_only=False)] = 0
        return b.append_column("bucket", pa.array(bk, pa.int64()))

    os.makedirs(out_dir, exist_ok=True)
    ds.map_batches(stamp, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["bucket"]
    )
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump({"key": key, "n_buckets": int(n_buckets)}, f)
    return out_dir


def _read_manifest(d: str) -> dict:
    with open(os.path.join(d, _MANIFEST)) as f:
        return json.load(f)


def _bucket_files(d: str, bucket: int) -> List[str]:
    bd = os.path.join(d, f"bucket={bucket}")
    if not os.path.isdir(bd):
        return []
    return sorted(
        os.path.join(bd, p) for p in os.listdir(bd) if p.endswith(".parquet")
    )


def bucketed_join(
    left_dir: str,
    right_dir: str,
    left_key: str,
    right_key: str,
    left_cols: Optional[List[str]] = None,
    right_cols: Optional[List[str]] = None,
) -> "ray.data.Dataset":
    """Inner-join two bucketed layouts with ZERO shuffle.

    One task per bucket: read ``bucket=i`` files from both layouts
    (column-pruned), join with ``pa.Table.join`` (Arrow's native hash
    join — no Python row loop). Returns the joined Dataset; downstream
    stages stream normally. Raises if the layouts' manifests disagree
    on bucket count (keys may differ in NAME across tables; the hash is
    over values, so equal values co-locate regardless of column name).
    """
    lm, rm = _read_manifest(left_dir), _read_manifest(right_dir)
    if lm["n_buckets"] != rm["n_buckets"]:
        raise ValueError(
            f"bucket layout mismatch: {lm['n_buckets']} vs {rm['n_buckets']}"
        )
    n_buckets = lm["n_buckets"]
    lcols = list(dict.fromkeys([left_key] + (left_cols or [])))
    rcols = list(dict.fromkeys([right_key] + (right_cols or [])))

    # Empty-output template (driver-side, zero data rows): keeps every
    # task's output schema identical even for buckets one side lacks.
    def _any_schema(d: str, cols: List[str]) -> pa.Table:
        for i in range(n_buckets):
            fs = _bucket_files(d, i)
            if fs:
                return pq.read_table(fs[0], columns=cols).slice(0, 0)
        raise FileNotFoundError(f"no bucket files under {d}")

    empty = _any_schema(left_dir, lcols).join(
        _any_schema(right_dir, rcols),
        keys=[left_key],
        right_keys=[right_key],
        join_type="inner",
    )

    def join_bucket(b: pa.Table) -> pa.Table:
        out = []
        for bk in b.column("bucket").to_pylist():
            lf = _bucket_files(left_dir, bk)
            rf = _bucket_files(right_dir, bk)
            if not lf or not rf:
                continue
            lt = pa.concat_tables(pq.read_table(p, columns=lcols) for p in lf)
            rt = pa.concat_tables(pq.read_table(p, columns=rcols) for p in rf)
            out.append(
                lt.join(
                    rt,
                    keys=[left_key],
                    right_keys=[right_key],
                    join_type="inner",
                )
            )
        if not out:
            return empty
        return pa.concat_tables(out, promote_options="default")

    ids = ray.data.from_items([{"bucket": i} for i in range(n_buckets)])
    return ids.map_batches(join_bucket, batch_size=1, batch_format="pyarrow")
