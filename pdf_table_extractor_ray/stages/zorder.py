"""Z-order (Morton) layout keys — multi-dimensional data clustering.

A table range-partitioned on ONE column answers filters on that column
with partition pruning and nothing else; web-scale fact tables get
filtered on several (date AND customer, host AND language). The
lakehouse answer (Delta/Iceberg `OPTIMIZE ZORDER BY`) is a
space-filling curve: quantize each dimension to a few bits, interleave
the bits into one Morton key, and range-partition on that key — rows
close in EVERY dimension land in few partitions, so a filter on any
participating column prunes ~√-ish of the data instead of none.

Everything here is vectorized bit arithmetic on int64 (no per-row
Python): quantization via integer scaling against broadcast (min, max)
bounds, interleave via the classic parallel-prefix bit spreading.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _spread_bits(x: np.ndarray, nbits: int) -> np.ndarray:
    """Spread the low ``nbits`` of each uint64 so bit i moves to
    position 2i (parallel-prefix masks, supports nbits ≤ 32)."""
    x = x.astype(np.uint64) & np.uint64((1 << nbits) - 1)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def morton_interleave(a: np.ndarray, b: np.ndarray, nbits: int) -> np.ndarray:
    """Interleave two ``nbits``-quantized uint64 arrays into one Morton
    key: bit i of ``a`` → bit 2i, bit i of ``b`` → bit 2i+1."""
    return _spread_bits(a, nbits) | (_spread_bits(b, nbits) << np.uint64(1))


def quantize(v: np.ndarray, lo: float, hi: float, nbits: int) -> np.ndarray:
    """Scale float64 values into [0, 2^nbits) integer cells (values at
    ``hi`` clamp into the top cell; degenerate lo == hi → cell 0)."""
    cells = 1 << nbits
    if hi <= lo:
        return np.zeros(len(v), np.uint64)
    q = ((v - lo) / (hi - lo) * cells).astype(np.int64)
    return np.clip(q, 0, cells - 1).astype(np.uint64)


def zorder_partition_stats(
    ds: "ray.data.Dataset",
    col_a: str,
    col_b: str,
    nbits: int = 8,
    n_parts: int = 16,
) -> "ray.data.Dataset":
    """The Z-order layout CERTIFICATE: quantize (col_a, col_b) to
    ``nbits`` each against global (min, max) bounds (one slim
    aggregate pass), interleave into a Morton key, split the key space
    into ``n_parts`` equal ranges, and report per partition: row
    count, distinct a-cells and distinct b-cells touched.

    Low per-partition cell-spans in BOTH dimensions are exactly what
    makes a filter on EITHER column prune partitions — compare with a
    single-column sort, whose partitions span the full range of the
    other column. Two streaming passes (bounds, then stats); only
    (partition, cell) pairs shuffle."""
    from ray.data.aggregate import Max, Min

    def nums(b: pa.Table) -> pa.Table:
        def as_f64(col):
            # timestamps/dates have no direct cast to double: go via int64
            if pa.types.is_temporal(col.type):
                col = pc.cast(col, pa.int64())
            return pc.cast(col, pa.float64())

        return pa.table(
            {"a": as_f64(b.column(col_a)), "b": as_f64(b.column(col_b))}
        )

    slim = ds.map_batches(nums, batch_format="pyarrow", zero_copy_batch=True)
    bounds = slim.aggregate(Min("a"), Max("a"), Min("b"), Max("b"))
    a_lo, a_hi = float(bounds["min(a)"]), float(bounds["max(a)"])
    b_lo, b_hi = float(bounds["min(b)"]), float(bounds["max(b)"])
    # Morton keys fill [0, 2^(2·nbits)); equal key ranges per partition
    part_width = (1 << (2 * nbits)) // n_parts + 1

    def stats(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        qa = quantize(a, a_lo, a_hi, nbits)
        qb = quantize(b, b_lo, b_hi, nbits)
        z = morton_interleave(qa, qb, nbits)
        part = (z // np.uint64(part_width)).astype(np.int64)
        # per (partition, a-cell) and (partition, b-cell) presence +
        # per-partition counts, combined in one slim partial table
        pa_keys, pa_cnt = np.unique(part * (1 << nbits) + qa.astype(np.int64), return_counts=True)
        pb_keys = np.unique(part * (1 << nbits) + qb.astype(np.int64))
        return pa.table(
            {
                "kind": pa.array(
                    np.concatenate(
                        [np.zeros(len(pa_keys), np.int8), np.ones(len(pb_keys), np.int8)]
                    )
                ),
                "key": pa.array(np.concatenate([pa_keys, pb_keys])),
                "n": pa.array(
                    np.concatenate([pa_cnt.astype(np.int64), np.zeros(len(pb_keys), np.int64)])
                ),
            }
        )

    from ray.data.aggregate import Sum

    merged = (
        slim.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["kind", "key"])
        .aggregate(Sum("n"))
    )

    def finish(b: pa.Table) -> pa.Table:
        kind = b.column("kind").to_numpy(zero_copy_only=False)
        key = b.column("key").to_numpy(zero_copy_only=False)
        n = pc.cast(b.column("sum(n)"), pa.int64()).to_numpy(zero_copy_only=False)
        part = key >> nbits
        # partial per block; final per-partition groupby below merges
        parts, inv = np.unique(part, return_inverse=True)
        rows = np.zeros(len(parts), np.int64)
        a_cells = np.zeros(len(parts), np.int64)
        b_cells = np.zeros(len(parts), np.int64)
        np.add.at(rows, inv, np.where(kind == 0, n, 0))
        np.add.at(a_cells, inv, (kind == 0).astype(np.int64))
        np.add.at(b_cells, inv, (kind == 1).astype(np.int64))
        return pa.table(
            {
                "part": pa.array(parts),
                "n_rows": pa.array(rows),
                "a_cells": pa.array(a_cells),
                "b_cells": pa.array(b_cells),
            }
        )

    final = (
        merged.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .aggregate(Sum("n_rows"), Sum("a_cells"), Sum("b_cells"))
    )
    return final.map_batches(
        lambda b: pa.Table.from_arrays(
            [
                b.column("part"),
                pc.cast(b.column("sum(n_rows)"), pa.int64()),
                pc.cast(b.column("sum(a_cells)"), pa.int64()),
                pc.cast(b.column("sum(b_cells)"), pa.int64()),
            ],
            names=["part", "n_rows", "a_cells", "b_cells"],
        ),
        batch_format="pyarrow",
    )
