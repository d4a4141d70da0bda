"""Ordered string aggregation — SQL ``string_agg(DISTINCT v, sep
ORDER BY v)`` / ordered ``collect_list`` — a grouped aggregate whose
RESULT depends on within-group order, which Ray Data's aggregate API
cannot express (aggregates are unordered fold/combine).

The reference has no collect operator (its per-document record lists
are assembled inside one converter call, e.g. conversor_bbmod1.py:108);
this is engine-only inventory for corpus reporting (per-source language
manifests, per-cluster member listings).

Shape: a map-side distinct (key, value) combiner collapses each batch
before anything moves, ONE groupby((key, value)) folds cross-batch
duplicates on the bounded pair axis, then ONE shuffle by key-HASH
BUCKET (fixed ``n_buckets`` groups whatever the key count — the
``sessionize`` pattern) where each bucket Arrow-sorts its pairs and
emits the per-key joins via ``ListArray`` offsets +
``pc.binary_join`` — no per-key Python anywhere.

Contract: the DISTINCT value set per key must be join-able (the output
row for a key is O(values-per-key) bytes); the pair table is bounded
by Σ|distinct values per key|, not by input rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def collect_sorted_distinct(
    ds: "ray.data.Dataset",
    key_col: str,
    value_col: str,
    sep: str = ",",
    out_col: str = "values",
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """Per ``key_col``: the DISTINCT non-null ``value_col`` strings in
    ascending order, joined with ``sep``. Output: (key_col, out_col,
    n_values). Null keys are excluded (SQL GROUP BY semantics keep a
    null group; DuckDB string_agg skips null values — we match the
    common reporting use and drop both)."""
    from ray.data.aggregate import Count

    from pdf_table_extractor_ray.stages.sketches import _hash64_column

    def distinct_pairs(b: pa.Table) -> pa.Table:
        t = pa.table({key_col: b.column(key_col), value_col: b.column(value_col)})
        t = t.filter(
            pc.and_(pc.is_valid(t.column(key_col)), pc.is_valid(t.column(value_col)))
        )
        return (
            pa.TableGroupBy(t, [key_col, value_col])
            .aggregate([])
        )

    pairs = (
        ds.map_batches(distinct_pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([key_col, value_col])
        .aggregate(Count())
    )

    def bucketize(b: pa.Table) -> pa.Table:
        h = _hash64_column(b.column(key_col))
        return pa.table(
            {
                key_col: b.column(key_col),
                value_col: b.column(value_col),
                "bucket": pa.array(
                    (h % np.uint64(n_buckets)).astype(np.int64), pa.int64()
                ),
            }
        )

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    key_col: pa.array([], g.schema.field(key_col).type),
                    out_col: pa.array([], pa.string()),
                    "n_values": pa.array([], pa.int64()),
                }
            )
        idx = pc.sort_indices(
            g, sort_keys=[(key_col, "ascending"), (value_col, "ascending")]
        )
        s = g.take(idx)
        keys = s.column(key_col).combine_chunks()
        vals = pc.cast(s.column(value_col), pa.string()).combine_chunks()
        n = len(keys)
        # run heads: key change marks a new group
        same = pc.equal(keys.slice(1, n - 1), keys.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        first = np.empty(n, bool)
        first[0] = True
        first[1:] = ~same
        starts = np.flatnonzero(first)
        offsets = np.append(starts, n).astype(np.int32)
        lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), vals)
        joined = pc.binary_join(lists, sep)
        return pa.table(
            {
                key_col: keys.take(pa.array(starts, pa.int64())),
                out_col: joined,
                "n_values": pa.array(np.diff(offsets).astype(np.int64), pa.int64()),
            }
        )

    return (
        pairs.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def collect_ranked(
    pairs: "ray.data.Dataset",
    key_col: str,
    value_col: str,
    weight_col: str,
    sep: str = ",",
    out_col: str = "values",
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """Rank-ordered string aggregation over an ALREADY-REDUCED
    (key, value, weight) table: per key, join the values ordered by
    (weight DESC, value ASC) — ``string_agg(v, sep ORDER BY w DESC,
    v)``. The caller owns the reduction (typically a pair-count
    groupby), so the input is bounded by the distinct-pair axis; this
    stage adds ONE key-hash bucket shuffle and the same
    ListArray + binary_join emit as ``collect_sorted_distinct``.
    Output: (key_col, out_col, n_values)."""
    from pdf_table_extractor_ray.stages.sketches import _hash64_column

    def bucketize(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(b.column(key_col)), pc.is_valid(b.column(value_col)))
        f = b.filter(m)
        h = _hash64_column(f.column(key_col))
        return pa.table(
            {
                key_col: f.column(key_col),
                value_col: f.column(value_col),
                weight_col: f.column(weight_col),
                "bucket": pa.array(
                    (h % np.uint64(n_buckets)).astype(np.int64), pa.int64()
                ),
            }
        )

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    key_col: pa.array([], g.schema.field(key_col).type),
                    out_col: pa.array([], pa.string()),
                    "n_values": pa.array([], pa.int64()),
                }
            )
        idx = pc.sort_indices(
            g,
            sort_keys=[
                (key_col, "ascending"),
                (weight_col, "descending"),
                (value_col, "ascending"),
            ],
        )
        s = g.take(idx)
        keys = s.column(key_col).combine_chunks()
        vals = pc.cast(s.column(value_col), pa.string()).combine_chunks()
        n = len(keys)
        same = pc.equal(keys.slice(1, n - 1), keys.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        first = np.empty(n, bool)
        first[0] = True
        first[1:] = ~same
        starts = np.flatnonzero(first)
        offsets = np.append(starts, n).astype(np.int32)
        lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), vals)
        return pa.table(
            {
                key_col: keys.take(pa.array(starts, pa.int64())),
                out_col: pc.binary_join(lists, sep),
                "n_values": pa.array(np.diff(offsets).astype(np.int64), pa.int64()),
            }
        )

    return (
        pairs.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
