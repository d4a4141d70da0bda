"""Distinct set operations (INTERSECT / EXCEPT) and ROLLUP
aggregation — the relational set surface the reference lacks
(SURVEY.md §2.6 "absent in the reference" list), expressed as single
keyed shuffles.

Set ops: tag each side with presence indicators, union the slim
(key-columns + two int8 flags) projections, and resolve membership
with ONE ``groupby(keys).aggregate(Max(in_a), Max(in_b))`` — the same
shuffle cost as a distinct, never a join. NULL keys compare equal
(one null group), matching SQL set-operation semantics (IS NOT
DISTINCT FROM), unlike join ON clauses.

Rollup: pre-reduce to the finest (level₁…levelₙ, measure-sum) table
ONCE (the only corpus-sized shuffle), materialize that small base,
then derive every coarser level by re-aggregating the base —
O(|distinct key combos|) work per level, not another corpus pass.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Max, Sum


def _fill_value(t: pa.DataType):
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return pa.scalar("", t)
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return pa.scalar(b"", t)
    if pa.types.is_boolean(t):
        return pa.scalar(False, t)
    return pa.scalar(0, t)  # ints / floats / timestamps (epoch)


def _tagged(
    ds: "ray.data.Dataset", cols: Sequence[str], a: int, b: int, types: dict
) -> "ray.data.Dataset":
    """Project to (null-encoded keys, presence flags). Keys are cast
    to the dataset-unified type (an all-null block types as `null`),
    then nulls are encoded as (valid-flag=0, type-default fill) so the
    groupby shuffle never sorts raw nulls (Ray's sort chokes on
    None-vs-value blocks) and so NULL = NULL, per SQL set-op
    semantics."""

    def tag(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        out = {}
        for c in cols:
            col = pc.cast(batch.column(c), types[c])
            out[f"_nn_{c}"] = pc.cast(pc.is_valid(col), pa.int8())
            out[c] = pc.fill_null(col, _fill_value(col.type))
        out["_in_a"] = pa.array(np.full(n, a, np.int8))
        out["_in_b"] = pa.array(np.full(n, b, np.int8))
        return pa.table(out)

    return ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)


def _membership(
    a: "ray.data.Dataset", b: "ray.data.Dataset", cols: Sequence[str], types: dict
) -> "ray.data.Dataset":
    both = _tagged(a, cols, 1, 0, types).union(_tagged(b, cols, 0, 1, types))
    keys = [f"_nn_{c}" for c in cols] + list(cols)
    return both.groupby(keys).aggregate(Max("_in_a"), Max("_in_b"))


def _keep(
    mem: "ray.data.Dataset",
    cols: Sequence[str],
    need_a: int,
    need_b: int,
    types: dict,
):
    def f(batch: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.equal(batch.column("max(_in_a)"), need_a),
            pc.equal(batch.column("max(_in_b)"), need_b),
        )
        kept = batch.filter(m)
        arrays = []
        for c in cols:
            col = kept.column(c)
            # decode nulls, then restore input types (the groupby
            # shuffle may coarsen temporal units, timestamp[us] → [s])
            col = pc.if_else(
                pc.equal(kept.column(f"_nn_{c}"), 0), pa.scalar(None, col.type), col
            )
            if col.type != types[c]:
                col = pc.cast(col, types[c])
            arrays.append(col)
        return pa.Table.from_arrays(arrays, names=list(cols))

    return mem.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _col_types(ds: "ray.data.Dataset", cols: Sequence[str]) -> dict:
    sch = ds.schema().base_schema
    return {c: sch.field(c).type for c in cols}


def distinct_intersect(
    a: "ray.data.Dataset", b: "ray.data.Dataset", cols: Sequence[str]
) -> "ray.data.Dataset":
    """SQL ``SELECT DISTINCT cols FROM a INTERSECT SELECT ... FROM b``."""
    types = _col_types(a, cols)
    return _keep(_membership(a, b, cols, types), cols, 1, 1, types)


def distinct_except(
    a: "ray.data.Dataset", b: "ray.data.Dataset", cols: Sequence[str]
) -> "ray.data.Dataset":
    """SQL ``SELECT DISTINCT cols FROM a EXCEPT SELECT ... FROM b``."""
    types = _col_types(a, cols)
    return _keep(_membership(a, b, cols, types), cols, 1, 0, types)


def rollup_sum(
    ds: "ray.data.Dataset", levels: Sequence[str], measure: str
) -> "ray.data.Dataset":
    """``GROUP BY ROLLUP(levels)`` over an int64 ``measure``: one
    corpus shuffle for the finest level, then cheap re-aggregations of
    the materialized base for each coarser prefix (incl. the grand
    total). Coarser rows carry nulls in the rolled-up level columns.
    Output: (*levels, measure) with measure = the int64 sum."""
    levels = list(levels)
    agg = ds.groupby(levels).aggregate(Sum(measure)).materialize()
    raw = agg.schema().base_schema
    base_schema = pa.schema(
        [raw.field(c) for c in levels] + [pa.field(measure, pa.int64())]
    )

    def _std(b: pa.Table, present: List[str]) -> pa.Table:
        cols = []
        for f in base_schema:
            if f.name in present:
                c = b.column(f.name)
                cols.append(pc.cast(c, f.type) if c.type != f.type else c)
            elif f.name == measure:
                cols.append(pc.cast(b.column(f"sum({measure})"), pa.int64()))
            else:
                cols.append(pa.nulls(b.num_rows, f.type))
        return pa.Table.from_arrays(cols, schema=base_schema)

    # the one corpus-sized shuffle; everything coarser derives from it
    base = agg.map_batches(
        lambda b: _std(b, levels), batch_format="pyarrow"
    ).materialize()
    parts = [base]
    for i in range(len(levels) - 1, 0, -1):
        prefix = levels[:i]
        sub = base.groupby(prefix).aggregate(Sum(measure))
        parts.append(
            sub.map_batches(
                lambda b, p=tuple(prefix): _std(b, list(p)), batch_format="pyarrow"
            )
        )
    total = base.sum(measure)
    total_tbl = pa.Table.from_arrays(
        [pa.nulls(1, base_schema.field(c).type) for c in levels]
        + [pa.array([int(total or 0)], pa.int64())],
        schema=base_schema,
    )
    parts.append(ray.data.from_arrow(total_tbl))
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def grouping_sets_sum(
    ds: "ray.data.Dataset",
    levels: Sequence[str],
    measure: str,
    sets: Sequence[Sequence[str]],
) -> "ray.data.Dataset":
    """``GROUP BY GROUPING SETS(sets)`` over an int64 ``measure``.

    Same plan shape as ``rollup_sum``: ONE corpus-sized shuffle to the
    finest level (all of ``levels``), materialize that small base, then
    derive every grouping set by re-aggregating the base — each set
    costs O(|distinct level combos|), never another corpus pass. Every
    set must be a subset of ``levels``; absent columns are null in that
    set's rows (SQL GROUPING SETS semantics).
    """
    levels = list(levels)
    for s in sets:
        if not set(s) <= set(levels):
            raise ValueError(f"grouping set {s!r} not a subset of levels {levels!r}")
    agg = ds.groupby(levels).aggregate(Sum(measure)).materialize()
    raw = agg.schema().base_schema
    base_schema = pa.schema(
        [raw.field(c) for c in levels] + [pa.field(measure, pa.int64())]
    )

    def _std(b: pa.Table, present: List[str]) -> pa.Table:
        cols = []
        for f in base_schema:
            if f.name in present:
                c = b.column(f.name)
                cols.append(pc.cast(c, f.type) if c.type != f.type else c)
            elif f.name == measure:
                src = f"sum({measure})" if f"sum({measure})" in b.column_names else measure
                cols.append(pc.cast(b.column(src), pa.int64()))
            else:
                cols.append(pa.nulls(b.num_rows, f.type))
        return pa.Table.from_arrays(cols, schema=base_schema)

    base = agg.map_batches(
        lambda b: _std(b, levels), batch_format="pyarrow"
    ).materialize()
    parts = []
    for s in sets:
        s = list(s)
        if s == levels:
            parts.append(base)
        elif s:
            sub = base.groupby(s).aggregate(Sum(measure))
            parts.append(
                sub.map_batches(
                    lambda b, p=tuple(s): _std(b, list(p)), batch_format="pyarrow"
                )
            )
        else:  # () — the grand total
            total = base.sum(measure)
            total_tbl = pa.Table.from_arrays(
                [pa.nulls(1, base_schema.field(c).type) for c in levels]
                + [pa.array([int(total or 0)], pa.int64())],
                schema=base_schema,
            )
            parts.append(ray.data.from_arrow(total_tbl))
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def cube_sum(
    ds: "ray.data.Dataset", levels: Sequence[str], measure: str
) -> "ray.data.Dataset":
    """``GROUP BY CUBE(levels)``: all 2^n grouping sets (n is small by
    contract — CUBE over many columns is a modeling error, not an
    engine problem)."""
    levels = list(levels)
    sets: List[List[str]] = []
    for mask in range(1 << len(levels)):
        sets.append([c for i, c in enumerate(levels) if mask & (1 << i)])
    # deterministic order: finest first so grouping_sets_sum reuses base
    sets.sort(key=len, reverse=True)
    return grouping_sets_sum(ds, levels, measure, sets)


def merge_upsert(
    base: "ray.data.Dataset",
    updates: "ray.data.Dataset",
    key: str,
    version_col: str,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """CDC-style upsert: union ``base`` with ``updates`` (same schema)
    and keep, per ``key``, the single row with the highest
    ``version_col`` — updates win ties (the SQL
    ``row_number() OVER (PARTITION BY key ORDER BY version DESC,
    is_update DESC) = 1`` merge).

    Plan: tag each side with an int8 precedence flag, union, shuffle
    ONCE by ``hash(key) % num_buckets`` and resolve winners with a
    vectorized lexsort per bucket — groups are buckets, not keys, so
    there is no per-key Python at corpus cardinality. At 100 TB set
    ``num_buckets`` ≈ cluster cores.
    """

    def tag(flag: int):
        def f(b: pa.Table) -> pa.Table:
            return b.append_column("_upd", pa.repeat(pa.scalar(flag, pa.int8()), b.num_rows))

        return f

    u = base.map_batches(tag(0), batch_format="pyarrow", zero_copy_batch=True).union(
        updates.map_batches(tag(1), batch_format="pyarrow", zero_copy_batch=True)
    )

    def bucketize(b: pa.Table) -> pa.Table:
        from pdf_table_extractor_ray.stages.sketches import _hash64_column

        if b.column(key).null_count:
            raise ValueError(f"merge_upsert key {key!r} must be non-null")
        h = _hash64_column(b.column(key))
        return b.append_column(
            "_bkt", pa.array((h % np.uint64(num_buckets)).astype(np.int64), pa.int64())
        )

    def resolve(g: pa.Table) -> pa.Table:
        k = g.column(key).to_numpy(zero_copy_only=False)
        v = g.column(version_col).to_numpy(zero_copy_only=False)
        upd = g.column("_upd").to_numpy(zero_copy_only=False)
        order = np.lexsort((-upd, -v, k))  # per key: version desc, updates first
        sk = k[order]
        first = np.empty(len(sk), bool)
        first[0] = True
        first[1:] = sk[1:] != sk[:-1]
        keep = np.sort(order[first])
        out = g.take(pa.array(keep))
        return out.drop_columns(["_upd", "_bkt"])

    return (
        u.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_bkt")
        .map_groups(resolve, batch_format="pyarrow")
    )


def union_by_name(datasets: List["ray.data.Dataset"]) -> "ray.data.Dataset":
    """``UNION ALL BY NAME`` — concatenate datasets whose schemas
    differ in column order and presence (the schema-evolution /
    multi-vintage-shard case every long-lived corpus hits). Columns
    missing from an input surface as typed nulls; the unified column
    order is first-seen order across inputs; a column present in
    several inputs must agree on type (cast-free by contract — a
    silent cast would hide vintage drift; callers cast explicitly).

    Scale shape: schema negotiation reads ONLY metadata
    (``ds.schema()``); each input gets one fused map stage that
    appends null columns + reorders (zero-copy — Arrow column
    shuffling moves no buffers), then a plain ``union`` concatenates
    block lists without materializing anything."""
    if not datasets:
        raise ValueError("union_by_name: at least one dataset required")
    unified: dict = {}
    for ds in datasets:
        sch = ds.schema().base_schema
        for f in sch:
            if f.name in unified:
                if unified[f.name] != f.type:
                    raise TypeError(
                        f"union_by_name: column {f.name!r} has conflicting "
                        f"types {unified[f.name]} vs {f.type}"
                    )
            else:
                unified[f.name] = f.type
    names = list(unified)

    def align_fn(present: frozenset):
        def align(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = [
                batch.column(c)
                if c in present
                else pa.nulls(n, unified[c])
                for c in names
            ]
            return pa.Table.from_arrays(cols, names=names)

        return align

    aligned = [
        ds.map_batches(
            align_fn(frozenset(ds.schema().base_schema.names)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        for ds in datasets
    ]
    out = aligned[0]
    if len(aligned) > 1:
        out = out.union(*aligned[1:])
    return out
