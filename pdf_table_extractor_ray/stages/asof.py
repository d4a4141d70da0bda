"""As-of (nearest-earlier) join — a time-series primitive Ray Data
lacks natively.

Semantics: for every left row, attach the single right row with the
same key and the greatest right timestamp ≤ the left timestamp
(``direction="backward"``; ``"forward"`` = smallest ≥). Equivalent to
DuckDB ``ASOF JOIN`` — which is the query's SQL oracle.

Partitioning: both sides are tagged into one union-schema dataset and
hash-shuffled ONCE by key (`groupby(on).map_groups`); within a key
group the match is a vectorized sorted-merge (`np.searchsorted`), so
per-group cost is O(n log n) in that key's rows only. Assumption (as
for any keyed shuffle): a single key's rows fit in one task — salt
pathological keys upstream.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_SIDE = "__asof_side"
_TS = "__asof_ts"


def asof_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    right_cols: Optional[list] = None,
    right_on: Optional[str] = None,
    tolerance_us: Optional[int] = None,
) -> "ray.data.Dataset":
    """Left rows + matched right payload columns (null when no match).

    Column names must be disjoint across sides apart from the key.
    Timestamps are compared as int64 microseconds (timestamp columns
    are cast; plain ints pass through).

    ``tolerance_us`` bounds the match distance (pandas ``merge_asof``
    tolerance semantics): a backward match further than ``tolerance_us``
    BEFORE the left timestamp (resp. forward: after) becomes a miss.
    Because as-of picks the NEAREST candidate, rejecting it means no
    in-tolerance candidate exists — so this equals the SQL
    ``ASOF JOIN … WHERE matched_ts ≥ ts − tol`` post-filter.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(direction)
    if right_on is None:
        right_on = on
    left_schema = left.schema().base_schema  # arrow schema (Ray wraps it)
    right_schema = right.schema().base_schema
    left_cols = [c for c in left_schema.names]
    if right_cols is None:
        right_cols = [c for c in right_schema.names if c not in (right_on, right_ts)]
    overlap = set(left_cols) & set(right_cols)
    if overlap:
        raise ValueError(f"overlapping payload columns: {sorted(overlap)}")
    right_types = {
        n: t for n, t in zip(right_schema.names, right_schema.types)
    }

    def ts_int(col) -> pa.Array:
        # normalize mixed timestamp units to microseconds BEFORE the
        # integer cast — a unit-blind cast would compare raw counts in
        # different units without any error
        if pa.types.is_timestamp(col.type):
            col = pc.cast(col, pa.timestamp("us"))
        return pc.cast(col, pa.int64())

    def tag_left(b: pa.Table) -> pa.Table:
        cols = {c: b.column(c) for c in left_cols}
        cols[_TS] = ts_int(b.column(left_ts))
        cols[_SIDE] = pa.array(np.zeros(b.num_rows, np.int8))
        for c in right_cols:
            cols[c] = pa.nulls(b.num_rows, right_types[c])
        return pa.table(cols)

    def tag_right(b: pa.Table) -> pa.Table:
        cols = {}
        for c in left_cols:
            if c == on:
                cols[c] = pc.cast(b.column(right_on), left_schema.field(on).type)
            else:
                cols[c] = pa.nulls(b.num_rows, left_schema.field(c).type)
        cols[_TS] = ts_int(b.column(right_ts))
        cols[_SIDE] = pa.array(np.ones(b.num_rows, np.int8))
        for c in right_cols:
            cols[c] = b.column(c)
        return pa.table(cols)

    tagged = left.map_batches(tag_left, batch_format="pyarrow", zero_copy_batch=True).union(
        right.map_batches(tag_right, batch_format="pyarrow", zero_copy_batch=True)
    )

    out_names = left_cols + right_cols

    def merge(group: pa.Table) -> pa.Table:
        side = group.column(_SIDE).to_numpy(zero_copy_only=False)
        # keep timestamps int64 and carry nulls as a separate boolean
        # mask — a float64+NaN encoding would silently lose precision
        # above 2^53 (nanosecond-epoch ints already exceed it)
        ts_col = group.column(_TS)
        ts_null = pc.is_null(ts_col).to_numpy(zero_copy_only=False)
        ts = pc.fill_null(ts_col, 0).to_numpy(zero_copy_only=False).astype(np.int64)
        l_mask = side == 0
        # right rows with a null timestamp can never match
        r_mask = (~l_mask) & ~ts_null
        lt = group.filter(pa.array(l_mask))
        if lt.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.array([], lt.schema.field(c).type) for c in out_names], names=out_names
            )
        l_ts = ts[l_mask]
        l_null = ts_null[l_mask]  # null left ts → miss, never a match
        if not r_mask.any():  # key has no right rows → all misses
            arrays = [lt.column(c) for c in left_cols] + [
                pa.nulls(lt.num_rows, right_types[c]) for c in right_cols
            ]
            return pa.Table.from_arrays(arrays, names=out_names)
        r_ts = np.sort(ts[r_mask])
        r_order = np.argsort(ts[r_mask], kind="stable")
        rt = group.filter(pa.array(r_mask)).take(pa.array(r_order, pa.int64()))
        if direction == "backward":
            idx = np.searchsorted(r_ts, l_ts, side="right") - 1
            valid = (idx >= 0) & ~l_null
            if tolerance_us is not None:
                valid &= l_ts - r_ts[np.where(valid, idx, 0)] <= tolerance_us
        else:
            idx = np.searchsorted(r_ts, l_ts, side="left")
            valid = (idx < len(r_ts)) & ~l_null
            if tolerance_us is not None:
                valid &= r_ts[np.where(valid, idx, 0)] - l_ts <= tolerance_us
        idx = np.where(valid, idx, 0)
        # clipped take + vectorized null-out for misses
        picked = rt.select(right_cols).take(
            pa.array(np.where(valid, idx, 0).astype(np.int64), pa.int64())
        )
        valid_arr = pa.array(valid)
        arrays = [lt.column(c) for c in left_cols] + [
            pc.if_else(
                valid_arr,
                picked.column(c).combine_chunks(),
                pa.scalar(None, right_types[c]),
            )
            for c in right_cols
        ]
        return pa.Table.from_arrays(arrays, names=out_names)

    return tagged.groupby(on).map_groups(merge, batch_format="pyarrow")
