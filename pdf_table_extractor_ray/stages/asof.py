"""As-of (nearest-earlier) join — a time-series primitive Ray Data
lacks natively.

Semantics: for every left row, attach the single right row with the
same key and the greatest right timestamp ≤ the left timestamp
(``direction="backward"``; ``"forward"`` = smallest ≥). Equivalent to
DuckDB ``ASOF JOIN`` — which is the query's SQL oracle. Null keys and
null timestamps never match (SQL equality semantics); left rows keep
null payloads on a miss.

Partitioning: both sides are tagged into one union-schema dataset and
hash-shuffled ONCE by key BUCKET (``key % n_buckets`` — group count
fixed at ``n_buckets`` whatever the key cardinality, NOT one Python
call per key). Inside a bucket the whole multi-key match is ONE
``np.searchsorted`` over a composite ``key_rank·span + ts`` array
(the rank stride confines each key's matches to its own block; a
probe that lands in a neighbor key's block fails the key-equality
check and becomes a miss) — the same vectorized trick as
``sessions.tag_late_events``. Join keys must be int64-castable
(ints / timestamps), which every current caller satisfies.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_SIDE = "__asof_side"
_TS = "__asof_ts"
_KB = "__asof_bucket"


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
    n_buckets: int = 64,
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

    def bucket_of(key_col) -> pa.Array:
        # null keys route to bucket 0 (they can never match — the key
        # stays null and fails the equality check inside the bucket)
        k = pc.fill_null(pc.cast(key_col, pa.int64()), 0).to_numpy(
            zero_copy_only=False
        )
        return pa.array((k % n_buckets).astype(np.int64), pa.int64())

    def tag_left(b: pa.Table) -> pa.Table:
        cols = {c: b.column(c) for c in left_cols}
        cols[_TS] = ts_int(b.column(left_ts))
        cols[_SIDE] = pa.array(np.zeros(b.num_rows, np.int8))
        for c in right_cols:
            cols[c] = pa.nulls(b.num_rows, right_types[c])
        cols[_KB] = bucket_of(b.column(on))
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
        cols[_KB] = bucket_of(b.column(right_on))
        return pa.table(cols)

    tagged = left.map_batches(tag_left, batch_format="pyarrow", zero_copy_batch=True).union(
        right.map_batches(tag_right, batch_format="pyarrow", zero_copy_batch=True)
    )

    out_names = left_cols + right_cols

    def merge(group: pa.Table) -> pa.Table:
        group = group.drop_columns([_KB])
        side = group.column(_SIDE).to_numpy(zero_copy_only=False)
        # keep timestamps int64 and carry nulls as a separate boolean
        # mask — a float64+NaN encoding would silently lose precision
        # above 2^53 (nanosecond-epoch ints already exceed it)
        ts_col = group.column(_TS)
        ts_null = pc.is_null(ts_col).to_numpy(zero_copy_only=False)
        ts = pc.fill_null(ts_col, 0).to_numpy(zero_copy_only=False).astype(np.int64)
        key_col = group.column(on)
        key_null = pc.is_null(key_col).to_numpy(zero_copy_only=False)
        key = (
            pc.fill_null(pc.cast(key_col, pa.int64()), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        l_mask = side == 0
        # right rows with a null timestamp or null key can never match
        r_mask = (~l_mask) & ~ts_null & ~key_null
        lt = group.filter(pa.array(l_mask))
        if lt.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.array([], lt.schema.field(c).type) for c in out_names], names=out_names
            )
        l_ts = ts[l_mask]
        l_key = key[l_mask]
        l_null = ts_null[l_mask] | key_null[l_mask]  # null ts/key → miss
        if not r_mask.any():  # bucket has no matchable right rows
            arrays = [lt.column(c) for c in left_cols] + [
                pa.nulls(lt.num_rows, right_types[c]) for c in right_cols
            ]
            return pa.Table.from_arrays(arrays, names=out_names)
        r_ts_raw = ts[r_mask]
        r_key = key[r_mask]
        # dense key ranks over the bucket's key universe (both sides)
        uk = np.unique(np.concatenate([l_key[~l_null], r_key]))
        if len(uk) == 0:
            arrays = [lt.column(c) for c in left_cols] + [
                pa.nulls(lt.num_rows, right_types[c]) for c in right_cols
            ]
            return pa.Table.from_arrays(arrays, names=out_names)
        real_ts = np.concatenate([l_ts[~l_null], r_ts_raw])
        t0 = int(real_ts.min())
        span = np.int64(int(real_ts.max()) - t0 + 2)
        # int64 headroom: keys-per-bucket × time-span must stay < 2^62
        if int(len(uk)) * int(span) >= (1 << 62):
            raise ValueError(
                "asof_join: keys-per-bucket x time-span exceeds int64 "
                "headroom; raise n_buckets"
            )
        l_rank = np.searchsorted(uk, l_key)
        # clip: a left key absent from uk (possible when its rows are
        # all null-ts) maps anywhere — those rows are already masked
        l_rank = np.minimum(l_rank, len(uk) - 1)
        r_rank = np.searchsorted(uk, r_key)
        r_comp = r_rank * span + (r_ts_raw - t0 + 1)
        r_order = np.argsort(r_comp, kind="stable")
        r_comp = r_comp[r_order]
        r_ts = r_ts_raw[r_order]
        r_key_sorted = r_key[r_order]
        rt = group.filter(pa.array(r_mask)).take(pa.array(r_order, pa.int64()))
        l_comp = l_rank * span + (np.where(l_null, 0, l_ts) - t0 + 1)
        if direction == "backward":
            idx = np.searchsorted(r_comp, l_comp, side="right") - 1
            valid = (idx >= 0) & ~l_null
            safe = np.where(valid, idx, 0)
            valid &= r_key_sorted[safe] == l_key
            if tolerance_us is not None:
                valid &= l_ts - r_ts[np.where(valid, idx, 0)] <= tolerance_us
        else:
            idx = np.searchsorted(r_comp, l_comp, side="left")
            valid = (idx < len(r_comp)) & ~l_null
            safe = np.where(valid, idx, 0)
            valid &= r_key_sorted[safe] == l_key
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

    return tagged.groupby(_KB).map_groups(merge, batch_format="pyarrow")
