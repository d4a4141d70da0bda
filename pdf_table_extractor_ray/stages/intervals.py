"""Interval (range) join operators.

A range join — points ``t`` against intervals ``[s, e)`` with NO
equality key — has no Ray Data primitive and is O(n·m) if done
naively. The distributed formulation used here (the classic banded /
bucketed interval join): pick a bucket width ``W`` ≥ the typical
interval length, assign each point to bucket ``floor(t/W)``,
replicate each interval to every bucket it overlaps (≤ 2 replicas
when ``len ≤ W``), co-locate the two sides with ONE groupby shuffle
on the bucket id, and solve each bucket vectorized.

Within a bucket, counts never enumerate pairs: with interval starts
and ends each sorted once, the number of intervals stabbing a point
``t`` is ``searchsorted(starts, t, 'right') − searchsorted(ends, t,
'right')`` (prefix counts), and weighted variants replace the prefix
*counts* with prefix *sums* of an integer weight in the same sort
orders. Per-interval point counts are the transpose (two
searchsorted's into the sorted point array). Cost is
O((n+m)·log(n+m)) per bucket; the only all-to-all traffic is slim
(bucket, key, value) rows, and the outputs of the aggregate variants
are pre-reduced partials.

Partitioning assumption (per the custom-operator rule): interval
length should be ≤ ``bucket_width`` for the ≤2-replica bound; longer
intervals replicate to ``ceil(len/W)+1`` buckets — still correct,
just more traffic. Point-side skew (a hot time bucket) is bounded by
W — shrink W to split a hot window across buckets.

No reference analog (the reference joins nothing across files); this
is part of the engine's relational surface alongside
``stages/joins.py`` and ``stages/asof.py``.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

US_PER_DAY = 86_400_000_000


def _as_int64_np(col: "pa.ChunkedArray | pa.Array") -> np.ndarray:
    """Timestamp or integer column → int64 numpy (µs for timestamps)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_timestamp(col.type) or not pa.types.is_int64(col.type):
        col = pc.cast(col, pa.int64())
    return col.to_numpy(zero_copy_only=False)


def _pad_nulls(tbl: pa.Table, schema: pa.Schema) -> pa.Table:
    """Align ``tbl`` to ``schema``, filling absent columns with nulls."""
    cols = []
    for field in schema:
        if field.name in tbl.column_names:
            c = tbl.column(field.name)
            if c.type != field.type:
                c = pc.cast(c, field.type)
            cols.append(c)
        else:
            cols.append(pa.nulls(tbl.num_rows, field.type))
    return pa.Table.from_arrays(cols, schema=schema)


def _combined(
    points: "ray.data.Dataset",
    intervals: "ray.data.Dataset",
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    point_cols: Sequence[str],
    interval_cols: Sequence[str],
) -> "ray.data.Dataset":
    """Tag + bucket both sides into one union dataset keyed by ``_b``.

    Point rows: ``_side=0, _t``; interval rows (replicated per
    overlapped bucket): ``_side=1, _s, _e``. Payload columns from the
    other side are null-padded so the union has one schema.
    """
    overlap = set(point_cols) & set(interval_cols)
    if overlap:
        raise ValueError(f"payload column names must be disjoint: {overlap}")
    p_schema = points.schema().base_schema
    i_schema = intervals.schema().base_schema
    schema = pa.schema(
        [
            pa.field("_b", pa.int64()),
            pa.field("_side", pa.int8()),
            pa.field("_t", pa.int64()),
            pa.field("_s", pa.int64()),
            pa.field("_e", pa.int64()),
        ]
        + [p_schema.field(c) for c in point_cols]
        + [i_schema.field(c) for c in interval_cols]
    )

    def prep_points(batch: pa.Table) -> pa.Table:
        t = _as_int64_np(batch.column(point_col))
        out = pa.table(
            {
                "_b": t // bucket_width,
                "_side": np.zeros(len(t), np.int8),
                "_t": t,
                **{c: batch.column(c) for c in point_cols},
            }
        )
        return _pad_nulls(out, schema)

    def prep_intervals(batch: pa.Table) -> pa.Table:
        s = _as_int64_np(batch.column(start_col))
        e = _as_int64_np(batch.column(end_col))
        b0 = s // bucket_width
        # last bucket an interval touches; empty intervals (e <= s) keep
        # one replica so LEFT-style per-interval counts still emit a 0
        b1 = np.maximum(e - 1, s) // bucket_width
        reps = (b1 - b0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(s)), reps)
        # offset of each replica within its interval's bucket run
        offs = np.arange(reps.sum()) - np.repeat(np.cumsum(reps) - reps, reps)
        out = pa.table(
            {
                "_b": b0[idx] + offs,
                "_side": np.ones(len(idx), np.int8),
                "_s": s[idx],
                "_e": e[idx],
                **{c: batch.column(c).take(pa.array(idx, pa.int64())) for c in interval_cols},
            }
        )
        return _pad_nulls(out, schema)

    pts = points.map_batches(prep_points, batch_format="pyarrow", zero_copy_batch=True)
    ivs = intervals.map_batches(prep_intervals, batch_format="pyarrow", zero_copy_batch=True)
    return pts.union(ivs)


def _split(group: pa.Table):
    side = group.column("_side").to_numpy(zero_copy_only=False)
    pmask, imask = side == 0, side == 1
    return group.filter(pa.array(pmask)), group.filter(pa.array(imask))


def count_matches_per_point(
    points: "ray.data.Dataset",
    intervals: "ray.data.Dataset",
    *,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    point_cols: Sequence[str] = (),
    weight_col: Optional[str] = None,
    out_col: str = "n_matches",
) -> "ray.data.Dataset":
    """Per point: how many intervals stab it — or, with ``weight_col``
    (an int64 interval column), the exact sum of stabbing intervals'
    weights. One row out per point row in; pairs are never enumerated.
    """
    icols = [weight_col] if weight_col else []
    comb = _combined(
        points, intervals, point_col, start_col, end_col, bucket_width, point_cols, icols
    )

    def solve(g: pa.Table) -> pa.Table:
        pts, ivs = _split(g)
        t = pts.column("_t").to_numpy(zero_copy_only=False)
        s = ivs.column("_s").to_numpy(zero_copy_only=False)
        e = ivs.column("_e").to_numpy(zero_copy_only=False)
        if weight_col is None:
            val = np.searchsorted(np.sort(s), t, "right") - np.searchsorted(
                np.sort(e), t, "right"
            )
            val = val.astype(np.int64)
        else:
            w = ivs.column(weight_col).to_numpy(zero_copy_only=False).astype(np.int64)
            so, eo = np.argsort(s, kind="stable"), np.argsort(e, kind="stable")
            s_sorted, e_sorted = s[so], e[eo]
            ws = np.concatenate(([0], np.cumsum(w[so])))
            we = np.concatenate(([0], np.cumsum(w[eo])))
            val = (
                ws[np.searchsorted(s_sorted, t, "right")]
                - we[np.searchsorted(e_sorted, t, "right")]
            )
        cols = {c: pts.column(c) for c in point_cols}
        cols[out_col] = pa.array(val, pa.int64())
        return pa.table(cols) if cols else pa.table({out_col: pa.array(val, pa.int64())})

    return comb.groupby("_b").map_groups(solve, batch_format="pyarrow")


def count_points_per_interval(
    points: "ray.data.Dataset",
    intervals: "ray.data.Dataset",
    *,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    interval_keys: Sequence[str],
    out_col: str = "n_points",
) -> "ray.data.Dataset":
    """Per interval (identified by ``interval_keys``): how many points
    fall in ``[s, e)``. LEFT semantics — intervals stabbing nothing
    emit 0. Each bucket contributes a partial per interval replica;
    a small keyed groupby sums them."""
    from ray.data.aggregate import Sum

    comb = _combined(
        points, intervals, point_col, start_col, end_col, bucket_width, (), interval_keys
    )

    def solve(g: pa.Table) -> pa.Table:
        pts, ivs = _split(g)
        tp = np.sort(pts.column("_t").to_numpy(zero_copy_only=False))
        s = ivs.column("_s").to_numpy(zero_copy_only=False)
        e = ivs.column("_e").to_numpy(zero_copy_only=False)
        # replicas only see their own bucket's points, so partials sum
        # to the exact global count
        n = np.searchsorted(tp, e, "left") - np.searchsorted(tp, s, "left")
        cols = {c: ivs.column(c) for c in interval_keys}
        cols["_partial"] = pa.array(n.astype(np.int64), pa.int64())
        return pa.table(cols)

    partials = comb.groupby("_b").map_groups(solve, batch_format="pyarrow")
    agg = partials.groupby(list(interval_keys)).aggregate(Sum("_partial"))
    return agg.map_batches(
        lambda b: pa.Table.from_arrays(
            [b.column(c) for c in interval_keys] + [b.column("sum(_partial)")],
            names=list(interval_keys) + [out_col],
        ),
        batch_format="pyarrow",
    )


def interval_join(
    points: "ray.data.Dataset",
    intervals: "ray.data.Dataset",
    *,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    point_cols: Sequence[str] = (),
    interval_cols: Sequence[str] = (),
) -> "ray.data.Dataset":
    """Enumerated range join: one output row per (point, interval)
    pair with ``s ≤ t < e``, carrying payload from both sides. Output
    is O(#pairs) by nature — prefer the count/sum variants when a
    downstream aggregate is the real goal."""
    comb = _combined(
        points,
        intervals,
        point_col,
        start_col,
        end_col,
        bucket_width,
        point_cols,
        list(interval_cols),
    )
    out_names = ["_t", *point_cols, "_s", "_e", *interval_cols]

    def solve(g: pa.Table) -> pa.Table:
        pts, ivs = _split(g)
        t = pts.column("_t").to_numpy(zero_copy_only=False)
        s = ivs.column("_s").to_numpy(zero_copy_only=False)
        e = ivs.column("_e").to_numpy(zero_copy_only=False)
        empty = pa.table(
            {
                "_t": pa.array([], pa.int64()),
                **{c: pa.array([], pts.column(c).type) for c in point_cols},
                "_s": pa.array([], pa.int64()),
                "_e": pa.array([], pa.int64()),
                **{c: pa.array([], ivs.column(c).type) for c in interval_cols},
            }
        )
        if len(t) == 0 or len(s) == 0:
            return empty
        order = np.argsort(s, kind="stable")
        s_sorted, e_by_s = s[order], e[order]
        max_len = int((e - s).max()) if len(s) else 0
        # candidate window per point: intervals with s in (t-max_len, t]
        hi = np.searchsorted(s_sorted, t, "right")
        lo = np.searchsorted(s_sorted, t - max(max_len, 1), "right")
        cnt = hi - lo
        total = int(cnt.sum())
        if total == 0:
            return empty
        p_idx = np.repeat(np.arange(len(t)), cnt)
        iv_pos = np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt) + np.repeat(lo, cnt)
        keep = e_by_s[iv_pos] > t[p_idx]
        p_idx, iv_pos = p_idx[keep], iv_pos[keep]
        iv_idx = order[iv_pos]
        p_take = pa.array(p_idx, pa.int64())
        i_take = pa.array(iv_idx, pa.int64())
        return pa.table(
            {
                "_t": pa.array(t[p_idx], pa.int64()),
                **{c: pts.column(c).take(p_take) for c in point_cols},
                "_s": pa.array(s[iv_idx], pa.int64()),
                "_e": pa.array(e[iv_idx], pa.int64()),
                **{c: ivs.column(c).take(i_take) for c in interval_cols},
            }
        )

    out = comb.groupby("_b").map_groups(solve, batch_format="pyarrow")
    return out.select_columns(out_names)
