"""2-D Pareto skyline (dominance frontier) — an operator family the
Dataset API lacks as a primitive (SURVEY §2.6 "absent in the
reference"; built per the task's custom-operator guidance as a
composition of map_batches passes).

The skyline is DISTRIBUTIVE: sky(A ∪ B) = sky(sky(A) ∪ sky(B)), so the
scalable plan is local-frontier-then-merge — each block reduces to its
own frontier (normally a handful of rows) before any data movement,
and one single-block merge pass finishes. The only cross-block traffic
is the union of local frontiers.

Partitioning assumption: the FINAL frontier (and the union of
per-block frontiers) is metadata-scale. For n rows with independently
drawn coordinates the expected frontier size is O(log n) per block, so
the merge input is ~blocks × log(block_rows) rows — thousands at 100 TB,
not millions.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _frontier_kernel(t: pa.Table, x_col: str, y_col: str) -> pa.Table:
    """Rows not dominated within ``t``: minimize x, maximize y; a row
    is dominated iff another row has x' <= x AND y' >= y with at least
    one strict inequality. Exact duplicates collapse to one row.

    One lexsort (x asc, y desc) + a running max: in that order every
    earlier row has x' < x, or x' = x with y' > y, so "dominated" ⇔
    ``y <= max(y among earlier rows)`` — a single vectorized pass.
    """
    x = t.column(x_col)
    y = t.column(y_col)
    if isinstance(x, pa.ChunkedArray):
        x = x.combine_chunks()
    if isinstance(y, pa.ChunkedArray):
        y = y.combine_chunks()
    valid = pc.and_(pc.is_valid(x), pc.is_valid(y))
    xn = x.filter(valid).to_numpy(zero_copy_only=False).astype(np.int64)
    yn = y.filter(valid).to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(xn)
    if n == 0:
        return pa.table({x_col: pa.array([], pa.int64()), y_col: pa.array([], pa.int64())})
    # np.negative on int64 is safe here by the exactness contract
    # (cents / epoch-us magnitudes, nowhere near INT64_MIN)
    order = np.lexsort((np.negative(yn), xn))
    xs, ys = xn[order], yn[order]
    keep = np.empty(n, bool)
    keep[0] = True
    if n > 1:
        keep[1:] = ys[1:] > np.maximum.accumulate(ys)[:-1]
    return pa.table(
        {x_col: pa.array(xs[keep], pa.int64()), y_col: pa.array(ys[keep], pa.int64())}
    )


def pareto_frontier(
    ds: "ray.data.Dataset", x_col: str, y_col: str
) -> "ray.data.Dataset":
    """Global 2-D skyline of ``ds`` over int64 columns (minimize
    ``x_col``, maximize ``y_col``); null coordinates are excluded (SQL
    aggregate semantics). Columns must be int64-exact (cents,
    epoch-us) so dominance comparisons are deterministic.

    Plan: per-block local frontier (the heavy reduction — each block
    of B rows emits ~O(log B) rows, nothing else ever leaves the
    block) → repartition(1) → one merge pass over the whole (tiny)
    union with the same kernel. Returns rows sorted by (x asc,
    y desc), which for a frontier is also (y desc) — a canonical
    order, so output is block-order deterministic.
    """

    def local(b: pa.Table) -> pa.Table:
        return _frontier_kernel(b, x_col, y_col)

    partial = ds.map_batches(local, batch_format="pyarrow", zero_copy_batch=True)
    # merge input is metadata-scale by the distributivity argument above
    return partial.repartition(1).map_batches(
        local, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
