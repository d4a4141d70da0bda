"""Distributed moment statistics — grouped co-moments in one pass.

Correlation / covariance / variance over a 100 TB table reduce to six
per-group sums (n, Σx, Σy, Σxy, Σx², Σy²): each is commutative and
associative, so the whole computation is a per-batch vectorized
pre-reduce followed by ONE slim groupby over (group, 6 counters) —
the canonical "algebraic aggregate" shape (Gray et al., Data Cube,
1997). Keeping the counters in integer units (cents / raw ints) makes
the result bit-identical across block layouts and cluster sizes
(float partial sums arrive in block order and differ in the last
ulp); the float statistics (corr, cov, stddev) are derived from the
exact integers at the very end, driver- or consumer-side.

Overflow note: int64 co-moments hold Σx² up to ~9.2e18 — ample for
cent-scaled test tables; a production run at 10^12 rows of large
values would bucket by group first or widen to float/udecimal at the
final merge.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Sum

_COLS = ["n", "n_xy", "sum_x", "sum_y", "sum_xy", "sum_x2", "sum_y2"]


def grouped_comoments(
    ds: "ray.data.Dataset",
    key_col: str,
    x_col: str,
    y_col: str,
) -> "ray.data.Dataset":
    """One row per key: (key, n, n_xy, sum_x, sum_y, sum_xy, sum_x2,
    sum_y2), integer-exact. ``x``/``y`` must already be integer-valued
    columns (scale floats to cents upstream). SQL null semantics:
    ``n`` counts all rows; y-dependent sums skip rows with null y
    (``n_xy`` counts the surviving pairs)."""

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        dic = keys.dictionary_encode()
        codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        g = len(dic.dictionary)
        xc = batch.column(x_col)
        if isinstance(xc, pa.ChunkedArray):
            xc = xc.combine_chunks()
        # x must be non-null (n counts every row) — a null would route
        # to_numpy through float64 and silently corrupt |x| > 2^53
        if xc.null_count:
            raise ValueError(f"grouped_comoments: null values in x column {x_col!r}")
        x = xc.to_numpy(zero_copy_only=False).astype(np.int64)
        yc = batch.column(y_col)
        if isinstance(yc, pa.ChunkedArray):
            yc = yc.combine_chunks()
        yvalid = ~np.asarray(yc.is_null())
        # fill nulls Arrow-side so the array stays int64: a null in the
        # batch would otherwise route to_numpy through float64 (NaN) and
        # corrupt |y| > 2^53 values
        y = pc.fill_null(yc, 0).to_numpy(zero_copy_only=False).astype(np.int64)

        def agg(w, mask=None):
            # int64 scatter-add (bincount would route through float64
            # weights and lose exactness past 2^53)
            acc = np.zeros(g, np.int64)
            if mask is None:
                np.add.at(acc, codes, w)
            else:
                np.add.at(acc, codes[mask], w[mask])
            return acc

        n = np.bincount(codes, minlength=g).astype(np.int64)
        n_xy = np.bincount(codes[yvalid], minlength=g).astype(np.int64)
        arrays = [
            pc.take(dic.dictionary, pa.array(np.arange(g))),
            pa.array(n),
            pa.array(n_xy),
            pa.array(agg(x)),
            pa.array(agg(y, yvalid)),
            pa.array(agg(x * y, yvalid)),
            pa.array(agg(x * x)),
            pa.array(agg(y * y, yvalid)),
        ]
        return pa.Table.from_arrays(arrays, names=[key_col] + _COLS)

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(key_col)
        .aggregate(*[Sum(c) for c in _COLS])
    )

    def finish(b: pa.Table) -> pa.Table:
        arrays = [b.column(key_col)] + [pc.cast(b.column(f"sum({c})"), pa.int64()) for c in _COLS]
        return pa.Table.from_arrays(arrays, names=[key_col] + _COLS)

    return agg.map_batches(finish, batch_format="pyarrow")


def corr_from_comoments(row: dict) -> float:
    """Pearson correlation of the (x, y) pairs from one co-moment row
    (pairs = rows with non-null y, so all sums share n_xy as their
    count — note sum_x/sum_x2 here must be recomputed over pairs for a
    strict pairwise corr; for null-free columns n == n_xy and the row
    is exact). Derived float — compute at the edge, not in the
    shuffle."""
    n = row["n_xy"]
    if n == 0:
        return float("nan")
    num = n * row["sum_xy"] - row["sum_x"] * row["sum_y"]
    dx = n * row["sum_x2"] - row["sum_x"] ** 2
    dy = n * row["sum_y2"] - row["sum_y"] ** 2
    if dx <= 0 or dy <= 0:
        return float("nan")
    return num / (np.sqrt(float(dx)) * np.sqrt(float(dy)))


def global_percent_rank(
    ds: "ray.data.Dataset",
    col: str,
    out: str = "pct_rank",
) -> "ray.data.Dataset":
    """``percent_rank() OVER (ORDER BY col)`` for every row — WITHOUT
    the global sort a naive window plan needs: one slim (value, count)
    groupby (bounded by the column's distinct cardinality, same
    contract as ``sketches.exact_quantile_disc``), a driver-side
    cumsum, then a broadcast searchsorted lookup per batch. Rows never
    shuffle or sort; at 100 TB the all-to-all a window sort implies is
    replaced by a lookup table of distinct values.

    percent_rank semantics (SQL): (count of rows strictly below) /
    (n − 1); 0 for n == 1. Ties share the rank of their first peer —
    exactly DuckDB's window result, bit-identical (one IEEE division
    of exact integers).
    """
    from pdf_table_extractor_ray.stages.sketches import sorted_value_counts

    vals, cnts = sorted_value_counts(ds, col)
    if len(vals) == 0:  # empty input: emit the (empty) rows unchanged shape
        return ds.map_batches(
            lambda b: b.append_column(out, pa.array([], pa.float64())),
            batch_format="pyarrow",
        )
    below = np.concatenate([[0], np.cumsum(cnts)[:-1]])  # rows strictly less
    n = int(cnts.sum())
    denom = float(n - 1) if n > 1 else 1.0

    def f(batch: pa.Table) -> pa.Table:
        x = batch.column(col).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(vals, x, "left")
        pr = below[idx] / denom
        return batch.append_column(out, pa.array(pr, pa.float64()))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def grouped_minmax_normalize(
    ds: "ray.data.Dataset",
    key_col: str,
    col: str,
    out: str = "scaled",
) -> "ray.data.Dataset":
    """Per-group min-max feature scaling — the two-pass broadcast
    pattern (the ML-preprocessing twin of a window plan): pass 1 is a
    tiny groupby producing one (min, max) row per group; pass 2 maps
    the table once with the group-stats broadcast into the closure and
    scales vectorized via a dictionary-encoded lookup. No window sort,
    no second shuffle of the data. Degenerate groups (min == max)
    scale to 0.0, mirroring SQL's NULLIF guard convention handled by
    the caller's expression."""
    from ray.data.aggregate import Max, Min

    stats = ds.groupby(key_col).aggregate(Min(col), Max(col)).take_all()
    keys = pa.array([r[key_col] for r in stats])
    lo = np.array([r[f"min({col})"] for r in stats], np.float64)
    hi = np.array([r[f"max({col})"] for r in stats], np.float64)

    def scale(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col)
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        idx = pc.index_in(k, value_set=keys).to_numpy(zero_copy_only=False).astype(np.int64)
        x = batch.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        span = hi[idx] - lo[idx]
        with np.errstate(divide="ignore", invalid="ignore"):
            scaled = np.where(span > 0, (x - lo[idx]) / span, 0.0)
        return batch.append_column(out, pa.array(scaled, pa.float64()))

    return ds.map_batches(scale, batch_format="pyarrow", zero_copy_batch=True)


def _interp_median(sorted_x: np.ndarray) -> float:
    """Continuous median with lower + (upper-lower)·0.5 interpolation —
    the exact float expression DuckDB's quantile_cont/median uses, so
    the SQL oracle matches bit-for-bit ((a+b)/2 can differ by 1 ulp)."""
    n = len(sorted_x)
    if n == 0:
        return float("nan")
    mid = (n - 1) / 2
    lo = sorted_x[int(np.floor(mid))]
    hi = sorted_x[int(np.ceil(mid))]
    return float(lo + (hi - lo) * 0.5)


def grouped_mad_outliers(
    ds: "ray.data.Dataset",
    key_col: str,
    value_col: str,
    z: float = 3.0,
) -> "ray.data.Dataset":
    """Robust per-key outlier stats: median, MAD (median absolute
    deviation) and the count of values with |x − median| > z·MAD — the
    outlier rule that, unlike mean/σ, is not dragged by the outliers
    themselves (50% breakdown point). Output: (key, n, median, mad,
    n_outliers).

    Partitioning contract: ``key_col`` has BOUNDED cardinality (the
    ``customer_balance_rank`` contract) — each key's values materialize
    in one group for the exact medians. For unbounded keys or one huge
    group, use ``kth_smallest`` (radix selection, no group
    materialization) per needed rank instead. Nulls are excluded."""

    def per_key(g: pa.Table) -> pa.Table:
        v = g.column(value_col)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        v = v.drop_null()
        x = np.sort(v.to_numpy(zero_copy_only=False).astype(np.float64))
        key = g.column(key_col)[0].as_py()
        if len(x) == 0:
            return pa.table(
                {
                    key_col: pa.array([key]),
                    "n": pa.array([0], pa.int64()),
                    "median": pa.array([None], pa.float64()),
                    "mad": pa.array([None], pa.float64()),
                    "n_outliers": pa.array([0], pa.int64()),
                }
            )
        med = _interp_median(x)
        dev = np.abs(x - med)
        mad = _interp_median(np.sort(dev))
        n_out = int((dev > z * mad).sum())
        return pa.table(
            {
                key_col: pa.array([key]),
                "n": pa.array([len(x)], pa.int64()),
                "median": pa.array([med], pa.float64()),
                "mad": pa.array([mad], pa.float64()),
                "n_outliers": pa.array([n_out], pa.int64()),
            }
        )

    return ds.groupby(key_col).map_groups(per_key, batch_format="pyarrow")


def key_skew_stats(
    ds: "ray.data.Dataset",
    key_col: str,
) -> "ray.data.Dataset":
    """One-row skew diagnostic for a prospective shuffle key — the
    numbers that decide between ``hash_shuffle_join`` /
    ``salted_hash_join`` / ``broadcast_join`` and size
    ``n_buckets``: (n_rows, n_keys, max_key_n, median_key_n,
    top1_share_micro = ⌊1e6·max_key_n/n_rows⌋).

    Shape: per-batch Arrow pre-count combiner → ONE (key, n) groupby-
    Sum (the counts table is distinct-key-sized and stays
    distributed); max/sum/count are slim aggregates over it; the
    median key mass is an EXACT order statistic via ``kth_smallest``
    (radix selection — works at unbounded key cardinality, counts
    < 2^53 are exact in the float64 domain it selects in)."""
    from ray.data.aggregate import Count, Max, Sum

    from pdf_table_extractor_ray.stages.sketches import kth_smallest

    def precount(b: pa.Table) -> pa.Table:
        t = (
            b.select([key_col])
            .drop_null()
            .group_by(key_col)
            .aggregate([(key_col, "count")])
        )
        return pa.table(
            {
                "k": t.column(key_col),
                "n_part": pc.cast(t.column(f"{key_col}_count"), pa.int64()),
            }
        )

    counts = (
        ds.map_batches(precount, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("k")
        .aggregate(Sum("n_part"))
    )

    def slim(b: pa.Table) -> pa.Table:
        return pa.table({"n": pc.cast(b.column("sum(n_part)"), pa.float64())})

    per_key = counts.map_batches(slim, batch_format="pyarrow").materialize()
    agg = per_key.aggregate(Sum("n"), Count(), Max("n"))
    n_rows = int(agg["sum(n)"])
    n_keys = int(agg["count()"])
    max_n = int(agg["max(n)"])
    med = int(kth_smallest(per_key, "n", (n_keys + 1) // 2)) if n_keys else 0
    return ray.data.from_items(
        [
            {
                "n_rows": n_rows,
                "n_keys": n_keys,
                "max_key_n": max_n,
                "median_key_n": med,
                "top1_share_micro": (1_000_000 * max_n) // n_rows if n_rows else 0,
            }
        ]
    )


def borda_rank_fusion(
    ds: "ray.data.Dataset",
    signal_cols,
    id_col: str = "doc_id",
    out: str = "borda",
) -> "ray.data.Dataset":
    """Multi-signal rank fusion (Borda count): every row's score is
    the SUM over signals of its SQL ``RANK() OVER (ORDER BY signal)``
    — the standard scale-free way to blend incomparable quality
    signals (length, fluency, repetitiveness, ...) into one ordering
    without normalizing any of them. Integer-exact, so bit-identical
    to the SQL window plan.

    Shape (no global sort, no window shuffle): ONE pass emits
    (signal, value, n) partials via per-batch np.unique, one slim
    groupby-Sum bounded by Σ per-signal distinct cardinalities (the
    ``sorted_value_counts`` bounded-domain contract, per signal), the
    driver builds each signal's below-count cumsum (rank = below + 1),
    and ONE map-only pass sums searchsorted rank lookups. Rows with a
    null in ANY signal are excluded (the SQL twin filters them too —
    DuckDB would otherwise sort nulls last, a semantics nobody wants
    in a quality score)."""
    from ray.data.aggregate import Sum

    signal_cols = list(signal_cols)

    def valid_mask(b: pa.Table):
        m = pc.is_valid(b.column(signal_cols[0]))
        for c in signal_cols[1:]:
            m = pc.and_(m, pc.is_valid(b.column(c)))
        return m

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(valid_mask(b))
        sigs, vals, cnts = [], [], []
        for si, c in enumerate(signal_cols):
            v = b.column(c).to_numpy(zero_copy_only=False).astype(np.int64)
            uv, cnt = np.unique(v, return_counts=True)
            sigs.append(np.full(len(uv), si, np.int64))
            vals.append(uv)
            cnts.append(cnt.astype(np.int64))
        return pa.table(
            {
                "sig": pa.array(np.concatenate(sigs) if sigs else []),
                "value": pa.array(np.concatenate(vals) if vals else []),
                "n": pa.array(np.concatenate(cnts) if cnts else []),
            }
        )

    # bounded: Σ per-signal distinct cardinalities by contract
    rows = (
        ds.select_columns(signal_cols)
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["sig", "value"])
        .aggregate(Sum("n"))
        .take_all()
    )
    per_sig_vals, per_sig_below = [], []
    for si in range(len(signal_cols)):
        vc = sorted((int(r["value"]), int(r["sum(n)"])) for r in rows if r["sig"] == si)
        vals = np.array([v for v, _ in vc], np.int64)
        cnts = np.array([c for _, c in vc], np.int64)
        below = np.concatenate([[0], np.cumsum(cnts)[:-1]]).astype(np.int64)
        per_sig_vals.append(vals)
        per_sig_below.append(below)

    def fuse(b: pa.Table) -> pa.Table:
        b = b.filter(valid_mask(b))
        total = np.zeros(b.num_rows, np.int64)
        for si, c in enumerate(signal_cols):
            x = b.column(c).to_numpy(zero_copy_only=False).astype(np.int64)
            idx = np.searchsorted(per_sig_vals[si], x, "left")
            total += per_sig_below[si][idx] + 1  # SQL RANK(): below + 1
        return pa.table({id_col: b.column(id_col), out: pa.array(total)})

    return ds.map_batches(fuse, batch_format="pyarrow", zero_copy_batch=True)
