"""Histogram-based decision-stump split finding — the inner loop of
gradient-boosted-tree training (LightGBM/XGBoost `hist` mode) expressed
as a Ray Data aggregation: bin the feature, count (key, bin, label)
with a per-batch combiner, and scan the tiny histogram for the best
threshold. The reference has no ML-training surface; this sits in the
engine's classifier family next to `stages/classifier.py` (scoring +
Naive-Bayes training).

Scale shape: the ONLY shuffle is the (key, bin) histogram — per batch
one np.unique collapses rows to ≤ |keys-in-batch| × n_bins partial
rows of 4 int64s; the raw feature column never moves. The split scan
runs per key over ≤ n_bins histogram rows (a `map_groups` whose group
size is bounded by N_BINS by construction — the bounded-cardinality
contract, like `customer_balance_rank`'s 25 nations). Everything is
exact integer arithmetic: the split criterion is misclassification
count (each side predicts its majority class), so the result is
SQL-checkable bit-for-bit — no float impurity.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def stump_splits(
    ds: "ray.data.Dataset",
    key_col: str,
    feature_col: str,
    pos_mask_fn,
    bin_width: int = 64,
) -> "ray.data.Dataset":
    """Per-``key_col`` best decision stump on integer ``feature_col``:
    choose threshold T (a bin upper edge, bins = ``feature //
    bin_width``) minimizing ``min(lp,ln) + min(rp,rn)`` where
    (lp, ln) / (rp, rn) are positive/negative counts left (< T) and
    right (≥ T) of the split; ties → smallest T. Candidates are the
    upper edges of every occupied bin except the highest (both sides
    non-empty by construction). ``pos_mask_fn(batch) -> BooleanArray``
    defines the positive class.

    Output: (key, threshold, n_left_pos, n_left_neg, n_right_pos,
    n_right_neg, err) — one row per key with ≥ 2 occupied bins.
    """
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        key = b.column(key_col)
        valid = pc.and_(pc.is_valid(key), pc.is_valid(b.column(feature_col)))
        b = b.filter(valid)
        empty = pa.table(
            {
                "key": pa.array([], pa.string()),
                "bin": pa.array([], pa.int64()),
                "p": pa.array([], pa.int64()),
                "q": pa.array([], pa.int64()),
            }
        )
        if b.num_rows == 0:
            return empty
        k = pc.cast(b.column(key_col), pa.string())
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        enc = k.dictionary_encode()
        kc = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        f = b.column(feature_col).to_numpy(zero_copy_only=False).astype(np.int64)
        binv = f // bin_width
        pos = pos_mask_fn(b)
        if isinstance(pos, pa.ChunkedArray):
            pos = pos.combine_chunks()
        pos = pos.to_numpy(zero_copy_only=False).astype(bool)
        # pack (key, bin) — bin range is data-bounded; offset to ≥ 0
        bmin = binv.min()
        span = np.int64(binv.max() - bmin + 1)
        packed = kc * span + (binv - bmin)
        upk, inv = np.unique(packed, return_inverse=True)
        p = np.bincount(inv, weights=pos.astype(np.int64), minlength=len(upk))
        tot = np.bincount(inv, minlength=len(upk))
        return pa.table(
            {
                "key": pc.take(enc.dictionary, pa.array(upk // span, pa.int64())),
                "bin": pa.array((upk % span) + bmin, pa.int64()),
                "p": pa.array(p.astype(np.int64), pa.int64()),
                "q": pa.array((tot - p).astype(np.int64), pa.int64()),
            }
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["key", "bin"])
        .aggregate(Sum("p"), Sum("q"))
    )

    def best_split(g: pa.Table) -> pa.Table:
        # group = one key's histogram, ≤ occupied-bin rows (bounded by
        # the feature range / bin_width — the documented contract)
        empty = pa.table(
            {
                "key": pa.array([], pa.string()),
                "threshold": pa.array([], pa.int64()),
                "n_left_pos": pa.array([], pa.int64()),
                "n_left_neg": pa.array([], pa.int64()),
                "n_right_pos": pa.array([], pa.int64()),
                "n_right_neg": pa.array([], pa.int64()),
                "err": pa.array([], pa.int64()),
            }
        )
        if g.num_rows < 2:
            return empty
        order = np.argsort(g.column("bin").to_numpy(zero_copy_only=False))
        bins = g.column("bin").to_numpy(zero_copy_only=False)[order]
        p = pc.cast(g.column("sum(p)"), pa.int64()).to_numpy(zero_copy_only=False)[order]
        q = pc.cast(g.column("sum(q)"), pa.int64()).to_numpy(zero_copy_only=False)[order]
        tp, tq = p.sum(), q.sum()
        lp = np.cumsum(p)[:-1]  # left of each candidate (upper edge of bin i)
        lq = np.cumsum(q)[:-1]
        rp, rq = tp - lp, tq - lq
        err = np.minimum(lp, lq) + np.minimum(rp, rq)
        i = int(np.argmin(err))  # first min = smallest threshold (bins sorted)
        thr = int(bins[i] + 1) * bin_width
        return pa.table(
            {
                "key": g.column("key").slice(0, 1),
                "threshold": pa.array([thr], pa.int64()),
                "n_left_pos": pa.array([int(lp[i])], pa.int64()),
                "n_left_neg": pa.array([int(lq[i])], pa.int64()),
                "n_right_pos": pa.array([int(rp[i])], pa.int64()),
                "n_right_neg": pa.array([int(rq[i])], pa.int64()),
                "err": pa.array([int(err[i])], pa.int64()),
            }
        )

    return hist.groupby("key").map_groups(best_split, batch_format="pyarrow")
