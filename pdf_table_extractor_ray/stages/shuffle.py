"""Deterministic seeded global shuffle — reproducible training-data
ordering as a first-class operator.

Training runs need the corpus in a *random but reproducible* order:
re-running the pipeline (or resuming a failed epoch) must yield the
SAME permutation, and the order must not depend on block layout or
scheduler timing. ``Dataset.random_shuffle()`` gives neither. Here the
permutation is defined *by the data itself*: each row's sort key is
``splitmix64(uint64(id) XOR seed)``. splitmix64 is a bijection on
uint64, so distinct ids get distinct keys — a collision-free
permutation, no tiebreak needed — and the key is layout-invariant by
construction (a pure function of the id).

Scale shape (the reason this beats a generic ``sort``):

- The key is avalanche-uniform on [0, 2^64), so its TOP BITS are a
  balanced range partitioner for free: ``bucket = key >> (64 - log2 B)``
  gives B near-equal buckets with **no boundary-sampling pass** — the
  step a general range shuffle cannot skip.
- Global positions come from counting-sort offsets: pass 1 is a
  map-side ``bincount`` over the id column only (B-row partials, one
  tiny groupby; with column pruning at the read nothing else is
  scanned), pass 2 carries the payload through ONE bucket exchange and
  sorts within each bucket (buckets are key ranges, so
  ``offset[bucket] + within-bucket rank`` is the exact global rank).
- Each epoch is just a new ``seed`` — no state carried between epochs.

The oracle face: splitmix64 is emulated bit-exactly in SQL (HUGEINT
arithmetic with 32-bit-split wrapping multiplication), so the whole
permutation is hash-verifiable against ``ROW_NUMBER() OVER (ORDER BY
h)`` — see ``splitmix64_sql`` and the ``shuffled_doc_order`` query.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_C0 = np.uint64(0x9E3779B97F4A7C15)
_C1 = np.uint64(0xBF58476D1CE4E5B9)
_C2 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer: bijective uint64 -> uint64."""
    z = x.astype(np.uint64, copy=True) + _C0
    z = (z ^ (z >> np.uint64(30))) * _C1
    z = (z ^ (z >> np.uint64(27))) * _C2
    return z ^ (z >> np.uint64(31))


def shuffle_key(ids: np.ndarray, seed: int) -> np.ndarray:
    """The permutation key for an int64/uint64 id array: a bijection
    of the id for any fixed seed (distinct ids never collide)."""
    return splitmix64(ids.astype(np.uint64) ^ np.uint64(seed & 0xFFFFFFFFFFFFFFFF))


def splitmix64_sql(id_expr: str, seed: int) -> str:
    """A DuckDB scalar expression computing ``shuffle_key`` bit-exactly
    (HUGEINT; wrapping 64-bit multiply split at 32 bits so the int128
    intermediate never overflows). ``id_expr`` must be non-negative."""
    m64 = "18446744073709551616::HUGEINT"

    def mulmod(z: str, c: int) -> str:
        return (
            f"(((({z}) % 4294967296) * {c}::HUGEINT + "
            f"(((({z}) // 4294967296) * {c}::HUGEINT) % 4294967296) * 4294967296) % {m64})"
        )

    s = seed & 0xFFFFFFFFFFFFFFFF
    z0 = f"((xor(CAST({id_expr} AS HUGEINT), {s}::HUGEINT) + {int(_C0)}::HUGEINT) % {m64})"
    z1 = mulmod(f"xor({z0}, ({z0}) >> 30)", int(_C1))
    z2 = mulmod(f"xor({z1}, ({z1}) >> 27)", int(_C2))
    return f"xor({z2}, ({z2}) >> 31)"


def deterministic_shuffle(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    seed: int = 0,
    n_buckets: int = 64,
    pos_col: str = "pos",
    bucket_col: str | None = None,
) -> "ray.data.Dataset":
    """Assign every row its global position in the seeded permutation.

    Returns the input columns plus ``pos_col`` (int64, a permutation of
    0..n-1). Two passes: a slim per-bucket histogram over ``id_col``
    (B-row partials, one bounded groupby, B rows to the driver — B is
    the operator's own constant, not a data-dependent cardinality),
    then ONE bucket exchange of the payload with a vectorized
    within-bucket argsort. Output block order is unspecified;
    ``pos_col`` IS the order (sort-free consumers range-read by it
    because buckets are contiguous pos ranges). With ``bucket_col``
    set, the bucket id is kept in the output — each bucket is a
    contiguous pos range, so it doubles as a balanced ordered shard
    key (``epoch_pack`` packs per bucket in pos order).
    """
    if n_buckets < 2 or (n_buckets & (n_buckets - 1)) != 0:
        raise ValueError(
            "deterministic_shuffle: n_buckets must be a power of two >= 2"
        )
    shift = np.uint64(64 - (int(n_buckets).bit_length() - 1))

    def hist(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        bucket = (shuffle_key(ids, seed) >> shift).astype(np.int64)
        counts = np.bincount(bucket, minlength=n_buckets)
        return pa.table(
            {
                "bucket": pa.array(np.arange(n_buckets, dtype=np.int64)),
                "n": pa.array(counts.astype(np.int64)),
            }
        )

    from ray.data.aggregate import Sum

    # bounded: exactly n_buckets rows by construction
    hist_rows = (
        ds.select_columns([id_col])
        .map_batches(hist, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .aggregate(Sum("n"))
        .take_all()
    )
    counts = np.zeros(n_buckets, np.int64)
    for r in hist_rows:
        counts[int(r["bucket"])] = int(r["sum(n)"])
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)

    def bucketize(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        key = shuffle_key(ids, seed)
        b = b.append_column("_sk", pa.array(key.view(np.int64), pa.int64()))
        return b.append_column(
            "_sb", pa.array((key >> shift).astype(np.int64), pa.int64())
        )

    def rank(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            out = g.drop_columns(["_sk", "_sb"]).append_column(
                pos_col, pa.array([], pa.int64())
            )
            if bucket_col:
                out = out.append_column(bucket_col, pa.array([], pa.int64()))
            return out
        bucket = int(g.column("_sb")[0].as_py())
        key = g.column("_sk").to_numpy(zero_copy_only=False).view(np.uint64)
        order = np.argsort(key, kind="stable")  # keys unique (bijection)
        pos = np.empty(len(key), np.int64)
        pos[order] = offsets[bucket] + np.arange(len(key), dtype=np.int64)
        out = g.drop_columns(["_sk", "_sb"]).append_column(pos_col, pa.array(pos))
        if bucket_col:
            out = out.append_column(
                bucket_col, pa.array(np.full(len(key), bucket, np.int64))
            )
        return out

    return (
        ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_sb")
        .map_groups(rank, batch_format="pyarrow")
    )


def curriculum_shuffle(
    ds: "ray.data.Dataset",
    strata_col: str,
    id_col: str = "doc_id",
    seed: int = 0,
    n_buckets: int = 64,
    pos_col: str = "pos",
) -> "ray.data.Dataset":
    """Curriculum ordering: global position = (stratum ascending, then
    the seeded permutation within the stratum) — the easy→hard
    curriculum-learning order (Bengio et al. 2009) with reproducible
    within-level shuffling. A new ``seed`` reshuffles every level
    without touching the level order.

    Same two-pass shape as ``deterministic_shuffle``; the histogram and
    offsets are per (stratum, key-bucket), so the driver state is
    |strata| × n_buckets rows — ``strata_col`` must be a BOUNDED domain
    (a curriculum level/decile/language, not an id; that bound is the
    operator's contract). One payload exchange, grouped by the packed
    (stratum, bucket) key; within a group one argsort of the bijective
    key. Output: input columns + ``pos_col`` (a permutation of 0..n-1;
    every stratum occupies a contiguous pos range).

    Null strata are EXCLUDED (SQL aggregate semantics — a row without
    a curriculum level has no place in the order).
    """
    if n_buckets < 2 or (n_buckets & (n_buckets - 1)) != 0:
        raise ValueError(
            "curriculum_shuffle: n_buckets must be a power of two >= 2"
        )
    shift = np.uint64(64 - (int(n_buckets).bit_length() - 1))

    from ray.data.aggregate import Sum

    def hist(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column(strata_col)))
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        bucket = (shuffle_key(ids, seed) >> shift).astype(np.int64)
        t = pa.table(
            {
                "stratum": b.column(strata_col),
                "bucket": pa.array(bucket),
                "n": pa.array(np.ones(len(bucket), np.int64)),
            }
        )
        return (
            pa.TableGroupBy(t, ["stratum", "bucket"])
            .aggregate([("n", "sum")])
            .rename_columns(["stratum", "bucket", "n"])
        )

    # bounded: ≤ |strata| x n_buckets rows by the strata-domain contract
    hist_rows = (
        ds.select_columns([id_col, strata_col])
        .map_batches(hist, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["stratum", "bucket"])
        .aggregate(Sum("n"))
        .take_all()
    )
    cells = sorted((r["stratum"], int(r["bucket"])) for r in hist_rows)
    counts = {(r["stratum"], int(r["bucket"])): int(r["sum(n)"]) for r in hist_rows}
    offsets = {}
    acc = 0
    for cell in cells:
        offsets[cell] = acc
        acc += counts[cell]
    strata = sorted({s for s, _ in cells})
    strata_arr = pa.array(strata)

    def bucketize(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column(strata_col)))
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        key = shuffle_key(ids, seed)
        bucket = (key >> shift).astype(np.int64)
        sidx = (
            pc.cast(pc.index_in(b.column(strata_col), value_set=strata_arr), pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        b = b.append_column("_sk", pa.array(key.view(np.int64), pa.int64()))
        return b.append_column(
            "_sg", pa.array(sidx * n_buckets + bucket, pa.int64())
        )

    def rank(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return g.drop_columns(["_sk", "_sg"]).append_column(
                pos_col, pa.array([], pa.int64())
            )
        packed = int(g.column("_sg")[0].as_py())
        cell = (strata[packed // n_buckets], packed % n_buckets)
        key = g.column("_sk").to_numpy(zero_copy_only=False).view(np.uint64)
        order = np.argsort(key, kind="stable")  # keys unique (bijection)
        pos = np.empty(len(key), np.int64)
        pos[order] = offsets[cell] + np.arange(len(key), dtype=np.int64)
        return g.drop_columns(["_sk", "_sg"]).append_column(pos_col, pa.array(pos))

    return (
        ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_sg")
        .map_groups(rank, batch_format="pyarrow")
    )
