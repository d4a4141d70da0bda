"""Cardinality sketches — approximate distinct counts at 100 TB scale.

HyperLogLog (Flajolet et al. 2007) with the standard small-range
linear-counting correction: per-batch register partials (2^p bytes
each) are max-merged, so the only data movement is one tiny register
array per block — never the keys. Register max-merge is commutative
and associative, so the estimate is **deterministic across block
counts, block orders and cluster sizes** (unlike sampling) — the same
corpus always yields the same number.

Hashing is fully vectorized (no per-row Python — at 100 TB the scan
cost must dominate, not the interpreter): numerics are bit-reinterpreted
to uint64 and passed through the splitmix64 finalizer; strings/binary
get a position-vectorized FNV-1a over the Arrow data buffer followed by
the same finalizer. Both are pure arithmetic on fixed constants →
stable across processes and machines.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from pdf_table_extractor_ray.stages.textstats import _splash64

HLL_P = 12  # 4096 registers → ~1.6% standard error, 4 KB per partial
_M = 1 << HLL_P

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def _fnv1a_bytes_array(arr: pa.Array) -> np.ndarray:
    """Vectorized FNV-1a-64 over a (large_)binary/string Arrow array:
    one numpy pass per byte *position* (bounded by the longest value),
    never per row."""
    arr = pc.cast(arr, pa.large_binary())
    n = len(arr)
    offsets = np.frombuffer(arr.buffers()[1], np.int64)[arr.offset : arr.offset + n + 1]
    starts, lens = offsets[:-1], np.diff(offsets)
    data = np.frombuffer(arr.buffers()[2], np.uint8)
    h = np.full(n, _FNV_OFFSET, np.uint64)
    for pos in range(int(lens.max()) if n else 0):
        act = lens > pos
        h[act] = (h[act] ^ data[starts[act] + pos].astype(np.uint64)) * _FNV_PRIME
    return h


def _hash64_column(col) -> np.ndarray:
    """uint64 hashes for an Arrow column (nulls dropped), vectorized."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = col.drop_null()
    t = col.type
    if pa.types.is_integer(t):
        raw = col.to_numpy(zero_copy_only=False).astype(np.uint64)
    elif pa.types.is_floating(t):
        raw = col.to_numpy(zero_copy_only=False).astype(np.float64).view(np.uint64)
    elif pa.types.is_string(t) or pa.types.is_large_string(t) or pa.types.is_binary(t) or pa.types.is_large_binary(t):
        raw = _fnv1a_bytes_array(col)
    else:  # rare fallback: hash the utf-8 repr
        raw = _fnv1a_bytes_array(pa.array([str(v) for v in col.to_pylist()], pa.string()))
    return _splash64(raw)


def _alpha(m: int) -> float:
    # bias constants from the HLL paper
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_registers(values) -> np.ndarray:
    """Register array for one batch of values (Arrow array/chunked
    array, numpy array, or Python list; nulls skipped)."""
    if not isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = pa.array(list(values))
    regs = np.zeros(_M, np.uint8)
    h = _hash64_column(values)
    if len(h) == 0:
        return regs
    idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    rest = h << np.uint64(HLL_P)
    # rank = 1 + leading zeros of the remaining bits, capped at the
    # register width; bit_length via 6-step binary reduction (vectorized)
    cap = 64 - HLL_P + 1
    bl = np.zeros(len(rest), np.int64)
    v = rest.copy()
    for s in (32, 16, 8, 4, 2, 1):
        m = (v >> np.uint64(s)) > 0
        bl[m] += s
        v[m] >>= np.uint64(s)
    bl += (v > 0).astype(np.int64)
    rank = np.where(rest == 0, cap, np.minimum(64 - bl + 1, cap)).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Cardinality estimate with linear-counting small-range
    correction."""
    m = float(_M)
    est = _alpha(_M) * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int(np.sum(regs == 0))
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)
    return float(est)


def hll_count_distinct(
    ds: "ray.data.Dataset", col: str
) -> "ray.data.Dataset":
    """One-row dataset (approx_distinct: int64): per-batch registers →
    driver max-merge (bounded: one 4 KB array per block)."""

    def partial(batch: pa.Table) -> pa.Table:
        regs = hll_registers(batch.column(col))
        return pa.Table.from_arrays(
            [pa.array([regs.tobytes()], pa.binary())], names=["regs"]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).take_all()
    merged = np.zeros(_M, np.uint8)
    for r in partials:
        merged = np.maximum(merged, np.frombuffer(r["regs"], np.uint8))
    est = int(round(hll_estimate(merged)))
    return ray.data.from_items([{"approx_distinct": est}])


def heavy_hitters(
    ds: "ray.data.Dataset", col: str, k: int = 10, m: int = 256
) -> "ray.data.Dataset":
    """Approximate top-``k`` frequent items (mergeable per-block
    summaries, Misra-Gries/Space-Saving merge theorem — Agarwal et al.
    PODS'12): each block keeps its EXACT top-``m`` item counts plus a
    residual threshold ``bt`` (the largest dropped count; 0 when the
    block has ≤ m distinct items). Merging sums per-item counts; an
    item absent from a block can hide at most ``bt`` occurrences
    there, so

        true_count ∈ [est, est + (T_total − Σ bt over blocks where
        present)] = [est, est + err]

    Only (item, n, bt) rows for m items per block ever shuffle; the
    driver sees k rows and one scalar. With uniform blocks the error
    is ≤ N/m per item — tighten by raising ``m``, not by moving data.

    Output: (item, est, err) sorted by (est desc, item asc), where
    ``err`` is the per-item worst-case undercount.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        c = batch.column(col)
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        vc = c.drop_null().value_counts()
        items = vc.field("values")
        counts = pc.cast(vc.field("counts"), pa.int64()).to_numpy(zero_copy_only=False)
        order = np.argsort(-counts, kind="stable")
        top = order[:m]
        bt = int(counts[order[m]]) if len(order) > m else 0
        take = pa.array(top, pa.int64())
        # one extra null-item row per block carries bt so T_total can be
        # summed without a second pass over the data
        return pa.concat_tables(
            [
                pa.table(
                    {
                        "item": pc.cast(items.take(take), pa.string()),
                        "n": pa.array(counts[top], pa.int64()),
                        "bt": pa.array(np.full(len(top), bt, np.int64)),
                    }
                ),
                pa.table(
                    {
                        "item": pa.array([None], pa.string()),
                        "n": pa.array([0], pa.int64()),
                        "bt": pa.array([bt], pa.int64()),
                    }
                ),
            ]
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # two consumers: T_total scalar + item groupby

    def thresh_rows(b: pa.Table) -> pa.Table:
        mask = pc.is_null(b.column("item"))
        return pa.table({"bt": b.filter(mask).column("bt")})

    t_row = partials.map_batches(thresh_rows, batch_format="pyarrow").sum("bt")
    t_total = int(t_row) if t_row is not None else 0

    def item_rows(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_valid(b.column("item")))

    agg = (
        partials.map_batches(item_rows, batch_format="pyarrow")
        .groupby("item")
        .aggregate(Sum("n"), Sum("bt"))
    )

    def finish(b: pa.Table) -> pa.Table:
        est = b.column("sum(n)")
        present = b.column("sum(bt)").to_numpy(zero_copy_only=False)
        err = np.maximum(t_total - present, 0)
        return pa.table(
            {
                "item": b.column("item"),
                "est": pc.cast(est, pa.int64()),
                "err": pa.array(err.astype(np.int64), pa.int64()),
            }
        )

    from pdf_table_extractor_ray.stages.topk import global_top_k

    out = agg.map_batches(finish, batch_format="pyarrow")
    return global_top_k(
        out, [("est", "descending"), ("item", "ascending")], k
    )


def approx_quantiles(
    ds: "ray.data.Dataset",
    col: str,
    qs,
    bins: int = 4096,
) -> "pa.Table":
    """Deterministic approximate quantiles via a two-pass fixed-width
    histogram: pass 1 = Min/Max aggregate; pass 2 = per-batch
    ``np.histogram`` partials shuffled as slim (bin, cnt) rows and
    merged by one groupby-sum. The driver sees ≤ ``bins`` rows.

    Value error ≤ one bin width = (max−min)/bins — exact for any
    distribution (no sampling variance), merge-order-invariant, and
    unchanged by cluster size. Quantile indexing matches the engine's
    exact-quantile convention (``ceil(q·n)−1``, quantile_disc): the
    returned value is the upper edge of the bin holding that index
    (lower edge for q=0).

    Output columns: (q, lo, hi) — the bin bounds bracketing the exact
    quantile value.
    """
    from ray.data.aggregate import Max, Min, Sum

    mm = ds.aggregate(Min(col), Max(col))
    mn, mx = float(mm[f"min({col})"]), float(mm[f"max({col})"])
    if mx <= mn:
        return pa.table(
            {
                "q": pa.array([float(q) for q in qs], pa.float64()),
                "lo": pa.array([mn] * len(qs), pa.float64()),
                "hi": pa.array([mx] * len(qs), pa.float64()),
            }
        )
    edges = np.linspace(mn, mx, bins + 1)

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(col)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        x = v.drop_null().to_numpy(zero_copy_only=False).astype(np.float64)
        cnt, _ = np.histogram(x, bins=edges)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "bin": pa.array(nz.astype(np.int64), pa.int64()),
                "cnt": pa.array(cnt[nz].astype(np.int64), pa.int64()),
            }
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bin")
        .aggregate(Sum("cnt"))
        .take_all()
    )
    counts = np.zeros(bins, np.int64)
    for r in hist:
        counts[r["bin"]] = r["sum(cnt)"]
    n = int(counts.sum())
    cum = np.cumsum(counts)
    q_arr, lo_arr, hi_arr = [], [], []
    for q in qs:
        idx = max(int(np.ceil(q * n)) - 1, 0)  # ceil(q·n)−1, clamped
        b = int(np.searchsorted(cum, idx + 1, "left"))
        q_arr.append(float(q))
        lo_arr.append(float(edges[b]))
        hi_arr.append(float(edges[b + 1]))
    return pa.table(
        {
            "q": pa.array(q_arr, pa.float64()),
            "lo": pa.array(lo_arr, pa.float64()),
            "hi": pa.array(hi_arr, pa.float64()),
        }
    )


def hll_count_distinct_by(
    ds: "ray.data.Dataset", key_col: str, value_col: str
) -> "ray.data.Dataset":
    """Per-key approximate distinct counts — the 100 TB shape for
    ``COUNT(DISTINCT value) GROUP BY key``: each batch emits one
    (key, 4 KB register) row per key PRESENT IN THAT BATCH; one
    groupby(key) shuffle max-merges the registers (commutative, so
    deterministic across block orders/cluster sizes). Values never
    shuffle — per-key sketch bytes do. Output: (key, approx_distinct).

    The per-batch loop is over the batch's DISTINCT keys (its group
    slices are sliced vectorized via one argsort), not over rows; the
    register build per slice is the vectorized ``hll_registers``
    kernel."""

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        vals = batch.column(value_col)
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        dic = keys.dictionary_encode()
        codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(codes, kind="stable")
        sc = codes[order]
        bounds = np.flatnonzero(np.r_[True, sc[1:] != sc[:-1]])
        ends = np.append(bounds[1:], len(sc))
        out_keys, out_regs = [], []
        order_arr = pa.array(order)
        sorted_vals = vals.take(order_arr)
        for b, e in zip(bounds, ends):
            out_keys.append(dic.dictionary[sc[b]].as_py())
            out_regs.append(hll_registers(sorted_vals.slice(b, e - b)).tobytes())
        return pa.Table.from_arrays(
            [pa.array(out_keys), pa.array(out_regs, pa.binary())],
            names=[key_col, "regs"],
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def merge(g: pa.Table) -> pa.Table:
        regs = np.frombuffer(b"".join(g.column("regs").to_pylist()), np.uint8).reshape(
            -1, _M
        )
        merged = regs.max(axis=0)
        return pa.Table.from_arrays(
            [
                g.column(key_col).slice(0, 1),
                pa.array([int(round(hll_estimate(merged)))], pa.int64()),
            ],
            names=[key_col, "approx_distinct"],
        )

    return partials.groupby(key_col).map_groups(merge, batch_format="pyarrow")


def approx_quantiles_by(
    ds: "ray.data.Dataset",
    key_col: str,
    col: str,
    qs,
    bins: int = 512,
) -> "ray.data.Dataset":
    """Per-key approximate quantiles ("p95 per user" at 100 TB):
    the same two-pass fixed-width histogram as ``approx_quantiles``,
    keyed — pass 1 aggregates GLOBAL min/max (two scalars; shared
    edges make every per-key histogram mergeable), pass 2 shuffles
    slim (key, bin, cnt) partials through ONE groupby and finalizes
    each key's quantiles from its ≤ ``bins`` counters, vectorized per
    group batch. Raw values never shuffle.

    Per-key value error ≤ (global max − min)/bins; same indexing
    convention as the exact quantiles (ceil(q·n)−1). Output: one row
    per key: (key, q{XX}_lo, q{XX}_hi per requested quantile).
    """
    from ray.data.aggregate import Max, Min, Sum

    qs = [float(q) for q in qs]
    out_names = [key_col] + [f"q{int(q * 100):02d}_{s}" for q in qs for s in ("lo", "hi")]
    mm = ds.aggregate(Min(col), Max(col))
    if not mm or mm.get(f"min({col})") is None:
        # empty or all-null value column: no quantiles exist for any key;
        # return an empty table with the documented OUTPUT schema
        key_type = ds.schema().base_schema.field(key_col).type
        empty = pa.Table.from_arrays(
            [pa.array([], key_type)] + [pa.array([], pa.float64())] * (2 * len(qs)),
            names=out_names,
        )
        return ray.data.from_arrow(empty)
    mn, mx = float(mm[f"min({col})"]), float(mm[f"max({col})"])
    span = mx - mn
    edges = np.linspace(mn, mx, bins + 1) if span > 0 else None

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        v = batch.column(col)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        if v.null_count:
            # drop nulls BEFORE binning — matching approx_quantiles'
            # drop_null semantics. A null would become NaN in to_numpy
            # and searchsorted(NaN,'right')−1 clips to the top bin,
            # silently counting every null as a maximal value (ADVICE r3)
            mask = pc.is_valid(v)
            keys = keys.filter(mask)
            v = v.filter(mask)
        x = v.to_numpy(zero_copy_only=False).astype(np.float64)
        if edges is None:  # degenerate corpus: every value identical
            b = np.zeros(len(x), np.int64)
        else:
            b = np.clip(np.searchsorted(edges, x, "right") - 1, 0, bins - 1)
        dic = keys.dictionary_encode()
        codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        pair = codes * bins + b
        upair, cnt = np.unique(pair, return_counts=True)
        return pa.Table.from_arrays(
            [
                pc.take(dic.dictionary, pa.array(upair // bins)),
                pa.array(upair % bins, pa.int64()),
                pa.array(cnt.astype(np.int64), pa.int64()),
            ],
            names=[key_col, "bin", "cnt"],
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([key_col, "bin"])
        .aggregate(Sum("cnt"))
    )

    names = out_names

    def finalize(g: pa.Table) -> pa.Table:
        # one group batch = ALL (bin, cnt) rows of one key
        b = g.column("bin").to_numpy(zero_copy_only=False).astype(np.int64)
        c = pc.cast(g.column("sum(cnt)"), pa.int64()).to_numpy(zero_copy_only=False)
        counts = np.zeros(bins, np.int64)
        counts[b] = c
        cum = np.cumsum(counts)
        n = int(cum[-1])
        cols = [g.column(key_col).slice(0, 1)]
        for q in qs:
            idx = max(int(np.ceil(q * n)) - 1, 0)
            k = int(np.searchsorted(cum, idx + 1, "left"))
            if edges is None:
                lo = hi = mn
            else:
                lo, hi = float(edges[k]), float(edges[k + 1])
            cols.append(pa.array([lo], pa.float64()))
            cols.append(pa.array([hi], pa.float64()))
        return pa.Table.from_arrays(cols, names=names)

    return hist.groupby(key_col).map_groups(finalize, batch_format="pyarrow")


def sorted_value_counts(ds: "ray.data.Dataset", col: str):
    """(sorted distinct values, counts) of a bounded-cardinality
    column: one slim (value, count) groupby, driver-side sort. The
    shared base of ``exact_quantile_disc`` and
    ``stats.global_percent_rank``. Empty input → two empty arrays."""
    from ray.data.aggregate import Count

    vc = ds.groupby(col).aggregate(Count()).take_all()
    vals = np.array([r[col] for r in vc])
    cnts = np.array([r["count()"] for r in vc], np.int64)
    order = np.argsort(vals)
    return vals[order], cnts[order]


def exact_quantile_disc(
    ds: "ray.data.Dataset",
    col: str,
    q: float,
) -> float:
    """EXACT discrete quantile of an integer-like column, distributed:
    value-counts groupby (only (value, count) pairs shuffle — bounded
    by the column's distinct cardinality, the documented contract:
    length-like / code-like ints, not arbitrary doubles), then one
    driver-side cumsum over the distinct values. quantile_disc
    semantics: element at ceil(q·n)−1 of the sorted multiset; NaN on
    an empty input (matching SQL's NULL)."""
    vals, cnts = sorted_value_counts(ds, col)
    if len(vals) == 0:
        return float("nan")
    cum = np.cumsum(cnts)
    n = int(cum[-1])
    rank = max(int(np.ceil(q * n)), 1)  # 1-indexed position in sorted multiset
    return float(vals[np.searchsorted(cum, rank, "left")])


def filter_above_quantile(
    ds: "ray.data.Dataset",
    col: str,
    q: float = 0.95,
) -> "ray.data.Dataset":
    """Outlier pass of a corpus-cleaning pipeline: keep rows whose
    ``col`` exceeds the EXACT global q-quantile (e.g. inspect the
    longest 5% of documents; flip the comparison to drop them). Two
    stages: slim value-count shuffle to find the threshold, then a
    streaming vectorized filter with the scalar broadcast in the
    closure. Empty input → empty output (NaN threshold guard)."""
    import math

    thr = exact_quantile_disc(ds, col, q)
    if math.isnan(thr):  # empty input: nothing can exceed the quantile
        return ds.map_batches(lambda b: b.slice(0, 0), batch_format="pyarrow")

    def f(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater(batch.column(col), pa.scalar(thr).cast(batch.schema.field(col).type)))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


CHECKSUM_MOD = 1 << 40  # keeps blocks × partials far inside int64


def table_checksum(
    ds: "ray.data.Dataset",
    col: str = "text",
) -> "ray.data.Dataset":
    """Order-invariant content checksum of a whole table — the
    "compare two replicas / verify a migration without moving data"
    primitive: per row, the first 60 bits of md5(value); summed modulo
    2^40 (mod is a sum homomorphism, so per-batch partial sums then a
    global sum give exactly the row-wise result, independent of block
    order/layout/cluster size). One row out: (n_rows, checksum).

    Per-batch partials are Python-int exact (arbitrary precision)
    before the mod, so no intermediate overflow; the global Sum sees
    only values < 2^40."""
    import hashlib

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch.column(col).to_pylist()
        s = 0
        for v in vals:
            if v is None:  # SQL sum skips NULL (md5(NULL) IS NULL); count(*) doesn't
                continue
            s += int(hashlib.md5(v.encode()).hexdigest()[:15], 16)
        return pa.Table.from_arrays(
            [pa.array([len(vals)], pa.int64()), pa.array([s % CHECKSUM_MOD], pa.int64())],
            names=["n_rows", "part"],
        )

    from ray.data.aggregate import Sum

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    row = parts.aggregate(Sum("n_rows"), Sum("part"))
    n = int(row["sum(n_rows)"] or 0)
    chk = int(row["sum(part)"] or 0) % CHECKSUM_MOD
    return ray.data.from_items([{"n_rows": n, "checksum": chk}])


def heavy_hitters_by(
    ds: "ray.data.Dataset",
    key_col: str,
    col: str,
    k: int = 10,
    m: int = 256,
) -> "ray.data.Dataset":
    """Per-key approximate top-``k`` frequent items — ``heavy_hitters``
    with every bound scoped to a key (GROUP BY + heavy-hitter in one
    pass). Per block each key keeps its EXACT top-``m`` item counts
    plus that key's residual threshold ``bt``; merging sums per
    (key, item) and the per-item worst-case undercount is
    ``err = T_key − Σ bt where present`` (Agarwal et al. PODS'12,
    applied per key). Exact (err = 0) whenever per-block distinct
    items per key ≤ m — the SQL-verifiable regime.

    Shuffle traffic: ≤ m slim (key, item, n, bt) rows per key per
    block + one threshold row per key per block. The key domain must
    be bounded (same contract as ``hll_count_distinct_by``): the
    per-key threshold table lands on the driver for the final err
    arithmetic. Output: top-k per key by (est DESC, item ASC), via the
    hot-key-safe grouped top-k (no per-key Python groups)."""
    from ray.data.aggregate import Sum

    import ray

    from pdf_table_extractor_ray.stages.topk import grouped_top_k

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.Table.from_arrays(
            [
                pc.cast(batch.column(key_col), pa.string()),
                pc.cast(batch.column(col), pa.string()),
            ],
            names=["key", "item"],
        ).drop_null()
        g = t.group_by(["key", "item"]).aggregate([("item", "count")])
        key = g.column("key").combine_chunks()
        item = g.column("item").combine_chunks()
        cnt = pc.cast(g.column("item_count"), pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((item, -cnt, key))  # (key asc, cnt desc, item asc)
        sk = key.take(pa.array(order))
        run_start = np.ones(len(order), bool)
        if len(order) > 1:
            eq = pc.equal(sk.slice(1), sk.slice(0, len(order) - 1))
            run_start[1:] = ~eq.to_numpy(zero_copy_only=False)
        pos = np.arange(len(order)) - np.maximum.accumulate(
            np.where(run_start, np.arange(len(order)), 0)
        )
        keep = order[pos < m]
        # per-key residual threshold: the (m+1)-th count, else 0
        starts = np.nonzero(run_start)[0]
        bt_key = np.zeros(len(starts), np.int64)
        over = starts + m  # index of the first dropped rank per run
        run_end = np.concatenate([starts[1:], [len(order)]])
        has_over = over < run_end
        bt_key[has_over] = cnt[order[over[has_over]]]
        run_id = np.cumsum(run_start) - 1
        items_tbl = pa.table(
            {
                "key": key.take(pa.array(keep)),
                "item": item.take(pa.array(keep)),
                "n": pa.array(cnt[keep], pa.int64()),
                "bt": pa.array(bt_key[run_id[pos < m]], pa.int64()),
            }
        )
        thresh_tbl = pa.table(
            {
                "key": sk.take(pa.array(starts, pa.int64())),
                "item": pa.array([""] * len(starts), pa.string()),
                "n": pa.array(np.full(len(starts), -1, np.int64)),
                "bt": pa.array(bt_key, pa.int64()),
            }
        )
        return pa.concat_tables([items_tbl, thresh_tbl])

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # two consumers: per-key T totals + item groupby

    def _key_thresholds(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b.column("n"), -1))
        return pa.table({"key": t.column("key"), "bt": t.column("bt")})

    t_rows = (
        partials.map_batches(_key_thresholds, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("bt"))
        .take_all()
    )  # bounded: one row per key (bounded key domain by contract)
    t_by_key = {r["key"]: int(r["sum(bt)"]) for r in t_rows}
    t_ref = ray.put(t_by_key)

    def item_rows(b: pa.Table) -> pa.Table:
        return b.filter(pc.not_equal(b.column("n"), -1))

    agg = (
        partials.map_batches(item_rows, batch_format="pyarrow")
        .groupby(["key", "item"])
        .aggregate(Sum("n"), Sum("bt"))
    )

    def finish(b: pa.Table) -> pa.Table:
        totals = ray.get(t_ref)
        keyarr = b.column("key")
        if isinstance(keyarr, pa.ChunkedArray):
            keyarr = keyarr.combine_chunks()
        enc = keyarr.dictionary_encode()
        # Python loop bounded by DISTINCT keys, not rows
        per_key = np.array(
            [totals.get(v, 0) for v in enc.dictionary.to_pylist()], np.int64
        )
        idx = enc.indices.to_numpy(zero_copy_only=False)
        present = b.column("sum(bt)").to_numpy(zero_copy_only=False)
        err = np.maximum(per_key[idx] - present, 0)
        return pa.table(
            {
                "key": b.column("key"),
                "item": b.column("item"),
                "est": pc.cast(b.column("sum(n)"), pa.int64()),
                "err": pa.array(err.astype(np.int64), pa.int64()),
            }
        )

    out = agg.map_batches(finish, batch_format="pyarrow")
    return grouped_top_k(out, "key", [("est", "descending"), ("item", "ascending")], k)


def fixed_width_histogram(
    ds: "ray.data.Dataset",
    col: str,
    scale: int = 100,
    width: int = 500,
) -> "ray.data.Dataset":
    """Exact fixed-width histogram: bin = floor(floor(col·scale) /
    width) over integer units (cents for scale=100), count per bin —
    the deterministic companion to ``approx_quantiles``' sketch (same
    (bin, n) shuffle shape, but bin edges are fixed a priori so the
    result is SQL-exact instead of sketch-approximate).

    Null values are dropped via an Arrow validity mask BEFORE the
    numpy conversion (a NaN would floor-cast to int64 garbage — the
    approx_quantiles_by lesson). Floor division throughout, including
    negatives (DuckDB ``//`` truncates — the oracle must spell
    ``floor()``). Shuffle traffic: ≤ distinct-bin slim int64 rows per
    block."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(col)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        v = v.drop_null()
        units = np.floor(
            v.to_numpy(zero_copy_only=False).astype(np.float64) * scale
        ).astype(np.int64)
        bins, cnt = np.unique(units // width, return_counts=True)
        return pa.table(
            {
                "bin": pa.array(bins, pa.int64()),
                "n_part": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bin")
        .aggregate(Sum("n_part"))
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "bin": b.column("bin"),
                "n": pc.cast(b.column("sum(n_part)"), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def _float64_to_ordered_u64(x: np.ndarray) -> np.ndarray:
    """Monotone IEEE-754 total-order map float64 → uint64 (sign-flip
    trick): a < b ⇔ map(a) < map(b), so integer bisection selects
    float order statistics exactly."""
    u = x.view(np.uint64).copy()
    neg = u >> np.uint64(63) == 1
    u[neg] = ~u[neg]
    u[~neg] |= np.uint64(1) << np.uint64(63)
    return u


def _ordered_u64_to_float64(u: int) -> float:
    uu = np.uint64(u)
    if uu >> np.uint64(63) == 1:
        uu = uu & ~(np.uint64(1) << np.uint64(63))
    else:
        uu = ~uu
    return float(np.array([uu], np.uint64).view(np.float64)[0])


def kth_smallest(
    ds: "ray.data.Dataset",
    col: str,
    k: int,
    nbins: int = 4096,
) -> float:
    """EXACT k-th smallest (1-based) of a float64 column with NO sort,
    NO bounded-distinct contract and NO driver materialization beyond
    ``nbins`` rows — distributed selection by radix bisection.

    Values map monotonically to uint64 (``_float64_to_ordered_u64``);
    each pass histograms the surviving range into ``nbins`` buckets
    ((bin, n) partials → one slim groupby-Sum → ≤ nbins rows to the
    driver), narrows to the bucket containing the rank, and rescales.
    The range is 2^64 wide so ⌈64 / log2(nbins)⌉ = 6 passes bound the
    worst case; duplicate-heavy columns terminate as soon as a bucket
    collapses to one key. The slim uint64 column is materialized ONCE
    and re-streamed per pass (8 bytes/row in the object store, spill-
    friendly) instead of re-running the upstream pipeline 6×.

    Complements ``exact_quantiles``/``sorted_value_counts`` (which
    require bounded distinct cardinality) and ``approx_quantiles``
    (sketch error): this is the exact answer at unbounded cardinality.
    Nulls are excluded; NaNs map above +inf (SQL engines instead
    exclude them — filter upstream if the column can hold NaN)."""
    return _select_kth_u(_u64_column(ds, col), k, nbins)


def kth_smallest_multi(
    ds: "ray.data.Dataset",
    col: str,
    ks,
    nbins: int = 4096,
) -> list:
    """``kth_smallest`` for several ranks sharing ONE materialization
    of the slim uint64 column (each rank still runs its own ≤6
    bisection passes — ranks in distinct regions touch disjoint bins,
    so sharing passes would not reduce shuffled bytes, only pass
    count)."""
    us = _u64_column(ds, col)
    return [_select_kth_u(us, k, nbins) for k in ks]


def _u64_column(ds: "ray.data.Dataset", col: str) -> "ray.data.Dataset":
    def to_u(batch: pa.Table) -> pa.Table:
        v = batch.column(col)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        v = v.drop_null()
        x = v.to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"u": pa.array(_float64_to_ordered_u64(x), pa.uint64())})

    return ds.map_batches(to_u, batch_format="pyarrow", zero_copy_batch=True).materialize()


def _select_kth_u_raw(us: "ray.data.Dataset", k: int, nbins: int = 4096) -> int:
    from ray.data.aggregate import Sum

    lo, hi = 0, (1 << 64) - 1
    rank = int(k)
    if rank < 1:
        raise ValueError(f"kth_smallest: k must be ≥ 1, got {k}")
    while lo < hi:
        width = hi - lo + 1
        binw = (width + nbins - 1) // nbins
        lo_s, binw_s = np.uint64(lo), np.uint64(binw)
        hi_s = np.uint64(hi)

        def hist(batch: pa.Table) -> pa.Table:
            u = batch.column("u").to_numpy(zero_copy_only=False)
            m = (u >= lo_s) & (u <= hi_s)
            b = ((u[m] - lo_s) // binw_s).astype(np.int64)
            bins, cnt = np.unique(b, return_counts=True)
            return pa.table(
                {
                    "bin": pa.array(bins, pa.int64()),
                    "n_part": pa.array(cnt.astype(np.int64), pa.int64()),
                }
            )

        rows = (
            us.map_batches(hist, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("bin")
            .aggregate(Sum("n_part"))
            .take_all()
        )  # bounded: ≤ nbins rows by construction (audit: _select_kth_u)
        counts = np.zeros(nbins, np.int64)
        for r in rows:
            counts[int(r["bin"])] = int(r["sum(n_part)"])
        cum = np.cumsum(counts)
        total = int(cum[-1]) if len(cum) else 0
        if rank > total:
            raise ValueError(
                f"kth_smallest: k={k} exceeds the {total} in-range values"
            )
        sel = int(np.searchsorted(cum, rank, side="left"))
        if sel > 0:
            rank -= int(cum[sel - 1])
        lo = lo + sel * binw
        hi = min(hi, lo + binw - 1)
    return lo


def _select_kth_u(us: "ray.data.Dataset", k: int, nbins: int = 4096) -> float:
    return _ordered_u64_to_float64(_select_kth_u_raw(us, k, nbins))


def kth_smallest_u64(us: "ray.data.Dataset", k: int, nbins: int = 4096) -> int:
    """Exact k-th smallest of a RAW uint64 column dataset (``u``) —
    the integer-domain face of the radix-bisection selector for
    callers whose keys exceed float64's 2^53 exact range (packed
    string prefixes, 64-bit hashes). No float total-order map on
    either side."""
    return _select_kth_u_raw(us, k, nbins)


def range_partition_counts(
    ds: "ray.data.Dataset",
    col: str,
    n_parts: int = 4,
    nbins: int = 4096,
) -> "ray.data.Dataset":
    """Balanced RANGE partitioning by exact order-statistic boundaries
    — the skew-defeating partitioner a range shuffle needs: boundary
    *i* is the exact (i·n/n_parts)-th smallest value
    (``kth_smallest_multi``, one slim-column materialization), bucket
    = searchsorted(boundaries, v, right) so parts differ only by
    duplicate mass at the boundaries. Returns (bucket, n) — the
    balance certificate; the same bucket kernel is what a caller keys
    a repartition/write on.

    Two streaming passes beyond selection: one count, one bucket
    count. Everything to the driver is ≤ n_parts boundaries and
    histogram rows."""
    from ray.data.aggregate import Sum

    def nvalid(b: pa.Table) -> pa.Table:
        c = b.column(col)
        return pa.table(
            {"n": pa.array([c.length() - c.null_count], pa.int64())}
        )

    n = int(
        ds.map_batches(nvalid, batch_format="pyarrow", zero_copy_batch=True)
        .aggregate(Sum("n"))["sum(n)"]
    )
    if n == 0:
        return ray.data.from_items([])
    ranks = [max(1, (i * n) // n_parts) for i in range(1, n_parts)]
    bounds = np.array(kth_smallest_multi(ds, col, ranks, nbins), np.float64)

    def bucketize(b: pa.Table) -> pa.Table:
        v = b.column(col)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        v = v.drop_null()
        x = v.to_numpy(zero_copy_only=False).astype(np.float64)
        bk = np.searchsorted(bounds, x, side="right").astype(np.int64)
        bins, cnt = np.unique(bk, return_counts=True)
        return pa.table(
            {
                "bucket": pa.array(bins, pa.int64()),
                "n_part": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    agg = (
        ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .aggregate(Sum("n_part"))
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "bucket": b.column("bucket"),
                "n": pc.cast(b.column("sum(n_part)"), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def join_overlap_estimate(
    left: "ray.data.Dataset",
    left_col: str,
    right: "ray.data.Dataset",
    right_col: str,
) -> "ray.data.Dataset":
    """Pre-join cardinality probe: approximate distinct keys on each
    side, their union, and the inclusion–exclusion intersection
    |A∩B| ≈ |A| + |B| − |A∪B| (clipped at 0) — with ``key_skew_stats``
    the two numbers that pick a join strategy before paying for the
    shuffle. HLL registers are mergeable, so the union costs no extra
    pass: max-merge the two sides' registers. One 4 KB array per
    block to the driver, nothing else moves."""

    def regs_of(ds: "ray.data.Dataset", col: str) -> np.ndarray:
        def partial(batch: pa.Table) -> pa.Table:
            return pa.table(
                {"regs": pa.array([hll_registers(batch.column(col)).tobytes()], pa.binary())}
            )

        merged = np.zeros(_M, np.uint8)
        for r in ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ).take_all():  # bounded: one 4 KB register row per block
            merged = np.maximum(merged, np.frombuffer(r["regs"], np.uint8))
        return merged

    ra = regs_of(left, left_col)
    rb = regs_of(right, right_col)
    na = int(round(hll_estimate(ra)))
    nb = int(round(hll_estimate(rb)))
    nu = int(round(hll_estimate(np.maximum(ra, rb))))
    return ray.data.from_items(
        [
            {
                "n_left_approx": na,
                "n_right_approx": nb,
                "n_union_approx": nu,
                "n_intersect_approx": max(0, na + nb - nu),
            }
        ]
    )


def kth_smallest_by(
    ds: "ray.data.Dataset",
    key_col: str,
    col: str,
    q_num: int,
    q_den: int,
    nbins: int = 4096,
) -> pa.Table:
    """EXACT per-key discrete quantile (DuckDB ``quantile_disc``
    parity: the value at 1-based rank ⌈q·n_k⌉ within each key's
    values). One-ratio convenience wrapper over
    ``kth_smallest_by_multi`` — see it for the algorithm and
    contracts. Returns a driver-side ``pa.Table`` (key, kth)."""
    t = kth_smallest_by_multi(ds, key_col, col, [(q_num, q_den)], nbins)
    return pa.table({"key": t.column("key"), "kth": t.column("kth")})


def weighted_kth_smallest_by(
    ds: "ray.data.Dataset",
    key_col: str,
    col: str,
    weight_col: str,
    q_num: int,
    q_den: int,
    nbins: int = 4096,
) -> pa.Table:
    """Per-key WEIGHTED exact quantile: the smallest value whose
    cumulative integer weight within its key reaches ⌈q·W_k⌉ — the
    grouped counterpart of ``weighted_median`` (one-ratio wrapper over
    ``kth_smallest_by_multi(weight_col=...)``; see it for plan and
    contracts). Returns a driver-side ``pa.Table`` (key, kth)."""
    t = kth_smallest_by_multi(
        ds, key_col, col, [(q_num, q_den)], nbins, weight_col=weight_col
    )
    return pa.table({"key": t.column("key"), "kth": t.column("kth")})


def kth_smallest_by_multi(
    ds: "ray.data.Dataset",
    key_col: str,
    col: str,
    ratios,
    nbins: int = 4096,
    weight_col: str = None,
) -> pa.Table:
    """EXACT per-key discrete quantiles for SEVERAL q ratios at once
    (DuckDB ``quantile_disc`` parity: value at 1-based rank ⌈q·n_k⌉
    per key) with NO per-key sort and NO full materialization —
    ``kth_smallest``'s radix bisection run for ALL (key, q) states
    simultaneously over ONE materialized slim column.

    Each q is an exact integer ratio (q_num, q_den) so ranks come from
    integer arithmetic — ``ceil(0.9·n)`` in float drifts off by one
    when 0.9·n lands on an ulp boundary.

    Per pass: each batch histograms its rows into every ACTIVE
    (key, q) state's current [lo, hi] range (states broadcast as one
    small dict via ``ray.put``; a row falling in two states' ranges is
    binned into both), one slim groupby-Sum over (key, q, bin) moves ≤
    |keys|·|qs|·nbins rows, and every state narrows independently. ≤
    ⌈64/log2(nbins)⌉ = 6 passes total REGARDLESS of key or q count —
    the per-state loop is on the driver over |keys|·|qs| dict entries
    only, so this requires the bounded-key-domain contract (GROUP BY a
    type/category column, not an id).

    Nulls in ``col`` or ``key_col`` are excluded (SQL aggregate
    semantics). NaNs order above +inf (filter upstream if present).
    Returns a driver-side ``pa.Table`` (key, q_num, q_den, kth) —
    one row per key per ratio.

    With ``weight_col`` set this computes the per-key WEIGHTED
    discrete quantile — the smallest value whose cumulative weight
    within its key reaches ⌈q·W_k⌉ — same plan, histograms summing
    weights instead of counting rows. Weights are floored to int64
    (exactness contract); rows with floored weight < 1 or null weight
    are excluded; Σw per key must fit int64."""
    import ray
    from ray.data.aggregate import Count, Sum

    ratios = list(ratios)
    for q_num, q_den in ratios:
        if not (0 < q_num <= q_den):
            raise ValueError(
                f"kth_smallest_by_multi: need 0 < q_num <= q_den, got {q_num}/{q_den}"
            )

    def to_u(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col)
        v = batch.column(col)
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        mask = pc.and_(pc.is_valid(k), pc.is_valid(v))
        if weight_col is None:
            k = k.filter(mask)
            x = v.filter(mask).to_numpy(zero_copy_only=False).astype(np.float64)
            return pa.table(
                {"key": k, "u": pa.array(_float64_to_ordered_u64(x), pa.uint64())}
            )
        w = batch.column(weight_col)
        if isinstance(w, pa.ChunkedArray):
            w = w.combine_chunks()
        mask = pc.and_(mask, pc.is_valid(w))
        k = k.filter(mask)
        x = v.filter(mask).to_numpy(zero_copy_only=False).astype(np.float64)
        wi = np.floor(
            w.filter(mask).to_numpy(zero_copy_only=False).astype(np.float64)
        ).astype(np.int64)
        keep = wi >= 1
        return pa.table(
            {
                "key": k.filter(pa.array(keep)),
                "u": pa.array(_float64_to_ordered_u64(x[keep]), pa.uint64()),
                "w": pa.array(wi[keep], pa.int64()),
            }
        )

    us = ds.map_batches(
        to_u, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # slim (key, u[, w]): re-streamed once per bisection pass

    if weight_col is None:
        counts = us.groupby("key").aggregate(Count()).take_all()
        count_field = "count()"
    else:
        counts = us.groupby("key").aggregate(Sum("w")).take_all()
        count_field = "sum(w)"
    # bounded: one row per key (bounded key domain by contract)
    state: dict = {}  # (key, q_idx) -> [lo, hi, rank]
    for r in counts:
        n = int(r[count_field])
        if n:
            for qi, (q_num, q_den) in enumerate(ratios):
                rank = (q_num * n + q_den - 1) // q_den  # ceil(q·n), exact
                state[(r["key"], qi)] = [0, (1 << 64) - 1, rank]

    nq = len(ratios)
    while True:
        active = {s: v for s, v in state.items() if v[0] < v[1]}
        if not active:
            break
        plan = {}  # key -> list of (q_idx, lo, hi, binw)
        for (k, qi), (lo, hi, _rank) in active.items():
            width = hi - lo + 1
            plan.setdefault(k, []).append((qi, lo, hi, (width + nbins - 1) // nbins))
        plan_ref = ray.put(plan)

        def hist(batch: pa.Table, _plan_ref=plan_ref) -> pa.Table:
            p = ray.get(_plan_ref)
            karr = batch.column("key")
            if isinstance(karr, pa.ChunkedArray):
                karr = karr.combine_chunks()
            enc = karr.dictionary_encode()
            dvals = enc.dictionary.to_pylist()
            code = enc.indices.to_numpy(zero_copy_only=False)
            u = batch.column("u").to_numpy(zero_copy_only=False)
            wgt = (
                batch.column("w").to_numpy(zero_copy_only=False)
                if weight_col is not None
                else None
            )
            outs = []
            for qi in range(nq):
                # per-DISTINCT-key lookup (bounded), then vectorized
                st = {d: None for d in dvals}
                for d in dvals:
                    for (qj, lo, hi, bw) in p.get(d, ()):
                        if qj == qi:
                            st[d] = (lo, hi, bw)
                act = np.array([st[d] is not None for d in dvals], bool)
                if not act.any():
                    continue
                lo_a = np.array(
                    [st[d][0] if st[d] else 0 for d in dvals], np.uint64
                )
                hi_a = np.array(
                    [st[d][1] if st[d] else 0 for d in dvals], np.uint64
                )
                bw_a = np.array(
                    [st[d][2] if st[d] else 1 for d in dvals], np.uint64
                )
                m = act[code] & (u >= lo_a[code]) & (u <= hi_a[code])
                cu, cc = u[m], code[m]
                b = ((cu - lo_a[cc]) // bw_a[cc]).astype(np.int64)
                if wgt is None:
                    comb, cnt = np.unique(
                        cc.astype(np.int64) * nbins + b, return_counts=True
                    )
                else:
                    comb, inv = np.unique(
                        cc.astype(np.int64) * nbins + b, return_inverse=True
                    )
                    cnt = np.zeros(len(comb), np.int64)
                    np.add.at(cnt, inv, wgt[m])
                outs.append(
                    pa.table(
                        {
                            "key": enc.dictionary.take(
                                pa.array(comb // nbins, pa.int64())
                            ),
                            "qi": pa.array(
                                np.full(len(comb), qi, np.int64), pa.int64()
                            ),
                            "bin": pa.array(comb % nbins, pa.int64()),
                            "n_part": pa.array(cnt.astype(np.int64), pa.int64()),
                        }
                    )
                )
            if not outs:
                return pa.table(
                    {
                        "key": enc.dictionary.take(pa.array([], pa.int64())),
                        "qi": pa.array([], pa.int64()),
                        "bin": pa.array([], pa.int64()),
                        "n_part": pa.array([], pa.int64()),
                    }
                )
            return pa.concat_tables(outs)

        rows = (
            us.map_batches(hist, batch_format="pyarrow", zero_copy_batch=True)
            .groupby(["key", "qi", "bin"])
            .aggregate(Sum("n_part"))
            .take_all()
        )  # bounded: ≤ |keys|·|qs|·nbins rows by construction (audit: kth_smallest_by_multi)
        per_state_counts: dict = {s: np.zeros(nbins, np.int64) for s in active}
        for r in rows:
            s = (r["key"], int(r["qi"]))
            if s in per_state_counts:
                per_state_counts[s][int(r["bin"])] = int(r["sum(n_part)"])
        for (k, qi), (lo, hi, rank) in active.items():
            cum = np.cumsum(per_state_counts[(k, qi)])
            total = int(cum[-1])
            if rank > total:
                raise ValueError(
                    f"kth_smallest_by_multi: rank {rank} exceeds the {total} "
                    f"in-range values for key {k!r} (q index {qi})"
                )
            sel = int(np.searchsorted(cum, rank, side="left"))
            if sel > 0:
                rank -= int(cum[sel - 1])
            binw = next(
                bw for (qj, plo, phi, bw) in plan[k] if qj == qi
            )
            lo = lo + sel * binw
            hi = min(hi, lo + binw - 1)
            state[(k, qi)] = [lo, hi, rank]

    out_keys, out_qn, out_qd, out_v = [], [], [], []
    for k in sorted({k for (k, _qi) in state}):
        for qi, (q_num, q_den) in enumerate(ratios):
            out_keys.append(k)
            out_qn.append(q_num)
            out_qd.append(q_den)
            out_v.append(_ordered_u64_to_float64(state[(k, qi)][0]))
    return pa.table(
        {
            "key": pa.array(out_keys),
            "q_num": pa.array(out_qn, pa.int64()),
            "q_den": pa.array(out_qd, pa.int64()),
            "kth": pa.array(out_v, pa.float64()),
        }
    )


def weighted_median(
    ds: "ray.data.Dataset",
    col: str,
    weight_col: str,
    nbins: int = 4096,
) -> float:
    """EXACT weighted (lower) median — the smallest value v whose
    cumulative weight reaches ⌈W/2⌉ — by the same radix-bisection plan
    as ``kth_smallest``: no sort, ≤6 histogram passes over a
    materialized slim (u64, w) table, ≤ nbins driver rows per pass.
    The importance/mixture-weighting primitive (weighted percentiles
    of quality scores, token-weighted medians) that neither
    ``exact_quantiles`` (bounded-distinct contract) nor plain
    ``kth_smallest`` (unweighted) covers.

    Weights are floored to int64 (exactness contract — fractional
    weights cannot hash-match an oracle); rows with null value, null
    weight or floored weight < 1 are excluded. Total weight must fit
    int64 (Σw < 2^63, i.e. ~9·10^18 — at 10^12 rows that allows ~10^6
    average weight)."""
    from ray.data.aggregate import Sum

    def to_uw(batch: pa.Table) -> pa.Table:
        v = batch.column(col)
        w = batch.column(weight_col)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        if isinstance(w, pa.ChunkedArray):
            w = w.combine_chunks()
        mask = pc.and_(pc.is_valid(v), pc.is_valid(w))
        x = v.filter(mask).to_numpy(zero_copy_only=False).astype(np.float64)
        wi = np.floor(
            w.filter(mask).to_numpy(zero_copy_only=False).astype(np.float64)
        ).astype(np.int64)
        keep = wi >= 1
        return pa.table(
            {
                "u": pa.array(_float64_to_ordered_u64(x[keep]), pa.uint64()),
                "w": pa.array(wi[keep], pa.int64()),
            }
        )

    us = ds.map_batches(
        to_uw, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # slim (u64, w): re-streamed once per bisection pass

    total_w = us.aggregate(Sum("w"))["sum(w)"]
    if total_w is None or int(total_w) < 1:
        raise ValueError("weighted_median: no rows with positive weight")
    rank = (int(total_w) + 1) // 2  # lower weighted median, exact integer
    return _ordered_u64_to_float64(_bisect_weighted_rank(us, rank, nbins))


def _bisect_weighted_rank(us: "ray.data.Dataset", rank: int, nbins: int) -> int:
    """Radix-bisect a materialized slim ``(u:uint64, w:int64)`` table to
    the smallest u whose cumulative weight reaches ``rank`` (1-based,
    1 ≤ rank ≤ Σw) — the shared kernel of ``weighted_median`` and
    ``weighted_prefix_threshold``. ≤⌈64/log2(nbins)⌉ histogram passes,
    each moving ≤ nbins (bin, weight) rows to the driver."""
    from ray.data.aggregate import Sum

    lo, hi = 0, (1 << 64) - 1
    while lo < hi:
        width = hi - lo + 1
        binw = (width + nbins - 1) // nbins
        lo_s, binw_s, hi_s = np.uint64(lo), np.uint64(binw), np.uint64(hi)

        def hist(batch: pa.Table) -> pa.Table:
            u = batch.column("u").to_numpy(zero_copy_only=False)
            w = batch.column("w").to_numpy(zero_copy_only=False)
            m = (u >= lo_s) & (u <= hi_s)
            b = ((u[m] - lo_s) // binw_s).astype(np.int64)
            part = np.zeros(nbins, np.int64)
            np.add.at(part, b, w[m])
            nz = np.flatnonzero(part)
            return pa.table(
                {
                    "bin": pa.array(nz, pa.int64()),
                    "w_part": pa.array(part[nz], pa.int64()),
                }
            )

        rows = (
            us.map_batches(hist, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("bin")
            .aggregate(Sum("w_part"))
            .take_all()
        )  # bounded: ≤ nbins rows by construction (audit: weighted_median)
        weights = np.zeros(nbins, np.int64)
        for r in rows:
            weights[int(r["bin"])] = int(r["sum(w_part)"])
        cum = np.cumsum(weights)
        sel = int(np.searchsorted(cum, rank, side="left"))
        if sel > 0:
            rank -= int(cum[sel - 1])
        lo = lo + sel * binw
        hi = min(hi, lo + binw - 1)
    return lo


def weighted_prefix_threshold(
    ds: "ray.data.Dataset",
    col: str,
    weight_col: str,
    budget: int,
    nbins: int = 4096,
) -> tuple:
    """Greedy prefix selection under a WEIGHT BUDGET — the data-mixing
    primitive "take rows in ascending ``col`` order while the running
    ``weight_col`` total stays ≤ budget" (token-budget head selection,
    cost-capped sampling) WITHOUT a global sort: one slim projection +
    the ``weighted_median`` radix bisection aimed at the absolute
    cumulative rank ``budget+1``.

    Returns ``(threshold, total_w)``: rows with ``col < threshold``
    are EXACTLY the greedy prefix (cumulative weight ≤ budget);
    ``threshold is None`` means the whole input fits the budget.
    Correctness needs ``col`` values UNIQUE per row (pack a tiebreak id
    into the low bits, as ``token_budget_head`` does) — with duplicate
    keys the strict-< cut cannot split inside a tie group. Weights are
    floored to int64; rows with null value/weight or floored weight < 1
    carry no weight (they are cut by the same threshold, matching SQL
    running-sum semantics where a zero-weight row never moves the
    cumulative). Σw must fit int64."""
    from ray.data.aggregate import Sum

    if budget < 0:
        raise ValueError("weighted_prefix_threshold: budget must be >= 0")

    def to_uw(batch: pa.Table) -> pa.Table:
        v = batch.column(col)
        w = batch.column(weight_col)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        if isinstance(w, pa.ChunkedArray):
            w = w.combine_chunks()
        mask = pc.and_(pc.is_valid(v), pc.is_valid(w))
        x = v.filter(mask).to_numpy(zero_copy_only=False).astype(np.float64)
        wi = np.floor(
            w.filter(mask).to_numpy(zero_copy_only=False).astype(np.float64)
        ).astype(np.int64)
        keep = wi >= 1
        return pa.table(
            {
                "u": pa.array(_float64_to_ordered_u64(x[keep]), pa.uint64()),
                "w": pa.array(wi[keep], pa.int64()),
            }
        )

    us = ds.map_batches(
        to_uw, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # slim (u64, w): re-streamed once per bisection pass

    total_w = us.aggregate(Sum("w"))["sum(w)"]
    total_w = 0 if total_w is None else int(total_w)
    if total_w <= budget:
        return None, total_w
    u_star = _bisect_weighted_rank(us, budget + 1, nbins)
    return _ordered_u64_to_float64(u_star), total_w


# ---------------------------------------------------------------------------
# count-min sketch


_CMS_MULT = np.array(
    [0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB, 0xD6E8FEB86659FD93],
    np.uint64,
)
_CMS_ADD = np.array(
    [0x2545F4914F6CDD1D, 0x27220A95FE58F3F9, 0x1D8E4E27C47D124F, 0xA24BAED4963EE407],
    np.uint64,
)


def _cms_cells(h: np.ndarray, width: int, depth: int) -> np.ndarray:
    """(depth, n) int64 cell ids in [0, depth·width): row d uses an
    independent affine remix of the base 64-bit hash. Vectorized."""
    if depth > len(_CMS_MULT):
        raise ValueError(f"depth ≤ {len(_CMS_MULT)} supported")
    out = np.empty((depth, len(h)), np.int64)
    for d in range(depth):
        hd = h * _CMS_MULT[d] + _CMS_ADD[d]  # uint64 wraparound is the mix
        out[d] = (np.right_shift(hd, np.uint64(17)) % np.uint64(width)).astype(
            np.int64
        ) + d * width
    return out


def cms_build(
    ds: "ray.data.Dataset", col: str, width: int = 4096, depth: int = 4
) -> "ray.data.Dataset":
    """Count-min sketch of ``col``'s non-null value frequencies as a
    DISTRIBUTED ``(cell:int64, cnt:int64)`` table of the non-zero
    cells — never a dense matrix on the driver.

    Per batch the depth×width counters come from ``np.bincount`` (one
    pass per depth row); merge is elementwise ADD, i.e. one
    ``groupby(cell).sum`` over ≤ depth·width bounded keys — a tiny
    shuffle regardless of input scale. Point estimates then read
    ``depth`` cells per query key (``cms_point_estimates``). Standard
    CM guarantees: est ≥ true; est ≤ true + e/width·N with prob
    1−exp(−depth) (Cormode & Muthukrishnan 2005)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        h = _hash64_column(batch.column(col))  # nulls dropped
        if len(h) == 0:
            return pa.table(
                {"cell": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())}
            )
        cells = _cms_cells(h, width, depth).ravel()
        counts = np.bincount(cells, minlength=depth * width)
        nz = np.nonzero(counts)[0]
        return pa.table(
            {
                "cell": pa.array(nz.astype(np.int64)),
                "cnt": pa.array(counts[nz].astype(np.int64)),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("cell")
        .aggregate(Sum("cnt"))
    )

    def rename(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [b.column("cell"), pc.cast(b.column("sum(cnt)"), pa.int64())],
            names=["cell", "cnt"],
        )

    return agg.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)


def cms_point_estimates(
    cms: "ray.data.Dataset",
    keys: pa.Array,
    width: int = 4096,
    depth: int = 4,
) -> pa.Table:
    """Frequency estimates for explicit ``keys`` from a ``cms_build``
    table: min over each key's ``depth`` cells. The sketch stays
    distributed — only the ≤ depth·|keys| relevant cells are filtered
    map-side and pulled (bounded by the query-key count)."""
    h = _hash64_column(keys)
    cells = _cms_cells(h, width, depth)  # (depth, |keys|)
    wanted = np.unique(cells.ravel())
    wanted_arr = pa.array(wanted, pa.int64())

    def pick(b: pa.Table) -> pa.Table:
        m = pc.is_in(b.column("cell"), value_set=wanted_arr)
        return b.filter(m)

    rows = cms.map_batches(
        pick, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()  # bounded: ≤ depth·|keys| cells
    got = {int(r["cell"]): int(r["cnt"]) for r in rows}
    est = np.array(
        [min(got.get(int(c), 0) for c in cells[:, i]) for i in range(len(h))],
        np.int64,
    )
    return pa.Table.from_arrays(
        [keys, pa.array(est)], names=["key", "est"]
    )
