"""KLL rank-quantile sketch (Karnin–Lang–Liberty 2016) — ONE-PASS
approximate quantiles with no range assumption.

The existing ``sketches.approx_quantiles`` is a fixed-width histogram:
it needs a min/max pass first (two scans) and its error is value-space
(bin width). KLL is the complement: a single scan, RANK-space error
(±ε·n whatever the value distribution — heavy tails and outliers cost
nothing), the sketch every streaming engine ships as its default
quantile. This implementation is deterministic: compaction keeps
odd/even items by a counter-seeded splitmix64 bit rather than a
random coin, so the same input in the same block layout reproduces
bit-identically (layout-different runs agree within the ε bound —
tested).

Distributed shape: per-batch sketches (bounded: k floats per level,
≤ ~log₂(n/k) levels) emit as (level, value, weight) rows; ONE
``groupby(bucket)`` over 64 fixed groups merges each bucket's partial
sketches by re-compaction; the ≤64 bucket sketches merge on the
driver (≤ 64·k·levels rows — KB-scale whatever the corpus). The raw
column never shuffles; nothing O(n) exists anywhere after the map.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

DEFAULT_K = 200


def _splitmix64(x: np.uint64) -> np.uint64:
    with np.errstate(over="ignore"):  # uint64 wraparound is the point
        x = np.uint64(x) + np.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


class KLL:
    """Mutable KLL sketch over float64 values. ``levels[i]`` holds
    UNSORTED retained values of weight 2^i; level capacity decays
    geometrically toward the top (c^depth·k, c=2/3) per the paper."""

    __slots__ = ("k", "levels", "n", "_compactions")

    def __init__(self, k: int = DEFAULT_K):
        self.k = int(k)
        self.levels: List[List[float]] = [[]]
        self.n = 0
        self._compactions = 0

    def _capacity(self, level: int) -> int:
        depth = len(self.levels) - 1 - level
        return max(int(self.k * (2.0 / 3.0) ** depth), 8)

    def update_many(self, values: np.ndarray) -> None:
        vals = values[~np.isnan(values)]
        self.n += len(vals)
        self.levels[0].extend(vals.tolist())
        self._compress()

    def _compress(self) -> None:
        i = 0
        while i < len(self.levels):
            if len(self.levels[i]) <= self._capacity(i):
                i += 1
                continue
            buf = sorted(self.levels[i])
            # deterministic coin: one splitmix bit per compaction
            self._compactions += 1
            off = int(_splitmix64(np.uint64(self._compactions)) & np.uint64(1))
            promoted = buf[off::2]
            self.levels[i] = []
            if i + 1 == len(self.levels):
                self.levels.append([])
            self.levels[i + 1].extend(promoted)
            i += 1

    def merge(self, other: "KLL") -> None:
        while len(self.levels) < len(other.levels):
            self.levels.append([])
        for i, buf in enumerate(other.levels):
            self.levels[i].extend(buf)
        self.n += other.n
        self._compress()

    def items(self) -> Tuple[np.ndarray, np.ndarray]:
        """(values, weights) of every retained item."""
        vs, ws = [], []
        for i, buf in enumerate(self.levels):
            vs.extend(buf)
            ws.extend([1 << i] * len(buf))
        return np.asarray(vs, np.float64), np.asarray(ws, np.int64)

    def quantile(self, q: float) -> float:
        vs, ws = self.items()
        if len(vs) == 0:
            return float("nan")
        order = np.argsort(vs, kind="stable")
        vs, ws = vs[order], ws[order]
        cum = np.cumsum(ws)
        target = q * cum[-1]
        idx = int(np.searchsorted(cum, target, side="left"))
        return float(vs[min(idx, len(vs) - 1)])

    def to_table(self) -> pa.Table:
        vs, ws = self.items()
        lv = np.concatenate(
            [np.full(len(buf), i, np.int64) for i, buf in enumerate(self.levels)]
        ) if any(self.levels) else np.array([], np.int64)
        return pa.table(
            {
                "level": pa.array(lv, pa.int64()),
                "value": pa.array(vs, pa.float64()),
                "n_part": pa.array(np.full(len(vs), 0, np.int64), pa.int64()),
            }
        )

    @staticmethod
    def from_rows(levels: np.ndarray, values: np.ndarray, n: int, k: int) -> "KLL":
        s = KLL(k)
        top = int(levels.max()) if len(levels) else 0
        s.levels = [[] for _ in range(top + 1)]
        for lv, v in zip(levels.tolist(), values.tolist()):
            s.levels[lv].append(v)
        s.n = n
        s._compress()
        return s


def kll_quantiles(
    ds: "ray.data.Dataset",
    col: str,
    qs=(0.25, 0.5, 0.75, 0.95),
    k: int = DEFAULT_K,
) -> pa.Table:
    """One-pass approximate quantiles of ``col``: (q, value) rows.
    Rank error ≤ ~1.7/k·n with high probability (KLL bound); value
    column never shuffles — per-batch sketches → 64-bucket merge →
    driver merge of ≤64 KB-scale sketches."""

    def sketch_batch(batch: pa.Table) -> pa.Table:
        import uuid

        v = batch.column(col)
        x = pc.cast(v, pa.float64()).to_numpy(zero_copy_only=False)
        s = KLL(k)
        s.update_many(x)
        t = s.to_table()
        # unique per-batch sketch id: merge grouping only (a different
        # id assignment changes merge ORDER, which KLL tolerates
        # within its ε bound — tested layout-invariance)
        sid = uuid.uuid4().int & ((1 << 62) - 1)
        return pa.table(
            {
                "bucket": pa.array(np.full(t.num_rows, sid % 64, np.int64), pa.int64()),
                "sketch_id": pa.array(np.full(t.num_rows, sid, np.int64), pa.int64()),
                "level": t.column("level"),
                "value": t.column("value"),
                "n_rows": pa.array(np.full(t.num_rows, s.n, np.int64), pa.int64()),
            }
        )

    def merge_bucket(group: pa.Table) -> pa.Table:
        sid = group.column("sketch_id").to_numpy(zero_copy_only=False)
        lv = group.column("level").to_numpy(zero_copy_only=False)
        vals = group.column("value").to_numpy(zero_copy_only=False)
        nr = group.column("n_rows").to_numpy(zero_copy_only=False)
        merged = KLL(k)
        for s_id in np.unique(sid):
            m = sid == s_id
            merged.merge(KLL.from_rows(lv[m], vals[m], int(nr[m][0]), k))
        t = merged.to_table()
        bucket = int(group.column("bucket")[0].as_py()) if group.num_rows else 0
        return pa.table(
            {
                "sketch_id": pa.array(np.full(t.num_rows, bucket, np.int64), pa.int64()),
                "level": t.column("level"),
                "value": t.column("value"),
                "n_rows": pa.array(np.full(t.num_rows, merged.n, np.int64), pa.int64()),
            }
        )

    parts = (
        ds.map_batches(sketch_batch, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(merge_bucket, batch_format="pyarrow")
        .take_all()
    )  # bounded: ≤ 64 sketches × k·levels rows
    final = KLL(k)
    if parts:
        rows = pa.Table.from_pylist(parts)
        sid = rows.column("sketch_id").to_numpy(zero_copy_only=False)
        lv = rows.column("level").to_numpy(zero_copy_only=False)
        vals = rows.column("value").to_numpy(zero_copy_only=False)
        nr = rows.column("n_rows").to_numpy(zero_copy_only=False)
        for s_id in np.unique(sid):
            m = sid == s_id
            final.merge(KLL.from_rows(lv[m], vals[m], int(nr[m][0]), k))
    return pa.table(
        {
            "q": pa.array(list(qs), pa.float64()),
            "value": pa.array([final.quantile(q) for q in qs], pa.float64()),
        }
    )


def kll_quantiles_by(
    ds: "ray.data.Dataset",
    key_col: str,
    col: str,
    qs=(0.25, 0.5, 0.75, 0.95),
    k: int = DEFAULT_K,
) -> "ray.data.Dataset":
    """PER-KEY one-pass quantiles: (key, q, value) rows.

    This is where rank-space sketches earn their keep over the
    histogram ``approx_quantiles_by``: that sketch bins every key into
    the same GLOBAL [min, max] edges, so two keys whose value ranges
    differ by orders of magnitude share a handful of useful bins and
    the narrow key's quantiles collapse. A per-key KLL carries its own
    adaptive support (±ε·n_key rank error regardless of scale).

    Shape: per batch, one KLL per key present (bounded by the batch's
    key count), emitted as slim (key, sketch_id, level, value, n)
    rows; ONE ``groupby(key)`` co-locates a key's partial sketches and
    the group UDF merges them and answers the quantiles directly —
    nothing returns to the driver, raw values never shuffle (only
    retained sketch items, sub-linear in n)."""
    import uuid

    def sketch_batch(batch: pa.Table) -> pa.Table:
        # SQL GROUP BY semantics: rows with a NULL key form no group.
        # Without this filter a null key dictionary-encodes to a null
        # index, to_numpy floats the codes to NaN, and np.unique/int(c)
        # crashes downstream (ADVICE-r4).
        keys = batch.column(key_col)
        if keys.null_count:
            batch = batch.filter(pc.is_valid(keys))
            keys = batch.column(key_col)
        keys_arr = keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys
        keys = keys_arr
        x = pc.cast(batch.column(col), pa.float64()).to_numpy(zero_copy_only=False)
        enc = keys.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        out_key, out_lv, out_v, out_n, out_sid = [], [], [], [], []
        for c in np.unique(codes):
            s = KLL(k)
            s.update_many(x[codes == c])
            kv = enc.dictionary[int(c)].as_py()
            sid = uuid.uuid4().int & ((1 << 62) - 1)
            for i, buf in enumerate(s.levels):
                out_key.extend([kv] * len(buf))
                out_lv.extend([i] * len(buf))
                out_v.extend(buf)
                out_n.extend([s.n] * len(buf))
                out_sid.extend([sid] * len(buf))
        return pa.table(
            {
                key_col: pa.array(out_key),
                "sketch_id": pa.array(out_sid, pa.int64()),
                "level": pa.array(out_lv, pa.int64()),
                "value": pa.array(out_v, pa.float64()),
                "n_rows": pa.array(out_n, pa.int64()),
            }
        )

    def merge_key(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table(
                {
                    key_col: pa.array([]),
                    "q": pa.array([], pa.float64()),
                    "value": pa.array([], pa.float64()),
                }
            )
        sid = group.column("sketch_id").to_numpy(zero_copy_only=False)
        lv = group.column("level").to_numpy(zero_copy_only=False)
        vals = group.column("value").to_numpy(zero_copy_only=False)
        nr = group.column("n_rows").to_numpy(zero_copy_only=False)
        merged = KLL(k)
        for s_id in np.unique(sid):
            m = sid == s_id
            merged.merge(KLL.from_rows(lv[m], vals[m], int(nr[m][0]), k))
        kv = group.column(key_col)[0].as_py()
        return pa.table(
            {
                key_col: pa.array([kv] * len(qs)),
                "q": pa.array(list(qs), pa.float64()),
                "value": pa.array([merged.quantile(q) for q in qs], pa.float64()),
            }
        )

    return (
        ds.map_batches(sketch_batch, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(key_col)
        .map_groups(merge_key, batch_format="pyarrow")
    )
