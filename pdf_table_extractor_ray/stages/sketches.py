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
