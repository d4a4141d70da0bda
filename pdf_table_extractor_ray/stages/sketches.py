"""Cardinality sketches — approximate distinct counts at 100 TB scale.

HyperLogLog (Flajolet et al. 2007) with the standard small-range
linear-counting correction: per-batch register partials (2^p bytes
each) are max-merged, so the only data movement is one tiny register
array per block — never the keys. Register max-merge is commutative
and associative, so the estimate is **deterministic across block
counts, block orders and cluster sizes** (unlike sampling) — the same
corpus always yields the same number.

Hashing uses md5 (stable across processes/machines; crc32's 32 bits
would cap the sketch's usable range).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

HLL_P = 12  # 4096 registers → ~1.6% standard error, 4 KB per partial
_M = 1 << HLL_P


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
    """Register array for one batch of values (any dtype; hashed via
    md5 of the utf-8 repr for strings / raw bytes for binary)."""
    regs = np.zeros(_M, np.uint8)
    for v in values:
        if v is None:
            continue
        data = v if isinstance(v, bytes) else str(v).encode()
        h = int.from_bytes(hashlib.md5(data).digest()[:8], "big")
        idx = h >> (64 - HLL_P)
        rest = (h << HLL_P) & ((1 << 64) - 1)
        # rank = 1 + leading zeros of the remaining bits (exact via
        # bit_length; capped at the register width)
        cap = 64 - HLL_P + 1
        rank = cap if rest == 0 else min(64 - rest.bit_length() + 1, cap)
        if rank > regs[idx]:
            regs[idx] = rank
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
        regs = hll_registers(batch.column(col).to_pylist())
        return pa.Table.from_arrays(
            [pa.array([regs.tobytes()], pa.binary())], names=["regs"]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).take_all()
    merged = np.zeros(_M, np.uint8)
    for r in partials:
        merged = np.maximum(merged, np.frombuffer(r["regs"], np.uint8))
    est = int(round(hll_estimate(merged)))
    return ray.data.from_items([{"approx_distinct": est}])
