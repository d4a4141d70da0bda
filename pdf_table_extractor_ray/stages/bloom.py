"""Bloom-filter membership screen — the 100 TB decontamination path.

The exact contamination screen (``chunks.contamination_batch``)
broadcasts the benchmark chunk set itself and probes with ``pc.is_in``
— fine while the set fits comfortably in every worker's heap. At real
scale the screened set (benchmark n-grams, a blocklist of URLs, seen
document hashes from a prior crawl) can be billions of entries; the
classic answer is a Bloom filter (Bloom 1970; CCNet/Gopher-style
decontamination uses the same trick): ``m`` bits + ``k`` hashes give a
fixed-size bitmap with **zero false negatives** (nothing contaminated
slips through) and a tunable false-positive rate
``(1 − e^{−kn/m})^k`` (a few clean rows over-flagged).

Everything is vectorized: values hash once through the existing
``_hash64_column`` (vectorized FNV-1a + splitmix64), the ``k`` probe
positions derive arithmetically via Kirsch–Mitzenmacher double
hashing (g_i = h1 + i·h2 mod m, h2 forced odd, m a power of two) —
no per-row Python, no per-hash rescan of the data.

Scale shape: the build is a map of per-batch partial bitmaps OR-merged
on the driver (one m/8-byte array per block — same bounded-partial
contract as the HLL registers; at 100 TB use a tree of OR-merges or
build from the already-deduped benchmark set, which is small by
definition). The probe side ships ONE bitmap via ``ray.put`` and runs
map-only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from pdf_table_extractor_ray.stages.sketches import _hash64_column
from pdf_table_extractor_ray.stages.textstats import _splash64

BLOOM_M_BITS = 1 << 20  # 128 KiB bitmap
BLOOM_K = 7

_H2_TWEAK = np.uint64(0xA5A5A5A55A5A5A5A)


def _positions(h: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) int64 bit positions via double hashing; ``m_bits`` must
    be a power of two (masked modulo)."""
    assert m_bits & (m_bits - 1) == 0, "m_bits must be a power of two"
    h2 = _splash64(h ^ _H2_TWEAK) | np.uint64(1)
    ii = np.arange(k, dtype=np.uint64)
    mask = np.uint64(m_bits - 1)
    return ((h[:, None] + ii[None, :] * h2[:, None]) & mask).astype(np.int64)


def bloom_from_values(col, m_bits: int = BLOOM_M_BITS, k: int = BLOOM_K) -> np.ndarray:
    """Packed bitmap (uint8[m_bits/8]) with every value of ``col``
    (Arrow array/chunked array; nulls skipped) inserted."""
    bits = np.zeros(m_bits // 8, np.uint8)
    h = _hash64_column(col if isinstance(col, (pa.Array, pa.ChunkedArray)) else pa.array(col))
    if len(h) == 0:
        return bits
    pos = _positions(h, m_bits, k).ravel()
    np.bitwise_or.at(bits, pos >> 3, (np.uint8(1) << (pos & 7).astype(np.uint8)))
    return bits


def bloom_contains(col, bits: np.ndarray, m_bits: int = BLOOM_M_BITS, k: int = BLOOM_K) -> np.ndarray:
    """Boolean membership mask for ``col`` (True = possibly inserted;
    False = DEFINITELY not inserted). Null rows probe as False."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    out = np.zeros(n, bool)
    if n == 0:
        return out
    valid = ~np.asarray(col.is_null())
    h = _hash64_column(col)  # drops nulls, order-preserving
    if len(h):
        pos = _positions(h, m_bits, k)
        hit = ((bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1).all(axis=1)
        out[np.flatnonzero(valid)] = hit
    return out


def bloom_build(
    ds: "ray.data.Dataset",
    col: str,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> np.ndarray:
    """Distributed build: per-batch partial bitmaps, OR-merged on the
    driver (bounded: one m/8-byte array per block). Deterministic
    across block layouts (bitwise OR is commutative/associative)."""

    def partial(batch: pa.Table) -> pa.Table:
        b = bloom_from_values(batch.column(col), m_bits, k)
        return pa.Table.from_arrays([pa.array([b.tobytes()], pa.binary())], names=["bits"])

    merged = np.zeros(m_bits // 8, np.uint8)
    for row in ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).take_all():
        merged |= np.frombuffer(row["bits"], np.uint8)
    return merged
