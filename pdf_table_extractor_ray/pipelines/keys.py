"""Deterministic partitioning keys (SURVEY §7.3).

- ``part_id = crc32(url) % P`` — the output-partition / lineage /
  resume unit. crc32, not Python ``hash()``: stable across processes
  and nodes (PYTHONHASHSEED-independent), cheap, and vectorizable.
- ``size_class = digitize(payload bytes)`` — the skew-bucketing key:
  long-tail documents (≈1 MB fixtures vs ≈1 KB median) are routed to
  a dedicated actor pool with a smaller batch size so a handful of
  giants cannot straggle a whole stage (the scaled-up version of the
  reference's 5-page block loop, conversor_itau.py:30-37).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

DEFAULT_NUM_PARTITIONS = 64

# byte-length boundaries between size classes 0,1,2 (small/medium/large)
SIZE_CLASS_BOUNDS = (8 * 1024, 256 * 1024)


def part_id_for_url(url: str, num_partitions: int = DEFAULT_NUM_PARTITIONS) -> int:
    return zlib.crc32(url.encode()) % num_partitions


def size_class_for_len(n: int) -> int:
    return int(np.digitize(n, SIZE_CLASS_BOUNDS))


def add_keys_batch(batch: pa.Table, num_partitions: int = DEFAULT_NUM_PARTITIONS) -> pa.Table:
    """Vectorized key-add over one Arrow batch: appends ``part_id`` and
    ``size_class`` columns. Runs as a stateless ``map_batches`` task."""
    urls = batch.column("url").to_pylist()
    part = np.fromiter(
        (zlib.crc32(u.encode()) % num_partitions for u in urls), dtype=np.int64, count=len(urls)
    )
    html_len = pc.binary_length(batch.column("html")).to_numpy(zero_copy_only=False)
    text_len = pc.utf8_length(batch.column("text")).to_numpy(zero_copy_only=False)
    sz = np.digitize(html_len + text_len, SIZE_CLASS_BOUNDS).astype(np.int32)
    out = batch.append_column("part_id", pa.array(part, pa.int64()))
    out = out.append_column("size_class", pa.array(sz, pa.int32()))
    return out
