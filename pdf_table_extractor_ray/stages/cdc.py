"""Content-defined chunking (CDC) over BINARY payloads — the
web-archive dedup primitive (Rabin fingerprinting / FastCDC family:
Muthitacharoen et al. LBFS SOSP'01, Xia et al. FastCDC ATC'16).
Boundaries are placed where a rolling hash of the last ``window``
bytes hits a mask, so identical regions chunk identically even when
surrounding bytes shift — the property fixed-size blocking lacks and
the reason CDC finds duplicate payload regions across crawls.

Token-level duplicated-span machinery lives in ``stages/substrings.py``
(text); this module is its byte-level counterpart for html/PDF/media
payloads where tokenization doesn't exist.

Scale shape: chunking is a pure map (one vectorized sliding-window
matmul per payload — O(len·window) numpy, no per-byte Python); only
slim (chunk_hash, len) rows shuffle for the corpus dup reduction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_P = np.uint64(0x100000001B3)  # FNV prime as the polynomial base


def _chunk_boundaries(data: np.ndarray, window: int, mask_bits: int) -> np.ndarray:
    """End offsets (exclusive) of content-defined chunks of ``data``.
    A boundary follows position i when the polynomial hash of
    data[i-window+1 : i+1] has its low ``mask_bits`` bits zero; the
    payload end is always a boundary. Expected chunk ≈ 2^mask_bits."""
    n = len(data)
    if n <= window:
        return np.array([n], np.int64) if n else np.array([], np.int64)
    powers = np.empty(window, np.uint64)
    powers[0] = np.uint64(1)
    for j in range(1, window):
        powers[j] = powers[j - 1] * _P
    win = np.lib.stride_tricks.sliding_window_view(data, window).astype(np.uint64)
    h = win @ powers  # uint64 wraparound == mod 2^64
    mask = np.uint64((1 << mask_bits) - 1)
    hits = np.nonzero((h & mask) == 0)[0] + window  # end offsets
    if len(hits) == 0 or hits[-1] != n:
        hits = np.append(hits, n)
    return hits.astype(np.int64)


def cdc_chunk_rows(
    ds: "ray.data.Dataset",
    payload_col: str = "html",
    id_col: str = "url",
    window: int = 16,
    mask_bits: int = 11,
) -> "ray.data.Dataset":
    """Explode payloads into (id, chunk_idx, chunk_len, chunk_hash)
    rows — chunk_hash is FNV-1a over the chunk bytes (the
    ``sketches`` kernel), so identical regions across documents get
    identical hashes. Null payloads contribute nothing (in-band)."""
    from pdf_table_extractor_ray.stages.sketches import _fnv1a_bytes_array

    def explode(batch: pa.Table) -> pa.Table:
        ids, idxs, lens, chunks = [], [], [], []
        pid = batch.column(id_col).to_pylist()
        payloads = batch.column(payload_col).to_pylist()
        for rid, payload in zip(pid, payloads):
            if payload is None or rid is None:
                continue
            if isinstance(payload, str):
                payload = payload.encode("utf-8", "replace")
            data = np.frombuffer(payload, np.uint8)
            ends = _chunk_boundaries(data, window, mask_bits)
            start = 0
            for i, e in enumerate(ends):
                ids.append(rid)
                idxs.append(i)
                lens.append(int(e - start))
                chunks.append(payload[start:e])
                start = int(e)
        if not ids:
            return pa.table(
                {
                    id_col: pa.array([], pa.string()),
                    "chunk_idx": pa.array([], pa.int64()),
                    "chunk_len": pa.array([], pa.int64()),
                    "chunk_hash": pa.array([], pa.uint64()),
                }
            )
        hashes = _fnv1a_bytes_array(pa.array(chunks, pa.binary()))
        return pa.table(
            {
                id_col: pa.array(ids, pa.string()),
                "chunk_idx": pa.array(idxs, pa.int64()),
                "chunk_len": pa.array(lens, pa.int64()),
                "chunk_hash": pa.array(hashes, pa.uint64()),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)


def cdc_dup_stats(
    ds: "ray.data.Dataset",
    payload_col: str = "html",
    id_col: str = "url",
    window: int = 16,
    mask_bits: int = 11,
) -> "ray.data.Dataset":
    """One-row corpus summary of payload-region duplication:
    (n_chunks, n_distinct, n_dup_hashes, dup_bytes) where dup_bytes
    counts every byte beyond the first copy of each duplicated chunk
    — the storage CDC dedup would reclaim. Only slim
    (hash, len, n) rows shuffle; the driver sees 4 integers."""
    from ray.data.aggregate import Sum

    rows = cdc_chunk_rows(ds, payload_col, id_col, window, mask_bits)

    def precount(b: pa.Table) -> pa.Table:
        t = (
            b.select(["chunk_hash", "chunk_len"])
            .group_by("chunk_hash")
            .aggregate([("chunk_len", "count"), ("chunk_len", "min")])
        )
        return pa.table(
            {
                "h": t.column("chunk_hash"),
                "n_part": pc.cast(t.column("chunk_len_count"), pa.int64()),
                "clen": pc.cast(t.column("chunk_len_min"), pa.int64()),
            }
        )

    from ray.data.aggregate import Min

    per_hash = (
        rows.map_batches(precount, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("h")
        .aggregate(Sum("n_part"), Min("clen"))
    )

    def summarize(b: pa.Table) -> pa.Table:
        n = pc.cast(b.column("sum(n_part)"), pa.int64()).to_numpy(zero_copy_only=False)
        clen = pc.cast(b.column("min(clen)"), pa.int64()).to_numpy(zero_copy_only=False)
        dup = n > 1
        return pa.table(
            {
                "n_chunks": pa.array([int(n.sum())], pa.int64()),
                "n_distinct": pa.array([len(n)], pa.int64()),
                "n_dup_hashes": pa.array([int(dup.sum())], pa.int64()),
                "dup_bytes": pa.array(
                    [int(((n[dup] - 1) * clen[dup]).sum())], pa.int64()
                ),
            }
        )

    from ray.data.aggregate import Sum as _S

    partial_sums = per_hash.map_batches(summarize, batch_format="pyarrow")
    agg = partial_sums.aggregate(
        _S("n_chunks"), _S("n_distinct"), _S("n_dup_hashes"), _S("dup_bytes")
    )
    return ray.data.from_items(
        [
            {
                "n_chunks": int(agg["sum(n_chunks)"] or 0),
                "n_distinct": int(agg["sum(n_distinct)"] or 0),
                "n_dup_hashes": int(agg["sum(n_dup_hashes)"] or 0),
                "dup_bytes": int(agg["sum(dup_bytes)"] or 0),
            }
        ]
    )
