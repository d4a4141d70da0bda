"""CDX-style URL index over WARC shards — the Common-Crawl index
pattern: per response record, a (surt_key, ts, offset, length, digest)
row that lets a reader SEEK straight to one record in a shard without
scanning it. Offsets address the shard blob directly: for plain WARC
the framed record bytes, for member-gzipped ``.warc.gz`` the record's
own gzip member (each record is one member precisely so offsets remain
seekable after compression — the reason Common Crawl uses that layout).

Scale shape: indexing is a linear per-shard walk inside
``map_batches`` (one shard = one parallelism unit, zero shuffle);
point lookup slices ``blob[offset : offset+length]`` and parses ONE
record. The SURT key (scheme dropped, host labels reversed) makes a
sort of the index co-locate all of a host's URLs — the property the
real CDX index is sorted on.
"""

from __future__ import annotations

import zlib
from typing import Iterator, List, Optional, Tuple

import pyarrow as pa

import ray.data

from pdf_table_extractor_ray.sources.warc import _iter_raw_records, iter_warc_records

_GZ_MAGIC = b"\x1f\x8b"


def surt(url: str) -> str:
    """Sort-friendly URI Reordering Transform: drop the scheme and
    fragment, lowercase the host, strip a default port, reverse the
    host labels comma-joined, then ``)/`` + path[?query].

    ``https://Docs.Example.org:443/a/b?q=1#frag`` →
    ``org,example,docs)/a/b?q=1``.
    """
    rest = url.split("://", 1)[1] if "://" in url else url
    rest = rest.split("#", 1)[0]
    slash = rest.find("/")
    hostport, path = (rest, "") if slash < 0 else (rest[:slash], rest[slash + 1 :])
    host = hostport.rsplit("@", 1)[-1].lower()
    port = ""
    if ":" in host:
        host, _, p = host.rpartition(":")
        if p not in ("80", "443"):
            port = ":" + p
    return ",".join(reversed(host.split("."))) + port + ")/" + path


def iter_warc_index(data: bytes) -> Iterator[Tuple[str, Optional[int], int, int, int]]:
    """Walk one WARC shard yielding (url, ts_us, offset, length,
    digest) per RESPONSE record, where ``blob[offset : offset+length]``
    is independently parseable (a framed record, or one gzip member)
    and digest is the crc32 of the HTTP payload — the dedup-friendly
    content digest CDX rows carry."""
    if data[:2] == _GZ_MAGIC:
        pos = 0
        rest = bytes(data)
        while rest[:2] == _GZ_MAGIC:
            d = zlib.decompressobj(16 + zlib.MAX_WBITS)
            try:
                plain = d.decompress(rest) + d.flush()
            except zlib.error:
                return
            if not d.eof:
                return  # truncated final member
            member_len = len(rest) - len(d.unused_data)
            for url, ts, payload, _status, _ctype in iter_warc_records(plain):
                yield url, ts, pos, member_len, zlib.crc32(payload)
            pos += member_len
            rest = d.unused_data
        return
    pos = 0
    n = len(data)
    while pos < n:
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0 or not data[pos:head_end].startswith(b"WARC/"):
            return
        # frame length from the record's own walk: parse exactly one
        # record starting here, then measure how far the cursor moved
        one = data[pos:]
        end = _one_record_end(one)
        if end is None:
            return
        for url, ts, payload, _status, _ctype in iter_warc_records(one[:end]):
            yield url, ts, pos, end, zlib.crc32(payload)
        pos += end


def _one_record_end(data: bytes) -> Optional[int]:
    """Byte length of the first framed record (headers + body + the
    trailing CRLF pair), or None if torn."""
    head_end = data.find(b"\r\n\r\n")
    if head_end < 0:
        return None
    length = -1
    for line in data[:head_end].split(b"\r\n")[1:]:
        k, _, v = line.partition(b":")
        if k.strip().lower() == b"content-length":
            try:
                length = int(v.strip())
            except ValueError:
                return None
    body_start = head_end + 4
    if length < 0 or body_start + length > len(data):
        return None
    end = body_start + length
    while data[end : end + 2] == b"\r\n":
        end += 2
    return end


def fetch_warc_record(
    blob: bytes, offset: int, length: int
) -> Optional[Tuple[str, Optional[int], bytes]]:
    """Point lookup: slice one indexed record out of a shard blob and
    parse it alone — (url, ts_us, payload), or None on a bad slice.
    This is the access path a 100-TB archive uses: the index names
    (shard, offset, length); the reader issues ONE ranged read."""
    piece = bytes(blob[offset : offset + length])
    if piece[:2] == _GZ_MAGIC:
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            piece = d.decompress(piece) + d.flush()
        except zlib.error:
            return None
    for url, ts, payload, _status, _ctype in iter_warc_records(piece):
        return url, ts, payload
    return None


def build_cdx(ds: "ray.data.Dataset", blob_col: str = "warc") -> "ray.data.Dataset":
    """Dataset of WARC shard blobs (+ a ``shard`` id column if present)
    → CDX rows (surt_key, url, warc_ts, offset, length, digest[,
    shard]). Sorting the result by surt_key gives the host-clustered
    index layout the real CDX files ship in."""

    def per_batch(b: pa.Table) -> pa.Table:
        shard_ids = (
            b.column("shard").to_pylist() if "shard" in b.column_names else [None] * b.num_rows
        )
        keys: List[str] = []
        urls: List[str] = []
        tss: List[Optional[int]] = []
        offs: List[int] = []
        lens: List[int] = []
        digs: List[int] = []
        shards: List[Optional[int]] = []
        for blob, sid in zip(b.column(blob_col).to_pylist(), shard_ids):
            if blob is None:
                continue
            for url, ts, off, ln, dig in iter_warc_index(blob):
                keys.append(surt(url))
                urls.append(url)
                tss.append(ts)
                offs.append(off)
                lens.append(ln)
                digs.append(dig)
                shards.append(sid)
        cols = {
            "surt_key": pa.array(keys, pa.string()),
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "offset": pa.array(offs, pa.int64()),
            "length": pa.array(lens, pa.int64()),
            "digest": pa.array(digs, pa.int64()),
        }
        if "shard" in b.column_names:
            cols["shard"] = pa.array(shards, pa.int64())
        return pa.table(cols)

    return ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)


def pack_key_prefix(keys) -> "np.ndarray":
    """First 8 bytes of each key packed big-endian into int64 —
    integer order == lexicographic byte order for the prefix. Contract:
    7-bit ASCII keys (SURT keys are lowercase ASCII by construction),
    so the top bit is always clear and the packed value is
    non-negative."""
    import numpy as np

    out = np.zeros(len(keys), np.int64)
    for i, k in enumerate(keys):
        b = k.encode("ascii", "replace")[:8]
        out[i] = int.from_bytes(b + b"\x00" * (8 - len(b)), "big")
    return out


def cdx_partition_certificate(
    index: "ray.data.Dataset",
    n_parts: int = 8,
    key_col: str = "surt_key",
) -> "ray.data.Dataset":
    """Balanced RANGE partitioning of a CDX index by its SURT key —
    the sorted layout archive indexes ship in (a reader binary-searches
    part manifests, then one part). Boundaries are EXACT order
    statistics of the packed 8-byte key prefix (the shared
    radix-bisection selector — ≤4096 driver rows per pass); partition
    = searchsorted(boundaries, packed, right), so a part holds a
    contiguous key range and parts differ only by duplicate-prefix
    mass at the boundaries. Returns the certificate
    (part, n_keys, min_packed, max_packed): non-overlap is
    max_packed[i] ≤ min_packed[i+1] by construction, asserted in
    tests."""
    import numpy as np
    from ray.data.aggregate import Max, Min, Sum

    from pdf_table_extractor_ray.stages.sketches import kth_smallest_u64

    def add_packed(b: pa.Table) -> pa.Table:
        keys = b.column(key_col).to_pylist()
        p = pack_key_prefix(keys)
        return pa.table(
            {
                "packed": pa.array(p),
                # the selector's raw-uint64 face: packed is non-negative
                # (7-bit ASCII contract) so the reinterpret is order-true
                "u": pa.array(p.astype(np.uint64), pa.uint64()),
            }
        )

    packed = index.map_batches(add_packed, batch_format="pyarrow", zero_copy_batch=True)
    packed = packed.materialize()  # selector runs ≤6 passes over it
    n = packed.count()
    if n == 0:
        return ray.data.from_items([])
    ranks = [max(1, (i * n) // n_parts) for i in range(1, n_parts)]
    us = packed.select_columns(["u"])
    # integer-exact boundaries: packed prefixes exceed float64's 2^53
    # exact range, so the float face of the selector would collapse
    # nearby keys onto one boundary
    bounds = np.array([kth_smallest_u64(us, k) for k in ranks], np.uint64).astype(np.int64)

    def certify(b: pa.Table) -> pa.Table:
        x = b.column("packed").to_numpy(zero_copy_only=False)
        part = np.searchsorted(bounds, x, side="right").astype(np.int64)
        order = np.argsort(part, kind="stable")
        sp, sx = part[order], x[order]
        cut = np.flatnonzero(np.r_[True, sp[1:] != sp[:-1]])
        ends = np.r_[cut[1:], len(sp)]
        return pa.table(
            {
                "part": pa.array(sp[cut]),
                "n_keys": pa.array((ends - cut).astype(np.int64)),
                "min_packed": pa.array(np.minimum.reduceat(sx, cut)),
                "max_packed": pa.array(np.maximum.reduceat(sx, cut)),
            }
        )

    return (
        packed.map_batches(certify, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .aggregate(Sum("n_keys"), Min("min_packed"), Max("max_packed"))
        .map_batches(
            lambda b: b.rename_columns(["part", "n_keys", "min_packed", "max_packed"]),
            batch_format="pyarrow",
        )
    )
