"""WARC (ISO 28500) source — the container Common Crawl actually
ships. The engine's canonical input is the parquet page table
(``input_hint``), but a crawl-side deployment starts from WARC shards;
this module turns WARC bytes into those page rows so everything
downstream (extraction, links, dedup) is unchanged.

Framing, not regex: WARC records are length-prefixed
(``Content-Length`` counts the payload bytes), so the parser walks
record headers and SEEKS over payloads — a page whose body happens to
contain ``WARC/1.0`` can never tear a record. Response records carry
an HTTP message; the HTTP header block is split off at its first blank
line. Non-response records (warcinfo, request, metadata) are skipped.

Scale shape: one WARC shard = one blob = one parse call inside
``map_batches`` (shards are the parallelism unit, exactly like the
parquet fragments in ``pipelines/extract.py``); parsing is a linear
scan with zero shuffle. Malformed shards degrade in-band: a torn
record ends that shard's parse at the last good boundary rather than
failing the task.

The writer exists for round-trip verification and test fixtures
(deterministic output — byte-identical for identical input), mirroring
``stages/html_tables.render_html_table_page``.
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Sequence, Tuple

import pyarrow as pa

import ray.data

_CRLF = b"\r\n"
_EPOCH_US = 1_735_689_600_000_000  # 2025-01-01T00:00:00Z (fixtures.EPOCH_US)


def _ts_to_warc_date(ts_us: int) -> bytes:
    """Microseconds-since-epoch → WARC-Date (ISO 8601, second
    precision, Z suffix) without consulting the wall clock."""
    import datetime as _dt

    d = _dt.datetime(2025, 1, 1, tzinfo=_dt.timezone.utc) + _dt.timedelta(
        microseconds=ts_us - _EPOCH_US
    )
    return d.strftime("%Y-%m-%dT%H:%M:%SZ").encode()


def _warc_date_to_ts(raw: bytes) -> Optional[int]:
    import datetime as _dt

    try:
        d = _dt.datetime.strptime(raw.decode("ascii"), "%Y-%m-%dT%H:%M:%SZ")
    except (ValueError, UnicodeDecodeError):
        return None
    return int(
        (d.replace(tzinfo=_dt.timezone.utc) - _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc))
        / _dt.timedelta(microseconds=1)
    )


def _gzip_member(raw: bytes) -> bytes:
    """One deterministic gzip member (no mtime/filename — byte-stable
    output), the per-record compression Common Crawl uses so a reader
    can seek to any record boundary."""
    import zlib

    co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
    return co.compress(raw) + co.flush()


def write_warc_bytes(
    records: Sequence[Tuple[str, int, bytes]],
    shard_id: int = 0,
    gzip_members: bool = False,
) -> bytes:
    """(url, ts_us, payload[, http_status[, content_type]]) rows → one
    WARC/1.0 shard: a warcinfo header record followed by one response
    record per row, each with an HTTP/1.1 message (status defaults to
    200 — re-crawl fixtures carry 4xx/5xx versions; content type
    defaults to text/html — mixed-media crawls carry
    text/plain/application/pdf). Deterministic (record ids derive from
    the shard id + position, never a clock or UUID). With
    ``gzip_members=True`` each record is its own gzip member — the
    actual ``.warc.gz`` layout Common Crawl distributes."""
    out: List[bytes] = []

    def record(wtype: bytes, headers: List[Tuple[bytes, bytes]], body: bytes) -> None:
        head = [b"WARC/1.0"]
        head.append(b"WARC-Type: " + wtype)
        for k, v in headers:
            head.append(k + b": " + v)
        head.append(b"Content-Length: " + str(len(body)).encode())
        raw = _CRLF.join(head) + _CRLF + _CRLF + body + _CRLF + _CRLF
        out.append(_gzip_member(raw) if gzip_members else raw)

    record(
        b"warcinfo",
        [(b"WARC-Record-ID", b"<urn:shard:%d:info>" % shard_id),
         (b"Content-Type", b"application/warc-fields")],
        b"software: pdf-table-extractor-ray\r\n",
    )
    for i, rec in enumerate(records):
        url, ts_us, payload = rec[0], rec[1], rec[2]
        status = int(rec[3]) if len(rec) > 3 else 200
        ctype = rec[4] if len(rec) > 4 else "text/html; charset=utf-8"
        http = (
            b"HTTP/1.1 " + str(status).encode() + b" OK\r\n"
            b"Content-Type: " + ctype.encode() + b"\r\n"
            b"Content-Length: " + str(len(payload)).encode() + b"\r\n\r\n"
        ) + payload
        record(
            b"response",
            [
                (b"WARC-Record-ID", b"<urn:shard:%d:%d>" % (shard_id, i)),
                (b"WARC-Target-URI", url.encode()),
                (b"WARC-Date", _ts_to_warc_date(int(ts_us))),
                (b"Content-Type", b"application/http; msgtype=response"),
            ],
            http,
        )
    return b"".join(out)


def _inflate_members(data: bytes) -> bytes:
    """Member-gzipped shard (.warc.gz): inflate members sequentially —
    decompressobj stops at each member boundary and hands back the rest
    via unused_data, so a corrupt member ends the scan in-band exactly
    like a torn plain record."""
    import zlib

    chunks: List[bytes] = []
    rest = bytes(data)
    while rest[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            chunks.append(d.decompress(rest))
            chunks.append(d.flush())
        except zlib.error:
            break
        if not d.eof:
            break  # truncated final member
        rest = d.unused_data
    return b"".join(chunks)


def _iter_raw_records(
    data: bytes,
) -> Iterator[Tuple[bytes, bytes, Optional[int], bytes]]:
    """Content-Length-framed walk over one WARC-family shard, yielding
    (warc_type, target_uri, ts_us, body) per record. Torn or malformed
    trailing bytes end the scan at the last good boundary."""
    if data[:2] == b"\x1f\x8b":
        data = _inflate_members(data)
    pos = 0
    n = len(data)
    while pos < n:
        head_end = data.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            return
        head = data[pos:head_end]
        if not head.startswith(b"WARC/"):
            return
        wtype = b""
        url = b""
        ts: Optional[int] = None
        length = -1
        for line in head.split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            k = k.strip().lower()
            v = v.strip()
            if k == b"warc-type":
                wtype = v
            elif k == b"warc-target-uri":
                url = v
            elif k == b"warc-date":
                ts = _warc_date_to_ts(v)
            elif k == b"content-length":
                try:
                    length = int(v)
                except ValueError:
                    return
        body_start = head_end + 4
        if length < 0 or body_start + length > n:
            return  # torn record
        body = data[body_start : body_start + length]
        pos = body_start + length
        # consume the record separator (two CRLFs), tolerantly
        while data[pos : pos + 2] == _CRLF:
            pos += 2
        yield wtype, url, ts, body


def iter_warc_records(
    data: bytes,
) -> Iterator[Tuple[str, Optional[int], bytes, int, str]]:
    """Walk one WARC shard by Content-Length framing, yielding
    (url, ts_us, html_payload, http_status, content_type) for each
    response record — status/content-type come from the embedded HTTP
    message (0/"" when absent) so downstream can apply the standard
    Common-Crawl admission filter (status 200, text/html) without
    re-parsing. Torn or malformed trailing bytes end the scan at the
    last good boundary."""
    for wtype, url, ts, body in _iter_raw_records(data):
        if wtype == b"response" and url:
            http_split = body.find(_CRLF + _CRLF)
            payload = body[http_split + 4 :] if http_split >= 0 else body
            status = 0
            ctype = ""
            if http_split >= 0:
                http_head = body[:http_split].split(_CRLF)
                first = http_head[0].split(b" ")
                if len(first) >= 2 and first[0].startswith(b"HTTP/"):
                    try:
                        status = int(first[1])
                    except ValueError:
                        status = 0
                for hline in http_head[1:]:
                    hk, _, hv = hline.partition(b":")
                    if hk.strip().lower() == b"content-type":
                        ctype = hv.strip().decode("utf-8", "replace")
                        break
            yield url.decode("utf-8", "replace"), ts, payload, status, ctype


def parse_warc_batches(ds: "ray.data.Dataset", blob_col: str = "warc") -> "ray.data.Dataset":
    """Dataset of WARC shard blobs → page rows (url, warc_ts:
    timestamp[us], html: binary, http_status: int32, content_type:
    string) — ready for the standard admission filter
    (``http_status == 200 and content_type starts with text/html``)."""

    def per_batch(b: pa.Table) -> pa.Table:
        urls: List[str] = []
        tss: List[Optional[int]] = []
        payloads: List[bytes] = []
        statuses: List[int] = []
        ctypes: List[str] = []
        for blob in b.column(blob_col).to_pylist():
            if blob is None:
                continue
            for url, ts, payload, status, ctype in iter_warc_records(blob):
                urls.append(url)
                tss.append(ts)
                payloads.append(payload)
                statuses.append(status)
                ctypes.append(ctype)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.timestamp("us")),
                "html": pa.array(payloads, pa.binary()),
                "http_status": pa.array(statuses, pa.int32()),
                "content_type": pa.array(ctypes, pa.string()),
            }
        )

    return ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)


def write_wet_bytes(
    records: Sequence[Tuple[str, int, str]],
    shard_id: int = 0,
    gzip_members: bool = False,
) -> bytes:
    """(url, ts_us, text) rows → one WET shard — the WARC *conversion*
    sibling Common Crawl ships extracted text in: a warcinfo record
    (``conformsTo`` the WET profile) followed by one
    ``WARC-Type: conversion`` record per row with a ``text/plain``
    UTF-8 payload and a ``WARC-Refers-To`` id pointing at the source
    response record position. Deterministic like ``write_warc_bytes``;
    this is the engine's extraction EXPORT format (pages in → WARC,
    extracted text out → WET)."""
    out: List[bytes] = []

    def record(wtype: bytes, headers: List[Tuple[bytes, bytes]], body: bytes) -> None:
        head = [b"WARC/1.0", b"WARC-Type: " + wtype]
        for k, v in headers:
            head.append(k + b": " + v)
        head.append(b"Content-Length: " + str(len(body)).encode())
        raw = _CRLF.join(head) + _CRLF + _CRLF + body + _CRLF + _CRLF
        out.append(_gzip_member(raw) if gzip_members else raw)

    record(
        b"warcinfo",
        [(b"WARC-Record-ID", b"<urn:wet:%d:info>" % shard_id),
         (b"Content-Type", b"application/warc-fields")],
        b"software: pdf-table-extractor-ray\r\n"
        b"conformsTo: WET extracted-text profile\r\n",
    )
    for i, (url, ts_us, text) in enumerate(records):
        record(
            b"conversion",
            [
                (b"WARC-Record-ID", b"<urn:wet:%d:%d>" % (shard_id, i)),
                (b"WARC-Refers-To", b"<urn:shard:%d:%d>" % (shard_id, i)),
                (b"WARC-Target-URI", url.encode()),
                (b"WARC-Date", _ts_to_warc_date(int(ts_us))),
                (b"Content-Type", b"text/plain"),
            ],
            text.encode("utf-8"),
        )
    return b"".join(out)


def iter_wet_records(data: bytes) -> Iterator[Tuple[str, Optional[int], str]]:
    """Walk one WET shard, yielding (url, ts_us, text) per conversion
    record — same Content-Length framing and in-band torn-shard
    semantics as ``iter_warc_records``."""
    for wtype, url, ts, body in _iter_raw_records(data):
        if wtype == b"conversion" and url:
            yield url.decode("utf-8", "replace"), ts, body.decode("utf-8", "replace")


def parse_wet_batches(ds: "ray.data.Dataset", blob_col: str = "wet") -> "ray.data.Dataset":
    """Dataset of WET shard blobs → extracted-text rows
    (url, warc_ts: timestamp[us], text: string)."""

    def per_batch(b: pa.Table) -> pa.Table:
        urls: List[str] = []
        tss: List[Optional[int]] = []
        texts: List[str] = []
        for blob in b.column(blob_col).to_pylist():
            if blob is None:
                continue
            for url, ts, text in iter_wet_records(blob):
                urls.append(url)
                tss.append(ts)
                texts.append(text)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.timestamp("us")),
                "text": pa.array(texts, pa.string()),
            }
        )

    return ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)


def wet_from_pages(
    ds: "ray.data.Dataset",
    url_col: str = "url",
    ts_col: str = "warc_ts",
    text_col: str = "text",
    records_per_shard: int = 128,
    gzip_members: bool = False,
) -> "ray.data.Dataset":
    """Extracted-text rows → WET shard blobs (one blob per
    ``records_per_shard`` rows WITHIN each batch — blobs never span
    batches, so output is shard-parallel and deterministic given the
    input layout). Shard ids derive from the first row's url hash so
    re-runs of the same layout write identical bytes."""
    import zlib as _zlib

    def per_batch(b: pa.Table) -> pa.Table:
        urls = b.column(url_col).to_pylist()
        tss = pa.compute.cast(b.column(ts_col), pa.int64()).to_pylist()
        texts = b.column(text_col).to_pylist()
        blobs: List[bytes] = []
        for start in range(0, len(urls), records_per_shard):
            chunk = [
                (u, int(t), x or "")
                for u, t, x in zip(
                    urls[start : start + records_per_shard],
                    tss[start : start + records_per_shard],
                    texts[start : start + records_per_shard],
                )
                if u is not None and t is not None
            ]
            if not chunk:
                continue
            shard_id = _zlib.crc32(chunk[0][0].encode()) & 0x7FFFFFFF
            blobs.append(write_wet_bytes(chunk, shard_id=shard_id, gzip_members=gzip_members))
        return pa.table({"wet": pa.array(blobs, pa.binary())})

    return ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)


def read_warc(paths) -> "ray.data.Dataset":
    """WARC files on disk → page rows; one file = one parallelism
    unit (``read_binary_files`` gives one row per shard)."""
    files = ray.data.read_binary_files(paths)

    def rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(["warc"])

    return parse_warc_batches(
        files.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)
    )
