"""CDX indexing (sources/cdx.py): SURT keys, offset/length slices,
gzip-member addressing, point fetch."""

import pyarrow as pa

from pdf_table_extractor_ray.sources.cdx import (
    build_cdx,
    fetch_warc_record,
    iter_warc_index,
    surt,
)
from pdf_table_extractor_ray.sources.warc import _EPOCH_US, write_warc_bytes


def test_surt_rules():
    assert surt("https://Docs.Example.org:443/a/b?q=1#frag") == "org,example,docs)/a/b?q=1"
    assert surt("http://example.org:80/") == "org,example)/"
    assert surt("http://example.org:8080/x") == "org,example:8080)/x"
    assert surt("https://user@host.test/p") == "test,host)/p"
    assert surt("https://a.test") == "test,a)/"


def _shard(gz):
    recs = [
        (f"https://a.test/{i}", _EPOCH_US + i * 1_000_000, f"payload {i} {'x' * i}".encode())
        for i in range(5)
    ]
    return recs, write_warc_bytes(recs, shard_id=3, gzip_members=gz)


def test_index_offsets_slice_to_single_records_plain_and_gzip():
    for gz in (False, True):
        recs, blob = _shard(gz)
        rows = list(iter_warc_index(blob))
        assert [r[0] for r in rows] == [u for u, _, _ in recs]
        for (url, ts, off, ln, _dig), (u, t, payload) in zip(rows, recs):
            got = fetch_warc_record(blob, off, ln)
            assert got == (u, t, payload)
        # slices tile the response region without overlap
        for (_, _, o1, l1, _), (_, _, o2, _, _) in zip(rows, rows[1:]):
            assert o1 + l1 <= o2


def test_index_digest_matches_payload_crc():
    import zlib

    recs, blob = _shard(False)
    for (_, _, _, _, dig), (_, _, payload) in zip(iter_warc_index(blob), recs):
        assert dig == zlib.crc32(payload)


def test_fetch_bad_slice_returns_none():
    _, blob = _shard(False)
    assert fetch_warc_record(blob, 1, 10) is None


def test_build_cdx_stage(ray_session):
    import ray

    recs, blob = _shard(True)
    ds = ray.data.from_arrow(
        pa.table({"warc": pa.array([blob], pa.binary()), "shard": pa.array([3], pa.int64())})
    )
    rows = build_cdx(ds).take_all()
    assert len(rows) == 5
    assert all(r["shard"] == 3 for r in rows)
    assert rows[0]["surt_key"] == "test,a)/0"
    got = fetch_warc_record(blob, rows[2]["offset"], rows[2]["length"])
    assert got == recs[2][:2] + (recs[2][2],)


def test_pack_key_prefix_orders_lexicographically():
    import numpy as np

    from pdf_table_extractor_ray.sources.cdx import pack_key_prefix

    keys = ["test,a)/", "test,a)/x", "test,b)/", "org,z)/", "a", ""]
    packed = pack_key_prefix(keys)
    # packed order must agree with byte order on the 8-byte prefix
    bytes8 = [k.encode()[:8] for k in keys]
    assert list(np.argsort(packed, kind="stable")) == sorted(
        range(len(keys)), key=lambda i: bytes8[i]
    )
    assert (packed >= 0).all()


def test_cdx_partition_certificate_nonoverlap_and_balance(ray_session):
    import numpy as np
    import ray

    from pdf_table_extractor_ray.sources.cdx import cdx_partition_certificate

    rng = np.random.default_rng(3)
    hosts = [f"d{int(x)}.test" for x in rng.integers(0, 97, 4000)]
    keys = [f"test,{h.split('.')[0]})/p{i}" for i, h in enumerate(hosts)]
    ds = ray.data.from_arrow(
        pa.table({"surt_key": pa.array(keys, pa.string())})
    ).repartition(6)
    cert = sorted(
        cdx_partition_certificate(ds, n_parts=8).take_all(), key=lambda r: r["part"]
    )
    assert sum(r["n_keys"] for r in cert) == 4000
    # contiguous non-overlapping key ranges across parts
    for a, b in zip(cert, cert[1:]):
        assert a["max_packed"] <= b["min_packed"]
    # balance: no part more than ~3x the ideal share (duplicate-prefix
    # mass at boundaries is the only allowed imbalance)
    assert max(r["n_keys"] for r in cert) <= 3 * (4000 // len(cert))
