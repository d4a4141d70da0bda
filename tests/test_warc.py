"""WARC source (sources/warc.py): Content-Length framing, record-type
filtering, torn-record degradation, file reading, roundtrips."""

import pyarrow as pa

from pdf_table_extractor_ray.sources.warc import (
    _EPOCH_US,
    iter_warc_records,
    parse_warc_batches,
    read_warc,
    write_warc_bytes,
)


def _mk(records, shard_id=0):
    return write_warc_bytes(records, shard_id=shard_id)


def test_roundtrip_and_warcinfo_skipped():
    recs = [
        ("https://a.test/1", _EPOCH_US, b"<html>one</html>"),
        ("https://a.test/2", _EPOCH_US + 5_000_000, b"two \xc3\xa9"),
    ]
    got = list(iter_warc_records(_mk(recs)))
    assert [(u, t, p) for u, t, p, _, _ in got] == [
        ("https://a.test/1", _EPOCH_US, b"<html>one</html>"),
        ("https://a.test/2", _EPOCH_US + 5_000_000, b"two \xc3\xa9"),
    ]


def test_payload_containing_warc_magic_does_not_tear():
    evil = b"body with\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\nfake"
    recs = [("https://a.test/x", _EPOCH_US, evil), ("https://a.test/y", _EPOCH_US, b"ok")]
    got = list(iter_warc_records(_mk(recs)))
    assert len(got) == 2
    assert got[0][2] == evil and got[1][2] == b"ok"


def test_torn_record_stops_at_last_good_boundary():
    data = _mk([("https://a.test/1", _EPOCH_US, b"good")])
    torn = data + b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 999\r\n\r\nshort"
    got = list(iter_warc_records(torn))
    assert len(got) == 1 and got[0][2] == b"good"


def test_non_warc_prefix_yields_nothing():
    assert list(iter_warc_records(b"HTTP/1.1 200 OK\r\n\r\nnope")) == []


def test_deterministic_writer():
    recs = [("https://a.test/1", _EPOCH_US, b"p")]
    assert _mk(recs, shard_id=3) == _mk(recs, shard_id=3)
    assert _mk(recs, shard_id=3) != _mk(recs, shard_id=4)


def test_parse_warc_batches(ray_session):
    import ray.data

    blobs = [
        _mk([("https://a.test/1", _EPOCH_US, b"one")], 0),
        _mk([("https://a.test/2", _EPOCH_US + 1_000_000, b"two")], 1),
        None,
    ]
    ds = ray.data.from_arrow(pa.table({"warc": pa.array(blobs, pa.binary())}))
    rows = sorted(parse_warc_batches(ds).take_all(), key=lambda r: r["url"])
    assert [r["url"] for r in rows] == ["https://a.test/1", "https://a.test/2"]
    assert [bytes(r["html"]) for r in rows] == [b"one", b"two"]
    assert rows[0]["warc_ts"] is not None


def test_read_warc_files(tmp_path, ray_session):
    p = tmp_path / "shard0.warc"
    p.write_bytes(_mk([("https://f.test/9", _EPOCH_US, b"from file")], 9))
    rows = read_warc(str(p)).take_all()
    assert len(rows) == 1
    assert rows[0]["url"] == "https://f.test/9"
    assert bytes(rows[0]["html"]) == b"from file"


def test_gzip_member_roundtrip():
    recs = [
        ("https://g.test/1", _EPOCH_US, b"alpha"),
        ("https://g.test/2", _EPOCH_US + 1_000_000, b"beta"),
    ]
    gz = write_warc_bytes(recs, shard_id=1, gzip_members=True)
    assert gz[:2] == b"\x1f\x8b"
    got = list(iter_warc_records(gz))
    assert [(u, p) for u, _, p, _, _ in got] == [
        ("https://g.test/1", b"alpha"),
        ("https://g.test/2", b"beta"),
    ]
    # plain and gzipped shards parse identically
    assert got == list(iter_warc_records(write_warc_bytes(recs, shard_id=1)))


def test_gzip_truncated_member_degrades_in_band():
    recs = [("https://g.test/1", _EPOCH_US, b"alpha"), ("https://g.test/2", _EPOCH_US, b"beta")]
    gz = write_warc_bytes(recs, shard_id=1, gzip_members=True)
    got_full = list(iter_warc_records(gz))
    assert len(got_full) == 2
    # chop the last gzip member in half: the earlier records still
    # parse, the truncated one is dropped in-band
    last_member = gz.rfind(b"\x1f\x8b\x08")
    assert last_member > 0
    torn = gz[: last_member + (len(gz) - last_member) // 2]
    got = list(iter_warc_records(torn))
    assert [u for u, *_ in got] == ["https://g.test/1"]


def test_http_status_and_content_type_surface():
    got = list(iter_warc_records(_mk([("https://a.test/1", _EPOCH_US, b"x")])))
    assert got[0][3] == 200
    assert got[0][4].startswith("text/html")


# ---------------------------------------------------------------------------
# WET (conversion records)

from pdf_table_extractor_ray.sources.warc import (  # noqa: E402
    iter_wet_records,
    parse_wet_batches,
    wet_from_pages,
    write_wet_bytes,
)


def test_wet_roundtrip_plain_and_gzip():
    rows = [
        ("https://a.test/1", _EPOCH_US + 1_000_000, "first text\nsecond line"),
        ("https://a.test/2", _EPOCH_US + 2_000_000, ""),
        ("https://a.test/3", _EPOCH_US + 3_000_000, "unicode: café €"),
    ]
    for gz in (False, True):
        blob = write_wet_bytes(rows, shard_id=7, gzip_members=gz)
        got = list(iter_wet_records(blob))
        assert got == rows


def test_wet_ignores_response_records_and_vice_versa():
    wet = write_wet_bytes([("u", _EPOCH_US, "t")], shard_id=1)
    warc = write_warc_bytes([("u", _EPOCH_US, b"<html>x</html>")], shard_id=1)
    # a WARC shard has no conversion records; a WET shard no responses
    assert list(iter_wet_records(warc)) == []
    assert list(iter_warc_records(wet)) == []


def test_wet_torn_shard_stops_at_last_boundary():
    rows = [("u1", _EPOCH_US, "aaaa"), ("u2", _EPOCH_US, "bbbb")]
    blob = write_wet_bytes(rows, shard_id=0)
    assert [u for u, _, _ in iter_wet_records(blob[:-20])] == ["u1"]


def test_wet_from_pages_stage_roundtrip(ray_session):
    import ray

    pages = pa.table(
        {
            "url": pa.array([f"https://s.test/{i}" for i in range(300)], pa.string()),
            "warc_ts": pa.array([_EPOCH_US + i for i in range(300)], pa.timestamp("us")),
            "text": pa.array([f"doc {i}" for i in range(300)], pa.string()),
        }
    )
    shards = wet_from_pages(ray.data.from_arrow(pages), records_per_shard=128)
    back = parse_wet_batches(shards).take_all()
    assert sorted((r["url"], r["text"]) for r in back) == sorted(
        (f"https://s.test/{i}", f"doc {i}") for i in range(300)
    )
