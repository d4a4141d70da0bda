"""JSONL source/sink (sources/jsonl.py)."""

import datetime
import glob
import gzip
import json

import pyarrow as pa
import pytest

from pdf_table_extractor_ray.sources.jsonl import (
    batch_to_jsonl_bytes,
    read_jsonl,
    write_jsonl_shards,
)

SCHEMA = pa.schema(
    [
        ("k", pa.int64()),
        ("s", pa.string()),
        ("v", pa.float64()),
        ("ts", pa.timestamp("us")),
    ]
)


def _tbl():
    return pa.table(
        {
            "k": pa.array([1, 2, 3], pa.int64()),
            "s": pa.array(["a", 'quote " and ünïcode', None], pa.string()),
            # 0.1 has no exact binary form — repr round-trip must
            # reproduce the identical float64 bits
            "v": pa.array([0.1, 471309.8, None], pa.float64()),
            "ts": pa.array(
                [datetime.datetime(1996, 4, 30), None, datetime.datetime(2001, 7, 6, 12, 30)],
                pa.timestamp("us"),
            ),
        }
    )


def test_lines_are_plain_json():
    lines = batch_to_jsonl_bytes(_tbl()).decode().splitlines()
    assert len(lines) == 3
    row = json.loads(lines[0])
    assert row == {"k": 1, "s": "a", "v": 0.1, "ts": "1996-04-30 00:00:00"}
    assert json.loads(lines[2])["v"] is None


@pytest.mark.parametrize("compress", [False, True])
def test_roundtrip_bit_exact(ray_session, tmp_path, compress):
    import ray

    out = str(tmp_path / ("gz" if compress else "plain"))
    ds = ray.data.from_arrow(_tbl()).repartition(2)
    write_jsonl_shards(ds, out, compress=compress)
    ext = "*.jsonl.gz" if compress else "*.jsonl"
    files = glob.glob(out + "/" + ext)
    assert files and not glob.glob(out + "/*.tmp")
    if compress:
        gzip.decompress(open(files[0], "rb").read())  # really gzip on disk
    back = read_jsonl(out, SCHEMA)
    got = sorted(back.take_all(), key=lambda r: r["k"])
    want = sorted(_tbl().to_pylist(), key=lambda r: r["k"])
    assert got == want


def test_read_empty_shard(ray_session, tmp_path):
    (tmp_path / "empty.jsonl").write_bytes(b"")
    out = read_jsonl(str(tmp_path), SCHEMA)
    assert out.count() == 0
