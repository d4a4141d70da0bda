"""Unit tests for the SMB bucketed co-located join (stages/bucketed.py)."""

import os
import shutil

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from pdf_table_extractor_ray.stages.bucketed import (
    bucket_of,
    bucketed_join,
    write_bucketed,
)


@pytest.fixture()
def layout_dir(tmp_path):
    d = str(tmp_path / "bucketed")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_bucket_of_deterministic_and_balanced():
    keys = np.arange(10_000, dtype=np.int64)
    b1 = bucket_of(keys, 16)
    b2 = bucket_of(keys.copy(), 16)
    assert (b1 == b2).all()
    assert b1.min() >= 0 and b1.max() < 16
    counts = np.bincount(b1, minlength=16)
    # splitmix64 over dense keys: every bucket within 3x of fair share
    assert counts.min() > 10_000 / 16 / 3
    assert counts.max() < 10_000 / 16 * 3


def test_join_matches_pyarrow_reference(ray_session, layout_dir):
    rng = np.random.default_rng(7)
    lk = rng.integers(0, 500, 3_000).astype(np.int64)
    rk = rng.integers(0, 500, 4_000).astype(np.int64)
    lt = pa.table({"k": lk, "a": np.arange(3_000, dtype=np.int64)})
    rt = pa.table({"kk": rk, "b": np.arange(4_000, dtype=np.int64)})
    write_bucketed(ray.data.from_arrow(lt), "k", 8, os.path.join(layout_dir, "l"))
    write_bucketed(ray.data.from_arrow(rt), "kk", 8, os.path.join(layout_dir, "r"))
    got = bucketed_join(
        os.path.join(layout_dir, "l"),
        os.path.join(layout_dir, "r"),
        "k",
        "kk",
        ["a"],
        ["b"],
    ).take_all()
    want = lt.join(rt, keys=["k"], right_keys=["kk"], join_type="inner")
    got_set = sorted((r["k"], r["a"], r["b"]) for r in got)
    want_set = sorted(zip(*(want.column(c).to_pylist() for c in ("k", "a", "b"))))
    assert got_set == want_set


def test_mismatched_bucket_counts_refused(ray_session, layout_dir):
    t = pa.table({"k": pa.array([1, 2, 3], pa.int64())})
    write_bucketed(ray.data.from_arrow(t), "k", 4, os.path.join(layout_dir, "a"))
    write_bucketed(ray.data.from_arrow(t), "k", 8, os.path.join(layout_dir, "b"))
    with pytest.raises(ValueError, match="mismatch"):
        bucketed_join(
            os.path.join(layout_dir, "a"), os.path.join(layout_dir, "b"), "k", "k"
        )


def test_null_keys_never_match(ray_session, layout_dir):
    lt = pa.table({"k": pa.array([1, None, 2], pa.int64()), "a": [10, 11, 12]})
    rt = pa.table({"k": pa.array([1, None, 3], pa.int64()), "b": [20, 21, 22]})
    write_bucketed(ray.data.from_arrow(lt), "k", 4, os.path.join(layout_dir, "l"))
    write_bucketed(ray.data.from_arrow(rt), "k", 4, os.path.join(layout_dir, "r"))
    got = bucketed_join(
        os.path.join(layout_dir, "l"),
        os.path.join(layout_dir, "r"),
        "k",
        "k",
        ["a"],
        ["b"],
    ).take_all()
    assert [(r["k"], r["a"], r["b"]) for r in got] == [(1, 10, 20)]
