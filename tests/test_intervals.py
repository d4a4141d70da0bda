"""Interval (range) join operators vs brute force.

Covers: per-point counts, per-point weighted sums, per-interval
counts (LEFT semantics incl. zero-match and empty intervals),
enumerated pair join, long intervals spanning many buckets, and
timestamp-typed inputs.
"""

import numpy as np
import pyarrow as pa
import pytest

BUCKET = 100


@pytest.fixture(scope="module")
def interval_data(ray_session):
    import ray.data

    rng = np.random.default_rng(7)
    n_pts, n_iv = 300, 120
    t = rng.integers(0, 10_000, n_pts)
    s = rng.integers(0, 10_000, n_iv)
    ln = rng.integers(0, 150, n_iv)  # includes empty (len 0) intervals
    long_mask = rng.random(n_iv) < 0.1
    ln[long_mask] = rng.integers(500, 3_000, long_mask.sum())  # ≫ bucket width
    e = s + ln
    w = rng.integers(1, 100, n_iv).astype(np.int64)
    pts = ray.data.from_arrow(pa.table({"pid": np.arange(n_pts, dtype=np.int64), "t": t}))
    ivs = ray.data.from_arrow(
        pa.table({"iid": np.arange(n_iv, dtype=np.int64), "s": s, "e": e, "w": w})
    )
    return (t, s, e, w), pts, ivs


def test_count_matches_per_point(interval_data):
    from pdf_table_extractor_ray.stages.intervals import count_matches_per_point

    (t, s, e, w), pts, ivs = interval_data
    out = count_matches_per_point(
        pts, ivs, point_col="t", start_col="s", end_col="e",
        bucket_width=BUCKET, point_cols=("pid",),
    ).take_all()
    got = {r["pid"]: r["n_matches"] for r in out}
    assert len(out) == len(t)
    for pid, tv in enumerate(t):
        assert got[pid] == int(((s <= tv) & (tv < e)).sum()), pid


def test_weighted_sum_per_point(interval_data):
    from pdf_table_extractor_ray.stages.intervals import count_matches_per_point

    (t, s, e, w), pts, ivs = interval_data
    out = count_matches_per_point(
        pts, ivs, point_col="t", start_col="s", end_col="e",
        bucket_width=BUCKET, point_cols=("pid",), weight_col="w", out_col="wsum",
    ).take_all()
    got = {r["pid"]: r["wsum"] for r in out}
    for pid, tv in enumerate(t):
        assert got[pid] == int(w[(s <= tv) & (tv < e)].sum()), pid


def test_count_points_per_interval(interval_data):
    from pdf_table_extractor_ray.stages.intervals import count_points_per_interval

    (t, s, e, w), pts, ivs = interval_data
    out = count_points_per_interval(
        pts, ivs, point_col="t", start_col="s", end_col="e",
        bucket_width=BUCKET, interval_keys=("iid",),
    ).take_all()
    got = {r["iid"]: r["n_points"] for r in out}
    # LEFT semantics: every interval appears, zero-match and empty included
    assert len(got) == len(s)
    for iid in range(len(s)):
        assert got[iid] == int(((t >= s[iid]) & (t < e[iid])).sum()), iid


def test_interval_join_pairs(interval_data):
    from pdf_table_extractor_ray.stages.intervals import interval_join

    (t, s, e, w), pts, ivs = interval_data
    out = interval_join(
        pts, ivs, point_col="t", start_col="s", end_col="e",
        bucket_width=BUCKET, point_cols=("pid",), interval_cols=("iid",),
    ).take_all()
    got = {(r["pid"], r["iid"]) for r in out}
    assert len(got) == len(out)  # no duplicate pairs from replication
    want = {
        (pid, int(iid))
        for pid in range(len(t))
        for iid in np.flatnonzero((s <= t[pid]) & (t[pid] < e))
    }
    assert got == want


def test_timestamp_inputs(ray_session):
    import ray.data

    from pdf_table_extractor_ray.stages.intervals import US_PER_DAY, count_matches_per_point

    base = 800_000 * US_PER_DAY // 1000  # arbitrary epoch offset
    t_us = np.array([base, base + US_PER_DAY, base + 3 * US_PER_DAY])
    s_us = np.array([base - US_PER_DAY, base + US_PER_DAY])
    e_us = s_us + 2 * US_PER_DAY
    pts = ray.data.from_arrow(
        pa.table({"pid": np.arange(3, dtype=np.int64),
                  "ts": pa.array(t_us, pa.timestamp("us"))})
    )
    ivs = ray.data.from_arrow(
        pa.table({"s": pa.array(s_us, pa.timestamp("us")),
                  "e": pa.array(e_us, pa.timestamp("us"))})
    )
    out = count_matches_per_point(
        pts, ivs, point_col="ts", start_col="s", end_col="e",
        bucket_width=7 * US_PER_DAY, point_cols=("pid",),
    ).take_all()
    got = {r["pid"]: r["n_matches"] for r in out}
    assert got == {0: 1, 1: 1, 2: 0}
