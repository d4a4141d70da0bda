"""Deterministic seeded global shuffle (stages/shuffle.py): permutation
properties, layout invariance, seed sensitivity, and the bit-exact
DuckDB splitmix64 emulation the SQL oracle rides on."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from pdf_table_extractor_ray.stages.shuffle import (
    deterministic_shuffle,
    shuffle_key,
    splitmix64_sql,
)


def _ids_table(ids, payload=None):
    cols = {"doc_id": pa.array(ids, pa.int64())}
    if payload is not None:
        cols["payload"] = pa.array(payload, pa.string())
    return pa.table(cols)


def test_sql_emulation_bit_exact():
    ids = np.arange(0, 50_000, dtype=np.int64)
    ref = shuffle_key(ids, seed=42)
    expr = splitmix64_sql("CAST(range AS HUGEINT)", seed=42)
    rows = duckdb.sql(
        f"SELECT {expr} AS h FROM range(0, 50000) ORDER BY range"
    ).fetchall()
    got = np.array([int(r[0]) for r in rows], dtype=np.uint64)
    assert (got == ref).all()


def test_shuffle_is_permutation(ray_session):
    import ray.data

    n = 5000
    ids = np.arange(n, dtype=np.int64)
    ds = ray.data.from_arrow(_ids_table(ids)).repartition(7)
    out = deterministic_shuffle(ds, "doc_id", seed=7, n_buckets=16)
    tbl = pa.concat_tables(out.iter_batches(batch_format="pyarrow", batch_size=None))
    pos = np.sort(tbl.column("pos").to_numpy(zero_copy_only=False))
    assert (pos == np.arange(n)).all()
    # pos order must equal key order
    got = tbl.to_pydict()
    order = np.argsort(np.asarray(got["pos"]))
    ids_by_pos = np.asarray(got["doc_id"])[order]
    key_sorted = ids[np.argsort(shuffle_key(ids, 7), kind="stable")]
    assert (ids_by_pos == key_sorted).all()


def test_layout_invariance_and_seed_sensitivity(ray_session):
    import ray.data

    n = 2000
    ids = np.arange(n, dtype=np.int64)

    def run(parts, seed):
        ds = ray.data.from_arrow(_ids_table(ids)).repartition(parts)
        out = deterministic_shuffle(ds, "doc_id", seed=seed, n_buckets=8)
        d = out.to_pandas().sort_values("doc_id")
        return d["pos"].to_numpy()

    a = run(3, seed=1)
    b = run(11, seed=1)
    assert (a == b).all()  # layout-invariant
    c = run(3, seed=2)
    assert (a != c).any()  # a different seed is a different permutation


def test_payload_rides_the_exchange(ray_session):
    import ray.data

    ids = np.array([10, 11, 12, 13], dtype=np.int64)
    payload = [f"p{i}" for i in ids]
    ds = ray.data.from_arrow(_ids_table(ids, payload))
    out = deterministic_shuffle(ds, "doc_id", seed=0, n_buckets=2).to_pandas()
    out = out.sort_values("doc_id")
    assert list(out["payload"]) == payload
    assert sorted(out["pos"]) == [0, 1, 2, 3]


def test_bucket_balance_is_structural():
    # avalanche uniformity: bucket spread stays tight with no sampling
    ids = np.arange(100_000, dtype=np.int64)
    bucket = (shuffle_key(ids, seed=3) >> np.uint64(58)).astype(np.int64)
    counts = np.bincount(bucket, minlength=64)
    assert counts.min() > 0.8 * counts.mean()
    assert counts.max() < 1.2 * counts.mean()


def test_bad_bucket_count_raises(ray_session):
    import ray.data

    ds = ray.data.from_arrow(_ids_table(np.arange(4, dtype=np.int64)))
    with pytest.raises(ValueError):
        deterministic_shuffle(ds, "doc_id", n_buckets=3)
    with pytest.raises(ValueError):
        deterministic_shuffle(ds, "doc_id", n_buckets=1)


def test_curriculum_shuffle_order_and_invariance(ray_session):
    import ray.data

    from pdf_table_extractor_ray.stages.shuffle import curriculum_shuffle

    n = 3000
    ids = np.arange(n, dtype=np.int64)
    strata = np.array(["b", "a", "c"])[ids % 3]
    strata = strata.astype(object)
    strata[5] = None  # null stratum: excluded
    tbl = pa.table(
        {"doc_id": pa.array(ids), "lvl": pa.array(strata, pa.string())}
    )

    def run(parts):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        out = curriculum_shuffle(ds, "lvl", id_col="doc_id", seed=9, n_buckets=8)
        d = out.to_pandas().sort_values("pos")
        return d

    d = run(4)
    assert len(d) == n - 1  # null stratum dropped
    assert (np.sort(d["pos"].to_numpy()) == np.arange(n - 1)).all()
    # strata occupy contiguous pos ranges in sorted stratum order
    lv = d["lvl"].to_numpy()
    changes = (lv[1:] != lv[:-1]).sum()
    assert changes == 2 and list(dict.fromkeys(lv)) == ["a", "b", "c"]
    # within a stratum, order == ascending shuffle key
    for s in ("a", "b", "c"):
        sub = d[d["lvl"] == s]["doc_id"].to_numpy()
        keys = shuffle_key(sub, 9)
        assert (np.diff(keys.astype(np.uint64)) > 0).all()
    # layout invariance
    d2 = run(9)
    assert (d2["doc_id"].to_numpy() == d["doc_id"].to_numpy()).all()
