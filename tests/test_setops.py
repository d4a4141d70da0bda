"""Distinct set operations, ROLLUP aggregation, stratified sampling."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def two_sets(ray_session):
    import ray.data

    rng = np.random.default_rng(3)
    a = rng.integers(0, 50, 200)  # with duplicates
    b = rng.integers(25, 75, 200)
    ds_a = ray.data.from_arrow(pa.table({"k": a, "tag": a % 3})).repartition(4)
    ds_b = ray.data.from_arrow(pa.table({"k": b, "tag": b % 3})).repartition(3)
    return a, b, ds_a, ds_b


def test_distinct_intersect_and_except(two_sets):
    from pdf_table_extractor_ray.stages.setops import distinct_except, distinct_intersect

    a, b, ds_a, ds_b = two_sets
    sa = {(int(k), int(k % 3)) for k in a}
    sb = {(int(k), int(k % 3)) for k in b}
    got_i = {
        (r["k"], r["tag"]) for r in distinct_intersect(ds_a, ds_b, ["k", "tag"]).take_all()
    }
    assert got_i == sa & sb
    got_e = {
        (r["k"], r["tag"]) for r in distinct_except(ds_a, ds_b, ["k", "tag"]).take_all()
    }
    assert got_e == sa - sb


def test_set_ops_null_keys_match_sql_semantics(ray_session):
    """NULL keys compare equal in SQL set operations (unlike joins):
    a null row present on both sides survives INTERSECT once."""
    import ray.data

    from pdf_table_extractor_ray.stages.setops import distinct_except, distinct_intersect

    ds_a = ray.data.from_items([{"k": 1}, {"k": None}, {"k": None}, {"k": 2}])
    ds_b = ray.data.from_items([{"k": None}, {"k": 2}])
    got = sorted(
        (r["k"] for r in distinct_intersect(ds_a, ds_b, ["k"]).take_all()),
        key=lambda v: (v is None, v),
    )
    assert got == [2, None]
    got_e = [r["k"] for r in distinct_except(ds_a, ds_b, ["k"]).take_all()]
    assert got_e == [1]


def test_rollup_sum(ray_session):
    import ray.data

    from pdf_table_extractor_ray.stages.setops import rollup_sum

    rows = [
        {"r": "EU", "n": "FR", "v": 10},
        {"r": "EU", "n": "FR", "v": 5},
        {"r": "EU", "n": "DE", "v": 7},
        {"r": "AM", "n": "BR", "v": 2},
    ]
    out = rollup_sum(ray.data.from_items(rows).repartition(3), ["r", "n"], "v").take_all()
    got = {(r["r"], r["n"]): r["v"] for r in out}
    assert got == {
        ("EU", "FR"): 15,
        ("EU", "DE"): 7,
        ("AM", "BR"): 2,
        ("EU", None): 22,
        ("AM", None): 2,
        (None, None): 24,
    }


def test_stratified_sample_rates_and_determinism(ray_session):
    """Per-stratum keep sets match the md5-prefix rule exactly and are
    layout-invariant."""
    import ray.data

    from pdf_table_extractor_ray.stages.dedup import stratified_sample

    rng = np.random.default_rng(9)
    langs = ["en", "pt", "es"]
    rows = [
        {"doc_id": i, "lang": langs[int(rng.integers(0, 3))], "text": f"doc body {i}"}
        for i in range(600)
    ]
    rates = {"en": ("0", "1"), "pt": ("0", "1", "2", "3", "4", "5", "6", "7")}
    default = ("0", "1", "2", "3")
    want = {
        r["doc_id"]
        for r in rows
        if hashlib.md5(r["text"].encode()).hexdigest()[0]
        in rates.get(r["lang"], default)
    }
    ds = ray.data.from_items(rows).repartition(5)
    got = {r["doc_id"] for r in stratified_sample(ds, "lang", rates, default).take_all()}
    assert got == want
    got2 = {r["doc_id"] for r in stratified_sample(ds.repartition(2), "lang", rates, default).take_all()}
    assert got2 == want
    # rates actually differ per stratum: pt keeps ~8/16, en ~2/16
    kept_by_lang = {}
    for r in rows:
        if r["doc_id"] in want:
            kept_by_lang[r["lang"]] = kept_by_lang.get(r["lang"], 0) + 1
    n_by_lang = {}
    for r in rows:
        n_by_lang[r["lang"]] = n_by_lang.get(r["lang"], 0) + 1
    assert kept_by_lang["pt"] / n_by_lang["pt"] > kept_by_lang["en"] / n_by_lang["en"]


class TestGroupingSets:
    def test_cube_matches_brute_force(self, ray_session):
        import ray.data

        from pdf_table_extractor_ray.stages.setops import cube_sum

        rng = np.random.default_rng(9)
        a = rng.choice(["x", "y", "z"], 300)
        b = rng.choice(["p", "q"], 300)
        m = rng.integers(-50, 100, 300)
        ds = ray.data.from_arrow(
            pa.table({"a": a, "b": b, "m": pa.array(m, pa.int64())})
        ).repartition(4)
        got = {
            (r["a"], r["b"]): r["m"] for r in cube_sum(ds, ["a", "b"], "m").take_all()
        }
        want = {}
        import itertools

        for keys in itertools.product([True, False], repeat=2):
            agg = {}
            for ai, bi, mi in zip(a, b, m):
                k = (ai if keys[0] else None, bi if keys[1] else None)
                agg[k] = agg.get(k, 0) + int(mi)
            want.update(agg)
        assert got == want

    def test_grouping_sets_subset_validation(self, ray_session):
        import ray.data

        from pdf_table_extractor_ray.stages.setops import grouping_sets_sum

        ds = ray.data.from_arrow(pa.table({"a": ["x"], "m": pa.array([1], pa.int64())}))
        with pytest.raises(ValueError):
            grouping_sets_sum(ds, ["a"], "m", [["nope"]])

    def test_grouping_sets_explicit(self, ray_session):
        import ray.data

        from pdf_table_extractor_ray.stages.setops import grouping_sets_sum

        tbl = pa.table(
            {
                "a": ["x", "x", "y"],
                "b": ["p", "q", "p"],
                "m": pa.array([1, 2, 4], pa.int64()),
            }
        )
        ds = ray.data.from_arrow(tbl)
        # GROUPING SETS ((a), ()) — no finest level in the output
        rows = [
            (r["a"], r["b"], r["m"])
            for r in grouping_sets_sum(ds, ["a", "b"], "m", [["a"], []]).take_all()
        ]
        got = sorted(rows, key=lambda t: (t[0] is None, t[0] or "", t[2]))
        assert got == [("x", None, 3), ("y", None, 4), (None, None, 7)]


class TestMergeUpsert:
    def test_upsert_matches_brute_force(self, ray_session):
        import ray.data

        from pdf_table_extractor_ray.stages.setops import merge_upsert

        rng = np.random.default_rng(31)
        base_keys = np.arange(100, dtype=np.int64)
        base = ray.data.from_arrow(
            pa.table(
                {
                    "k": pa.array(base_keys),
                    "val": pa.array(base_keys * 10),
                    "version": pa.array(np.ones(100, np.int64)),
                }
            )
        ).repartition(4)
        upd_keys = rng.choice(150, 60, replace=False).astype(np.int64)  # some new keys
        versions = rng.integers(0, 3, 60)  # 0 loses to base, 1 ties (update wins), 2 wins
        upd = ray.data.from_arrow(
            pa.table(
                {
                    "k": pa.array(upd_keys),
                    "val": pa.array(upd_keys * 1000),
                    "version": pa.array(versions, pa.int64()),
                }
            )
        ).repartition(3)
        got = {r["k"]: (r["val"], r["version"]) for r in merge_upsert(base, upd, "k", "version").take_all()}

        want = {int(k): (int(k) * 10, 1) for k in base_keys}
        for k, v in zip(upd_keys, versions):
            k, v = int(k), int(v)
            if k not in want or v >= want[k][1]:
                want[k] = (k * 1000, v)
        assert got == want

    def test_null_key_rejected(self, ray_session):
        import ray.data

        from pdf_table_extractor_ray.stages.setops import merge_upsert

        ds = ray.data.from_arrow(
            pa.table({"k": pa.array([1, None], pa.int64()), "version": pa.array([1, 1], pa.int64())})
        )
        with pytest.raises(Exception):
            merge_upsert(ds, ds, "k", "version").take_all()


def test_union_by_name(ray_session):
    """Schema-drift union: null fill, first-seen column order, type
    conflicts rejected."""
    import pyarrow as pa
    import pytest
    import ray.data

    from pdf_table_extractor_ray.stages.setops import union_by_name

    a = ray.data.from_arrow(
        pa.table({"x": pa.array([1, 2], pa.int64()), "y": pa.array(["a", "b"])})
    )
    b = ray.data.from_arrow(
        pa.table({"z": pa.array([0.5], pa.float64()), "x": pa.array([3], pa.int64())})
    )
    out = union_by_name([a, b])
    assert out.schema().names == ["x", "y", "z"]
    rows = sorted(out.take_all(), key=lambda r: r["x"])
    assert rows == [
        {"x": 1, "y": "a", "z": None},
        {"x": 2, "y": "b", "z": None},
        {"x": 3, "y": None, "z": 0.5},
    ]

    c = ray.data.from_arrow(pa.table({"x": pa.array(["s"], pa.string())}))
    with pytest.raises(TypeError, match="conflicting"):
        union_by_name([a, c])
