"""KLL one-pass rank-quantile sketch (stages/kll.py)."""

import numpy as np
import pyarrow as pa

from pdf_table_extractor_ray.stages.kll import KLL, kll_quantiles


def _rank_error(sketch, data, q):
    est = sketch.quantile(q)
    true_rank = (data <= est).mean()
    return abs(true_rank - q)


def test_exact_below_capacity():
    s = KLL(k=200)
    x = np.arange(100, dtype=float)
    s.update_many(x)
    assert s.quantile(0.5) in (49.0, 50.0)
    assert s.quantile(0.0) == 0.0
    assert s.quantile(1.0) == 99.0


def test_rank_error_bound_uniform_and_heavy_tail():
    rng = np.random.default_rng(7)
    for data in (
        rng.uniform(0, 1, 100_000),
        rng.pareto(1.1, 100_000),  # heavy tail — value-space bins fail here
        np.sort(rng.normal(0, 1, 100_000)),  # adversarial sorted order
    ):
        s = KLL(k=200)
        for chunk in np.array_split(data, 37):
            s.update_many(chunk)
        for q in (0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
            assert _rank_error(s, data, q) < 0.02, (q, _rank_error(s, data, q))


def test_merge_matches_single_stream():
    rng = np.random.default_rng(11)
    data = rng.normal(10, 3, 50_000)
    a, b = KLL(200), KLL(200)
    a.update_many(data[:30_000])
    b.update_many(data[30_000:])
    a.merge(b)
    assert a.n == 50_000
    for q in (0.25, 0.5, 0.9):
        assert _rank_error(a, data, q) < 0.02


def test_nan_skipped_and_memory_bounded():
    s = KLL(k=100)
    x = np.full(10_000, np.nan)
    x[::2] = np.arange(5_000)
    s.update_many(x)
    assert s.n == 5_000
    retained = sum(len(b) for b in s.levels)
    assert retained < 1_500  # sub-linear retention


def test_distributed_quantiles(ray_session):
    import ray

    rng = np.random.default_rng(5)
    data = rng.lognormal(0, 2, 40_000)  # no usable global range
    ds = ray.data.from_arrow(
        pa.table({"v": pa.array(data, pa.float64())})
    ).repartition(16)
    out = kll_quantiles(ds, "v", qs=(0.1, 0.5, 0.9, 0.99))
    got = dict(zip(out.column("q").to_pylist(), out.column("value").to_pylist()))
    for q, est in got.items():
        true_rank = (data <= est).mean()
        assert abs(true_rank - q) < 0.03, (q, true_rank)


def test_distributed_empty(ray_session):
    import ray

    ds = ray.data.from_arrow(pa.table({"v": pa.array([], pa.float64())}))
    out = kll_quantiles(ds, "v", qs=(0.5,))
    assert np.isnan(out.column("value").to_pylist()[0])


def test_per_key_kll_scale_separation(ray_session):
    """The case the global-bin histogram sketch cannot handle: two
    keys whose ranges differ by 9 orders of magnitude each keep their
    own rank accuracy."""
    import ray

    from pdf_table_extractor_ray.stages.kll import kll_quantiles_by

    rng = np.random.default_rng(13)
    a = rng.uniform(0, 1, 30_000)
    b = rng.pareto(1.2, 30_000) * 1e9
    tbl = pa.table(
        {
            "k": pa.array(["a"] * len(a) + ["b"] * len(b), pa.string()),
            "v": pa.array(np.concatenate([a, b]), pa.float64()),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(12)
    out = kll_quantiles_by(ds, "k", "v", qs=(0.1, 0.5, 0.9)).take_all()
    got = {(r["k"], r["q"]): r["value"] for r in out}
    assert len(got) == 6
    for key, data in (("a", a), ("b", b)):
        for q in (0.1, 0.5, 0.9):
            est = got[(key, q)]
            true_rank = (data <= est).mean()
            assert abs(true_rank - q) < 0.03, (key, q, true_rank)


def test_per_key_kll_small_groups_exact(ray_session):
    import ray

    from pdf_table_extractor_ray.stages.kll import kll_quantiles_by

    tbl = pa.table(
        {
            "k": pa.array(["x"] * 5 + ["y"] * 3, pa.string()),
            "v": pa.array([1.0, 2, 3, 4, 5, 10, 20, 30], pa.float64()),
        }
    )
    out = kll_quantiles_by(
        ray.data.from_arrow(tbl).repartition(2), "k", "v", qs=(0.5,)
    ).take_all()
    got = {r["k"]: r["value"] for r in out}
    assert got["x"] == 3.0 and got["y"] == 20.0


def test_per_key_kll_null_keys_dropped(ray_session):
    """NULL keys form no group (SQL GROUP BY semantics) instead of
    crashing sketch_batch (ADVICE-r4)."""
    import pytest
    import ray

    from pdf_table_extractor_ray.stages.kll import kll_quantiles_by

    tbl = pa.table(
        {
            "k": pa.array(["x", None, "x", "y", None, "y"], pa.string()),
            "v": pa.array([1.0, 99, 3, 10, 99, 30], pa.float64()),
        }
    )
    out = kll_quantiles_by(
        ray.data.from_arrow(tbl).repartition(2), "k", "v", qs=(0.5,)
    ).take_all()
    got = {r["k"]: r["value"] for r in out}
    assert set(got) == {"x", "y"}
    assert got["x"] == pytest.approx(2.0, abs=1.0)
    assert got["y"] == pytest.approx(20.0, abs=10.0)
