"""Table profiler: exact counters, exact min/max, HLL distinct
accuracy, null handling, layout invariance."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def test_profile_exact_fields_and_hll_accuracy(ray_session):
    import ray.data

    from pdf_table_extractor_ray.stages.profile import table_profile

    rng = np.random.default_rng(5)
    n = 4000
    ints = rng.integers(0, 700, n)
    floats = rng.normal(0, 1, n)
    strs = [f"s{int(v):03d}" for v in rng.integers(0, 40, n)]
    tbl = pa.table(
        {
            "i": pa.array(ints, pa.int64()),
            "f": pa.array(floats, pa.float64()),
            "s": pa.array(strs, pa.string()),
            "nul": pa.array([None if k % 3 == 0 else k for k in range(n)], pa.int64()),
            "allnul": pa.array([None] * n, pa.int64()),
        }
    )
    outs = []
    for parts in (1, 9):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        out = {r["column"]: r for r in table_profile(ds).take_all()}
        assert set(out) == {"i", "f", "s", "nul", "allnul"}
        for c in out.values():
            assert c["n_rows"] == n
        assert out["i"]["n_nulls"] == 0
        assert out["nul"]["n_nulls"] == sum(1 for k in range(n) if k % 3 == 0)
        assert out["allnul"]["n_nulls"] == n
        assert out["allnul"]["approx_distinct"] == 0
        assert out["i"]["min_num"] == float(ints.min())
        assert out["i"]["max_num"] == float(ints.max())
        assert out["f"]["min_num"] == float(floats.min())
        assert out["s"]["min_str"] == min(strs) and out["s"]["max_str"] == max(strs)
        assert out["s"]["min_num"] is None and out["i"]["min_str"] is None
        # HLL within 10% of truth
        for col, truth in (("i", len(set(ints.tolist()))), ("s", len(set(strs)))):
            est = out[col]["approx_distinct"]
            assert abs(est - truth) <= max(2, 0.1 * truth), (col, est, truth)
        outs.append(out)
    assert outs[0] == outs[1]  # layout-invariant


def test_profile_column_subset(ray_session):
    import ray.data

    from pdf_table_extractor_ray.stages.profile import table_profile

    tbl = pa.table({"a": pa.array([1, 2], pa.int64()), "b": pa.array(["x", "y"])})
    ds = ray.data.from_arrow(tbl)
    out = table_profile(ds, columns=["b"]).take_all()
    assert [r["column"] for r in out] == ["b"]
