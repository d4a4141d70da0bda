"""UniMax training-mix budget allocation (stages/mixing.py)."""

import numpy as np
import pyarrow as pa
import pytest


def _alloc(masses, budget, epochs=4):
    from pdf_table_extractor_ray.stages.mixing import unimax_allocation

    tbl = pa.table(
        {
            "key": pa.array([k for k, _ in masses], pa.string()),
            "n": pa.array([n for _, n in masses], pa.int64()),
        }
    )
    out = unimax_allocation(tbl, budget=budget, epochs=epochs)
    return {
        k: (n, a)
        for k, n, a in zip(
            out.column("key").to_pylist(),
            out.column("n_tokens").to_pylist(),
            out.column("alloc_tokens").to_pylist(),
        )
    }


def test_unimax_invariants_and_waterline():
    masses = [("a", 10), ("b", 100), ("c", 1000), ("d", 10000)]
    E, B = 4, 5000
    got = _alloc(masses, B, E)
    # per-source epoch cap honored; budget never exceeded
    assert all(a <= E * n for n, a in got.values())
    assert sum(a for _n, a in got.values()) <= B
    # small sources fully capped, the rest share the remainder equally
    assert got["a"] == (10, 40)
    assert got["b"] == (100, 400)
    rem = B - 40 - 400
    assert got["c"][1] == got["d"][1] == rem // 2


def test_unimax_all_fit():
    masses = [("a", 10), ("b", 20)]
    got = _alloc(masses, budget=1000, epochs=4)
    assert got == {"a": (10, 40), "b": (20, 80)}


def test_unimax_none_fit():
    masses = [("a", 100), ("b", 100), ("c", 100)]
    got = _alloc(masses, budget=30, epochs=4)
    assert all(a == 10 for _n, a in got.values())


def test_unimax_empty():
    from pdf_table_extractor_ray.stages.mixing import unimax_allocation

    out = unimax_allocation(
        pa.table({"key": pa.array([], pa.string()), "n": pa.array([], pa.int64())}),
        budget=100,
    )
    assert out.num_rows == 0


def test_unimax_matches_iterative_reference():
    """Closed form == the paper's iterative smallest-first waterfill."""
    rng = np.random.default_rng(5)
    for trial in range(20):
        k = int(rng.integers(1, 12))
        masses = [(f"s{i}", int(rng.integers(1, 1000))) for i in range(k)]
        E = int(rng.integers(1, 6))
        total = sum(n for _k2, n in masses)
        B = int(rng.integers(0, E * total + 10))
        got = _alloc(masses, B, E)

        ordered = sorted(masses, key=lambda r: (r[1], r[0]))
        rem, left = B, len(ordered)
        want = {}
        # iterative: smallest first; a source takes min(cap, fair share)
        # and once one source falls below its cap, all later (larger)
        # ones take the SAME floor share (the waterline)
        share = None
        for key, n in ordered:
            cap = E * n
            fair = rem // left
            if share is None and cap * left <= rem:
                want[key] = cap
                rem -= cap
                left -= 1
            else:
                if share is None:
                    share = fair
                want[key] = share
        assert got == {k2: (dict(masses)[k2], a) for k2, a in want.items()}, (
            trial,
            masses,
            E,
            B,
        )


def test_token_mass_by(ray_session):
    import ray.data

    from pdf_table_extractor_ray.stages.mixing import token_mass_by

    tbl = pa.table(
        {
            "source": pa.array(["x", "x", "y", "y"], pa.string()),
            "text": pa.array(["a b c", "", "one", None], pa.string()),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(2)
    got = {r["key"]: r["n"] for r in token_mass_by(ds).take_all()}
    assert got == {"x": 3, "y": 1}


# ---------------------------------------------------------------------------
# temperature (α=0.5) allocation

from pdf_table_extractor_ray.stages.mixing import temperature_allocation  # noqa: E402


def _masses(pairs):
    import pyarrow as pa

    return pa.table(
        {"key": pa.array([k for k, _ in pairs], pa.string()),
         "n": pa.array([n for _, n in pairs], pa.int64())}
    )


def test_temperature_allocation_sums_to_budget_exactly():
    t = temperature_allocation(_masses([("a", 100), ("b", 400), ("c", 10000)]), budget=777)
    assert sum(t.column("alloc_tokens").to_pylist()) == 777


def test_temperature_allocation_flattens_vs_proportional():
    # α=0.5: small sources get MORE than proportional share, large less
    t = temperature_allocation(_masses([("small", 100), ("big", 10000)]), budget=1010)
    alloc = dict(zip(t.column("key").to_pylist(), t.column("alloc_tokens").to_pylist()))
    # proportional would give small 10, big 1000; sqrt weights 10:100
    assert alloc["small"] == 1010 * 10 // 110 + (1 if (1010 * 10) % 110 >= (1010 * 100) % 110 else 0) or alloc["small"] > 10
    assert alloc["small"] > 1010 * 100 // 10100  # > proportional
    assert alloc["big"] < 1010 * 10000 // 10100  # < proportional
    assert alloc["small"] + alloc["big"] == 1010


def test_temperature_allocation_largest_remainder_ties_by_key():
    # equal masses → equal weights → remainders tie; +1 goes to keys ascending
    t = temperature_allocation(_masses([("b", 100), ("a", 100), ("c", 100)]), budget=8)
    alloc = dict(zip(t.column("key").to_pylist(), t.column("alloc_tokens").to_pylist()))
    assert alloc == {"a": 3, "b": 3, "c": 2}


def test_temperature_allocation_empty_and_zero_mass():
    t = temperature_allocation(_masses([]), budget=10)
    assert t.num_rows == 0
    t = temperature_allocation(_masses([("a", 0)]), budget=10)
    assert t.column("alloc_tokens").to_pylist() == [0]


def test_neyman_allocation_exact_and_invariant(ray_session):
    import math

    import ray

    from pdf_table_extractor_ray.stages.mixing import (
        neyman_allocation,
        value_stats_by,
    )

    rng = np.random.default_rng(17)
    rows_k, rows_v = [], []
    spread = {"a": 1.0, "b": 10.0, "c": 100.0}
    for k, s in spread.items():
        for v in rng.normal(500.0, s, 400):
            rows_k.append(k)
            rows_v.append(float(v))
    rows_k.append("const")  # zero-variance stratum → weight 0
    rows_v.append(5.0)
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(rows_k), "v": pa.array(rows_v, pa.float64())})
    ).repartition(4)
    out = neyman_allocation(value_stats_by(ds, "k", "v"), 1000)
    alloc = dict(zip(out.column("key").to_pylist(), out.column("alloc").to_pylist()))
    assert sum(alloc.values()) == 1000
    # variance-ordered: wider strata get more budget; zero-variance none
    assert alloc["c"] > alloc["b"] > alloc["a"] > alloc["const"] == 0

    # brute-force parity: exact integer weights equal isqrt of the
    # cents sufficient statistics computed in plain Python
    cents = {}
    for k, v in zip(rows_k, rows_v):
        cents.setdefault(k, []).append(math.floor(v * 100))
    for k, xs in cents.items():
        n, sx, sxx = len(xs), sum(xs), sum(x * x for x in xs)
        w = math.isqrt(n * sxx - sx * sx)
        # allocation is within 1 of the real-valued proportional share
        W = sum(
            math.isqrt(
                len(x2) * sum(y * y for y in x2) - sum(x2) ** 2
            )
            for x2 in cents.values()
        )
        assert abs(alloc[k] - 1000 * w / W) <= 1


def test_neyman_all_zero_variance(ray_session):
    import ray

    from pdf_table_extractor_ray.stages.mixing import (
        neyman_allocation,
        value_stats_by,
    )

    ds = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(["x", "x", "y"]),
                "v": pa.array([1.0, 1.0, 2.0], pa.float64()),
            }
        )
    )
    out = neyman_allocation(value_stats_by(ds, "k", "v"), 100)
    assert out.column("alloc").to_pylist() == [0, 0]


def test_attribution_linear_edges(ray_session, tmp_path, monkeypatch):
    """Hand-checked attribution: remainder goes to the earliest touch,
    zero-touch conversions contribute nothing, other users isolated."""
    import datetime

    import pyarrow.parquet as pq

    import __ray_entry__ as entry

    ts0 = datetime.datetime(2024, 1, 10, 12, 0, 0)

    def T(minutes):
        return ts0 + datetime.timedelta(minutes=minutes)

    rows = {
        "event_id": [1, 2, 3, 10, 20, 30],
        "user_id": [7, 7, 7, 7, 8, 8],
        "event_type": ["view", "click", "view", "purchase", "purchase", "view"],
        # user 7: three touches inside 24h then a purchase;
        # user 8: purchase BEFORE its only touch → zero-touch
        "ts": [T(0), T(5), T(10), T(30), T(0), T(5)],
        "value": [0.0] * 6,
    }
    tbl = pa.table(
        {
            "event_id": pa.array(rows["event_id"], pa.int64()),
            "user_id": pa.array(rows["user_id"], pa.int64()),
            "event_type": pa.array(rows["event_type"], pa.string()),
            "ts": pa.array(rows["ts"], pa.timestamp("us")),
            "value": pa.array(rows["value"], pa.float64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    out = entry.queries()["attribution_linear"](str(tmp_path))
    got = {r["event_type"]: r["credit_micro"] for r in out.take_all()}
    # 1,000,000 / 3 = 333,333 r 1 → earliest touch (view @T0) gets +1
    assert got == {"view": 333334 + 333333, "click": 333333}
