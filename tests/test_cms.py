"""Count-min sketch: overestimate-only guarantee, CM error bound,
layout invariance of the distributed build, null handling."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pdf_table_extractor_ray.stages.sketches import (
    _cms_cells,
    _hash64_column,
    cms_build,
    cms_point_estimates,
)

WIDTH, DEPTH = 1024, 4


def _exact_counts(values: np.ndarray, keys: np.ndarray) -> np.ndarray:
    return np.array([(values == k).sum() for k in keys], np.int64)


def _zipf_values(n: int = 50_000, seed: int = 3) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.zipf(1.3, n).astype(np.int64) % 5_000


def test_cms_overestimates_within_bound(ray_session):
    import ray.data

    vals = _zipf_values()
    ds = ray.data.from_arrow(pa.table({"v": vals})).repartition(8)
    cms = cms_build(ds, "v", width=WIDTH, depth=DEPTH)
    keys = np.arange(25, dtype=np.int64)
    est = cms_point_estimates(cms, pa.array(keys), width=WIDTH, depth=DEPTH)
    got = est.column("est").to_numpy(zero_copy_only=False)
    exact = _exact_counts(vals, keys)
    assert (got >= exact).all(), "CM estimates must never undercount"
    # CM bound: est ≤ true + e/width·N w.p. 1−e^-depth; deterministic
    # data + hashing make this a fixed (reproducible) outcome
    bound = int(np.ceil(np.e / WIDTH * len(vals)))
    assert (got <= exact + bound).all(), (got - exact, bound)


def test_cms_layout_invariant(ray_session):
    import ray.data

    vals = _zipf_values(20_000, seed=9)
    keys = pa.array(np.arange(10, dtype=np.int64))
    ests = []
    for parts in (2, 16):
        ds = ray.data.from_arrow(pa.table({"v": vals})).repartition(parts)
        cms = cms_build(ds, "v", width=WIDTH, depth=DEPTH)
        t = cms_point_estimates(cms, keys, width=WIDTH, depth=DEPTH)
        ests.append(t.column("est").to_pylist())
    assert ests[0] == ests[1], "sketch must not depend on block layout"


def test_cms_total_mass_and_nulls(ray_session):
    import ray.data

    vals = pa.table({"v": pa.array([1, 1, 2, None, None, 3], pa.int64())})
    ds = ray.data.from_arrow(vals).repartition(2)
    cms = cms_build(ds, "v", width=WIDTH, depth=DEPTH)
    rows = cms.take_all()
    per_depth = np.zeros(DEPTH, np.int64)
    for r in rows:
        per_depth[int(r["cell"]) // WIDTH] += int(r["cnt"])
    # nulls are excluded; every depth row holds the full non-null mass
    assert (per_depth == 4).all(), per_depth


def test_cms_string_keys_match_column_hashing():
    keys = pa.array(["alpha", "beta", "alpha"], pa.string())
    h = _hash64_column(keys)
    cells = _cms_cells(h, WIDTH, DEPTH)
    assert cells.shape == (DEPTH, 3)
    assert (cells[:, 0] == cells[:, 2]).all(), "equal values → equal cells"
    assert (cells >= np.arange(DEPTH)[:, None] * WIDTH).all()
    assert (cells < (np.arange(DEPTH)[:, None] + 1) * WIDTH).all()
