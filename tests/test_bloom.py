"""Bloom-filter membership screen: no false negatives, bounded false
positives, layout-invariant distributed build, superset-vs-exact
contamination screen."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pdf_table_extractor_ray.stages.bloom import (
    BLOOM_K,
    BLOOM_M_BITS,
    bloom_build,
    bloom_contains,
    bloom_from_values,
)


def test_no_false_negatives_and_fp_rate():
    rng = np.random.default_rng(5)
    inserted = pa.array([f"in-{i}-{rng.integers(1 << 30)}" for i in range(20_000)])
    absent = pa.array([f"out-{i}-{rng.integers(1 << 30)}" for i in range(20_000)])
    bits = bloom_from_values(inserted)
    assert bloom_contains(inserted, bits).all()  # zero false negatives
    fp = bloom_contains(absent, bits).mean()
    # theoretical FP ≈ (1 - e^{-kn/m})^k
    n, m, k = len(inserted), BLOOM_M_BITS, BLOOM_K
    bound = (1 - np.exp(-k * n / m)) ** k
    assert fp <= 3 * bound + 1e-4, (fp, bound)


def test_nulls_probe_false_and_int_columns():
    bits = bloom_from_values(pa.array([1, 2, 3], pa.int64()))
    mask = bloom_contains(pa.array([1, None, 99], pa.int64()), bits)
    assert mask[0] and not mask[1]


def test_distributed_build_matches_driver_build(ray_session):
    import ray.data

    vals = pa.array([f"v{i}" for i in range(5000)])
    tbl = pa.table({"chunk": vals})
    ds = ray.data.from_arrow(tbl)
    b1 = bloom_build(ds.repartition(7), "chunk")
    b2 = bloom_build(ds.repartition(2), "chunk")
    b3 = bloom_from_values(vals)
    assert np.array_equal(b1, b2) and np.array_equal(b1, b3)


def test_bloom_screen_is_superset_of_exact(ray_session):
    """On the real sf0.001 documents table: bloom contamination counts
    dominate the exact counts row-wise and (at this corpus size /
    bitmap size) match almost everywhere."""
    import __ray_entry__ as em

    sf = "/root/testdata/sf0.001"
    exact = {r["doc_id"]: r for r in em.queries()["contamination_screen"](sf).take_all()}
    bloom = {r["doc_id"]: r for r in em.queries()["contamination_screen_bloom"](sf).take_all()}
    assert set(exact) == set(bloom)
    over = 0
    for d, e in exact.items():
        b = bloom[d]
        assert b["n_chunks"] == e["n_chunks"]
        assert b["n_contaminated"] >= e["n_contaminated"], d  # no false negatives
        over += b["n_contaminated"] - e["n_contaminated"]
    total_chunks = sum(e["n_chunks"] for e in exact.values())
    assert over <= max(10, 0.01 * total_chunks), (over, total_chunks)
