"""Sorted-Neighborhood near-dup pairs (stages/snm.py)."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from pdf_table_extractor_ray.stages.snm import snm_pairs

ORACLE = """
WITH o AS (SELECT doc_id, lower(substr(COALESCE(text,''),1,32)) AS k FROM documents),
r AS (SELECT doc_id, k, row_number() OVER (ORDER BY k, doc_id) AS rn FROM o)
SELECT a.doc_id, b.doc_id, CAST(levenshtein(a.k,b.k) AS BIGINT)
FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + {w}
WHERE levenshtein(a.k,b.k) <= {d}
"""


def _corpus(n=300, seed=5, dense=False):
    rng = np.random.default_rng(seed)
    words = ["data", "date", "gate", "dart"] if dense else [
        "alpha", "beta", "gamma", "delta", "epsilon", "zeta",
    ]
    rows = [
        {"doc_id": i, "text": " ".join(rng.choice(words, 10))} for i in range(n)
    ]
    return pa.table(
        {
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
        }
    )


@pytest.mark.parametrize("dense", [False, True])
@pytest.mark.parametrize("n_parts", [1, 4, 7])
def test_snm_matches_window_oracle(ray_session, dense, n_parts):
    """Exact equality with the row_number self-join across partition
    counts — the dense corpus forces many cross-boundary pairs, the
    prime partition count misaligns every boundary."""
    import ray

    tbl = _corpus(dense=dense)
    ds = ray.data.from_arrow(tbl).repartition(4)
    got = sorted(
        (r["doc_a"], r["doc_b"], r["dist"])
        for r in snm_pairs(ds, window=5, max_dist=2, n_parts=n_parts).take_all()
    )
    con = duckdb.connect()
    con.register("documents", tbl)
    want = sorted(tuple(r) for r in con.execute(ORACLE.format(w=5, d=2)).fetchall())
    assert got == want
    if dense:
        assert len(got) >= 100  # the dense case is non-trivial


def test_snm_small_partition_contract(ray_session):
    import ray

    tbl = _corpus(n=12)
    ds = ray.data.from_arrow(tbl)
    # n_parts is clamped so every partition can hold >= window rows
    out = snm_pairs(ds, window=5, max_dist=2, n_parts=64).take_all()
    con = duckdb.connect()
    con.register("documents", tbl)
    want = sorted(tuple(r) for r in con.execute(ORACLE.format(w=5, d=2)).fetchall())
    assert sorted((r["doc_a"], r["doc_b"], r["dist"]) for r in out) == want


def test_snm_tiny_inputs(ray_session):
    import ray

    one = pa.table(
        {"doc_id": pa.array([1], pa.int64()), "text": pa.array(["x"], pa.string())}
    )
    assert snm_pairs(ray.data.from_arrow(one)).count() == 0
