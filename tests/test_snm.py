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


def test_snm_below_window_single_partition(ray_session):
    """n < window with one partition must NOT raise (ADVICE-r4): no
    pair can span a boundary, the local d-loop covers everything."""
    import ray

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["data x", "date x", "gate x"], pa.string()),
        }
    )
    got = sorted(
        (r["doc_a"], r["doc_b"], r["dist"])
        for r in snm_pairs(
            ray.data.from_arrow(tbl), window=5, max_dist=2, n_parts=8
        ).take_all()
    )
    con = duckdb.connect()
    con.register("documents", tbl)
    want = sorted(tuple(r) for r in con.execute(ORACLE.format(w=5, d=2)).fetchall())
    assert got == want and len(got) == 3


@pytest.mark.parametrize("n_parts", [1, 4])
def test_snm_non_ascii_keys_consistent(ray_session, n_parts):
    """Non-ASCII text: the comparison key is sanitized exactly like the
    packed partition key (codepoint -> '?'), so the partitioned run
    matches the single-partition run AND the sanitized SQL oracle —
    the silent-pair-drop ADVICE-r4 flagged."""
    import ray

    rng = np.random.default_rng(11)
    variants = [
        ("café", "cafe"),
        ("naïve", "naive"),
        ("über", "uber"),
        ("señor", "senor"),
        ("piñata", "pinata"),
        ("crème", "creme"),
    ]
    texts = [
        " ".join(pair[rng.integers(0, 2)] for pair in variants) for _ in range(120)
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(120)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    got = sorted(
        (r["doc_a"], r["doc_b"], r["dist"])
        for r in snm_pairs(
            ray.data.from_arrow(tbl).repartition(3),
            window=5,
            max_dist=2,
            n_parts=n_parts,
        ).take_all()
    )
    oracle = """
    WITH o AS (SELECT doc_id,
               regexp_replace(lower(substr(COALESCE(text,''),1,32)),
                              '[^\\x00-\\x7F]', '?', 'g') AS k
               FROM documents),
    r AS (SELECT doc_id, k, row_number() OVER (ORDER BY k, doc_id) AS rn FROM o)
    SELECT a.doc_id, b.doc_id, CAST(levenshtein(a.k,b.k) AS BIGINT)
    FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 5
    WHERE levenshtein(a.k,b.k) <= 2
    """
    con = duckdb.connect()
    con.register("documents", tbl)
    want = sorted(tuple(r) for r in con.execute(oracle).fetchall())
    assert got == want
    assert len(got) > 0
