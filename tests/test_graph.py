"""Distributed integer PageRank: float-reference parity, layout
invariance, mass conservation."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pdf_table_extractor_ray.stages.graph import RANK_UNIT, pagerank


def _float_pagerank(edges, iters=10, d=0.85):
    """Dense float reference on the symmetric graph."""
    nodes = sorted({x for e in edges for x in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for a, b in edges:
        deg[idx[a]] += 1
        deg[idx[b]] += 1
    r = np.ones(n)
    for _ in range(iters):
        nr = np.full(n, 1 - d)
        for a, b in edges:
            nr[idx[b]] += d * r[idx[a]] / deg[idx[a]]
            nr[idx[a]] += d * r[idx[b]] / deg[idx[b]]
        r = nr
    return {nodes[i]: r[i] for i in range(n)}


def test_pagerank_matches_float_reference_and_is_layout_invariant(ray_session):
    import ray.data

    # star (hub 0) + a triangle + an isolated pair: hub must rank top
    edges = [(0, 1), (0, 2), (0, 3), (0, 4), (10, 11), (11, 12), (12, 10), (20, 21)]
    tbl = pa.table(
        {
            "doc_a": pa.array([a for a, _ in edges], pa.int64()),
            "doc_b": pa.array([b for _, b in edges], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(3)
    got = {r["node"]: r["rank_micro"] for r in pagerank(ds, iters=10).take_all()}
    want = _float_pagerank(edges, iters=10)
    assert set(got) == set(want)
    for n in want:
        # integer micro-rank ≈ float rank · 1e9 (floor leakage is tiny)
        assert abs(got[n] / RANK_UNIT - want[n]) < 5e-3, (n, got[n], want[n])
    # hub dominates
    assert got[0] == max(got.values())

    # bit-identical across layouts
    got2 = {r["node"]: r["rank_micro"] for r in pagerank(ds.repartition(1), iters=10).take_all()}
    assert got == got2

    # mass conserved up to floor leakage (≤ 1 micro per edge-endpoint per round)
    total = sum(got.values())
    n_nodes = len(want)
    assert n_nodes * RANK_UNIT - total <= 2 * len(edges) * 2 * 10
    assert total <= n_nodes * RANK_UNIT
