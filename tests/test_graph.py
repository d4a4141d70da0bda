"""Distributed integer PageRank: float-reference parity, layout
invariance, mass conservation."""

from __future__ import annotations

import itertools

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


def _brute_triangles(edge_set):
    nodes = sorted({n for e in edge_set for n in e})
    return sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if (a, b) in edge_set and (a, c) in edge_set and (b, c) in edge_set
    )


def test_triangle_count_brute_force(ray_session):
    """Degree-ordered wedge counting vs itertools brute force on a
    random graph; parallel edges, reversed duplicates and self-loops
    collapse; clique and star sanity values."""
    import ray.data

    from pdf_table_extractor_ray.stages.graph import triangle_count

    rng = np.random.default_rng(17)
    n = 40
    edges = set()
    for _ in range(160):
        a, b = int(rng.integers(0, n)), int(rng.integers(0, n))
        if a != b:
            edges.add((min(a, b), max(a, b)))
    rows_a, rows_b = [], []
    for a, b in edges:
        rows_a.append(a), rows_b.append(b)
        rows_a.append(b), rows_b.append(a)  # reversed duplicate
    rows_a += [5, 7]  # self-loops: must be ignored
    rows_b += [5, 7]
    ds = ray.data.from_arrow(
        pa.table({"doc_a": pa.array(rows_a, pa.int64()), "doc_b": pa.array(rows_b, pa.int64())})
    ).repartition(4)
    got = triangle_count(ds).take_all()[0]["n_triangles"]
    assert got == _brute_triangles(edges)

    # K5 clique → C(5,3) = 10 triangles
    k5 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    ds5 = ray.data.from_arrow(
        pa.table(
            {
                "doc_a": pa.array([e[0] for e in k5], pa.int64()),
                "doc_b": pa.array([e[1] for e in k5], pa.int64()),
            }
        )
    )
    assert triangle_count(ds5).take_all()[0]["n_triangles"] == 10

    # star graph → 0 triangles
    star = ray.data.from_arrow(
        pa.table(
            {
                "doc_a": pa.array([0] * 6, pa.int64()),
                "doc_b": pa.array(list(range(1, 7)), pa.int64()),
            }
        )
    )
    assert triangle_count(star).take_all()[0]["n_triangles"] == 0


def _seq_lpa(edges, iters=5):
    """Sequential synchronous LPA reference: most-frequent neighbor
    label, ties to the smallest label."""
    from collections import Counter, defaultdict

    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    labels = {n: n for n in adj}
    for _ in range(iters):
        new = {}
        for n, nbrs in adj.items():
            c = Counter(labels[m] for m in nbrs)
            best = max(c.items(), key=lambda kv: (kv[1], -kv[0]))
            new[n] = best[0]
        labels = new
    return labels


def test_label_propagation_matches_sequential_and_layout(ray_session):
    """Distributed sync LPA == the sequential reference on a random
    graph with two planted cliques joined by one weak edge, for every
    block layout; the two cliques must land in different communities."""
    import random

    import ray.data

    from pdf_table_extractor_ray.stages.graph import label_propagation

    rng = random.Random(7)
    edges = set()
    # two 6-cliques, ids 0-5 and 100-105, bridged by (5, 100)
    for base in (0, 100):
        for i in range(6):
            for j in range(i + 1, 6):
                edges.add((base + i, base + j))
    edges.add((5, 100))
    # plus random sparse noise on 200..239
    for _ in range(30):
        a, b = rng.sample(range(200, 240), 2)
        edges.add((min(a, b), max(a, b)))
    edges = sorted(edges)
    want = _seq_lpa(edges, iters=5)
    tbl = pa.table(
        {
            "doc_a": pa.array([a for a, _ in edges], pa.int64()),
            "doc_b": pa.array([b for _, b in edges], pa.int64()),
        }
    )
    got_by_layout = []
    for parts in (1, 5):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        got = {
            r["node"]: r["community"]
            for r in label_propagation(ds, iters=5).take_all()
        }
        assert got == want
        got_by_layout.append(got)
    assert got_by_layout[0] == got_by_layout[1]
    # community structure: the cliques keep distinct labels
    c1 = {got_by_layout[0][i] for i in range(5)}
    c2 = {got_by_layout[0][100 + i] for i in range(1, 6)}
    assert len(c1) == 1 and len(c2) == 1 and c1 != c2


def _seq_kcore(edges, k):
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
    return {n: len(nbrs) for n, nbrs in adj.items() if nbrs}


def test_kcore_matches_sequential_and_layout(ray_session):
    """Distributed peel == sequential k-core on a graph with a planted
    5-clique (4-core), a chain (no 3-core), parallel edges and a
    self-loop, for several block layouts."""
    import random

    import ray.data

    from pdf_table_extractor_ray.stages.graph import k_core

    rng = random.Random(13)
    edges = []
    for i in range(5):  # 5-clique on 0..4
        for j in range(i + 1, 5):
            edges.append((i, j))
    edges += [(10 + i, 11 + i) for i in range(8)]  # chain 10..18
    edges += [(0, 1), (3, 3)]  # parallel edge + self-loop
    for _ in range(25):  # random sparse noise
        a, b = rng.sample(range(30, 60), 2)
        edges.append((a, b))
    for k in (2, 3, 4):
        want = _seq_kcore(edges, k)
        tbl = pa.table(
            {
                "doc_a": pa.array([a for a, _ in edges], pa.int64()),
                "doc_b": pa.array([b for _, b in edges], pa.int64()),
            }
        )
        for parts in (1, 4):
            ds = ray.data.from_arrow(tbl).repartition(parts)
            got = {
                r["node"]: r["core_degree"] for r in k_core(ds, k=k).take_all()
            }
            assert got == want, (k, parts)
    # the 5-clique is exactly the 4-core
    assert set(_seq_kcore(edges, 4)) == {0, 1, 2, 3, 4}


# ---------------------------------------------------------------------------
# directed weighted PageRank (host graph)


def _float_pagerank_directed(edges, iters=10, d=0.85):
    """Dense float reference: directed, weighted, dangling mass
    redistributed uniformly. edges = [(src, dst, w)]."""
    nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    wout = np.zeros(n)
    for s, _, w in edges:
        wout[idx[s]] += w
    r = np.ones(n)
    for _ in range(iters):
        dangling = sum(r[i] for i in range(n) if wout[i] == 0)
        nr = np.full(n, (1 - d) + d * dangling / n)
        for s, t, w in edges:
            nr[idx[t]] += d * r[idx[s]] * w / wout[idx[s]]
        r = nr
    return {nodes[i]: r[i] for i in range(n)}


def test_pagerank_directed_weighted_dangling(ray_session):
    import ray.data

    from pdf_table_extractor_ray.stages.graph import pagerank_directed

    # c is a dangling sink everyone points at (heaviest in-mass);
    # weights skew a→b over a→d; e links only into the core
    edges = [
        ("a", "b", 5),
        ("a", "d", 1),
        ("b", "c", 3),
        ("d", "c", 2),
        ("e", "a", 1),
        ("e", "c", 1),
    ]
    tbl = pa.table(
        {
            "src": pa.array([e[0] for e in edges], pa.string()),
            "dst": pa.array([e[1] for e in edges], pa.string()),
            "w": pa.array([e[2] for e in edges], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(3)
    got = {
        r["node"]: r["rank_micro"]
        for r in pagerank_directed(ds, "src", "dst", "w", iters=10).take_all()
    }
    want = _float_pagerank_directed(edges, iters=10)
    assert set(got) == set(want)
    for n in want:
        assert abs(got[n] / RANK_UNIT - want[n]) < 5e-3, (n, got[n], want[n])
    # the dangling sink c absorbs the most mass
    assert got["c"] == max(got.values())
    # weighted fan-out: b (weight 5 from a) outranks d (weight 1)
    assert got["b"] > got["d"]

    # bit-identical across layouts
    got2 = {
        r["node"]: r["rank_micro"]
        for r in pagerank_directed(
            ray.data.from_arrow(tbl).repartition(1), "src", "dst", "w", iters=10
        ).take_all()
    }
    assert got == got2

    # mass conserved up to one-sided floor leakage
    total = sum(got.values())
    assert total <= len(want) * RANK_UNIT
    assert len(want) * RANK_UNIT - total < len(want) * RANK_UNIT * 0.01


def test_pagerank_directed_unweighted_default(ray_session):
    import ray.data

    from pdf_table_extractor_ray.stages.graph import pagerank_directed

    edges = [("x", "y", 1), ("y", "x", 1)]
    tbl = pa.table(
        {
            "src": pa.array([e[0] for e in edges], pa.string()),
            "dst": pa.array([e[1] for e in edges], pa.string()),
        }
    )
    got = {
        r["node"]: r["rank_micro"]
        for r in pagerank_directed(ray.data.from_arrow(tbl), "src", "dst", iters=8).take_all()
    }
    want = _float_pagerank_directed(edges, iters=8)
    for n in want:
        assert abs(got[n] / RANK_UNIT - want[n]) < 5e-3
    # symmetric 2-cycle: equal ranks
    assert got["x"] == got["y"]


def test_host_edges_and_synth_corpus(ray_session):
    import ray.data

    from pdf_table_extractor_ray.stages.links import (
        extract_outlinks,
        host_edges,
        synth_link_corpus,
    )

    pages = synth_link_corpus(n_pages=60, n_hosts=6, seed=7)
    ds = ray.data.from_arrow(pages).repartition(4)
    edges = host_edges(extract_outlinks(ds)).take_all()
    assert edges, "corpus must produce host edges"
    srcs = {e["src"] for e in edges}
    dsts = {e["dst"] for e in edges}
    # the last host never links out but is linked to (dangling)
    assert "site5.test" not in srcs and "site5.test" in dsts
    # weights aggregate: at least one multi-link edge
    assert max(e["w"] for e in edges) > 1
    # self-edges exist (relative links resolve to the page's own host)
    assert any(e["src"] == e["dst"] for e in edges)


# ---------------------------------------------------------------------------
# HITS hubs & authorities


def _float_hits(edges, iters=8):
    """Dense float reference, L∞ normalization (max → 1)."""
    nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    hub = np.ones(n)
    auth = np.ones(n)
    for _ in range(iters):
        na = np.zeros(n)
        for s, t, w in edges:
            na[idx[t]] += hub[idx[s]] * w
        auth = na / na.max() if na.max() > 0 else na
        nh = np.zeros(n)
        for s, t, w in edges:
            nh[idx[s]] += auth[idx[t]] * w
        hub = nh / nh.max() if nh.max() > 0 else nh
    return (
        {nodes[i]: hub[i] for i in range(n)},
        {nodes[i]: auth[i] for i in range(n)},
    )


def test_hits_matches_float_reference(ray_session):
    import ray.data

    from pdf_table_extractor_ray.stages.graph import HITS_UNIT, hits

    # h1/h2 are hubs listing authorities a1/a2/a3; a1 is listed by
    # both (top authority); h1 lists more (top hub); x→h1 only
    edges = [
        ("h1", "a1", 2),
        ("h1", "a2", 1),
        ("h1", "a3", 1),
        ("h2", "a1", 1),
        ("h2", "a2", 1),
        ("x", "h1", 1),
    ]
    tbl = pa.table(
        {
            "src": pa.array([e[0] for e in edges], pa.string()),
            "dst": pa.array([e[1] for e in edges], pa.string()),
            "w": pa.array([e[2] for e in edges], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(3)
    rows = hits(ds, "src", "dst", "w", iters=8).take_all()
    got_hub = {r["node"]: r["hub_micro"] for r in rows}
    got_auth = {r["node"]: r["auth_micro"] for r in rows}
    want_hub, want_auth = _float_hits(edges, iters=8)
    assert set(got_hub) == set(want_hub)
    for n in want_hub:
        assert abs(got_hub[n] / HITS_UNIT - want_hub[n]) < 1e-3, ("hub", n)
        assert abs(got_auth[n] / HITS_UNIT - want_auth[n]) < 1e-3, ("auth", n)
    # structure: h1 is the top hub, a1 the top authority
    assert got_hub["h1"] == max(got_hub.values())
    assert got_auth["a1"] == max(got_auth.values())
    # x points at a hub, not an authority: near-zero hub score relative
    # to h1 (a hub's value comes from pointing at AUTHORITIES)
    assert got_hub["x"] < got_hub["h2"]

    # bit-identical across layouts
    rows2 = hits(ray.data.from_arrow(tbl).repartition(1), "src", "dst", "w", iters=8).take_all()
    assert {r["node"]: (r["hub_micro"], r["auth_micro"]) for r in rows2} == {
        r["node"]: (r["hub_micro"], r["auth_micro"]) for r in rows
    }


def test_hits_unweighted_default(ray_session):
    import ray.data

    from pdf_table_extractor_ray.stages.graph import HITS_UNIT, hits

    edges = [("u", "v", 1), ("w", "v", 1)]
    tbl = pa.table(
        {
            "src": pa.array([e[0] for e in edges], pa.string()),
            "dst": pa.array([e[1] for e in edges], pa.string()),
        }
    )
    rows = hits(ray.data.from_arrow(tbl), "src", "dst", iters=4).take_all()
    got_auth = {r["node"]: r["auth_micro"] for r in rows}
    got_hub = {r["node"]: r["hub_micro"] for r in rows}
    # v is the only authority; u and w are symmetric hubs at max
    assert got_auth["v"] == HITS_UNIT
    assert got_hub["u"] == got_hub["w"] == HITS_UNIT
    assert got_auth["u"] == got_auth["w"] == 0


# ---------------------------------------------------------------------------
# bounded-depth BFS

def _bfs_reference(edges, seeds, max_depth):
    from collections import defaultdict, deque

    adj = defaultdict(list)
    for s, d in edges:
        adj[s].append(d)
    dist = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        u = q.popleft()
        if dist[u] >= max_depth:
            continue
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def test_bfs_depths_matches_sequential(ray_session):
    import ray.data

    from pdf_table_extractor_ray.stages.graph import bfs_depths

    rng = np.random.default_rng(11)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 120, (400, 2))]
    seeds = [0, 7, 63]
    ref = _bfs_reference(edges, seeds, max_depth=5)
    got = {
        r["node"]: r["depth"]
        for r in bfs_depths(
            ray.data.from_items([{"src": s, "dst": d} for s, d in edges]).repartition(4),
            ray.data.from_items([{"node": s} for s in seeds]),
            max_depth=5,
        ).take_all()
    }
    assert got == ref


def test_bfs_depths_early_stop_and_min_hop(ray_session):
    import ray.data

    from pdf_table_extractor_ray.stages.graph import bfs_depths

    # diamond: 1→2→4 and 1→3→4 plus the shortcut 1→4: depth(4) == 1
    edges = [(1, 2), (1, 3), (2, 4), (3, 4), (1, 4), (4, 5)]
    got = {
        r["node"]: r["depth"]
        for r in bfs_depths(
            ray.data.from_items([{"src": s, "dst": d} for s, d in edges]),
            ray.data.from_items([{"node": 1}]),
            max_depth=8,  # graph drains after 2 rounds — early stop path
        ).take_all()
    }
    assert got == {1: 0, 2: 1, 3: 1, 4: 1, 5: 2}


def test_bfs_checkpointed_matches_straight_and_resumes(ray_session, tmp_path):
    import json
    import os

    import ray.data

    from pdf_table_extractor_ray.stages.graph import bfs_depths, bfs_depths_checkpointed
    from pdf_table_extractor_ray.state.checkpoint import latest_checkpoint

    rng = np.random.default_rng(7)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 80, (250, 2))]
    seeds = [0, 5]
    e = lambda: ray.data.from_items([{"src": s, "dst": d} for s, d in edges])
    s = lambda: ray.data.from_items([{"node": n} for n in seeds])
    straight = {r["node"]: r["depth"] for r in bfs_depths(e(), s(), max_depth=5).take_all()}

    ck = str(tmp_path / "bfs_ck")
    got = {r["node"]: r["depth"] for r in bfs_depths_checkpointed(e(), s(), ck, max_depth=5).take_all()}
    assert got == straight
    last = latest_checkpoint(ck)
    assert last is not None and last[1] is True

    # resume: truncate to round 2 by deleting later markers, then rerun
    for name in os.listdir(ck):
        r = int(name.split("=")[1])
        if r > 2:
            os.remove(os.path.join(ck, name, "_COMPLETE"))
        else:
            # ensure kept markers say not-done so the loop continues
            with open(os.path.join(ck, name, "_COMPLETE"), "w") as f:
                json.dump({"round": r, "done": False}, f)
    resumed = {r["node"]: r["depth"] for r in bfs_depths_checkpointed(e(), s(), ck, max_depth=5).take_all()}
    assert resumed == straight


def test_checkpoint_ignores_uncommitted_round(ray_session, tmp_path):
    import os

    import pyarrow.parquet as pq
    import ray.data

    from pdf_table_extractor_ray.state.checkpoint import latest_checkpoint, run_checkpointed

    ck = str(tmp_path / "ck")
    # torn round: directory with data but NO marker must be ignored
    os.makedirs(os.path.join(ck, "round=3"))
    pq.write_table(pa.table({"node": [99], "depth": [9]}), os.path.join(ck, "round=3", "x.parquet"))
    assert latest_checkpoint(ck) is None

    calls = []

    def step(state, r):
        calls.append(r)
        return state, False

    init = ray.data.from_items([{"node": 1, "depth": 0}])
    out = run_checkpointed(init, step, rounds=3, ckpt_dir=ck).take_all()
    assert calls == [1, 2, 3]
    assert out == [{"node": 1, "depth": 0}]
    # converged marker: a rerun does nothing
    calls.clear()
    run_checkpointed(init, step, rounds=3, ckpt_dir=ck)
    assert calls == []
