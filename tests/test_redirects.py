"""Pointer-doubling redirect resolution (stages/redirects.py):
chain finals + exact hop counts vs brute force, cycles, convergence
in log rounds."""

import pyarrow as pa

from pdf_table_extractor_ray.stages.redirects import resolve_chains


def _edges_ds(edges, ray_module):
    return ray_module.data.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in edges], pa.string()),
                "dst": pa.array([b for _, b in edges], pa.string()),
            }
        )
    ).repartition(3)


def _brute(edges):
    nxt = dict(edges)
    out = {}
    for s in nxt:
        cur, hops, seen = s, 0, set()
        while cur in nxt and cur not in seen:
            seen.add(cur)
            cur = nxt[cur]
            hops += 1
        out[s] = (cur, hops, cur not in nxt)
    return out


def test_chains_and_branches_match_brute(ray_session):
    import ray

    # one long chain, a tree converging into it, and a lone edge
    edges = [(f"c{i}", f"c{i+1}") for i in range(9)]
    edges += [("t1", "c3"), ("t2", "t1"), ("lone", "end")]
    got = {
        r["src"]: (r["final"], r["hops"], r["resolved"])
        for r in resolve_chains(_edges_ds(edges, ray)).take_all()
    }
    assert got == _brute(edges)
    assert got["c0"] == ("c9", 9, True)
    assert got["t2"] == ("c9", 8, True)


def test_cycle_flagged_unresolved(ray_session):
    import ray

    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("x", "a"), ("ok", "out")]
    got = {
        r["src"]: (r["resolved"]) for r in resolve_chains(_edges_ds(edges, ray)).take_all()
    }
    assert got["a"] is False and got["b"] is False and got["c"] is False
    # x feeds the cycle: also unresolvable
    assert got["x"] is False
    assert got["ok"] is True


def test_long_chain_within_round_budget(ray_session):
    import ray

    # 200-hop chain must finish in max_rounds=8 (2^8 = 256 ≥ 200)
    edges = [(f"n{i}", f"n{i+1}") for i in range(200)]
    rows = resolve_chains(_edges_ds(edges, ray), max_rounds=8).take_all()
    got = {r["src"]: (r["final"], r["hops"], r["resolved"]) for r in rows}
    assert got["n0"] == ("n200", 200, True)
    assert all(v[2] for v in got.values())


def test_duplicate_out_edges_min_dst_wins(ray_session):
    import ray

    edges = [("a", "z2"), ("a", "z1")]
    rows = resolve_chains(_edges_ds(edges, ray)).take_all()
    assert rows[0]["final"] == "z1" and rows[0]["resolved"] is True
