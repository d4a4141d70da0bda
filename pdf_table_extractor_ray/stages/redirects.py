"""Redirect-chain resolution by POINTER DOUBLING — collapse 301/meta-
refresh/rel-canonical chains (src → dst hops) to each source's final
URL. Crawls need this before dedup and link analysis: a chain
a → b → c means a's content, links and rank all belong to c.

Why doubling: chasing chains one hop per round needs O(longest chain)
shuffles. Pointer doubling (the classic PRAM list-ranking step:
``f(x) ← f(f(x))``) squares the resolved distance every round, so L-hop
chains finish in ⌈log₂ L⌉ rounds — each round ONE bucket co-location
shuffle of slim (node, ptr, dist) rows and one driver scalar (the
active count). ``dist`` accumulates additively through the jump
(list ranking), so the hop count of the ORIGINAL chain is exact.

Termination: a pointer with no table entry is a terminal URL — the row
is done and propagates its done flag to rows that jump onto it. Rows
still active after ``max_rounds`` (chains longer than 2^max_rounds, or
redirect CYCLES — which never stabilize) return ``resolved=False``
with their partial pointer; callers treat those as spider traps.

Contract: one outgoing redirect per source (enforced by a min-dst
pre-reduction — deterministic when the input disagrees with itself).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Min

from pdf_table_extractor_ray.stages.sketches import _fnv1a_bytes_array

_NB = 64


def _bucket(col) -> pa.Array:
    col = pc.cast(col, pa.string())
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return pa.array((_fnv1a_bytes_array(col) % np.uint64(_NB)).astype(np.int64))


def resolve_chains(
    edges: "ray.data.Dataset",
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 16,
) -> "ray.data.Dataset":
    """(src, dst) redirect edges → (src, final, hops, resolved) for
    every source node; ``hops`` is the original chain length. Chains
    up to 2^max_rounds resolve; longer ones and cycles come back with
    ``resolved=False``."""

    def init(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                b.column(src_col),
                pc.cast(b.column(f"min({dst_col})"), pa.string()),
                pa.array(np.ones(b.num_rows, np.int64)),
                pa.array(np.zeros(b.num_rows, np.int8)),
            ],
            names=["node", "ptr", "dist", "done"],
        )

    P = max(8, int(ray.cluster_resources().get("CPU", 8)))

    def bounded(ds_in):
        m = ds_in.materialize()
        if m.num_blocks() > P:
            m = m.repartition(P).materialize()
        return m

    state = bounded(
        edges.groupby(src_col).aggregate(Min(dst_col)).map_batches(init, batch_format="pyarrow")
    )

    def as_rows(kind: int):
        # kind 0 = jump request keyed by ptr; kind 1 = table keyed by node
        def f(b: pa.Table) -> pa.Table:
            key = b.column("ptr" if kind == 0 else "node")
            return pa.Table.from_arrays(
                [
                    b.column("node"),
                    b.column("ptr"),
                    b.column("dist"),
                    b.column("done"),
                    pa.array(np.full(b.num_rows, kind, np.int8)),
                    _bucket(key),
                ],
                names=["node", "ptr", "dist", "done", "kind", "bucket"],
            )

        return f

    def jump(group: pa.Table) -> pa.Table:
        """One bucket: binary-search each active request's pointer in
        the co-located table slice; hit → double (dist adds, done flag
        propagates), miss → the pointer is terminal (done)."""
        empty = pa.Table.from_arrays(
            [pa.array([], pa.string()), pa.array([], pa.string()),
             pa.array([], pa.int64()), pa.array([], pa.int8())],
            names=["node", "ptr", "dist", "done"],
        )
        if group.num_rows == 0:
            return empty
        kind = group.column("kind").to_numpy(zero_copy_only=False)
        node = group.column("node").to_numpy(zero_copy_only=False)
        ptr = group.column("ptr").to_numpy(zero_copy_only=False)
        dist = group.column("dist").to_numpy(zero_copy_only=False).astype(np.int64)
        done = group.column("done").to_numpy(zero_copy_only=False).astype(np.int8)
        is_req = kind == 0
        rn, rp, rd = node[is_req], ptr[is_req], dist[is_req]
        tn, tp, td, tdone = (
            node[~is_req], ptr[~is_req], dist[~is_req], done[~is_req]
        )
        order = np.argsort(tn, kind="stable")
        tn, tp, td, tdone = tn[order], tp[order], td[order], tdone[order]
        if len(tn):
            idx = np.searchsorted(tn, rp)
            idx_c = np.clip(idx, 0, len(tn) - 1)
            hit = tn[idx_c] == rp
            new_ptr = np.where(hit, tp[idx_c], rp)
            new_dist = np.where(hit, rd + td[idx_c], rd)
            new_done = np.where(hit, tdone[idx_c], 1).astype(np.int8)
        else:  # no table rows in this bucket: every pointer is terminal
            new_ptr = rp
            new_dist = rd
            new_done = np.ones(len(rp), np.int8)
        return pa.Table.from_arrays(
            [pa.array(rn, pa.string()), pa.array(new_ptr, pa.string()),
             pa.array(new_dist), pa.array(new_done)],
            names=["node", "ptr", "dist", "done"],
        )

    for _ in range(max_rounds):
        act = state.map_batches(
            lambda b: b.filter(pc.equal(b.column("done"), pa.scalar(0, pa.int8()))),
            batch_format="pyarrow",
        )
        fin = state.map_batches(
            lambda b: b.filter(pc.equal(b.column("done"), pa.scalar(1, pa.int8()))),
            batch_format="pyarrow",
        )
        n_active = act.count()  # ONE driver scalar per round
        if n_active == 0:
            break
        jumped = (
            act.map_batches(as_rows(0), batch_format="pyarrow")
            .union(state.map_batches(as_rows(1), batch_format="pyarrow"))
            .groupby("bucket")
            .map_groups(jump, batch_format="pyarrow")
        )
        state = bounded(jumped.union(fin))

    def finish(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                b.column("node"),
                b.column("ptr"),
                b.column("dist"),
                pc.cast(pc.equal(b.column("done"), pa.scalar(1, pa.int8())), pa.bool_()),
            ],
            names=["src", "final", "hops", "resolved"],
        )

    return state.map_batches(finish, batch_format="pyarrow")
