"""Graph centrality over a similarity-pair list — distributed PageRank.

Near-dup pipelines need a canonical representative per duplicate
cluster; "the doc most similar to everything else" (graph centrality)
is the usual pick when min-id is too arbitrary. This module runs
PageRank (Page et al. 1999) over the undirected pair graph that
MinHash/SimHash/Jaccard stages emit.

Design (the same discipline as ``dedup.connected_components``):

- **Groupby-only iteration.** Each round unions the static,
  materialized-once adjacency rows with the current rank table and
  spreads ``damping·rank/deg`` to neighbors inside ONE
  ``groupby(node % 64)`` bucket shuffle (per-node work vectorized
  inside each bucket via ``reduceat``); a second groupby sums incoming
  contributions. No ``Dataset.join`` (Ray 2.49's hash-shuffle join
  trips on schema-less empty blocks in iterative loops) and no
  edge/rank materialization on the driver — the driver sees nothing
  per round.
- **Integer arithmetic.** Ranks are int64 micro-units (initial mass
  10^9 per node); contributions are ``rank·85 // (100·deg)``. Float
  groupby sums arrive in block order and differ in the last ulp
  between runs — integer ops make the result **bit-identical across
  block layouts and cluster sizes** (the same property the CC labels
  have). Floor division leaks ≤1 micro-unit of mass per edge per
  round — bounded, one-sided, and irrelevant at rank scale.
- **Block-count bounding.** Iterative union+groupby grows block count
  per round; the carried rank table is repartitioned to ≤P blocks
  each round (measured in the CC work: unbounded loops grow tasks ~3×
  per round).

Symmetric pair graphs have no dangling nodes (every node has deg ≥ 1
and receives ≥ 1 contribution), so the base term is exactly
``(1−d)·10^9`` per node.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

RANK_UNIT = 1_000_000_000  # initial micro-rank per node


def pagerank(
    pairs: "ray.data.Dataset",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    iters: int = 10,
    damping_pct: int = 85,
) -> "ray.data.Dataset":
    """(node, rank_micro) for every node of the undirected pair graph;
    ``rank_micro`` sums to ≈ n_nodes·10^9 (floor-division leakage
    aside) and is deterministic across block layouts."""

    _NB = 64  # spread-shuffle buckets (fixed group count, not per-node)

    def to_adj(b: pa.Table) -> pa.Table:
        a = b.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
        bb = b.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
        node = np.concatenate([a, bb])
        return pa.Table.from_arrays(
            [
                pa.array(node),
                pa.array(np.concatenate([bb, a])),
                pa.array(np.ones(2 * len(a), dtype=np.int8)),
                pa.array(node % _NB),
            ],
            names=["node", "val", "kind", "bucket"],
        )

    P = max(8, int(ray.cluster_resources().get("CPU", 8)))

    def bounded(ds_in):
        m = ds_in.materialize()
        if m.num_blocks() > P:
            m = m.repartition(P).materialize()
        return m

    adj = bounded(pairs.map_batches(to_adj, batch_format="pyarrow", zero_copy_batch=True))

    # initial ranks: one row per distinct node at RANK_UNIT
    def init_rank(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [b.column("node"), pa.array(np.full(b.num_rows, RANK_UNIT, np.int64))],
            names=["node", "rank"],
        )

    nodes = adj.groupby("node").aggregate(Sum("kind")).drop_columns(["sum(kind)"])
    ranks = bounded(nodes.map_batches(init_rank, batch_format="pyarrow"))

    base = ((100 - damping_pct) * RANK_UNIT) // 100

    def as_rank_rows(b: pa.Table) -> pa.Table:
        node = b.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_arrays(
            [
                pa.array(node),
                pc.cast(b.column("rank"), pa.int64()),
                pa.array(np.zeros(len(node), dtype=np.int8)),
                pa.array(node % _NB),
            ],
            names=["node", "val", "kind", "bucket"],
        )

    def spread(group: pa.Table) -> pa.Table:
        """One BUCKET of nodes per call (shuffle key = node % _NB —
        the per-round Python-call count is fixed, not per-node): per
        node run, degree + own rank via two ``reduceat``s, integer
        contribution fanned to the run's neighbor rows by one gather.
        A run with no rank row (cannot occur — ranks cover all nodes)
        fans zero contribution, which leaves every sum unchanged."""
        n = group.num_rows
        empty = pa.Table.from_arrays(
            [pa.array([], pa.int64()), pa.array([], pa.int64())],
            names=["node", "contrib"],
        )
        if n == 0:
            return empty
        node = group.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
        val = group.column("val").to_numpy(zero_copy_only=False).astype(np.int64)
        kind = group.column("kind").to_numpy(zero_copy_only=False)
        order = np.argsort(node, kind="stable")
        sn, sv, sk = node[order], val[order], kind[order]
        first = np.empty(n, bool)
        first[0] = True
        first[1:] = sn[1:] != sn[:-1]
        starts = np.flatnonzero(first)
        run_id = np.cumsum(first) - 1
        is_nb = sk == 1
        deg = np.add.reduceat(is_nb.astype(np.int64), starts)
        own = np.maximum.reduceat(np.where(sk == 0, sv, -1), starts)  # ranks ≥ 0
        ok = (deg > 0) & (own >= 0)
        contrib_run = np.where(
            ok, (np.where(ok, own, 0) * damping_pct) // np.maximum(100 * deg, 1), 0
        )
        fan = is_nb
        if not fan.any():
            return empty
        return pa.Table.from_arrays(
            [pa.array(sv[fan]), pa.array(contrib_run[run_id[fan]])],
            names=["node", "contrib"],
        )

    def finish(b: pa.Table) -> pa.Table:
        got = pc.cast(b.column("sum(contrib)"), pa.int64())
        rank = pc.add(got, pa.scalar(base, pa.int64()))
        return pa.Table.from_arrays([b.column("node"), rank], names=["node", "rank"])

    for _ in range(iters):
        rank_rows = ranks.map_batches(as_rank_rows, batch_format="pyarrow")
        ranks = bounded(
            adj.union(rank_rows)
            .groupby("bucket")
            .map_groups(spread, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Sum("contrib"))
            .map_batches(finish, batch_format="pyarrow")
        )

    return ranks.map_batches(
        lambda b: pa.Table.from_arrays(
            [b.column("node"), b.column("rank")], names=["node", "rank_micro"]
        ),
        batch_format="pyarrow",
    )


def triangle_count(
    pairs: "ray.data.Dataset",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> "ray.data.Dataset":
    """EXACT triangle count of the undirected pair graph — the cluster
    cohesion probe (near-dup clusters that are cliques vs chains need
    different canonicalization budgets).

    The classic degree-ordered wedge plan (node-iterator with the
    (deg, id) total order): orient every distinct edge from its
    "smaller" endpoint, enumerate wedges (out-neighbor pairs) at each
    node, and count wedges whose closing edge exists. Degree ordering
    bounds every out-degree by O(√m) on ANY graph — the hub-skew
    guarantee that makes the wedge stage safe at web scale.

    Matching is GROUPBY-ONLY: wedge rows and edge rows union into one
    slim (lo, hi, is_edge, is_wedge) stream; one keyed groupby sums
    both indicators and triangles = Σ sum_edge·sum_wedge — no join
    needed where the join would be pair-keyed anyway. Each triangle is
    counted exactly once (its ≺-minimum vertex emits the wedge).
    Self-loops and null endpoints are dropped; parallel edges collapse.
    Returns a 1-row Dataset (n_triangles)."""
    from pdf_table_extractor_ray.stages.joins import hash_shuffle_join

    def canon(b: pa.Table) -> pa.Table:
        a = b.column(a_col)
        c = b.column(b_col)
        m = pc.and_(pc.is_valid(a), pc.is_valid(c))
        a = pc.cast(a.filter(m), pa.int64()).to_numpy(zero_copy_only=False)
        c = pc.cast(c.filter(m), pa.int64()).to_numpy(zero_copy_only=False)
        keep = a != c
        a, c = a[keep], c[keep]
        return pa.table(
            {"lo": pa.array(np.minimum(a, c)), "hi": pa.array(np.maximum(a, c))}
        )

    edges = (
        pairs.map_batches(canon, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["lo", "hi"])
        .aggregate(Count())
        .map_batches(lambda b: b.select(["lo", "hi"]), batch_format="pyarrow")
        .materialize()  # reused: degrees, orientation, closing-edge match
    )

    def endpoints(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [
                        pc.cast(b.column("lo"), pa.int64()).combine_chunks(),
                        pc.cast(b.column("hi"), pa.int64()).combine_chunks(),
                    ]
                )
            }
        )

    degrees = (
        edges.map_batches(endpoints, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("node")
        .aggregate(Count())
        .map_batches(
            lambda b: pa.table(
                {"node": b.column("node"), "deg": pc.cast(b.column("count()"), pa.int64())}
            ),
            batch_format="pyarrow",
        )
    )

    with_lo = hash_shuffle_join(
        edges, degrees, on="lo", right_on="node", how="inner"
    ).map_batches(
        lambda b: pa.table(
            {"lo": b.column("lo"), "hi": b.column("hi"), "deg_lo": b.column("deg")}
        ),
        batch_format="pyarrow",
    )
    with_both = hash_shuffle_join(
        with_lo, degrees, on="hi", right_on="node", how="inner"
    )

    def orient(b: pa.Table) -> pa.Table:
        lo = b.column("lo").to_numpy(zero_copy_only=False)
        hi = b.column("hi").to_numpy(zero_copy_only=False)
        dl = b.column("deg_lo").to_numpy(zero_copy_only=False)
        dh = b.column("deg").to_numpy(zero_copy_only=False)
        # src = endpoint smaller in the (deg, id) total order
        lo_first = (dl < dh) | ((dl == dh) & (lo < hi))
        src = np.where(lo_first, lo, hi)
        dst = np.where(lo_first, hi, lo)
        return pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    oriented = with_both.map_batches(orient, batch_format="pyarrow", zero_copy_batch=True)

    # wedge enumeration with NO per-source-node Python: shuffle by
    # src BUCKET (64 fixed groups); per bucket one lexsort, then pair
    # expansion batched by out-degree (one triu_indices + one gather
    # per DISTINCT degree value — degree-ordering bounds out-degree by
    # O(√m), so the distinct-degree count per bucket is tiny)
    def bucketize_src(b: pa.Table) -> pa.Table:
        s = b.column("src").to_numpy(zero_copy_only=False)
        return b.append_column(
            "bucket", pa.array((s % 64).astype(np.int64), pa.int64())
        )

    def wedges(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "lo": pa.array([], pa.int64()),
                "hi": pa.array([], pa.int64()),
                "is_edge": pa.array([], pa.int64()),
                "is_wedge": pa.array([], pa.int64()),
            }
        )
        n = g.num_rows
        if n < 2:
            return empty
        src = g.column("src").to_numpy(zero_copy_only=False)
        dst = g.column("dst").to_numpy(zero_copy_only=False)
        order = np.lexsort((dst, src))
        ss, sd = src[order], dst[order]
        first = np.empty(n, bool)
        first[0] = True
        first[1:] = ss[1:] != ss[:-1]
        starts = np.flatnonzero(first)
        lens = np.diff(np.append(starts, n))
        xs, ys = [], []
        for L in np.unique(lens):
            if L < 2:
                continue
            rows = starts[lens == L]
            block = sd[rows[:, None] + np.arange(L)]  # dst ascending per run
            iu, ju = np.triu_indices(int(L), 1)
            xs.append(block[:, iu].ravel())
            ys.append(block[:, ju].ravel())
        if not xs:
            return empty
        x = np.concatenate(xs)
        y = np.concatenate(ys)  # run-sorted ⇒ x < y, already id-canonical
        return pa.table(
            {
                "lo": pa.array(x.astype(np.int64)),
                "hi": pa.array(y.astype(np.int64)),
                "is_edge": pa.array(np.zeros(len(x), np.int64)),
                "is_wedge": pa.array(np.ones(len(x), np.int64)),
            }
        )

    wedge_rows = (
        oriented.map_batches(bucketize_src, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(wedges, batch_format="pyarrow")
    )
    edge_rows = edges.map_batches(
        lambda b: pa.table(
            {
                "lo": b.column("lo"),
                "hi": b.column("hi"),
                "is_edge": pa.array(np.ones(b.num_rows, np.int64)),
                "is_wedge": pa.array(np.zeros(b.num_rows, np.int64)),
            }
        ),
        batch_format="pyarrow",
    )

    matched = (
        wedge_rows.union(edge_rows)
        .groupby(["lo", "hi"])
        .aggregate(Sum("is_edge"), Sum("is_wedge"))
    )

    def tri_partial(b: pa.Table) -> pa.Table:
        e = pc.cast(b.column("sum(is_edge)"), pa.int64()).to_numpy(zero_copy_only=False)
        w = pc.cast(b.column("sum(is_wedge)"), pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"t": pa.array([int((e * w).sum())], pa.int64())})

    total = matched.map_batches(
        tri_partial, batch_format="pyarrow", zero_copy_batch=True
    ).aggregate(Sum("t"))
    n = 0 if total is None else int(total["sum(t)"] or 0)
    return ray.data.from_arrow(pa.table({"n_triangles": pa.array([n], pa.int64())}))


def label_propagation(
    pairs: "ray.data.Dataset",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    iters: int = 5,
) -> "ray.data.Dataset":
    """Synchronous label-propagation communities (Raghavan et al. 2007)
    over the undirected pair graph — the community detector that needs
    no cluster count up front; near-dup pipelines use it to split a
    connected component that chains several true clusters through
    weak links (CC alone merges them; LPA keeps dense cores apart).

    Deterministic variant: every node starts labeled with its own id;
    each round, every node simultaneously adopts the most frequent
    label among its neighbors, ties broken by SMALLEST label. Fixed
    ``iters`` rounds (no convergence probe → no driver traffic).

    Same distribution discipline as :func:`pagerank`: the static
    adjacency unions with the current label table, ONE
    ``groupby(node % 64)`` bucket shuffle fans each node's label to
    its neighbors as (neighbor, label) votes — per-bucket work is one
    argsort + reduceat family, Python-call count fixed at 64 — then
    one keyed groupby counts votes and ONE packed-int64 Max
    (count·2^40 + (2^40−1−label)) picks argmax-with-min-tie-break per
    node: bit-identical across block layouts and cluster sizes.
    Packing contract: labels (node ids) < 2^40 and per-node degree
    < 2^23 — both hold for any graph whose *pair list* fits a real
    corpus (document ids are dense int64 well under 2^40; a node with
    ≥2^23 candidate-pair neighbors would have defeated the LSH
    banding long before this stage).

    Returns (node, community) — community = the converged label.
    """
    _NB = 64
    _PACK = 1 << 40

    def to_adj(b: pa.Table) -> pa.Table:
        a = b.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
        bb = b.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
        node = np.concatenate([a, bb])
        return pa.Table.from_arrays(
            [
                pa.array(node),
                pa.array(np.concatenate([bb, a])),
                pa.array(np.ones(2 * len(a), dtype=np.int8)),
                pa.array(node % _NB),
            ],
            names=["node", "val", "kind", "bucket"],
        )

    P = max(8, int(ray.cluster_resources().get("CPU", 8)))

    def bounded(ds_in):
        m = ds_in.materialize()
        if m.num_blocks() > P:
            m = m.repartition(P).materialize()
        return m

    adj = bounded(pairs.map_batches(to_adj, batch_format="pyarrow", zero_copy_batch=True))

    def init_label(b: pa.Table) -> pa.Table:
        node = b.column("node")
        return pa.Table.from_arrays([node, node], names=["node", "label"])

    nodes = adj.groupby("node").aggregate(Sum("kind")).drop_columns(["sum(kind)"])
    labels = bounded(nodes.map_batches(init_label, batch_format="pyarrow"))

    def as_label_rows(b: pa.Table) -> pa.Table:
        node = b.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_arrays(
            [
                pa.array(node),
                pc.cast(b.column("label"), pa.int64()),
                pa.array(np.zeros(len(node), dtype=np.int8)),
                pa.array(node % _NB),
            ],
            names=["node", "val", "kind", "bucket"],
        )

    def fan_votes(group: pa.Table) -> pa.Table:
        """One bucket of SENDING nodes: fan each node's current label
        to its neighbor rows, pre-counted within the bucket — emits
        distinct (voter-target, label, n) triples."""
        n = group.num_rows
        empty = pa.Table.from_arrays(
            [pa.array([], pa.int64()), pa.array([], pa.int64()), pa.array([], pa.int64())],
            names=["node", "label", "n"],
        )
        if n == 0:
            return empty
        node = group.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
        val = group.column("val").to_numpy(zero_copy_only=False).astype(np.int64)
        kind = group.column("kind").to_numpy(zero_copy_only=False)
        order = np.argsort(node, kind="stable")
        sn, sv, sk = node[order], val[order], kind[order]
        first = np.empty(n, bool)
        first[0] = True
        first[1:] = sn[1:] != sn[:-1]
        run_id = np.cumsum(first) - 1
        starts = np.flatnonzero(first)
        own = np.maximum.reduceat(np.where(sk == 0, sv, -1), starts)  # labels ≥ 0
        fan = sk == 1
        if not fan.any():
            return empty
        tgt = sv[fan]
        lab = own[run_id[fan]]
        # within-bucket pre-count: the (target, label) vote multiset
        pairs_arr = np.stack([tgt, lab], axis=1)
        upair, cnt = np.unique(pairs_arr, axis=0, return_counts=True)
        return pa.Table.from_arrays(
            [
                pa.array(upair[:, 0]),
                pa.array(upair[:, 1]),
                pa.array(cnt.astype(np.int64)),
            ],
            names=["node", "label", "n"],
        )

    def pack(b: pa.Table) -> pa.Table:
        cnt = pc.cast(b.column("sum(n)"), pa.int64()).to_numpy(zero_copy_only=False)
        lab = b.column("label").to_numpy(zero_copy_only=False)
        packed = cnt * _PACK + (_PACK - 1 - lab)
        return pa.Table.from_arrays(
            [b.column("node"), pa.array(packed)], names=["node", "packed"]
        )

    def unpack(b: pa.Table) -> pa.Table:
        packed = pc.cast(b.column("max(packed)"), pa.int64()).to_numpy(zero_copy_only=False)
        lab = _PACK - 1 - (packed % _PACK)
        return pa.Table.from_arrays(
            [b.column("node"), pa.array(lab)], names=["node", "label"]
        )

    for _ in range(iters):
        label_rows = labels.map_batches(as_label_rows, batch_format="pyarrow")
        labels = bounded(
            adj.union(label_rows)
            .groupby("bucket")
            .map_groups(fan_votes, batch_format="pyarrow")
            .groupby(["node", "label"])
            .aggregate(Sum("n"))
            .map_batches(pack, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Max("packed"))
            .map_batches(unpack, batch_format="pyarrow")
        )

    return labels.map_batches(
        lambda b: pa.Table.from_arrays(
            [b.column("node"), b.column("label")], names=["node", "community"]
        ),
        batch_format="pyarrow",
    )


def k_core(
    pairs: "ray.data.Dataset",
    k: int = 3,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iters: int = 16,
) -> "ray.data.Dataset":
    """Nodes of the k-core (maximal subgraph with min degree ≥ k) of
    the undirected pair graph — the dense-cluster extractor: in a
    near-dup graph the 3-core keeps true duplicate cliques and sheds
    the LSH-false-positive fringe that chains them together.

    Distributed peeling, join-free like :func:`pagerank` (Ray's hash
    join misbehaves on schema-less empty blocks in iterative loops):
    each round (1) degrees via one keyed groupby over half-edge rows,
    (2) survivor set = deg ≥ k, (3) edges re-filtered by BOTH
    endpoints with one ``groupby(node % 64)`` bucket shuffle (in-bucket
    survivor membership via sorted searchsorted — vectorized) and one
    (lo, hi) pair groupby that keeps edges whose two halves both
    survived. Early exit when the surviving half-edge count is stable
    — ONE scalar to the driver per round (same budget as the CC
    convergence probe). Peeling converges in ≤ diameter-ish rounds;
    ``max_iters`` bounds the worst case (a path graph peels one layer
    per round).

    Returns (node, core_degree) for every node of the k-core, where
    core_degree = its degree within the core (≥ k by construction).
    """
    _NB = 64

    def halves(b: pa.Table) -> pa.Table:
        a = b.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
        bb = b.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
        keep = a != bb  # self-loops never help a core
        a, bb = a[keep], bb[keep]
        return pa.Table.from_arrays(
            [
                pa.array(np.concatenate([a, bb])),
                pa.array(np.concatenate([bb, a])),
            ],
            names=["node", "other"],
        )

    P = max(8, int(ray.cluster_resources().get("CPU", 8)))

    def bounded(ds_in):
        m = ds_in.materialize()
        if m.num_blocks() > P:
            m = m.repartition(P).materialize()
        return m

    # collapse parallel edges up front: distinct (node, other) halves
    edges = bounded(
        pairs.map_batches(halves, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["node", "other"])
        .aggregate(Count())
        .drop_columns(["count()"])
    )
    n_half = edges.count()

    def deg_partial(b: pa.Table) -> pa.Table:
        node = b.column("node").to_numpy(zero_copy_only=False)
        u, c = np.unique(node, return_counts=True)
        return pa.Table.from_arrays(
            [pa.array(u.astype(np.int64)), pa.array(c.astype(np.int64))],
            names=["node", "d"],
        )

    def filter_by_survivors(group: pa.Table) -> pa.Table:
        """One bucket: survivor ids (kind 0) + half-edges keyed by
        their 'node' endpoint (kind 1); emit the (lo, hi) of halves
        whose keyed endpoint survives."""
        kind = group.column("kind").to_numpy(zero_copy_only=False)
        node = group.column("node").to_numpy(zero_copy_only=False)
        other = group.column("other").to_numpy(zero_copy_only=False)
        surv = np.sort(node[kind == 0])
        he = kind == 1
        n, o = node[he], other[he]
        if len(surv) == 0 or len(n) == 0:
            e = pa.array([], pa.int64())
            return pa.Table.from_arrays([e, e], names=["lo", "hi"])
        pos = np.searchsorted(surv, n)
        ok = (pos < len(surv)) & (surv[np.minimum(pos, len(surv) - 1)] == n)
        n, o = n[ok], o[ok]
        return pa.Table.from_arrays(
            [pa.array(np.minimum(n, o)), pa.array(np.maximum(n, o))],
            names=["lo", "hi"],
        )

    def reexpand(b: pa.Table) -> pa.Table:
        cnt = pc.cast(b.column("count()"), pa.int64()).to_numpy(zero_copy_only=False)
        lo = b.column("lo").to_numpy(zero_copy_only=False)
        hi = b.column("hi").to_numpy(zero_copy_only=False)
        both = cnt == 2  # both endpoints survived
        lo, hi = lo[both], hi[both]
        return pa.Table.from_arrays(
            [
                pa.array(np.concatenate([lo, hi])),
                pa.array(np.concatenate([hi, lo])),
            ],
            names=["node", "other"],
        )

    for _ in range(max_iters):
        if n_half == 0:
            break
        deg = (
            edges.map_batches(deg_partial, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("node")
            .aggregate(Sum("d"))
        )

        def survivors(b: pa.Table) -> pa.Table:
            d = pc.cast(b.column("sum(d)"), pa.int64())
            keep = pc.greater_equal(d, k)
            node = pc.array_filter(b.column("node"), keep)
            n = len(node)
            return pa.Table.from_arrays(
                [
                    pc.cast(node, pa.int64()),
                    pa.array(np.zeros(n, np.int64)),
                    pa.array(np.zeros(n, np.int8)),
                    pa.array(pc.cast(node, pa.int64()).to_numpy(zero_copy_only=False) % _NB),
                ],
                names=["node", "other", "kind", "bucket"],
            )

        def tag_halves(b: pa.Table) -> pa.Table:
            node = b.column("node").to_numpy(zero_copy_only=False)
            return pa.Table.from_arrays(
                [
                    b.column("node"),
                    b.column("other"),
                    pa.array(np.ones(len(node), np.int8)),
                    pa.array(node % _NB),
                ],
                names=["node", "other", "kind", "bucket"],
            )

        surv_rows = deg.map_batches(survivors, batch_format="pyarrow")
        half_rows = edges.map_batches(tag_halves, batch_format="pyarrow", zero_copy_batch=True)
        edges = bounded(
            surv_rows.union(half_rows)
            .groupby("bucket")
            .map_groups(filter_by_survivors, batch_format="pyarrow")
            .groupby(["lo", "hi"])
            .aggregate(Count())
            .map_batches(reexpand, batch_format="pyarrow")
        )
        new_half = edges.count()
        if new_half == n_half:
            break
        n_half = new_half

    out = (
        edges.map_batches(deg_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("node")
        .aggregate(Sum("d"))
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [b.column("node"), pc.cast(b.column("sum(d)"), pa.int64())],
            names=["node", "core_degree"],
        )

    return out.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# directed weighted PageRank over a host link graph


def pagerank_directed(
    edges: "ray.data.Dataset",
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = None,
    iters: int = 10,
    damping_pct: int = 85,
) -> "ray.data.Dataset":
    """Directed, WEIGHTED PageRank with dangling-mass redistribution —
    the host-graph variant (the canonical Common-Crawl computation:
    Page et al. 1999 §2.1, link weights = inter-host link counts).

    Differences from the undirected ``pagerank`` above, which it
    otherwise follows (groupby-only iteration, integer micro-ranks,
    block-count bounding — see that docstring for the rationale):

    - **Directed**: mass flows src→dst only; a node's fan-out is its
      OUT-edge list, weighted ``rank·d·w // (100·W_out)`` per edge.
    - **String nodes**: hosts groupby natively as Arrow strings; the
      bucket key is vectorized FNV-1a-64 (``sketches.py``), and
      within-bucket runs sort the string array directly — no global
      string→int id assignment pass, no hash-collision risk.
    - **Dangling nodes** (no out-links — link sinks are common in real
      crawls): their damped mass redistributes uniformly,
      ``share = d·D_t // (100·N)``. ``D_t`` (the dangling rank sum) is
      ONE driver scalar per round over the already-materialized rank
      table (same budget the undirected loop's convergence probe
      spends); every node's zero-contribution row keeps in-link-free
      nodes alive through the sum.

    Integer overflow bound (documented contract): per-edge math is
    ``(rank·d//100)·w``, so ``max_rank · max_edge_weight`` must fit
    int64 — at 10^9 nodes (rank mass ≤ ~10^18 micro-units only if one
    node absorbed the whole graph; realistic top ranks are ≤10^6·UNIT)
    and per-edge weights ≤ 10^3 the product stays ≤ ~10^18.

    Returns (node: string, rank_micro: int64); the total mass is
    ≈ N·10^9 minus bounded one-sided floor-division leakage, and the
    result is bit-identical across block layouts and cluster sizes.
    """
    from pdf_table_extractor_ray.stages.sketches import _fnv1a_bytes_array

    _NB = 64

    def _bucket(col: pa.Array) -> pa.Array:
        return pa.array(
            (_fnv1a_bytes_array(pc.cast(col, pa.string()).combine_chunks()
                                if isinstance(col, pa.ChunkedArray) else pc.cast(col, pa.string()))
             % np.uint64(_NB)).astype(np.int64)
        )

    def to_adj(b: pa.Table) -> pa.Table:
        src = pc.cast(b.column(src_col), pa.string())
        dst = pc.cast(b.column(dst_col), pa.string())
        if weight_col is not None:
            w = pc.cast(b.column(weight_col), pa.int64())
        else:
            w = pa.array(np.ones(b.num_rows, np.int64))
        return pa.Table.from_arrays(
            [src, dst, w,
             pa.array(np.ones(b.num_rows, np.int8)),
             _bucket(src)],
            names=["node", "nb", "w", "kind", "bucket"],
        )

    P = max(8, int(ray.cluster_resources().get("CPU", 8)))

    def bounded(ds_in):
        m = ds_in.materialize()
        if m.num_blocks() > P:
            m = m.repartition(P).materialize()
        return m

    adj = bounded(edges.map_batches(to_adj, batch_format="pyarrow", zero_copy_batch=True))

    # node set + dangling flag (no out-edges), one groupby
    def node_rows(b: pa.Table) -> pa.Table:
        return pa.table({
            "node": pa.concat_arrays(
                [pc.cast(b.column(src_col), pa.string()).combine_chunks(),
                 pc.cast(b.column(dst_col), pa.string()).combine_chunks()]
            ),
            "is_src": pa.array(np.concatenate(
                [np.ones(b.num_rows, np.int8), np.zeros(b.num_rows, np.int8)]
            )),
        })

    def init_rank(b: pa.Table) -> pa.Table:
        dang = pc.cast(
            pc.subtract(pa.scalar(1, pa.int8()), pc.cast(b.column("max(is_src)"), pa.int8())),
            pa.int8(),
        )
        return pa.Table.from_arrays(
            [b.column("node"),
             pa.array(np.full(b.num_rows, RANK_UNIT, np.int64)),
             dang],
            names=["node", "rank", "dang"],
        )

    ranks = bounded(
        edges.map_batches(node_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("node")
        .aggregate(Max("is_src"))
        .map_batches(init_rank, batch_format="pyarrow")
    )
    n_nodes = ranks.count()
    if n_nodes == 0:
        return ranks.map_batches(
            lambda b: pa.Table.from_arrays(
                [b.column("node"), b.column("rank")], names=["node", "rank_micro"]
            ),
            batch_format="pyarrow",
        )

    base = ((100 - damping_pct) * RANK_UNIT) // 100

    def as_rank_rows(b: pa.Table) -> pa.Table:
        node = b.column("node")
        return pa.Table.from_arrays(
            [pc.cast(node, pa.string()),
             pa.nulls(b.num_rows, pa.string()),
             pc.cast(b.column("rank"), pa.int64()),
             pa.array(np.zeros(b.num_rows, np.int8)),
             _bucket(node)],
            names=["node", "nb", "w", "kind", "bucket"],
        )

    def zero_rows(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [b.column("node"),
             pa.array(np.zeros(b.num_rows, np.int64)),
             b.column("dang")],
            names=["node", "contrib", "dang"],
        )

    def spread(group: pa.Table) -> pa.Table:
        """One bucket of source nodes per call: sort the mixed
        adjacency+rank rows by node string, two ``reduceat``s give
        each run its rank and total out-weight, one gather fans the
        weighted integer contribution to the run's out-neighbors."""
        empty = pa.Table.from_arrays(
            [pa.array([], pa.string()), pa.array([], pa.int64()),
             pa.array([], pa.int8())],
            names=["node", "contrib", "dang"],
        )
        n = group.num_rows
        if n == 0:
            return empty
        node = group.column("node").to_numpy(zero_copy_only=False)
        nb = group.column("nb").to_numpy(zero_copy_only=False)
        w = group.column("w").to_numpy(zero_copy_only=False).astype(np.int64)
        kind = group.column("kind").to_numpy(zero_copy_only=False)
        order = np.argsort(node, kind="stable")
        sn, snb, sw, sk = node[order], nb[order], w[order], kind[order]
        first = np.empty(n, bool)
        first[0] = True
        first[1:] = sn[1:] != sn[:-1]
        starts = np.flatnonzero(first)
        run_id = np.cumsum(first) - 1
        is_edge = sk == 1
        wout = np.add.reduceat(np.where(is_edge, sw, 0), starts)
        own = np.maximum.reduceat(np.where(sk == 0, sw, -1), starts)
        q = np.where(own >= 0, (np.maximum(own, 0) * damping_pct) // 100, 0)
        fan = is_edge & (q[run_id] > 0) & (wout[run_id] > 0)
        if not fan.any():
            return empty
        contrib = (q[run_id[fan]] * sw[fan]) // wout[run_id[fan]]
        return pa.Table.from_arrays(
            [pa.array(snb[fan], pa.string()), pa.array(contrib),
             pa.array(np.zeros(int(fan.sum()), np.int8))],
            names=["node", "contrib", "dang"],
        )

    ranks_out = ranks
    for _ in range(iters):
        # one driver scalar per round: the dangling rank mass
        dang_mass = ranks_out.map_batches(
            lambda b: pa.table({
                "dm": pa.array([int(
                    np.where(
                        b.column("dang").to_numpy(zero_copy_only=False) == 1,
                        b.column("rank").to_numpy(zero_copy_only=False),
                        0,
                    ).sum()
                )], pa.int64())
            }),
            batch_format="pyarrow",
        ).sum("dm")
        share = (int(dang_mass or 0) * damping_pct) // (100 * n_nodes)

        rank_rows = ranks_out.map_batches(as_rank_rows, batch_format="pyarrow")
        contribs = (
            adj.union(rank_rows)
            .groupby("bucket")
            .map_groups(spread, batch_format="pyarrow")
        )
        zeros = ranks_out.map_batches(zero_rows, batch_format="pyarrow")

        def finish(b: pa.Table, _share=share) -> pa.Table:
            got = pc.cast(b.column("sum(contrib)"), pa.int64())
            rank = pc.add(got, pa.scalar(base + _share, pa.int64()))
            return pa.Table.from_arrays(
                [b.column("node"), rank, pc.cast(b.column("max(dang)"), pa.int8())],
                names=["node", "rank", "dang"],
            )

        ranks_out = bounded(
            contribs.union(zeros)
            .groupby("node")
            .aggregate(Sum("contrib"), Max("dang"))
            .map_batches(finish, batch_format="pyarrow")
        )

    return ranks_out.map_batches(
        lambda b: pa.Table.from_arrays(
            [b.column("node"), b.column("rank")], names=["node", "rank_micro"]
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# HITS hubs & authorities (Kleinberg 1998) over the directed host graph


HITS_UNIT = 1_000_000  # normalized score scale (max score per round = UNIT)




def hits(
    edges: "ray.data.Dataset",
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = None,
    iters: int = 8,
) -> "ray.data.Dataset":
    """Hubs & authorities (Kleinberg 1998, the HITS fixpoint) over a
    directed weighted edge list → (node, hub_micro, auth_micro), both
    L∞-normalized to ``HITS_UNIT`` per half-round.

    The other classic web centrality next to ``pagerank_directed``
    (authorities ≠ high-PageRank: a page every hub lists is an
    authority even with little random-walk mass). Same distributed
    discipline: adjacency materialized once per direction, each
    half-round is ONE ``groupby(bucket)`` spread + ONE ``groupby(node)``
    integer Sum; hub and auth live as separate slim (node, val) tables
    so a half-round touches exactly one of them (no per-round
    hub/auth zip — they are merged once, at the end). The driver sees
    one scalar per half-round (the normalization max).

    Determinism contract: all accumulation is exact int64 (layout- and
    cluster-size-invariant); normalization is a pure per-element
    float64 rescale of those exact sums (``floor(raw·UNIT/max)``) — no
    float is ever accumulated, so results are bit-identical across
    block layouts.
    """
    from pdf_table_extractor_ray.stages.sketches import _fnv1a_bytes_array

    _NB = 64

    def _bucket(col) -> pa.Array:
        col = pc.cast(col, pa.string())
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return pa.array((_fnv1a_bytes_array(col) % np.uint64(_NB)).astype(np.int64))

    def adj_batch(b: pa.Table, key_col: str, other_col: str) -> pa.Table:
        key = pc.cast(b.column(key_col), pa.string())
        other = pc.cast(b.column(other_col), pa.string())
        if weight_col is not None:
            w = pc.cast(b.column(weight_col), pa.int64())
        else:
            w = pa.array(np.ones(b.num_rows, np.int64))
        return pa.Table.from_arrays(
            [key, other, w, pa.array(np.ones(b.num_rows, np.int8)), _bucket(key)],
            names=["node", "nb", "w", "kind", "bucket"],
        )

    P = max(8, int(ray.cluster_resources().get("CPU", 8)))

    def bounded(ds_in):
        m = ds_in.materialize()
        if m.num_blocks() > P:
            m = m.repartition(P).materialize()
        return m

    # adjacency keyed by src (auth pass: fan hub(src)→dst) and by dst
    # (hub pass: fan auth(dst)→src); both materialized once
    adj_s = bounded(
        edges.map_batches(
            lambda b: adj_batch(b, src_col, dst_col),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    )
    adj_d = bounded(
        edges.map_batches(
            lambda b: adj_batch(b, dst_col, src_col),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    )

    def node_rows(b: pa.Table) -> pa.Table:
        return pa.table({
            "node": pa.concat_arrays(
                [pc.cast(b.column(src_col), pa.string()).combine_chunks(),
                 pc.cast(b.column(dst_col), pa.string()).combine_chunks()]
            ),
        })

    nodes = bounded(
        edges.map_batches(node_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("node")
        .aggregate(Count())
        .drop_columns(["count()"])
    )

    def init_scores(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [b.column("node"), pa.array(np.full(b.num_rows, HITS_UNIT, np.int64))],
            names=["node", "val"],
        )

    hubs = bounded(nodes.map_batches(init_scores, batch_format="pyarrow"))
    auths = hubs  # same initial table; immutable datasets, safe to share

    def zeros(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [b.column("node"), pa.array(np.zeros(b.num_rows, np.int64))],
            names=["node", "contrib"],
        )

    zero_rows = bounded(nodes.map_batches(zeros, batch_format="pyarrow"))

    def score_rows(b: pa.Table) -> pa.Table:
        node = b.column("node")
        return pa.Table.from_arrays(
            [pc.cast(node, pa.string()),
             pa.nulls(b.num_rows, pa.string()),
             pc.cast(b.column("val"), pa.int64()),
             pa.array(np.zeros(b.num_rows, np.int8)),
             _bucket(node)],
            names=["node", "nb", "w", "kind", "bucket"],
        )

    def spread(group: pa.Table) -> pa.Table:
        """One bucket per call: each run's score (kind=0 row) fans
        ``score·w`` to the run's neighbors — the HITS sum has no
        degree division, so the fan is a single gather."""
        empty = pa.Table.from_arrays(
            [pa.array([], pa.string()), pa.array([], pa.int64())],
            names=["node", "contrib"],
        )
        n = group.num_rows
        if n == 0:
            return empty
        node = group.column("node").to_numpy(zero_copy_only=False)
        nb = group.column("nb").to_numpy(zero_copy_only=False)
        w = group.column("w").to_numpy(zero_copy_only=False).astype(np.int64)
        kind = group.column("kind").to_numpy(zero_copy_only=False)
        order = np.argsort(node, kind="stable")
        sn, snb, sw, sk = node[order], nb[order], w[order], kind[order]
        first = np.empty(n, bool)
        first[0] = True
        first[1:] = sn[1:] != sn[:-1]
        starts = np.flatnonzero(first)
        run_id = np.cumsum(first) - 1
        own = np.maximum.reduceat(np.where(sk == 0, sw, -1), starts)
        fan = (sk == 1) & (own[run_id] > 0)
        if not fan.any():
            return empty
        contrib = own[run_id[fan]] * sw[fan]
        return pa.Table.from_arrays(
            [pa.array(snb[fan], pa.string()), pa.array(contrib)],
            names=["node", "contrib"],
        )

    def half_round(adj, scores):
        raw = bounded(
            adj.union(scores.map_batches(score_rows, batch_format="pyarrow"))
            .union(zero_rows.map_batches(
                lambda b: pa.Table.from_arrays(
                    [b.column("node"), pa.nulls(b.num_rows, pa.string()),
                     b.column("contrib"),
                     pa.array(np.full(b.num_rows, 2, np.int8)),
                     _bucket(b.column("node"))],
                    names=["node", "nb", "w", "kind", "bucket"],
                ),
                batch_format="pyarrow",
            ))
            .groupby("bucket")
            .map_groups(spread_with_zero, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Sum("contrib"))
        )
        m = int(raw.max("sum(contrib)") or 0)  # ONE driver scalar

        def rescale(b: pa.Table, _m=m) -> pa.Table:
            v = pc.cast(b.column("sum(contrib)"), pa.int64()).to_numpy(
                zero_copy_only=False
            )
            if _m > 0:
                out = np.floor(v.astype(np.float64) * HITS_UNIT / _m).astype(np.int64)
            else:
                out = np.zeros(len(v), np.int64)
            return pa.Table.from_arrays(
                [b.column("node"), pa.array(out)], names=["node", "val"]
            )

        return raw.map_batches(rescale, batch_format="pyarrow")

    def spread_with_zero(group: pa.Table) -> pa.Table:
        """spread() + pass-through of kind=2 zero rows (keeps every
        node alive through the contribution Sum without a third
        union at the outer level)."""
        out = spread(group.filter(pc.not_equal(group.column("kind"), pa.scalar(2, pa.int8()))))
        z = group.filter(pc.equal(group.column("kind"), pa.scalar(2, pa.int8())))
        if z.num_rows == 0:
            return out
        zt = pa.Table.from_arrays(
            [z.column("node"), z.column("w")], names=["node", "contrib"]
        )
        return pa.concat_tables([out, zt]) if out.num_rows else zt

    for _ in range(iters):
        auths = half_round(adj_s, hubs)    # auth ← Σ_in hub·w
        hubs = half_round(adj_d, auths)    # hub ← Σ_out auth·w

    # single final merge: tag and combine per bucket
    def tag(which):
        def f(b: pa.Table) -> pa.Table:
            return pa.Table.from_arrays(
                [b.column("node"), pc.cast(b.column("val"), pa.int64()),
                 pa.array(np.full(b.num_rows, 1 if which == "hub" else 0, np.int8)),
                 _bucket(b.column("node"))],
                names=["node", "v", "is_hub", "bucket"],
            )
        return f

    def combine(group: pa.Table) -> pa.Table:
        n = group.num_rows
        empty = pa.Table.from_arrays(
            [pa.array([], pa.string()), pa.array([], pa.int64()),
             pa.array([], pa.int64())],
            names=["node", "hub_micro", "auth_micro"],
        )
        if n == 0:
            return empty
        node = group.column("node").to_numpy(zero_copy_only=False)
        v = group.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
        is_hub = group.column("is_hub").to_numpy(zero_copy_only=False)
        order = np.argsort(node, kind="stable")
        sn, sv, si = node[order], v[order], is_hub[order]
        first = np.empty(n, bool)
        first[0] = True
        first[1:] = sn[1:] != sn[:-1]
        starts = np.flatnonzero(first)
        hub = np.maximum(np.maximum.reduceat(np.where(si == 1, sv, -1), starts), 0)
        auth = np.maximum(np.maximum.reduceat(np.where(si == 0, sv, -1), starts), 0)
        return pa.Table.from_arrays(
            [pa.array(sn[starts], pa.string()), pa.array(hub), pa.array(auth)],
            names=["node", "hub_micro", "auth_micro"],
        )

    return (
        hubs.map_batches(tag("hub"), batch_format="pyarrow")
        .union(auths.map_batches(tag("auth"), batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(combine, batch_format="pyarrow")
    )


def _bfs_setup(
    edges: "ray.data.Dataset",
    seeds: "ray.data.Dataset",
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
):
    """Bounded-depth BFS — min-hop distance from a seed SET over a
    directed edge list (the crawl-depth assignment every frontier
    scheduler needs: depth-0 seeds, depth-k pages discovered k hops
    out, halt at the crawl's depth budget).

    Same distribution discipline as :func:`pagerank` /
    :func:`label_propagation`: the static adjacency is bucketed and
    materialized ONCE; each round unions it with the current frontier
    inside ONE ``groupby(src % 64)`` bucket shuffle (per-bucket
    frontier membership via one sorted ``searchsorted`` probe — no
    per-node Python), then one keyed ``Min`` groupby folds newly
    reached nodes into the distance table. One scalar count probe per
    round early-stops a drained frontier; ≤ ``max_depth`` rounds
    whatever the graph.

    Returns (node, depth) for every node within ``max_depth`` hops of
    a seed (seeds at depth 0). Nodes only ever named as edge sources
    but never reached stay absent — unreachable is out-of-band by
    omission, like the redirect resolver's cycle flag.
    """
    _NB = 64

    def to_adj(b: pa.Table) -> pa.Table:
        s = pc.cast(b.column(src_col), pa.int64()).to_numpy(zero_copy_only=False)
        d = pc.cast(b.column(dst_col), pa.int64()).to_numpy(zero_copy_only=False)
        return pa.Table.from_arrays(
            [
                pa.array(s),
                pa.array(d),
                pa.array(np.ones(len(s), dtype=np.int8)),
                pa.array(s % _NB),
            ],
            names=["node", "val", "kind", "bucket"],
        )

    P = max(8, int(ray.cluster_resources().get("CPU", 8)))

    def bounded(ds_in):
        m = ds_in.materialize()
        if m.num_blocks() > P:
            m = m.repartition(P).materialize()
        return m

    adj = bounded(edges.map_batches(to_adj, batch_format="pyarrow", zero_copy_batch=True))

    def init_seed(b: pa.Table) -> pa.Table:
        n = pc.cast(b.column(node_col), pa.int64())
        return pa.Table.from_arrays(
            [n, pa.array(np.zeros(len(n), dtype=np.int64))], names=["node", "depth"]
        )

    dists = bounded(
        seeds.map_batches(init_seed, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("node")
        .aggregate(Min("depth"))
        .map_batches(
            lambda b: b.rename_columns(["node", "depth"]), batch_format="pyarrow"
        )
    )

    return adj, dists, bounded


def bfs_depths(
    edges: "ray.data.Dataset",
    seeds: "ray.data.Dataset",
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    max_depth: int = 8,
) -> "ray.data.Dataset":
    adj, dists, bounded = _bfs_setup(edges, seeds, src_col, dst_col, node_col)
    for r in range(1, max_depth + 1):
        dists, reached_now = _bfs_round(adj, dists, r, bounded)
        if not reached_now:
            break
    return dists


def bfs_depths_checkpointed(
    edges: "ray.data.Dataset",
    seeds: "ray.data.Dataset",
    ckpt_dir: str,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    max_depth: int = 8,
) -> "ray.data.Dataset":
    """Resumable :func:`bfs_depths`: the carried (node, depth) state
    checkpoints to parquet after every round through
    ``state.checkpoint.run_checkpointed`` (atomic per-round markers),
    so a job killed at round k resumes at round k — the adjacency
    rebuilds from the immutable input, never from the checkpoint.
    Result-identical to the straight run (integer state, layout-
    invariant rounds; pinned in test_graph)."""
    from pdf_table_extractor_ray.state.checkpoint import run_checkpointed

    adj, dists, bounded = _bfs_setup(edges, seeds, src_col, dst_col, node_col)

    def step(state, r):
        new, reached = _bfs_round(adj, state, r, bounded)
        return new, not reached

    return run_checkpointed(dists, step, rounds=max_depth, ckpt_dir=ckpt_dir)


def _bfs_round(adj, dists, r, bounded):
    """One BFS frontier expansion: (new dists, any-node-reached flag).
    Exposed so the checkpointed variant replays the identical round."""
    _NB = 64
    want = r - 1


    def as_frontier(b: pa.Table, want=want) -> pa.Table:
        b = b.filter(pc.equal(b.column("depth"), pa.scalar(want, pa.int64())))
        n = b.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_arrays(
            [
                pa.array(n),
                pa.array(np.zeros(len(n), dtype=np.int64)),
                pa.array(np.zeros(len(n), dtype=np.int8)),
                pa.array(n % _NB),
            ],
            names=["node", "val", "kind", "bucket"],
        )

    frontier = dists.map_batches(
        as_frontier, batch_format="pyarrow", zero_copy_batch=True
    )

    def expand(g: pa.Table, depth=r) -> pa.Table:
        kind = g.column("kind").to_numpy(zero_copy_only=False)
        node = g.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
        val = g.column("val").to_numpy(zero_copy_only=False).astype(np.int64)
        fr = np.unique(node[kind == 0])
        if fr.size == 0:
            return pa.table(
                {"node": pa.array([], pa.int64()), "depth": pa.array([], pa.int64())}
            )
        am = kind == 1
        an, av = node[am], val[am]
        pos = np.searchsorted(fr, an)
        pos[pos >= fr.size] = 0
        hit = fr[pos] == an
        reached = np.unique(av[hit])
        return pa.table(
            {
                "node": pa.array(reached),
                "depth": pa.array(np.full(reached.size, depth, dtype=np.int64)),
            }
        )

    new = (
        adj.union(frontier)
        .groupby("bucket")
        .map_groups(expand, batch_format="pyarrow")
    )
    dists = bounded(
        dists.union(new)
        .groupby("node")
        .aggregate(Min("depth"))
        .map_batches(
            lambda b: b.rename_columns(["node", "depth"]), batch_format="pyarrow"
        )
    )
    # one scalar per round: a drained frontier ends the walk early
    reached_now = dists.map_batches(
        lambda b, rr=r: pa.table(
            {
                "n": pa.array(
                    [
                        pc.sum(
                            pc.cast(
                                pc.equal(b.column("depth"), pa.scalar(rr, pa.int64())),
                                pa.int64(),
                            )
                        ).as_py()
                        or 0
                    ],
                    pa.int64(),
                )
            }
        ),
        batch_format="pyarrow",
    ).sum("n")
    return dists, bool(reached_now)
