"""Sorted-Neighborhood Method (SNM) near-dup pairs — the classic
record-linkage blocking strategy (Hernández & Stolfo 1995) the engine's
hash-blocking family (MinHash/SimHash buckets) doesn't cover: sort the
corpus by a discriminating key and compare each row only to its
``window`` nearest neighbors in sort order. Where LSH blocks by
CONTENT similarity, SNM blocks by KEY adjacency — it catches the
near-miss pairs whose difference sits exactly in the hashed features
(typo in the first shingle) as long as the sort key still clusters
them.

Distributed shape (halo-free two-stage exactness):

1. slim (key, id) rows range-partition by EXACT order statistics of
   the packed 8-byte key prefix (``kth_smallest_u64`` — the CDX
   sorted-parts machinery; packed order is a prefix of byte order, so
   partition order refines the global (key, id) sort),
2. per partition: one sort, then the window pairs via ``window``
   shifted vectorized Levenshtein passes (byte-exact vs DuckDB's
   ``levenshtein``) — no Python over pairs,
3. cross-boundary pairs: each partition also emits its FIRST and LAST
   ``window`` rows (2·w·P slim rows total — KB-scale); consecutive
   partitions' (tail, head) rows pair where the global rank distance
   ``e + h − 1 ≤ window``. Raw text never shuffles; the corpus crosses
   ONE exchange.

Contract (checked at runtime): when more than one partition exists,
every partition must hold ≥ ``window`` rows, else a pair could span
three partitions — choose ``n_parts ≤ n / (2·window)``. With a single
partition no pair can span a boundary, so any m ≥ 0 is fine and the
local ``d ∈ 1..min(window, m−1)`` loop covers every pair. Keys are
lowercased prefixes sanitized to ASCII (non-ASCII codepoints → ``?``,
applied identically to the comparison key and the packed partition
key, so packed byte order always refines the comparison sort — the
partition/compare consistency ADVICE-r4 flagged; byte order ==
codepoint order under DuckDB's binary collation).
"""

from __future__ import annotations

from typing import List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def snm_pairs(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix_len: int = 32,
    window: int = 5,
    max_dist: int = 2,
    n_parts: int = 8,
) -> "ray.data.Dataset":
    """(doc_a, doc_b, dist): pairs within ``window`` positions of the
    global (key, id) sort whose keys are within ``max_dist`` byte
    edits; ``doc_a`` is the lower-ranked row (== the SQL row_number
    self-join orientation)."""
    from pdf_table_extractor_ray.sources.cdx import pack_key_prefix
    from pdf_table_extractor_ray.stages.sketches import kth_smallest_u64
    from pdf_table_extractor_ray.stages.textstats import batched_levenshtein

    def project(b: pa.Table) -> pa.Table:
        k = pc.utf8_lower(
            pc.utf8_slice_codeunits(pc.fill_null(b.column(text_col), ""), 0, prefix_len)
        )
        # Sanitize to ASCII (non-ASCII codepoint -> '?') so the key the
        # window COMPARES is byte-identical to what pack_key_prefix
        # PARTITIONS on (it packs ascii/'replace'); without this a
        # non-ASCII corpus silently drops cross-partition pairs.
        # Fast path: all-ASCII batches (byte len == codepoint len) skip
        # the per-row re-encode.
        if pc.any(
            pc.not_equal(pc.binary_length(k), pc.utf8_length(k)),
            min_count=0,
        ).as_py():
            k = pa.array(
                [s.encode("ascii", "replace").decode("ascii") for s in k.to_pylist()],
                pa.string(),
            )
        return pa.table({"k": k, "id": pc.cast(b.column(id_col), pa.int64())})

    slim = ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True).materialize()
    n = slim.count()
    if n < 2:
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "dist": pa.array([], pa.int64()),
                }
            )
        )
    n_parts = max(min(n_parts, n // max(2 * window, 1)), 1)

    def packed(b: pa.Table) -> pa.Table:
        return pa.table(
            {"u": pa.array(pack_key_prefix(b.column("k").to_pylist()), pa.int64())}
        )

    us = slim.map_batches(packed, batch_format="pyarrow", zero_copy_batch=True)
    ranks = [(i * n) // n_parts for i in range(1, n_parts)]
    bounds = np.array(
        sorted(kth_smallest_u64(us, r + 1) for r in ranks), dtype=np.int64
    )

    def assign(b: pa.Table) -> pa.Table:
        u = pack_key_prefix(b.column("k").to_pylist())
        p = np.searchsorted(bounds, u, side="right")
        return b.append_column("part", pa.array(p.astype(np.int64), pa.int64()))

    def per_part(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(g, sort_keys=[("k", "ascending"), ("id", "ascending")])
        g = g.take(idx)
        ks: List[str] = g.column("k").to_pylist()
        ids = g.column("id").to_numpy(zero_copy_only=False)
        part = int(g.column("part")[0].as_py())
        m = len(ks)
        # The >= window contract only matters when a pair could span a
        # partition boundary; with a single partition (bounds empty) any
        # m is valid and the d-loop below covers every window pair.
        if m < window and n_parts > 1:
            raise ValueError(
                f"snm_pairs: partition {part} holds {m} < window={window} rows; "
                "lower n_parts (contract: n_parts <= n / (2*window))"
            )
        a_out, b_out, d_out = [], [], []
        for d in range(1, min(window, m - 1) + 1):
            dist = batched_levenshtein(ks[:-d], ks[d:])
            keep = dist <= max_dist
            a_out.append(ids[:-d][keep])
            b_out.append(ids[d:][keep])
            d_out.append(dist[keep])
        pairs_a = np.concatenate(a_out) if a_out else np.array([], np.int64)
        pairs_b = np.concatenate(b_out) if b_out else np.array([], np.int64)
        pairs_d = np.concatenate(d_out) if d_out else np.array([], np.int64)
        # boundary rows: head positions 1..w and tail positions 1..w
        head = list(range(min(window, m)))
        tail = list(range(max(m - window, 0), m))
        brows = sorted(set(head + tail))
        kind = [0] * len(pairs_a) + [1] * len(brows)
        return pa.table(
            {
                "kind": pa.array(kind, pa.int64()),
                "doc_a": pa.array(
                    np.concatenate([pairs_a, ids[brows]]), pa.int64()
                ),
                "doc_b": pa.array(
                    np.concatenate([pairs_b, np.zeros(len(brows), np.int64)]),
                    pa.int64(),
                ),
                "dist": pa.array(
                    np.concatenate([pairs_d, np.zeros(len(brows), np.int64)]),
                    pa.int64(),
                ),
                "part": pa.array([part] * (len(pairs_a) + len(brows)), pa.int64()),
                "pos": pa.array(
                    [-1] * len(pairs_a) + brows, pa.int64()
                ),
                "m": pa.array([m] * (len(pairs_a) + len(brows)), pa.int64()),
                "k": pa.array(
                    [None] * len(pairs_a) + [ks[i] for i in brows], pa.string()
                ),
            }
        )

    mixed = (
        slim.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(per_part, batch_format="pyarrow")
        .materialize()
    )

    def pairs_only(b: pa.Table) -> pa.Table:
        f = b.filter(pc.equal(b.column("kind"), 0))
        return f.select(["doc_a", "doc_b", "dist"])

    local_pairs = mixed.map_batches(pairs_only, batch_format="pyarrow", zero_copy_batch=True)

    def boundary_only(b: pa.Table) -> pa.Table:
        f = b.filter(pc.equal(b.column("kind"), 1))
        return f.select(["part", "pos", "m", "k", "doc_a"])

    # bounded: ≤ 2·window rows per partition — KB-scale driver traffic
    brows = (
        mixed.map_batches(boundary_only, batch_format="pyarrow", zero_copy_batch=True)
        .take_all()
    )
    by_part: dict = {}
    for r in brows:
        by_part.setdefault(int(r["part"]), []).append(r)
    xa, xb, xd = [], [], []
    parts_sorted = sorted(by_part)
    for p, p_next in zip(parts_sorted[:-1], parts_sorted[1:]):
        left = sorted(by_part[p], key=lambda r: r["pos"])
        right = sorted(by_part[p_next], key=lambda r: r["pos"])
        m_left = int(left[0]["m"])
        tails = [r for r in left if r["pos"] >= m_left - window]
        heads = [r for r in right if r["pos"] < window]
        cand_a, cand_b = [], []
        for t in tails:
            e = m_left - int(t["pos"])  # 1 = last row of the partition
            for h in heads:
                if e + int(h["pos"]) <= window:  # global rank distance e+pos
                    cand_a.append(t)
                    cand_b.append(h)
        if cand_a:
            dist = batched_levenshtein(
                [r["k"] for r in cand_a], [r["k"] for r in cand_b]
            )
            keep = dist <= max_dist
            for i in np.flatnonzero(keep):
                xa.append(int(cand_a[i]["doc_a"]))
                xb.append(int(cand_b[i]["doc_a"]))
                xd.append(int(dist[i]))
    cross = ray.data.from_arrow(
        pa.table(
            {
                "doc_a": pa.array(xa, pa.int64()),
                "doc_b": pa.array(xb, pa.int64()),
                "dist": pa.array(xd, pa.int64()),
            }
        )
    )
    return local_pairs.union(cross)
