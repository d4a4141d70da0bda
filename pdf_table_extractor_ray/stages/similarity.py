"""Similarity search over an embedding column (list<float>).

- Brute-force cosine top-k: the baseline — query matrix broadcast once
  via ``ray.put``, per-batch numpy matmul partial top-k, small-key
  groupby merge. Scales as a single pass over the corpus.
- LSH-bucketed variant: random-hyperplane signatures route rows to
  buckets; only matching buckets are scanned — the 100-TB path when a
  full pass per query set is too expensive.
- Embedding near-dup: bucketed pairwise cosine ≥ threshold.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def _matrix(batch_col) -> np.ndarray:
    arr = batch_col.combine_chunks()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = np.asarray(arr.flatten(), dtype=np.float64)
    n = len(arr)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def knn_bruteforce(
    ds: "ray.data.Dataset",
    query_vecs: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> "ray.data.Dataset":
    """Top-k cosine neighbors for each query vector.

    Returns (query_id, rank, vec_id, score) — deterministic tiebreak by
    (−score, vec_id). The query matrix ships to every task through one
    ``ray.put`` object (broadcast), never per batch.
    """
    qn = _normalize(np.asarray(query_vecs, np.float64))
    q_ref = ray.put(qn)
    qid_ref = ray.put(np.asarray(query_ids))

    def partial_topk(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        qids = ray.get(qid_ref)
        m = _matrix(batch.column(vec_col))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if m.shape[0] == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()), pa.array([], pa.int64()), pa.array([], pa.float64())],
                names=["query_id", "vec_id", "score"],
            )
        scores = _normalize(m) @ q.T  # (n, Q)
        kk = min(k, scores.shape[0])
        # per-query partial top-k inside the batch
        out_q, out_v, out_s = [], [], []
        for qi in range(scores.shape[1]):
            col = scores[:, qi]
            idx = np.argpartition(-col, kk - 1)[:kk]
            out_q.extend([int(qids[qi])] * len(idx))
            out_v.extend(ids[idx].tolist())
            out_s.extend(col[idx].tolist())
        return pa.Table.from_arrays(
            [pa.array(out_q, pa.int64()), pa.array(out_v, pa.int64()), pa.array(out_s, pa.float64())],
            names=["query_id", "vec_id", "score"],
        )

    partials = ds.map_batches(partial_topk, batch_format="pyarrow", zero_copy_batch=True)

    def merge(group: pa.Table) -> pa.Table:
        v = group.column("vec_id").to_numpy(zero_copy_only=False)
        s = group.column("score").to_numpy(zero_copy_only=False)
        qid = group.column("query_id")[0].as_py()
        order = np.lexsort((v, -s))[:k]
        return pa.Table.from_arrays(
            [
                pa.array([qid] * len(order), pa.int64()),
                pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
                pa.array(v[order], pa.int64()),
                pa.array(s[order], pa.float64()),
            ],
            names=["query_id", "rank", "vec_id", "score"],
        )

    return partials.groupby("query_id").map_groups(merge, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# LSH-bucketed ANN

N_PLANES = 12  # 4096 buckets


def _planes(dim: int, seed: int = 11) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((N_PLANES, dim))


def _bucket_of(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (m @ planes.T) > 0
    return (bits.astype(np.uint32) << np.arange(N_PLANES, dtype=np.uint32)).sum(axis=1)


def knn_lsh(
    ds: "ray.data.Dataset",
    query_vecs: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_tables: int = 4,
) -> "ray.data.Dataset":
    """Approximate top-k: scan only rows whose hyperplane bucket matches
    a query bucket in at least one of ``n_tables`` independent hash
    tables (the standard L-table LSH recall lever — one table's 12-bit
    bucket misses any neighbor that straddles a hyperplane; the union
    of independent tables recovers it). Recall < 1 by design; the
    scale path. Measured recall@5 vs brute force is asserted in
    test_corpus_ops on a clustered corpus."""
    q = np.asarray(query_vecs, np.float64)
    planes_list = [_planes(q.shape[1], seed=11 + t) for t in range(n_tables)]
    q_bucket_arrays = [
        np.unique(_bucket_of(_normalize(q), pl)) for pl in planes_list
    ]
    qn_ref = ray.put(_normalize(q))
    qid_ref = ray.put(np.asarray(query_ids))
    bucket_ref = ray.put(q_bucket_arrays)
    planes_ref = ray.put(planes_list)

    def partial_topk(batch: pa.Table) -> pa.Table:
        m = _matrix(batch.column(vec_col))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        empty = pa.Table.from_arrays(
            [pa.array([], pa.int64()), pa.array([], pa.int64()), pa.array([], pa.float64())],
            names=["query_id", "vec_id", "score"],
        )
        if m.shape[0] == 0:
            return empty
        mn = _normalize(m)
        q_buckets = ray.get(bucket_ref)
        mask = np.zeros(mn.shape[0], bool)
        for pl, qb in zip(ray.get(planes_ref), q_buckets):
            mask |= np.isin(_bucket_of(mn, pl), qb)
        if not mask.any():
            return empty
        mn, ids = mn[mask], ids[mask]
        qn, qids = ray.get(qn_ref), ray.get(qid_ref)
        scores = mn @ qn.T
        kk = min(k, scores.shape[0])
        out_q, out_v, out_s = [], [], []
        for qi in range(scores.shape[1]):
            col = scores[:, qi]
            idx = np.argpartition(-col, kk - 1)[:kk] if kk < len(col) else np.arange(len(col))
            out_q.extend([int(qids[qi])] * len(idx))
            out_v.extend(ids[idx].tolist())
            out_s.extend(col[idx].tolist())
        return pa.Table.from_arrays(
            [pa.array(out_q, pa.int64()), pa.array(out_v, pa.int64()), pa.array(out_s, pa.float64())],
            names=["query_id", "vec_id", "score"],
        )

    partials = ds.map_batches(partial_topk, batch_format="pyarrow", zero_copy_batch=True)

    def merge(group: pa.Table) -> pa.Table:
        v = group.column("vec_id").to_numpy(zero_copy_only=False)
        s = group.column("score").to_numpy(zero_copy_only=False)
        qid = group.column("query_id")[0].as_py()
        order = np.lexsort((v, -s))[:k]
        return pa.Table.from_arrays(
            [
                pa.array([qid] * len(order), pa.int64()),
                pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
                pa.array(v[order], pa.int64()),
                pa.array(s[order], pa.float64()),
            ],
            names=["query_id", "rank", "vec_id", "score"],
        )

    return partials.groupby("query_id").map_groups(merge, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path

IVF_CLUSTERS = 64
IVF_NPROBE = 4
IVF_TRAIN_SAMPLE = 2048
IVF_KMEANS_ITERS = 10


def train_ivf_centroids(
    ds: "ray.data.Dataset",
    vec_col: str = "embedding",
    n_clusters: int = IVF_CLUSTERS,
    sample_size: int = IVF_TRAIN_SAMPLE,
    iters: int = IVF_KMEANS_ITERS,
    seed: int = 13,
) -> np.ndarray:
    """Seeded mini k-means on a driver-side sample (the classic IVF
    training step: the sample is small by design; assignment stays
    distributed)."""
    sample = ds.limit(sample_size).take_all()
    m = _normalize(np.array([r[vec_col] for r in sample], np.float64))
    rng = np.random.RandomState(seed)
    k = min(n_clusters, len(m))
    centroids = m[rng.choice(len(m), size=k, replace=False)]
    for _ in range(iters):
        assign = np.argmax(m @ centroids.T, axis=1)
        for c in range(k):
            members = m[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _normalize(centroids)
    return centroids


def knn_ivf(
    ds: "ray.data.Dataset",
    query_vecs: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: Optional[np.ndarray] = None,
    nprobe: int = IVF_NPROBE,
) -> "ray.data.Dataset":
    """IVF top-k: rows are assigned to their nearest centroid per
    batch; only rows in the queries' ``nprobe`` nearest cells are
    scored. Approximate (recall < 1); one streaming pass, centroids
    broadcast once."""
    if centroids is None:
        centroids = train_ivf_centroids(ds, vec_col)
    qn = _normalize(np.asarray(query_vecs, np.float64))
    q_cells = np.argsort(-(qn @ centroids.T), axis=1)[:, :nprobe]
    probe_cells = set(q_cells.ravel().tolist())
    cent_ref = ray.put(centroids)
    qn_ref = ray.put(qn)
    qid_ref = ray.put(np.asarray(query_ids))
    cells_ref = ray.put(probe_cells)

    def partial_topk(batch: pa.Table) -> pa.Table:
        m = _matrix(batch.column(vec_col))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        empty = pa.Table.from_arrays(
            [pa.array([], pa.int64()), pa.array([], pa.int64()), pa.array([], pa.float64())],
            names=["query_id", "vec_id", "score"],
        )
        if m.shape[0] == 0:
            return empty
        mn = _normalize(m)
        cell = np.argmax(mn @ ray.get(cent_ref).T, axis=1)
        mask = np.isin(cell, list(ray.get(cells_ref)))
        if not mask.any():
            return empty
        mn, ids = mn[mask], ids[mask]
        qn_, qids = ray.get(qn_ref), ray.get(qid_ref)
        scores = mn @ qn_.T
        kk = min(k, scores.shape[0])
        out_q, out_v, out_s = [], [], []
        for qi in range(scores.shape[1]):
            col = scores[:, qi]
            idx = np.argpartition(-col, kk - 1)[:kk] if kk < len(col) else np.arange(len(col))
            out_q.extend([int(qids[qi])] * len(idx))
            out_v.extend(ids[idx].tolist())
            out_s.extend(col[idx].tolist())
        return pa.Table.from_arrays(
            [pa.array(out_q, pa.int64()), pa.array(out_v, pa.int64()), pa.array(out_s, pa.float64())],
            names=["query_id", "vec_id", "score"],
        )

    partials = ds.map_batches(partial_topk, batch_format="pyarrow", zero_copy_batch=True)

    def merge(group: pa.Table) -> pa.Table:
        v = group.column("vec_id").to_numpy(zero_copy_only=False)
        s = group.column("score").to_numpy(zero_copy_only=False)
        qid = group.column("query_id")[0].as_py()
        order = np.lexsort((v, -s))[:k]
        return pa.Table.from_arrays(
            [
                pa.array([qid] * len(order), pa.int64()),
                pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
                pa.array(v[order], pa.int64()),
                pa.array(s[order], pa.float64()),
            ],
            names=["query_id", "rank", "vec_id", "score"],
        )

    return partials.groupby("query_id").map_groups(merge, batch_format="pyarrow")


def embedding_dup_pairs(
    ds: "ray.data.Dataset",
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: Optional[int] = None,
    n_bandings: int = 3,
    emit: str = "pairs",
) -> "ray.data.Dataset":
    """Embedding-cosine near-dup pairs via hyperplane bucketing +
    within-bucket pairwise cosine.

    Recall hardening: ``n_bandings`` independent hyperplane sets (the
    union of their buckets), so a 0.95-cosine pair that straddles one
    hyperplane in banding 0 still collides in banding 1/2; the same
    pair surfacing from several bandings is deduped by a final
    (id_a, id_b) groupby-max.

    Hot-bucket mitigation (matches minhash/simhash): within a bucket,
    byte-identical vectors are collapsed first, so the pairwise matmul
    is O(u²) over *unique* vectors — a degenerate bucket where one
    vector dominates costs O(u² + output), not O(n²). ``emit``:

    - ``"pairs"`` (default): every qualifying pair — output is
      O(clique²) on a degenerate corpus (the query's contract).
    - ``"star"``: spanning star per identical group + one
      representative edge per qualifying unique pair — linear output,
      the right input for connected-components dedup.
    """

    planes_holder: dict = {}

    def to_buckets(batch: pa.Table) -> pa.Table:
        m = _matrix(batch.column(vec_col))
        if m.shape[0] == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int32()), pa.array([], pa.uint32()),
                 pa.array([], pa.int64()), pa.array([], pa.list_(pa.float64()))],
                names=["banding", "bucket", id_col, "vec"],
            )
        if "p" not in planes_holder:
            planes_holder["p"] = [_planes(m.shape[1], seed=11 + b) for b in range(n_bandings)]
        mn = _normalize(m)
        vec_list = pa.array(list(mn), pa.list_(pa.float64()))
        parts = []
        for b, pl in enumerate(planes_holder["p"]):
            buckets = _bucket_of(mn, pl)
            parts.append(
                pa.Table.from_arrays(
                    [
                        pa.array(np.full(m.shape[0], b, np.int32)),
                        pa.array(buckets, pa.uint32()),
                        batch.column(id_col),
                        vec_list,
                    ],
                    names=["banding", "bucket", id_col, "vec"],
                )
            )
        return pa.concat_tables(parts)

    bucketed = ds.map_batches(to_buckets, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        empty = pa.Table.from_arrays(
            [pa.array([], pa.int64()), pa.array([], pa.int64()), pa.array([], pa.float64())],
            names=["id_a", "id_b", "cosine"],
        )
        if len(ids) < 2:
            return empty
        m = _matrix(group.column("vec"))
        order = np.argsort(ids, kind="stable")
        ids, m = ids[order], m[order]
        uniq, inverse = np.unique(m, axis=0, return_inverse=True)
        members = [ids[inverse == g] for g in range(len(uniq))]
        a_out: list = []
        b_out: list = []
        c_out: list = []

        def add_block(a: np.ndarray, b: np.ndarray, cos: float) -> None:
            lo, hi = np.minimum(a, b), np.maximum(a, b)
            a_out.append(lo)
            b_out.append(hi)
            c_out.append(np.full(len(lo), cos))

        for mem in members:  # identical-vector groups: cosine exactly 1.0
            if len(mem) < 2:
                continue
            if emit == "star":
                add_block(np.full(len(mem) - 1, mem[0]), mem[1:], 1.0)
            else:
                iu, ju = np.triu_indices(len(mem), 1)
                add_block(mem[iu], mem[ju], 1.0)
        if len(uniq) > 1:
            sims = uniq @ uniq.T
            gi, gj = np.nonzero(np.triu(sims >= threshold, 1))
            for i, j in zip(gi, gj):
                cos = float(sims[i, j])
                if emit == "star":
                    add_block(members[i][:1], members[j][:1], cos)
                else:
                    x, y = members[i], members[j]
                    add_block(np.repeat(x, len(y)), np.tile(y, len(x)), cos)
        if not a_out:
            return empty
        return pa.Table.from_arrays(
            [
                pa.array(np.concatenate(a_out).astype(np.int64)),
                pa.array(np.concatenate(b_out).astype(np.int64)),
                pa.array(np.concatenate(c_out), pa.float64()),
            ],
            names=["id_a", "id_b", "cosine"],
        )

    pairs = bucketed.groupby(["banding", "bucket"]).map_groups(
        bucket_pairs, batch_format="pyarrow"
    )
    # same pair can surface from several bandings/buckets → keep one
    from ray.data.aggregate import Max

    return pairs.groupby(["id_a", "id_b"]).aggregate(Max("cosine")).map_batches(
        lambda b: pa.Table.from_arrays(
            [b.column("id_a"), b.column("id_b"), b.column("max(cosine)")],
            names=["id_a", "id_b", "cosine"],
        ),
        batch_format="pyarrow",
    )


def kmeans_assign(
    ds: "ray.data.Dataset",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_clusters: int = IVF_CLUSTERS,
    centroids: Optional[np.ndarray] = None,
    seed: int = 13,
) -> "ray.data.Dataset":
    """Semantic clustering of an embedding corpus (the curation /
    domain-mixing step of a training-data pipeline): seeded k-means
    centroids trained on a driver-side sample (``train_ivf_centroids``),
    broadcast once via ``ray.put``, then every row assigned to its
    max-cosine centroid in one streaming vectorized pass (batch matmul
    — no shuffle, no per-row Python). Output: (id, cluster, cosine).
    Deterministic for a fixed corpus + seed."""
    if centroids is None:
        centroids = train_ivf_centroids(ds, vec_col, n_clusters=n_clusters, seed=seed)
    cent_ref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        m = _matrix(batch.column(vec_col))
        if m.shape[0] == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()), pa.array([], pa.int64()), pa.array([], pa.float64())],
                names=[id_col, "cluster", "cosine"],
            )
        sims = _normalize(m) @ ray.get(cent_ref).T
        cell = np.argmax(sims, axis=1)
        best = sims[np.arange(len(cell)), cell]
        return pa.Table.from_arrays(
            [
                batch.column(id_col),
                pa.array(cell.astype(np.int64)),
                pa.array(best, pa.float64()),
            ],
            names=[id_col, "cluster", "cosine"],
        )

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def kmeans_cluster_sizes(assigned: "ray.data.Dataset") -> "ray.data.Dataset":
    """(cluster, n_members, mean_cosine·1e6 as int) summary of a
    ``kmeans_assign`` output — integer-microcosine mean so the result
    is block-order-deterministic (float Mean() is not)."""
    from ray.data.aggregate import Count, Sum

    def to_micro(batch: pa.Table) -> pa.Table:
        micro = pc.cast(
            pc.floor(pc.multiply(batch.column("cosine"), pa.scalar(1e6))), pa.int64()
        )
        return pa.Table.from_arrays(
            [batch.column("cluster"), micro], names=["cluster", "micro"]
        )

    agg = (
        assigned.map_batches(to_micro, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("cluster")
        .aggregate(Count(), Sum("micro"))
    )

    def finish(b: pa.Table) -> pa.Table:
        n = pc.cast(b.column("count()"), pa.int64())
        tot = pc.cast(b.column("sum(micro)"), pa.int64())
        mean_micro = pc.cast(pc.divide(tot, n), pa.int64())
        return pa.Table.from_arrays(
            [b.column("cluster"), n, mean_micro],
            names=["cluster", "n_members", "mean_cosine_micro"],
        )

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# PQ (product quantization) ANN — the memory-compression scale path.
# IVF prunes WHICH vectors are scored; PQ compresses HOW each vector is
# stored/scored: dim float64s collapse to m uint8 codes (Jégou et al.,
# "Product Quantization for Nearest Neighbor Search", TPAMI 2011), so a
# 100-TB embedding column scans as a few bytes per row with
# asymmetric-distance (ADC) lookups instead of full dot products.

PQ_SUBSPACES = 8
PQ_CODEBOOK = 32  # centroids per subspace: codes fit one uint8 each
PQ_TRAIN_SAMPLE = 2048
PQ_KMEANS_ITERS = 12


def train_pq_codebooks(
    ds: "ray.data.Dataset",
    vec_col: str = "embedding",
    m: int = PQ_SUBSPACES,
    ksub: int = PQ_CODEBOOK,
    sample_size: int = PQ_TRAIN_SAMPLE,
    iters: int = PQ_KMEANS_ITERS,
    seed: int = 17,
) -> list:
    """Seeded per-subspace k-means (L2) on a driver-side sample —
    bounded by design, like train_ivf_centroids. Vectors are
    L2-normalized first so inner-product ADC ranks like cosine.
    Returns a list of m (ksub_i, dsub_i) arrays (np.array_split
    tolerates dim % m != 0)."""
    sample = ds.limit(sample_size).take_all()
    x = _normalize(np.array([r[vec_col] for r in sample], np.float64))
    rng = np.random.RandomState(seed)
    books = []
    for sub in np.array_split(x, m, axis=1):
        k = min(ksub, len(sub))
        cents = sub[rng.choice(len(sub), size=k, replace=False)]
        for _ in range(iters):
            # L2 assignment: argmin ||v - c||^2 = argmax (v.c - |c|^2/2)
            assign = np.argmax(sub @ cents.T - 0.5 * (cents * cents).sum(1), axis=1)
            for c in range(k):
                members = sub[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books.append(cents)
    return books


def pq_encode(mat: np.ndarray, books: list) -> np.ndarray:
    """(n, dim) float → (n, m) uint8 codes; one argmax per subspace."""
    codes = np.empty((mat.shape[0], len(books)), np.uint8)
    col = 0
    for s, cents in enumerate(books):
        d = cents.shape[1]
        sub = mat[:, col : col + d]
        codes[:, s] = np.argmax(sub @ cents.T - 0.5 * (cents * cents).sum(1), axis=1)
        col += d
    return codes


def knn_pq(
    ds: "ray.data.Dataset",
    query_vecs: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    books: Optional[list] = None,
    rerank: int = 16,
) -> "ray.data.Dataset":
    """PQ-ADC top-k with exact re-rank (the ADC+R shape of Jégou et
    al. §V): each batch encodes its vectors to m uint8 codes and
    scores every query via per-subspace lookup tables
    (score ≈ Σ_s q_s · c_{s,code}); the ``rerank·k`` best ADC
    candidates per query then get ONE exact dot product each — full
    products for a bounded pool, never the whole batch. Re-rank is
    required for fine ranks: coarse codes tie all near-identical
    vectors and ADC alone picks arbitrarily among ties. Still
    approximate (a true neighbor outside its batch's ADC pool is
    lost; recall@5 gated vs brute force in pytest). Codebooks + query
    LUTs broadcast once via ray.put; same partial-top-k → single
    bounded merge shape as knn_bruteforce."""
    if books is None:
        books = train_pq_codebooks(ds, vec_col)
    qn = _normalize(np.asarray(query_vecs, np.float64))
    # LUT[s]: (nq, ksub_s) — query-side halves of the inner product
    luts, col = [], 0
    for cents in books:
        d = cents.shape[1]
        luts.append(qn[:, col : col + d] @ cents.T)
        col += d
    books_ref = ray.put(books)
    luts_ref = ray.put(luts)
    qn_ref = ray.put(qn)
    qid_ref = ray.put(np.asarray(query_ids))

    def partial_topk(batch: pa.Table) -> pa.Table:
        m_ = _matrix(batch.column(vec_col))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if m_.shape[0] == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()), pa.array([], pa.int64()), pa.array([], pa.float64())],
                names=["query_id", "vec_id", "score"],
            )
        mn = _normalize(m_)
        codes = pq_encode(mn, ray.get(books_ref))
        luts_ = ray.get(luts_ref)
        # (nq, nb): Σ_s LUT[s][:, codes[:, s]]
        scores = luts_[0][:, codes[:, 0]]
        for s in range(1, len(luts_)):
            scores = scores + luts_[s][:, codes[:, s]]
        qids = ray.get(qid_ref)
        qn_ = ray.get(qn_ref)
        kk = min(k, scores.shape[1])
        pool = min(rerank * k, scores.shape[1])
        out_q, out_v, out_s = [], [], []
        for qi in range(scores.shape[0]):
            row = scores[qi]
            cand = (
                np.argpartition(-row, pool - 1)[:pool]
                if pool < len(row)
                else np.arange(len(row))
            )
            exact = mn[cand] @ qn_[qi]  # re-rank: pool exact products only
            idx = cand[
                np.argpartition(-exact, kk - 1)[:kk] if kk < len(cand) else np.arange(len(cand))
            ]
            out_q.extend([int(qids[qi])] * len(idx))
            out_v.extend(ids[idx].tolist())
            out_s.extend((mn[idx] @ qn_[qi]).tolist())
        return pa.Table.from_arrays(
            [pa.array(out_q, pa.int64()), pa.array(out_v, pa.int64()), pa.array(out_s, pa.float64())],
            names=["query_id", "vec_id", "score"],
        )

    partials = ds.map_batches(partial_topk, batch_format="pyarrow", zero_copy_batch=True)

    def merge(group: pa.Table) -> pa.Table:
        v = group.column("vec_id").to_numpy(zero_copy_only=False)
        s = group.column("score").to_numpy(zero_copy_only=False)
        qid = group.column("query_id")[0].as_py()
        order = np.lexsort((v, -s))[:k]
        return pa.Table.from_arrays(
            [
                pa.array([qid] * len(order), pa.int64()),
                pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
                pa.array(v[order], pa.int64()),
                pa.array(s[order], pa.float64()),
            ],
            names=["query_id", "rank", "vec_id", "score"],
        )

    return partials.groupby("query_id").map_groups(merge, batch_format="pyarrow")


def semantic_dedup(
    ds: "ray.data.Dataset",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_clusters: int = IVF_CLUSTERS,
    eps: float = 0.95,
    seed: int = 13,
    centroids: Optional[np.ndarray] = None,
) -> "ray.data.Dataset":
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    near-duplicate removal by clustering embeddings and deduplicating
    WITHIN clusters only — the trick that turns an O(n²) cosine
    self-join into k independent O(s²) problems (s = cluster size).

    Per row: (id, cluster, keep, dup_of) — ``dup_of`` is the kept
    representative's id (-1 for kept rows). Representatives are chosen
    in ascending centroid-cosine order (the paper keeps LOW-centroid-
    similarity members to preserve diversity), id ascending as the
    deterministic tiebreak; a row is a duplicate iff its cosine to an
    already-kept member ≥ ``eps``.

    Scale shape: centroids are sample-trained and broadcast
    (``train_ivf_centroids``); assignment is one streaming matmul
    pass; embeddings shuffle ONCE keyed by cluster (unavoidable — the
    pairwise check needs co-location, and cluster count is the
    operator's skew knob: pick ``n_clusters ≈ corpus / target_cluster_
    size`` so per-group work is bounded, exactly the paper's k=50k
    regime). The per-cluster kernel is a vectorized greedy scan
    (one kept-matrix matvec per member, no Python pair loop)."""
    if centroids is None:
        centroids = train_ivf_centroids(ds, vec_col, n_clusters=n_clusters, seed=seed)
    cent_ref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        m = _matrix(batch.column(vec_col))
        if m.shape[0] == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "cluster": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                    vec_col: batch.column(vec_col),
                }
            )
        sims = _normalize(m) @ ray.get(cent_ref).T
        cell = np.argmax(sims, axis=1)
        best = sims[np.arange(len(cell)), cell]
        return pa.table(
            {
                id_col: batch.column(id_col),
                "cluster": pa.array(cell.astype(np.int64)),
                "cosine": pa.array(best, pa.float64()),
                vec_col: batch.column(vec_col),
            }
        )

    assigned = ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)

    def per_cluster(g: pa.Table) -> pa.Table:
        n = g.num_rows
        ids = g.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        cos = g.column("cosine").to_numpy(zero_copy_only=False)
        m = _normalize(_matrix(g.column(vec_col)))
        order = np.lexsort((ids, cos))  # centroid-cosine asc, id asc
        keep = np.zeros(n, bool)
        dup_of = np.full(n, -1, np.int64)
        kept_rows = np.empty_like(m)
        kept_ids: list = []
        kk = 0
        for i in order:
            if kk:
                sims = kept_rows[:kk] @ m[i]
                j = int(np.argmax(sims))
                if sims[j] >= eps:
                    dup_of[i] = kept_ids[j]
                    continue
            keep[i] = True
            kept_rows[kk] = m[i]
            kept_ids.append(int(ids[i]))
            kk += 1
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "cluster": g.column("cluster"),
                "keep": pa.array(keep),
                "dup_of": pa.array(dup_of, pa.int64()),
            }
        )

    return assigned.groupby("cluster").map_groups(
        per_cluster, batch_format="pyarrow"
    )


def grouped_centroids(
    ds: "ray.data.Dataset",
    vec_col: str = "embedding",
    label_col: str = "label",
    micro: int = 1_000_000,
) -> "ray.data.Dataset":
    """Per-label embedding centroid mass, integer-exact: one row per
    (label, dim) with ``sum_micro = Σ floor(v_dim · micro)`` and the
    member count — the class-centroid primitive of curation pipelines
    (domain mixing, SemDeDup cluster seeds, nearest-class-mean
    filters). Integer micro-units so the result is block-order
    deterministic AND SQL-verifiable (float summation is neither).

    Per batch: one (n × d) matrix, dictionary-encoded labels, a single
    ``np.add.at`` scatter — emits ≤ labels_in_batch × d slim partial
    rows; one (label, dim) groupby-Sum merges. Vectors themselves
    never shuffle. Caller divides sum_micro / n for the mean (kept
    unsplit here: integer division conventions differ per consumer).

    ``dim`` is 1-based (matches SQL array indexing)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        lab = batch.column(label_col)
        if isinstance(lab, pa.ChunkedArray):
            lab = lab.combine_chunks()
        valid = pc.is_valid(lab)
        m = _matrix(batch.column(vec_col))
        if m.shape[0] == 0 or not pc.any(valid).as_py():
            return pa.table(
                {
                    label_col: pa.array([], pa.int64()),
                    "dim": pa.array([], pa.int64()),
                    "part_sum": pa.array([], pa.int64()),
                    "part_n": pa.array([], pa.int64()),
                }
            )
        vmask = valid.to_numpy(zero_copy_only=False)
        m = m[vmask]
        lab = lab.filter(valid)
        enc = lab.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n_lab, d = len(enc.dictionary), m.shape[1]
        micro_m = np.floor(m.astype(np.float64) * micro).astype(np.int64)
        sums = np.zeros((n_lab, d), np.int64)
        np.add.at(sums, codes, micro_m)
        counts = np.bincount(codes, minlength=n_lab).astype(np.int64)
        labels_out = pc.cast(enc.dictionary, pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                label_col: pa.array(np.repeat(labels_out, d), pa.int64()),
                "dim": pa.array(np.tile(np.arange(1, d + 1), n_lab), pa.int64()),
                "part_sum": pa.array(sums.ravel(), pa.int64()),
                "part_n": pa.array(np.repeat(counts, d), pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([label_col, "dim"])
        .aggregate(Sum("part_sum"), Sum("part_n"))
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                label_col: b.column(label_col),
                "dim": b.column("dim"),
                "sum_micro": pc.cast(b.column("sum(part_sum)"), pa.int64()),
                "n": pc.cast(b.column("sum(part_n)"), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def nn_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    vec_col: str = "embedding",
    left_id: str = "vec_id",
    right_id: str = "vec_id",
    n_clusters: int = IVF_CLUSTERS,
    nprobe: int = IVF_NPROBE,
    seed: int = 13,
) -> "ray.data.Dataset":
    """Approximate nearest-neighbor JOIN: for EVERY left vector, its
    max-cosine right vector — the bulk matching step behind
    exemplar/atlas assignment, retrieval-augmented labeling and
    cross-corpus alignment, where ``knn_*`` (a handful of queries)
    doesn't apply because the query side IS a corpus.

    IVF-bucketed: centroids train on a right-side sample and broadcast;
    the right side lands in its nearest cell, the left side replicates
    into its ``nprobe`` nearest cells (the recall/cost knob); ONE
    cell-keyed shuffle co-locates them and each cell runs one
    (left × right) matmul. Per-cell partial winners are max-merged by
    a slim (left_id, best) groupby — vectors never shuffle twice.
    Output: (left_id, nn_id, cos_micro) with cos_micro =
    ⌊1e6·cosine⌋ (integer: deterministic merge order). Left rows whose
    probed cells hold no right rows are absent (document: raise
    ``nprobe`` or ``n_clusters`` sizing).

    Self-match is NOT excluded — pass disjoint sides (or filter
    ``nn_id != left_id`` downstream with k=2 semantics via two calls).
    """
    centroids = train_ivf_centroids(right, vec_col, n_clusters=n_clusters, seed=seed)
    cent_ref = ray.put(centroids)

    def right_cells(batch: pa.Table) -> pa.Table:
        m = _matrix(batch.column(vec_col))
        if m.shape[0] == 0:
            return pa.table(
                {
                    "cell": pa.array([], pa.int64()),
                    "rid": pa.array([], pa.int64()),
                    "vec": batch.column(vec_col),
                    "side": pa.array([], pa.int8()),
                }
            )
        cell = np.argmax(_normalize(m) @ ray.get(cent_ref).T, axis=1)
        return pa.table(
            {
                "cell": pa.array(cell.astype(np.int64)),
                "rid": pc.cast(batch.column(right_id), pa.int64()),
                "vec": batch.column(vec_col),
                "side": pa.array(np.ones(len(cell), np.int8)),
            }
        )

    def left_probe(batch: pa.Table) -> pa.Table:
        m = _matrix(batch.column(vec_col))
        if m.shape[0] == 0:
            return pa.table(
                {
                    "cell": pa.array([], pa.int64()),
                    "rid": pa.array([], pa.int64()),
                    "vec": batch.column(vec_col),
                    "side": pa.array([], pa.int8()),
                }
            )
        sims = _normalize(m) @ ray.get(cent_ref).T
        cells = np.argsort(-sims, axis=1)[:, :nprobe]
        n = m.shape[0]
        rep = np.repeat(np.arange(n), nprobe)
        vecs = batch.column(vec_col)
        if isinstance(vecs, pa.ChunkedArray):
            vecs = vecs.combine_chunks()
        return pa.table(
            {
                "cell": pa.array(cells.ravel().astype(np.int64)),
                "rid": pc.cast(batch.column(left_id), pa.int64()).take(
                    pa.array(rep)
                ),
                "vec": vecs.take(pa.array(rep)),
                "side": pa.array(np.zeros(n * nprobe, np.int8)),
            }
        )

    tagged = left.map_batches(
        left_probe, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        right.map_batches(right_cells, batch_format="pyarrow", zero_copy_batch=True)
    )

    def per_cell(g: pa.Table) -> pa.Table:
        side = g.column("side").to_numpy(zero_copy_only=False)
        empty = pa.table(
            {
                "lid": pa.array([], pa.int64()),
                "nn_id": pa.array([], pa.int64()),
                "cos_micro": pa.array([], pa.int64()),
            }
        )
        lmask, rmask = side == 0, side == 1
        if not lmask.any() or not rmask.any():
            return empty
        m = _normalize(_matrix(g.column("vec")))
        ids = g.column("rid").to_numpy(zero_copy_only=False)
        sims = m[lmask] @ m[rmask].T
        best = np.argmax(sims, axis=1)
        cos = sims[np.arange(sims.shape[0]), best]
        return pa.table(
            {
                "lid": pa.array(ids[lmask], pa.int64()),
                "nn_id": pa.array(ids[rmask][best], pa.int64()),
                "cos_micro": pa.array(
                    np.floor(cos * 1_000_000).astype(np.int64), pa.int64()
                ),
            }
        )

    partials = tagged.groupby("cell").map_groups(per_cell, batch_format="pyarrow")

    # max-merge the ≤ nprobe partial winners per left id: hot-key-safe
    # grouped top-1 on (cos desc, nn_id asc)
    from pdf_table_extractor_ray.stages.topk import grouped_top_k

    best = grouped_top_k(
        partials, "lid", [("cos_micro", "descending"), ("nn_id", "ascending")], 1
    )

    def rename(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                left_id: b.column("lid"),
                "nn_id": b.column("nn_id"),
                "cos_micro": b.column("cos_micro"),
            }
        )

    return best.map_batches(rename, batch_format="pyarrow")


def dim_moments(
    ds: "ray.data.Dataset",
    vec_col: str = "embedding",
    micro: int = 1_000_000,
) -> "ray.data.Dataset":
    """Global per-dimension first and second moments of an embedding
    column — the feature-scaler primitive (mean/variance per dim for
    standardization before clustering / ANN): one row per 1-based dim
    with ``n``, ``sum_micro = Σ floor(v·micro)`` and
    ``sumsq_micro2 = Σ floor(v·micro)²``, all int64 so the result is
    block-order deterministic and SQL-exact (consumer computes
    mean = sum/n, var = sumsq/n − mean² in its own precision).

    Per batch: one (n × d) matrix, three vectorized column reductions
    — only d slim partial rows leave each batch; one d-row groupby-Sum
    merges. int64 headroom: |v| ≤ ~2 ⇒ micro² ≤ 4·10¹², ~2.3M rows per
    batch before a partial could overflow (batches are ≤ thousands).
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column(vec_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = col.drop_null()  # null vectors excluded (SQL aggregate semantics)
        m = _matrix(pa.chunked_array([col]))
        if m.shape[0] == 0:
            return pa.table(
                {
                    "dim": pa.array([], pa.int64()),
                    "p_n": pa.array([], pa.int64()),
                    "p_s1": pa.array([], pa.int64()),
                    "p_s2": pa.array([], pa.int64()),
                }
            )
        d = m.shape[1]
        mi = np.floor(m.astype(np.float64) * micro).astype(np.int64)
        return pa.table(
            {
                "dim": pa.array(np.arange(1, d + 1), pa.int64()),
                "p_n": pa.array(np.full(d, m.shape[0], np.int64), pa.int64()),
                "p_s1": pa.array(mi.sum(axis=0, dtype=np.int64), pa.int64()),
                "p_s2": pa.array((mi * mi).sum(axis=0, dtype=np.int64), pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("dim")
        .aggregate(Sum("p_n"), Sum("p_s1"), Sum("p_s2"))
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "dim": b.column("dim"),
                "n": pc.cast(b.column("sum(p_n)"), pa.int64()),
                "sum_micro": pc.cast(b.column("sum(p_s1)"), pa.int64()),
                "sumsq_micro2": pc.cast(b.column("sum(p_s2)"), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Maximal Marginal Relevance — diverse top-k selection


def mmr_select(
    ds: "ray.data.Dataset",
    query_vec: np.ndarray,
    k: int = 16,
    lam: float = 0.7,
    pool: int = 256,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """Diverse top-k via Maximal Marginal Relevance (Carbonell &
    Goldstein, SIGIR 1998): greedily pick the item maximizing
    ``lam * cos(q, d) − (1 − lam) * max_{s∈selected} cos(d, s)`` —
    the de-duplicating retrieval/selection step of a RAG or
    training-mix pipeline (plain top-k returns k near-copies of the
    best hit; MMR trades relevance for coverage).

    Scale shape: greedy MMR is inherently sequential in k, so the
    distributed part is CANDIDATE GENERATION — one corpus pass with
    per-batch cosine scoring and partial top-``pool`` (the
    ``global_top_k`` merge, no global sort; the candidates' vectors
    ride the k-rows-per-block exchange), then the greedy loop runs on
    the driver over the bounded pool×dim matrix. Exact MMR when
    ``pool`` ≥ corpus; otherwise the standard candidate-pool
    approximation (every selected item still comes from the pool's
    relevance top-``pool``). Deterministic: ties break by ascending
    ``id_col``.

    Returns a pa.Table (rank, id, relevance, mmr_score) with
    ``rank`` 1-based in selection order.
    """
    from pdf_table_extractor_ray.stages.topk import global_top_k

    q = np.asarray(query_vec, np.float64).ravel()
    qn = q / (np.linalg.norm(q) or 1.0)
    q_ref = ray.put(qn)

    def score(batch: pa.Table) -> pa.Table:
        m = _matrix(batch.column(vec_col))
        if m.shape[0] == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    vec_col: batch.column(vec_col),
                    "relevance": pa.array([], pa.float64()),
                }
            )
        rel = _normalize(m) @ ray.get(q_ref)
        return pa.table(
            {
                id_col: pc.cast(batch.column(id_col), pa.int64()),
                vec_col: batch.column(vec_col),
                "relevance": pa.array(rel, pa.float64()),
            }
        )

    cand = global_top_k(
        ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True),
        [("relevance", "descending"), (id_col, "ascending")],
        pool,
    ).take_all()  # bounded: exactly ≤ pool rows by construction

    if not cand:
        return pa.table(
            {
                "rank": pa.array([], pa.int64()),
                id_col: pa.array([], pa.int64()),
                "relevance": pa.array([], pa.float64()),
                "mmr_score": pa.array([], pa.float64()),
            }
        )
    # deterministic candidate order: by (−relevance, id)
    cand.sort(key=lambda r: (-r["relevance"], r[id_col]))
    ids = np.array([r[id_col] for r in cand], np.int64)
    rel = np.array([r["relevance"] for r in cand], np.float64)
    mat = _normalize(np.array([r[vec_col] for r in cand], np.float64))

    n = len(ids)
    kk = min(k, n)
    selected = np.zeros(n, bool)
    max_sim = np.zeros(n, np.float64)  # max cosine to the selected set
    out_id, out_rel, out_score = [], [], []
    for _ in range(kk):
        score_vec = lam * rel - (1.0 - lam) * max_sim
        score_vec[selected] = -np.inf
        # argmax with (−score, id) tiebreak: among the max scores pick min id
        best = np.flatnonzero(score_vec == score_vec.max())
        pick = best[np.argmin(ids[best])]
        selected[pick] = True
        out_id.append(int(ids[pick]))
        out_rel.append(float(rel[pick]))
        out_score.append(float(score_vec[pick]))
        max_sim = np.maximum(max_sim, mat @ mat[pick])
    return pa.table(
        {
            "rank": pa.array(np.arange(1, kk + 1, dtype=np.int64)),
            id_col: pa.array(out_id, pa.int64()),
            "relevance": pa.array(out_rel, pa.float64()),
            "mmr_score": pa.array(out_score, pa.float64()),
        }
    )


def pca_top_components(
    ds: "ray.data.Dataset",
    vec_col: str = "embedding",
    n_components: int = 2,
    iters: int = 30,
    seed: int = 7,
) -> pa.Table:
    """Distributed PCA: the top ``n_components`` principal components
    of the (mean-centered) embedding cloud by BLOCK POWER ITERATION
    (orthogonal/subspace iteration) — the linear-algebra primitive
    behind whitening, spectral outlier screens and low-rank compression
    of an embedding column, which no other stage here covers.

    Shape: a slim materialized matrix dataset is re-streamed once per
    iteration; each batch contributes the d×k partial ``Yᵀ(Y·V)``
    (Y = locally mean-centered rows — row-wise centering makes the
    cross-batch sum exact), emitted as (j, k) cell rows; ONE bounded
    groupby over d·k cells folds the partials and the driver re-
    orthonormalizes V by QR (d·k floats — never rows). All component
    directions converge in the SAME passes, so the pass count is
    ``iters`` + 2 regardless of k. Driver state and shuffle volume are
    both O(d·k) — dimension-bounded, corpus-size-free.

    Determinism: fixed seed start, fixed iteration count, QR sign fixed
    by forcing each loading's largest-|entry| coordinate positive.
    (Float partial sums vary at ulp scale with block layout — the
    direction is stable to ~1e-6 by convergence; the pytest oracle
    gates on cosine/eigenvalue tolerance, not bit equality.)

    Returns a driver-side table: one row per component —
    (component 1-based, eigenvalue of the SAMPLE covariance = λ/(n−1),
    loading list<double>)."""
    from ray.data.aggregate import Sum

    def slim(batch: pa.Table) -> pa.Table:
        col = batch.column(vec_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        keep = pc.is_valid(col)
        return pa.table({"v": col.filter(keep)})

    mat_ds = ds.map_batches(
        slim, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # slim vector column: re-streamed once per iteration

    # pass 1: n and Σx (dimension-bounded partials)
    def sum_partial(batch: pa.Table) -> pa.Table:
        m = _matrix(batch.column("v"))
        if m.size == 0:
            return pa.table(
                {"j": pa.array([], pa.int64()), "s": pa.array([], pa.float64()),
                 "n": pa.array([], pa.int64())}
            )
        s = m.sum(axis=0)
        return pa.table(
            {
                "j": pa.array(np.arange(len(s), dtype=np.int64)),
                "s": pa.array(s, pa.float64()),
                "n": pa.array(np.full(len(s), m.shape[0], np.int64)),
            }
        )

    rows = (
        mat_ds.map_batches(sum_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("j")
        .aggregate(Sum("s"), Sum("n"))
        .take_all()
    )  # bounded: one row per dimension
    if not rows:
        raise ValueError("pca_top_components: no vectors")
    d = len(rows)
    mu = np.zeros(d)
    n = 0
    for r in rows:
        mu[int(r["j"])] = float(r["sum(s)"])
        n = int(r["sum(n)"])
    if n < 2:
        raise ValueError("pca_top_components: need >= 2 vectors")
    mu /= n

    k = min(n_components, d)
    rng = np.random.default_rng(seed)
    v = np.linalg.qr(rng.standard_normal((d, k)))[0]  # d×k orthonormal

    lam = np.zeros(k)
    for _ in range(iters):
        vb = v.copy()

        def matvec_partial(batch: pa.Table) -> pa.Table:
            m = _matrix(batch.column("v"))
            if m.size == 0:
                return pa.table(
                    {"cell": pa.array([], pa.int64()), "w": pa.array([], pa.float64())}
                )
            y = m - mu
            w = y.T @ (y @ vb)  # d×k scatter-matrix partial
            cells = np.arange(d * k, dtype=np.int64)
            return pa.table(
                {"cell": pa.array(cells), "w": pa.array(w.ravel(), pa.float64())}
            )

        out = (
            mat_ds.map_batches(
                matvec_partial, batch_format="pyarrow", zero_copy_batch=True
            )
            .groupby("cell")
            .aggregate(Sum("w"))
            .take_all()
        )  # bounded: d·k cells
        w = np.zeros(d * k)
        for r in out:
            w[int(r["cell"])] = float(r["sum(w)"])
        w = w.reshape(d, k)
        # Rayleigh quotients BEFORE re-orthonormalization: λ_i = v_iᵀ C v_i
        lam = np.einsum("ij,ij->j", v, w)
        v = np.linalg.qr(w)[0]

    # deterministic sign: largest-|entry| coordinate positive per column
    for j in range(k):
        i = int(np.argmax(np.abs(v[:, j])))
        if v[i, j] < 0:
            v[:, j] = -v[:, j]

    order = np.argsort(-lam)
    return pa.table(
        {
            "component": pa.array(np.arange(1, k + 1, dtype=np.int64)),
            "eigenvalue": pa.array(lam[order] / (n - 1), pa.float64()),
            "loading": pa.array(
                [v[:, int(j)].tolist() for j in order], pa.list_(pa.float64())
            ),
        }
    )


def mutual_nn_pairs(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    vec_col: str = "embedding",
    left_id: str = "vec_id",
    right_id: str = "vec_id",
    n_clusters: int = IVF_CLUSTERS,
    nprobe: int = IVF_NPROBE,
    seed: int = 13,
) -> "ray.data.Dataset":
    """RECIPROCAL nearest-neighbor pairs between two vector corpora —
    (a, b) where b is a's max-cosine right vector AND a is b's
    max-cosine left vector. The mutual-NN criterion is the standard
    high-precision matching rule for cross-corpus alignment
    (translation-pair mining, exemplar linking, near-duplicate
    bridging): one-directional NN is noisy exactly where mutuality
    prunes it.

    Shape: two ``nn_join`` passes (IVF-bucketed, one cell-keyed
    shuffle each — see nn_join for the recall knobs), then ONE slim
    hash-shuffle join of the two (id, nn) edge tables keyed on the
    forward target = backward source, filtered to reciprocity. Only
    id/score triples move in the final exchange — vectors shuffle only
    inside the nn_join cells. With ``n_clusters=1`` both passes are
    exhaustive and the result is the exact mutual-NN set.

    Output: (a_id, b_id, cos_micro) with cos_micro from the forward
    pass (integer ⌊1e6·cos⌋; the backward score of the same pair is
    the same true cosine, so one column suffices)."""
    from pdf_table_extractor_ray.stages.joins import hash_shuffle_join

    fwd = nn_join(
        left, right, vec_col, left_id, right_id,
        n_clusters=n_clusters, nprobe=nprobe, seed=seed,
    )
    bwd = nn_join(
        right, left, vec_col, right_id, left_id,
        n_clusters=n_clusters, nprobe=nprobe, seed=seed,
    )

    def tag_fwd(b: pa.Table) -> pa.Table:
        # nn_join names its id column after the probing side's id param
        return pa.table(
            {
                "a_id": b.column(left_id),
                "b_id": b.column("nn_id"),
                "cos_micro": b.column("cos_micro"),
            }
        )

    def tag_bwd(b: pa.Table) -> pa.Table:
        return pa.table(
            {"bb_id": b.column(right_id), "back_id": b.column("nn_id")}
        )

    f = fwd.map_batches(tag_fwd, batch_format="pyarrow")
    g = bwd.map_batches(tag_bwd, batch_format="pyarrow")
    joined = hash_shuffle_join(f, g, on="b_id", right_on="bb_id", how="inner")

    def keep_mutual(b: pa.Table) -> pa.Table:
        m = pc.equal(b.column("back_id"), b.column("a_id"))
        b = b.filter(m)
        return pa.table(
            {
                "a_id": pc.cast(b.column("a_id"), pa.int64()),
                "b_id": pc.cast(b.column("b_id"), pa.int64()),
                "cos_micro": pc.cast(b.column("cos_micro"), pa.int64()),
            }
        )

    return joined.map_batches(keep_mutual, batch_format="pyarrow")


def kmeans_parallel_init(
    ds: "ray.data.Dataset",
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    rounds: int = 3,
    oversample: Optional[int] = None,
    lloyd_iters: int = 10,
    seed: int = 13,
) -> np.ndarray:
    """k-means|| seeding (Bahmani et al. 2012, "Scalable k-means++")
    — the cluster-initialization path that does NOT depend on a
    driver-side sample seeing the whole distribution (the weakness of
    ``train_ivf_centroids``' limit() sample at 100 TB): candidate
    centers are drawn from the FULL corpus, each round preferring
    points far from the current candidate set.

    Per round: (a) one streaming pass computes φ = Σ min-dist² to the
    candidates (candidates broadcast via ray.put, per batch one matmul
    + rowmin; partials reduced by Dataset.sum), (b) one streaming pass
    samples each point with prob min(1, l·d²/φ) using a seeded
    splitmix64 of its id — DETERMINISTIC and layout-invariant, unlike
    an RNG draw — pulling only the sampled rows (expected l per round,
    l = ``oversample`` = 2k default) to the driver. After ``rounds``:
    one pass weights every candidate by its nearest-point count, and a
    weighted Lloyd refinement over the ≤ 1 + rounds·(sampled) candidate
    set runs on the driver (bounded, seeded). Output: (k × d) unit-norm
    centroids for ``kmeans_assign``.

    Total passes: 2·rounds + 2 — each touches only (id, vec)."""
    import ray

    from ray.data.aggregate import Sum

    from pdf_table_extractor_ray.stages.textstats import _splash64

    l = int(oversample) if oversample is not None else 2 * k

    def _vecs_ids(batch: pa.Table):
        m = _normalize(_matrix(batch.column(vec_col)))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return m, ids

    # ---- first center: the row with the globally smallest seeded id
    # hash (one map pass of 1-row partials; deterministic, unbiased)
    def first_partial(b: pa.Table) -> pa.Table:
        m, ids = _vecs_ids(b)
        if len(ids) == 0:
            return pa.table(
                {"h": pa.array([], pa.uint64()), "v": pa.array([], pa.list_(pa.float64()))}
            )
        h = _splash64(ids.view(np.uint64) ^ np.uint64(seed))
        i = int(np.argmin(h))
        return pa.table(
            {
                "h": pa.array([int(h[i])], pa.uint64()),
                "v": pa.array([m[i].tolist()], pa.list_(pa.float64())),
            }
        )

    firsts = pa.concat_tables(
        [
            b
            for b in ds.map_batches(
                first_partial, batch_format="pyarrow", zero_copy_batch=True
            ).iter_batches(batch_format="pyarrow")
        ]
    )  # one row per block
    hvals = firsts.column("h").to_numpy(zero_copy_only=False)
    cand = np.array(
        [firsts.column("v").to_pylist()[int(np.argmin(hvals))]], np.float64
    )

    for r in range(rounds):
        cref = ray.put(cand)

        def cost_partial(b: pa.Table) -> pa.Table:
            m, _ids = _vecs_ids(b)
            if len(m) == 0:
                return pa.table({"phi": pa.array([0.0], pa.float64())})
            c = ray.get(cref)
            d2 = np.maximum(
                (m * m).sum(1)[:, None] - 2.0 * (m @ c.T) + (c * c).sum(1)[None, :], 0.0
            ).min(axis=1)
            return pa.table({"phi": pa.array([float(d2.sum())], pa.float64())})

        phi = float(
            ds.map_batches(cost_partial, batch_format="pyarrow", zero_copy_batch=True)
            .sum("phi")
        )
        if phi <= 0.0:
            break  # every point coincides with a candidate

        def sample_partial(b: pa.Table, _r=r, _phi=phi) -> pa.Table:
            m, ids = _vecs_ids(b)
            empty = pa.table({"v": pa.array([], pa.list_(pa.float64()))})
            if len(m) == 0:
                return empty
            c = ray.get(cref)
            d2 = np.maximum(
                (m * m).sum(1)[:, None] - 2.0 * (m @ c.T) + (c * c).sum(1)[None, :], 0.0
            ).min(axis=1)
            h = _splash64(ids.view(np.uint64) ^ np.uint64((seed + 1 + _r) * 0x9E3779B9))
            u = (h.astype(np.float64) + 1.0) / 18446744073709551616.0
            p = np.minimum(1.0, float(l) * d2 / _phi)
            pick = u <= p
            if not pick.any():
                return empty
            return pa.table({"v": pa.array(m[pick].tolist(), pa.list_(pa.float64()))})

        picked = pa.concat_tables(
            [
                b
                for b in ds.map_batches(
                    sample_partial, batch_format="pyarrow", zero_copy_batch=True
                ).iter_batches(batch_format="pyarrow")
            ]
        )
        if picked.num_rows:
            cand = np.vstack([cand, np.array(picked.column("v").to_pylist(), np.float64)])

    # ---- weight candidates by nearest-point mass (one pass, slim pairs)
    cref = ray.put(cand)

    def weight_partial(b: pa.Table) -> pa.Table:
        m, _ids = _vecs_ids(b)
        if len(m) == 0:
            return pa.table(
                {"cand": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        c = ray.get(cref)
        d2 = (m * m).sum(1)[:, None] - 2.0 * (m @ c.T) + (c * c).sum(1)[None, :]
        near = np.argmin(d2, axis=1)
        u, cnt = np.unique(near, return_counts=True)
        return pa.table(
            {
                "cand": pa.array(u.astype(np.int64), pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    wrows = (
        ds.map_batches(weight_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("cand")
        .aggregate(Sum("n"))
        .take_all()
    )  # bounded by the candidate count (≤ 1 + rounds·E[l])
    w = np.zeros(len(cand), np.float64)
    for row in wrows:
        w[int(row["cand"])] = float(row["sum(n)"])

    # ---- weighted k-means++ seeding + Lloyd over the candidate set
    rng = np.random.RandomState(seed)
    kk = min(k, len(cand))
    centers = [cand[int(np.argmax(w))]]
    for _ in range(1, kk):
        d2 = np.min(
            ((cand[:, None, :] - np.array(centers)[None, :, :]) ** 2).sum(-1), axis=1
        )
        probs = w * d2
        tot = probs.sum()
        if tot <= 0:
            break
        centers.append(cand[int(rng.choice(len(cand), p=probs / tot))])
    centers = np.array(centers, np.float64)
    for _ in range(lloyd_iters):
        d2 = ((cand[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
        a = np.argmin(d2, axis=1)
        for c in range(len(centers)):
            mask = a == c
            mass = w[mask].sum()
            if mass > 0:
                centers[c] = (cand[mask] * w[mask, None]).sum(0) / mass
    return _normalize(centers)


def train_sq8_bounds(
    ds: "ray.data.Dataset", vec_col: str = "embedding"
) -> tuple:
    """Per-dimension (min, max) over the UNIT-NORMALIZED corpus — the
    SQ8 training pass (faiss ScalarQuantizer QT_8bit): one streaming
    pass of (1 × 2d) partial rows, reduced by Dataset.min / .max."""
    probe = ds.take_batch(1, batch_format="pyarrow")
    d = len(probe.column(vec_col)[0].as_py())

    def partial(b: pa.Table) -> pa.Table:
        m = _normalize(_matrix(b.column(vec_col)))
        cols = {}
        if m.shape[0] == 0:
            lo = np.full(d, np.inf)
            hi = np.full(d, -np.inf)
        else:
            lo, hi = m.min(axis=0), m.max(axis=0)
        for j in range(d):
            cols[f"lo{j}"] = pa.array([float(lo[j])], pa.float64())
            cols[f"hi{j}"] = pa.array([float(hi[j])], pa.float64())
        return pa.table(cols)

    agg = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    mins = agg.min([f"lo{j}" for j in range(d)])
    maxs = agg.max([f"hi{j}" for j in range(d)])
    lo = np.array([mins[f"min(lo{j})"] for j in range(d)], np.float64)
    hi = np.array([maxs[f"max(hi{j})"] for j in range(d)], np.float64)
    return lo, hi


def sq8_encode(m: np.ndarray, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """uint8 codes: round((v−lo)/(hi−lo)·255), degenerate dims → 0."""
    span = np.where(hi > lo, hi - lo, 1.0)
    return np.clip(np.round((m - lo) / span * 255.0), 0, 255).astype(np.uint8)


def sq8_decode(codes: np.ndarray, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    span = np.where(hi > lo, hi - lo, 1.0)
    return lo + codes.astype(np.float64) / 255.0 * span


def knn_sq8(
    ds: "ray.data.Dataset",
    query_vecs: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bounds: Optional[tuple] = None,
    rerank: int = 16,
) -> "ray.data.Dataset":
    """SQ8 top-k with exact re-rank — the scalar-quantization rung of
    the ANN ladder (between brute force and PQ: 8 bits/dim, 8×
    memory cut, near-exact scores): per batch vectors encode to uint8,
    scores come from the DECODED approximation (one matmul against the
    query matrix), the ``rerank·k`` best per query re-ranked with
    exact dot products. Bounds trained in one distributed min/max
    pass, broadcast once; same partial-top-k → grouped merge shape as
    ``knn_bruteforce`` (no global sort). In a production layout the
    uint8 codes — not the float vectors — would be the stored column;
    here encode-then-decode inside the task measures exactly the
    accuracy loss that layout would pay."""
    import ray

    if bounds is None:
        bounds = train_sq8_bounds(ds, vec_col)
    lo, hi = bounds
    qn = _normalize(np.asarray(query_vecs, np.float64))
    b_ref = ray.put((lo, hi))
    qn_ref = ray.put(qn)
    qid_ref = ray.put(np.asarray(query_ids))

    def partial_topk(batch: pa.Table) -> pa.Table:
        m_ = _matrix(batch.column(vec_col))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if m_.shape[0] == 0:
            return pa.Table.from_arrays(
                [
                    pa.array([], pa.int64()),
                    pa.array([], pa.int64()),
                    pa.array([], pa.float64()),
                ],
                names=["query_id", "vec_id", "score"],
            )
        lo_, hi_ = ray.get(b_ref)
        mn = _normalize(m_)
        approx = sq8_decode(sq8_encode(mn, lo_, hi_), lo_, hi_)
        qn_ = ray.get(qn_ref)
        qids = ray.get(qid_ref)
        scores = qn_ @ approx.T  # (nq, nb) on the decoded approximation
        kk = min(k, scores.shape[1])
        pool = min(rerank * k, scores.shape[1])
        out_q, out_v, out_s = [], [], []
        for qi in range(scores.shape[0]):
            row = scores[qi]
            cand = (
                np.argpartition(-row, pool - 1)[:pool]
                if pool < len(row)
                else np.arange(len(row))
            )
            exact = mn[cand] @ qn_[qi]
            idx = cand[
                np.argpartition(-exact, kk - 1)[:kk]
                if kk < len(cand)
                else np.arange(len(cand))
            ]
            out_q.extend([int(qids[qi])] * len(idx))
            out_v.extend(ids[idx].tolist())
            out_s.extend((mn[idx] @ qn_[qi]).tolist())
        return pa.Table.from_arrays(
            [
                pa.array(out_q, pa.int64()),
                pa.array(out_v, pa.int64()),
                pa.array(out_s, pa.float64()),
            ],
            names=["query_id", "vec_id", "score"],
        )

    partials = ds.map_batches(partial_topk, batch_format="pyarrow", zero_copy_batch=True)

    def merge(group: pa.Table) -> pa.Table:
        v = group.column("vec_id").to_numpy(zero_copy_only=False)
        s = group.column("score").to_numpy(zero_copy_only=False)
        qid = group.column("query_id")[0].as_py()
        order = np.lexsort((v, -s))[:k]
        return pa.Table.from_arrays(
            [
                pa.array([qid] * len(order), pa.int64()),
                pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
                pa.array(v[order], pa.int64()),
                pa.array(s[order], pa.float64()),
            ],
            names=["query_id", "rank", "vec_id", "score"],
        )

    return partials.groupby("query_id").map_groups(merge, batch_format="pyarrow")
