"""Deduplication operators over a documents table.

Exact dedup generalizes the reference's whole-row ``drop_duplicates``
(conversor_santander.py:149, conversor_c6.py:94) from one DataFrame to
a corpus: hash-partitioned groupby on a content key. Near-dup
(MinHash+LSH, SimHash, n-gram Jaccard, embedding cosine) follows the
published schemes (Broder 1997 resemblance / MMDS ch.3 banding;
Charikar 2002 SimHash).

Shuffle discipline: every variant pre-reduces inside ``map_batches``
(signatures, band keys) so the only all-to-all exchanges are
small-key groupbys — never raw text.
"""

from __future__ import annotations

import hashlib
import zlib
from typing import List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Min

from pdf_table_extractor_ray.stages.textstats import _splash64, simhash64

# ---------------------------------------------------------------------------
# exact dedup


def add_md5_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    md5s = [hashlib.md5((t or "").encode()).hexdigest() for t in texts]
    return batch.append_column("content_md5", pa.array(md5s, pa.string()))


def exact_dedup_ids(ds: "ray.data.Dataset", text_col: str = "text") -> "ray.data.Dataset":
    """Keeper doc_ids after exact text dedup: min(doc_id) per content
    hash. Hash computed batch-side; only (hash, doc_id) shuffles."""

    def project(batch: pa.Table) -> pa.Table:
        b = add_md5_batch(batch, text_col)
        return b.select(["content_md5", "doc_id"])

    hashed = ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
    agg = hashed.groupby("content_md5").aggregate(Min("doc_id"))
    return agg.map_batches(
        lambda b: pa.Table.from_arrays([b.column("min(doc_id)")], names=["doc_id"]),
        batch_format="pyarrow",
    )


def exact_dup_groups(ds: "ray.data.Dataset", text_col: str = "text") -> "ray.data.Dataset":
    """(content_md5, n_copies, keeper) for groups with >1 copy."""

    def project(batch: pa.Table) -> pa.Table:
        b = add_md5_batch(batch, text_col)
        return b.select(["content_md5", "doc_id"])

    hashed = ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
    agg = hashed.groupby("content_md5").aggregate(Count(), Min("doc_id"))

    def finish(b: pa.Table) -> pa.Table:
        t = pa.Table.from_arrays(
            [b.column("content_md5"), pc.cast(b.column("count()"), pa.int64()), b.column("min(doc_id)")],
            names=["content_md5", "n_copies", "keeper"],
        )
        return t.filter(pc.greater(t.column("n_copies"), 1))

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH

MINHASH_K = 64  # signature length
LSH_BANDS = 16  # bands of r = K/BANDS rows each
_MERSENNE = np.uint64((1 << 61) - 1)


def _perm_params(k: int = MINHASH_K, seed: int = 7):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, (1 << 61) - 1, size=k, dtype=np.uint64)
    b = rng.randint(0, (1 << 61) - 1, size=k, dtype=np.uint64)
    return a, b


_PERM_A, _PERM_B = _perm_params()


_SHINGLE_C = (
    np.uint64(0x9E3779B97F4A7C15),
    np.uint64(0xC2B2AE3D27D4EB4F),
    np.uint64(0x165667B19E3779F9),
)


def _shingle_hashes(text: str, width: int = 3) -> np.ndarray:
    """Word-``width``-gram shingles → stable 64-bit hashes.

    Tokens hash once via crc32 (C speed); the sliding-window combine is
    pure numpy — no per-shingle string joins."""
    tokens = text.split()
    if not tokens:
        return np.zeros(1, dtype=np.uint64)
    h = _splash64(
        np.fromiter((zlib.crc32(t.encode()) for t in tokens), dtype=np.uint32, count=len(tokens))
    )
    if len(tokens) < width:
        acc = np.uint64(0)
        for j, c in zip(range(len(tokens)), _SHINGLE_C):
            acc ^= h[j] * c
        return _splash64(np.array([acc], dtype=np.uint64))
    n = len(tokens) - width + 1
    acc = np.zeros(n, dtype=np.uint64)
    for j in range(width):
        acc ^= h[j : j + n] * _SHINGLE_C[j]
    return _splash64(acc)


def minhash_signature(text: str, k: int = MINHASH_K) -> np.ndarray:
    h = np.unique(_shingle_hashes(text))
    # (a*h + b) mod p over the 61-bit Mersenne prime; min per permutation
    vals = (_PERM_A[:, None] * (h[None, :] & _MERSENNE) + _PERM_B[:, None]) % _MERSENNE
    return vals.min(axis=1)


def minhash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """(doc_id, sig fixed_size_list<uint64, K>)"""
    texts = batch.column(text_col).to_pylist()
    sigs = np.stack([minhash_signature(t or "") for t in texts]) if texts else np.zeros((0, MINHASH_K), np.uint64)
    sig_arr = pa.FixedSizeListArray.from_arrays(pa.array(sigs.ravel(), pa.uint64()), MINHASH_K)
    return pa.Table.from_arrays([batch.column("doc_id"), sig_arr], names=["doc_id", "sig"])


def _band_rows(doc_ids: np.ndarray, sigs: np.ndarray, bands: int = LSH_BANDS):
    """Explode signatures to (band_id, band_key, doc_id, sig) rows."""
    n, k = sigs.shape
    r = k // bands
    out_band, out_key, out_doc = [], [], []
    for b in range(bands):
        chunk = np.ascontiguousarray(sigs[:, b * r : (b + 1) * r])
        keys = [hashlib.md5(chunk[i].tobytes()).hexdigest()[:16] for i in range(n)]
        out_band.extend([b] * n)
        out_key.extend(keys)
        out_doc.extend(doc_ids.tolist())
    return out_band, out_key, out_doc


def minhash_lsh_pairs(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    threshold: float = 0.7,
) -> "ray.data.Dataset":
    """Near-duplicate pairs (doc_a < doc_b, est_jaccard ≥ threshold).

    shingle → minhash → band → bucket groupby → within-bucket signature
    agreement → pair dedup across buckets. Signatures (K·8 bytes)
    shuffle; raw text never does.
    """

    def to_bands(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        if not texts:
            return pa.Table.from_arrays(
                [pa.array([], pa.int32()), pa.array([], pa.string()), pa.array([], pa.int64()),
                 pa.FixedSizeListArray.from_arrays(pa.array([], pa.uint64()), MINHASH_K)],
                names=["band_id", "band_key", "doc_id", "sig"],
            )
        sigs = np.stack([minhash_signature(t or "") for t in texts])
        band_id, band_key, doc = _band_rows(doc_ids, sigs)
        rep = len(band_id) // len(texts)
        sig_rep = np.tile(sigs, (rep, 1))
        return pa.Table.from_arrays(
            [
                pa.array(band_id, pa.int32()),
                pa.array(band_key, pa.string()),
                pa.array(doc, pa.int64()),
                pa.FixedSizeListArray.from_arrays(pa.array(sig_rep.ravel(), pa.uint64()), MINHASH_K),
            ],
            names=["band_id", "band_key", "doc_id", "sig"],
        )

    banded = ds.map_batches(to_bands, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_pairs(group: pa.Table) -> pa.Table:
        doc_ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        empty = pa.Table.from_arrays(
            [pa.array([], pa.int64()), pa.array([], pa.int64()), pa.array([], pa.float64())],
            names=["doc_a", "doc_b", "est_jaccard"],
        )
        if len(doc_ids) < 2:
            return empty
        sigs = np.asarray(group.column("sig").combine_chunks().flatten()).reshape(
            len(doc_ids), MINHASH_K
        )
        order = np.argsort(doc_ids, kind="stable")
        doc_ids, sigs = doc_ids[order], sigs[order]
        a_out, b_out, j_out = [], [], []
        for i in range(len(doc_ids) - 1):
            agree = (sigs[i + 1 :] == sigs[i][None, :]).mean(axis=1)
            hit = np.nonzero(agree >= threshold)[0]
            for j in hit:
                if doc_ids[i] != doc_ids[i + 1 + j]:
                    a_out.append(int(doc_ids[i]))
                    b_out.append(int(doc_ids[i + 1 + j]))
                    j_out.append(float(agree[j]))
        if not a_out:
            return empty
        return pa.Table.from_arrays(
            [pa.array(a_out, pa.int64()), pa.array(b_out, pa.int64()), pa.array(j_out, pa.float64())],
            names=["doc_a", "doc_b", "est_jaccard"],
        )

    pairs = banded.groupby(["band_id", "band_key"]).map_groups(bucket_pairs, batch_format="pyarrow")
    # same pair can surface from several bands → keep one
    from ray.data.aggregate import Max

    return pairs.groupby(["doc_a", "doc_b"]).aggregate(Max("est_jaccard")).map_batches(
        lambda b: pa.Table.from_arrays(
            [b.column("doc_a"), b.column("doc_b"), b.column("max(est_jaccard)")],
            names=["doc_a", "doc_b", "est_jaccard"],
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# SimHash near-dup


def simhash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    hashes = [simhash64(t or "") for t in texts]
    return pa.Table.from_arrays(
        [batch.column("doc_id"), pa.array(hashes, pa.uint64())],
        names=["doc_id", "simhash64"],
    )


def simhash_pairs(
    ds: "ray.data.Dataset", text_col: str = "text", max_hamming: int = 3
) -> "ray.data.Dataset":
    """Near-dup pairs by SimHash: band the 64-bit hash into 4×16-bit
    chunks (any pair within hamming ≤3 must agree on ≥1 chunk — the
    pigeonhole banding of Manku et al. 2007), bucket-groupby, verify
    hamming inside buckets.

    Partitioning assumption: chunk buckets stay small (pairwise verify
    is O(bucket²)). Degenerate corpora (millions of near-identical or
    empty texts hashing to one bucket) need a hot-bucket split on a
    second chunk before the verify — the MinHash path's banding has the
    same property; exact dedup first removes the worst offenders."""

    def to_bands(batch: pa.Table) -> pa.Table:
        t = simhash_batch(batch, text_col)
        h = t.column("simhash64").to_numpy(zero_copy_only=False)
        doc = t.column("doc_id").to_numpy(zero_copy_only=False)
        band_id, band_key, doc_out, h_out = [], [], [], []
        for b in range(4):
            chunk = (h >> np.uint64(16 * b)) & np.uint64(0xFFFF)
            band_id.extend([b] * len(h))
            band_key.extend(chunk.tolist())
            doc_out.extend(doc.tolist())
            h_out.extend(h.tolist())
        return pa.Table.from_arrays(
            [
                pa.array(band_id, pa.int32()),
                pa.array(band_key, pa.uint64()),
                pa.array(doc_out, pa.int64()),
                pa.array(h_out, pa.uint64()),
            ],
            names=["band_id", "band_key", "doc_id", "simhash64"],
        )

    banded = ds.map_batches(to_bands, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_pairs(group: pa.Table) -> pa.Table:
        doc = group.column("doc_id").to_numpy(zero_copy_only=False)
        empty = pa.Table.from_arrays(
            [pa.array([], pa.int64()), pa.array([], pa.int64()), pa.array([], pa.int64())],
            names=["doc_a", "doc_b", "hamming"],
        )
        if len(doc) < 2:
            return empty
        h = group.column("simhash64").to_numpy(zero_copy_only=False)
        order = np.argsort(doc, kind="stable")
        doc, h = doc[order], h[order]
        a_out, b_out, d_out = [], [], []
        for i in range(len(doc) - 1):
            x = h[i + 1 :] ^ h[i]
            dist = np.array([bin(int(v)).count("1") for v in x])
            for j in np.nonzero(dist <= max_hamming)[0]:
                if doc[i] != doc[i + 1 + j]:
                    a_out.append(int(doc[i]))
                    b_out.append(int(doc[i + 1 + j]))
                    d_out.append(int(dist[j]))
        if not a_out:
            return empty
        return pa.Table.from_arrays(
            [pa.array(a_out, pa.int64()), pa.array(b_out, pa.int64()), pa.array(d_out, pa.int64())],
            names=["doc_a", "doc_b", "hamming"],
        )

    pairs = banded.groupby(["band_id", "band_key"]).map_groups(bucket_pairs, batch_format="pyarrow")
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(Min("hamming")).map_batches(
        lambda b: pa.Table.from_arrays(
            [b.column("doc_a"), b.column("doc_b"), b.column("min(hamming)")],
            names=["doc_a", "doc_b", "hamming"],
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# near-dedup keep-set: pairs → clusters → keepers


def near_dedup_keep_ids(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    threshold: float = 0.7,
) -> "ray.data.Dataset":
    """Documents surviving MinHash-LSH near-dedup: duplicate pairs →
    connected components (union-find on the driver — the pair list is
    the *already-reduced* output of LSH, tiny relative to the corpus)
    → keep min(doc_id) per cluster → broadcast drop-set filter."""
    pairs = minhash_lsh_pairs(ds, text_col, threshold).take_all()
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for p in pairs:
        a, b = find(p["doc_a"]), find(p["doc_b"])
        if a != b:
            if a > b:
                a, b = b, a
            parent[b] = a  # root = smallest id → keeper
    drop = sorted(x for x in parent if find(x) != x)
    drop_arr = pa.array(drop, pa.int64())

    def keep(batch: pa.Table) -> pa.Table:
        mask = pc.invert(pc.is_in(batch.column("doc_id"), value_set=drop_arr))
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# exact n-gram Jaccard verification


def ngram_set(text: str, width: int = 3) -> set:
    tokens = text.split()
    if len(tokens) < width:
        return {" ".join(tokens)} if tokens else set()
    return {" ".join(tokens[i : i + width]) for i in range(len(tokens) - width + 1)}


def verify_pairs_jaccard(
    docs_ds: "ray.data.Dataset",
    pairs: List[tuple],
    text_col: str = "text",
    width: int = 3,
) -> pa.Table:
    """Exact n-gram Jaccard for a (small) candidate pair list.

    Broadcast pattern: the pair list's doc texts are fetched once via a
    pushed-down id filter, built into a local dict, and compared —
    candidates come pre-pruned by LSH so this side stays small.
    """
    need = sorted({d for p in pairs for d in p[:2]})
    need_arr = pa.array(need, pa.int64())

    def pick(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column("doc_id"), value_set=need_arr)
        return batch.filter(mask).select(["doc_id", text_col])

    small = docs_ds.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True).take_all()
    texts = {r["doc_id"]: r[text_col] for r in small}
    a_out, b_out, j_out = [], [], []
    for a, b in [p[:2] for p in pairs]:
        sa, sb = ngram_set(texts.get(a, ""), width), ngram_set(texts.get(b, ""), width)
        union = len(sa | sb)
        j = (len(sa & sb) / union) if union else 0.0
        a_out.append(a)
        b_out.append(b)
        j_out.append(j)
    return pa.Table.from_arrays(
        [pa.array(a_out, pa.int64()), pa.array(b_out, pa.int64()), pa.array(j_out, pa.float64())],
        names=["doc_a", "doc_b", "jaccard"],
    )
