"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling",
arXiv:2302.03169) — the standard recipe for selecting pretraining data
that *looks like* a curated target set.

Method, as published: featurize every document as a bag of HASHED word
n-grams (unigrams + bigrams into B buckets — the feature-hashing trick
keeps the parameter space fixed regardless of vocabulary); fit two
bag-of-words models, one on the target set and one on the raw pool;
score each raw document with its log importance weight
``logw(doc) = Σ_b c_b(doc) · (log p̂_target(b) − log p̂_raw(b))``
(add-α smoothed); then sample k documents WITHOUT replacement with
probability ∝ exp(logw) — realized here by the Gumbel top-k trick so
the draw is a deterministic function of (doc_id, seed): reproducible
and layout-invariant, like every other sampler in this repo.

Scale shape:
- Feature counting is map-side ``bincount`` per batch; only (bucket, n)
  pairs shuffle, and the model tables are bounded by B = ``n_buckets``
  (the operator's own constant, default 2^16 ≈ 0.5 MB of float64) —
  NOT by the corpus vocabulary. Raw text never shuffles.
- The λ = log-ratio vector is built driver-side from the two bounded
  count tables and broadcast once into the scoring stage's closure;
  scoring is one map-only pass (flat-token hash + one weighted
  bincount per batch).
- Resampling is ``global_top_k`` over (logw + Gumbel(id, seed)) — the
  per-batch partial top-k merge, no global sort.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

DEFAULT_BUCKETS = 1 << 16

_BIGRAM_MIX = np.uint64(0x100000001B3)  # FNV prime reused as the pair mix


def _batch_feature_hashes(batch: pa.Table, text_col: str):
    """(flat uint64 feature hashes, doc index per feature) for one
    batch: word unigrams + within-doc adjacent bigrams, vectorized."""
    from pdf_table_extractor_ray.stages.lm import _flat_tokens
    from pdf_table_extractor_ray.stages.sketches import _fnv1a_bytes_array

    n = batch.num_rows
    flat, lens = _flat_tokens(batch.column(text_col))
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    if len(flat) == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64), n
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    h = _fnv1a_bytes_array(flat)[nonempty]
    d = doc_idx[nonempty]
    if len(h) == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64), n
    # bigrams: adjacent token pairs of the SAME doc (order-sensitive mix)
    same = d[1:] == d[:-1]
    bg = (h[:-1][same] * _BIGRAM_MIX) ^ h[1:][same]
    feats = np.concatenate([h, bg])
    docs = np.concatenate([d, d[:-1][same]])
    return feats, docs, n


def hashed_bucket_counts(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
) -> "ray.data.Dataset":
    """Corpus-level hashed n-gram bucket counts: (bucket, n) with at
    most ``n_buckets`` rows — the bag-of-words model DSIR fits on each
    side. Map-side np.unique combiner, ONE bounded groupby-Sum."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        feats, _, _ = _batch_feature_hashes(b, text_col)
        bucket = (feats % np.uint64(n_buckets)).astype(np.int64)
        ub, cnt = np.unique(bucket, return_counts=True)
        return pa.table(
            {"bucket": pa.array(ub), "n": pa.array(cnt.astype(np.int64))}
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .aggregate(Sum("n"))
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "bucket": pc.cast(b.column("bucket"), pa.int64()),
                "n": pc.cast(b.column("sum(n)"), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def hashed_bucket_counts_paired(
    ds: "ray.data.Dataset",
    target_filter,
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
) -> "ray.data.Dataset":
    """(bucket, n_target, n_pool) in ONE tokenize+hash pass when the
    target set is a row predicate over the pool itself (the common
    DSIR call shape) — halves the feature-counting work vs two
    independent ``hashed_bucket_counts`` passes. ``target_filter`` is
    a batch -> boolean-mask function. Bounded by ``n_buckets``."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        feats, docs, _ = _batch_feature_hashes(b, text_col)
        bucket = (feats % np.uint64(n_buckets)).astype(np.int64)
        mask = target_filter(b)
        if isinstance(mask, (pa.Array, pa.ChunkedArray)):
            mask = pc.fill_null(mask, False).to_numpy(zero_copy_only=False)
        mask = np.asarray(mask, bool)
        pool_n = np.bincount(bucket, minlength=n_buckets)
        tgt_n = np.bincount(bucket[mask[docs]], minlength=n_buckets)
        nz = np.nonzero(pool_n)[0]
        return pa.table(
            {
                "bucket": pa.array(nz.astype(np.int64)),
                "n_target": pa.array(tgt_n[nz].astype(np.int64)),
                "n_pool": pa.array(pool_n[nz].astype(np.int64)),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .aggregate(Sum("n_target"), Sum("n_pool"))
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "bucket": pc.cast(b.column("bucket"), pa.int64()),
                "n_target": pc.cast(b.column("sum(n_target)"), pa.int64()),
                "n_pool": pc.cast(b.column("sum(n_pool)"), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def dsir_log_ratios_paired(
    paired_counts: "ray.data.Dataset",
    n_buckets: int = DEFAULT_BUCKETS,
    alpha: float = 1.0,
) -> np.ndarray:
    """λ from one ``hashed_bucket_counts_paired`` table."""
    t = np.zeros(n_buckets, np.float64)
    r = np.zeros(n_buckets, np.float64)
    # bounded: ≤ n_buckets rows by construction
    for row in paired_counts.take_all():
        t[int(row["bucket"])] = float(row["n_target"])
        r[int(row["bucket"])] = float(row["n_pool"])
    lt = np.log(t + alpha) - np.log(t.sum() + alpha * n_buckets)
    lr = np.log(r + alpha) - np.log(r.sum() + alpha * n_buckets)
    return lt - lr


def dsir_log_ratios(
    target_counts: "ray.data.Dataset",
    raw_counts: "ray.data.Dataset",
    n_buckets: int = DEFAULT_BUCKETS,
    alpha: float = 1.0,
) -> np.ndarray:
    """λ[b] = log p̂_target(b) − log p̂_raw(b), add-α smoothed — the
    bounded (n_buckets float64) model the scoring stage broadcasts."""

    def to_array(counts_ds) -> np.ndarray:
        out = np.zeros(n_buckets, np.int64)
        # bounded: ≤ n_buckets rows by hashed_bucket_counts construction
        for r in counts_ds.take_all():
            out[int(r["bucket"])] = int(r["n"])
        return out

    t = to_array(target_counts).astype(np.float64)
    r = to_array(raw_counts).astype(np.float64)
    lt = np.log(t + alpha) - np.log(t.sum() + alpha * n_buckets)
    lr = np.log(r + alpha) - np.log(r.sum() + alpha * n_buckets)
    return lt - lr


def dsir_weights(
    ds: "ray.data.Dataset",
    lam: np.ndarray,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Per-document log importance weight: ONE map-only pass (the λ
    vector rides the closure — broadcast once per actor, bounded by
    ``len(lam)``). Output (id_col, logw float64, n_feats int64)."""
    n_buckets = len(lam)

    def score(b: pa.Table) -> pa.Table:
        feats, docs, n = _batch_feature_hashes(b, text_col)
        bucket = (feats % np.uint64(n_buckets)).astype(np.int64)
        logw = np.bincount(docs, weights=lam[bucket], minlength=n)
        n_feats = np.bincount(docs, minlength=n)
        return pa.table(
            {
                id_col: b.column(id_col),
                "logw": pa.array(logw.astype(np.float64)),
                "n_feats": pa.array(n_feats.astype(np.int64)),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def dsir_resample(
    weights: "ray.data.Dataset",
    k: int,
    seed: int = 0,
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Gumbel top-k draw of ``k`` docs without replacement with
    probability ∝ exp(logw): key = logw + Gumbel(u), u a seeded
    splitmix64 of the id mapped to (0, 1) — deterministic,
    layout-invariant, rerun-stable (the Efraimidis-Spirakis analogue
    in log space). Selection via the partial-top-k merge, no sort."""
    from pdf_table_extractor_ray.stages.shuffle import shuffle_key
    from pdf_table_extractor_ray.stages.topk import global_top_k

    def keyed(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        logw = b.column("logw").to_numpy(zero_copy_only=False)
        # (0, 1) open interval: (h + 0.5) / 2^64 never hits 0 or 1
        u = (shuffle_key(ids, seed).astype(np.float64) + 0.5) / 2.0**64
        g = -np.log(-np.log(u))
        return b.append_column("gumbel_key", pa.array(logw + g, pa.float64()))

    keyed_ds = weights.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
    return global_top_k(
        keyed_ds, [("gumbel_key", "descending"), (id_col, "ascending")], k
    )


def dsir_select(
    ds: "ray.data.Dataset",
    target_filter,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
    alpha: float = 1.0,
    seed: int = 0,
    raw_ds: Optional["ray.data.Dataset"] = None,
) -> "ray.data.Dataset":
    """The full DSIR pipeline: fit target/raw hashed bag-of-words,
    score the pool, Gumbel-top-k resample ``k`` docs. ``target_filter``
    is a row-level Arrow predicate function (batch -> boolean mask)
    defining the target set; the pool defaults to ``ds`` itself.
    Returns (id_col, logw, n_feats, gumbel_key) for the selected k.

    When the pool IS ``ds`` (the default), target and pool counts come
    from ONE fused tokenize+hash pass (``hashed_bucket_counts_paired``)
    — the whole selection is then 2 executions over the corpus: the
    paired count pass and the fused score→resample pass."""
    if raw_ds is None:
        lam = dsir_log_ratios_paired(
            hashed_bucket_counts_paired(ds, target_filter, text_col, n_buckets),
            n_buckets,
            alpha,
        )
        pool = ds
    else:

        def keep_target(b: pa.Table) -> pa.Table:
            return b.filter(target_filter(b))

        target = ds.map_batches(
            keep_target, batch_format="pyarrow", zero_copy_batch=True
        )
        lam = dsir_log_ratios(
            hashed_bucket_counts(target, text_col, n_buckets),
            hashed_bucket_counts(raw_ds, text_col, n_buckets),
            n_buckets,
            alpha,
        )
        pool = raw_ds
    return dsir_resample(dsir_weights(pool, lam, id_col, text_col), k, seed, id_col)
