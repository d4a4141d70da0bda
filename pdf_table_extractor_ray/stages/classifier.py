"""Batched model inference as an actor-pool stage — the fastText-style
hashed bag-of-words LINEAR quality classifier every web-corpus pipeline
runs between extraction and training-mix assembly (reference has no
model scoring at all; this is the engine-side representative of the
"load model once per actor, score batches vectorized" pattern).

The model is deterministic so correctness is SQL-checkable end to end:
token weight = md5-derived integer in [-500, 500] (the same
oracle-reproducible md5 device as ``doc_sample`` / ``mix_rebalance``),
doc score = Σ token weights (with multiplicity). A real trained model
swaps ``_weight_of`` for an embedding-matrix lookup loaded in
``__init__`` — the Ray plumbing (actor pool, per-actor weight cache,
per-batch vectorized segment-sum) is exactly what changes hands.

Scale shape: map-only (NO shuffle) scoring pass; the per-actor weight
cache is the model state, built lazily and shared across every batch
the actor sees; per batch the only Python-loop work is one md5 per
*previously-unseen unique token* (vocabulary saturates after the first
few batches — Zipf), everything else is numpy: one np.unique over the
batch's flattened tokens, one gather, one reduceat per doc segment.
"""

from __future__ import annotations

import hashlib
import re
from typing import Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_TOKEN_RE = re.compile(r"[a-z0-9]+")

WEIGHT_MOD = 1001
WEIGHT_BIAS = 500


def token_weight(tok: str) -> int:
    """md5(token) first-8-hex-digits % 1001 − 500 ∈ [−500, 500] —
    bit-reproducible in DuckDB as
    ``CAST(concat('0x', substr(md5(t),1,8)) AS BIGINT) % 1001 - 500``."""
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % WEIGHT_MOD - WEIGHT_BIAS


class LinearQualityModel:
    """Callable class for ``map_batches(..., concurrency=N)``: the
    model "loads" once per actor (the weight cache persists across
    batches); ``__call__`` is the batched inference pass.

    Output: (doc_id, source, n_model_tokens, w_sum) — integer exact,
    layout-invariant (per-doc sums don't depend on batch boundaries).
    """

    def __init__(self) -> None:
        self._weights: dict = {}

    def _weights_for(self, uniq: np.ndarray) -> np.ndarray:
        w = np.empty(len(uniq), np.int64)
        cache = self._weights
        for i, tok in enumerate(uniq):
            hit = cache.get(tok)
            if hit is None:
                hit = token_weight(tok)
                cache[tok] = hit
            w[i] = hit
        return w

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = pc.utf8_lower(
            pc.fill_null(pc.cast(batch.column("text"), pa.string()), "")
        ).to_pylist()
        toks_per_doc = [_TOKEN_RE.findall(t) for t in texts]
        counts = np.array([len(t) for t in toks_per_doc], np.int64)
        flat = [tok for toks in toks_per_doc for tok in toks]
        if flat:
            uniq, inv = np.unique(np.array(flat, dtype=object), return_inverse=True)
            w_flat = self._weights_for(uniq)[inv]
            bounds = np.zeros(len(counts) + 1, np.int64)
            np.cumsum(counts, out=bounds[1:])
            # reduceat needs non-empty segments: sum via add.at on doc ids
            doc_ids = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
            w_sum = np.zeros(len(counts), np.int64)
            np.add.at(w_sum, doc_ids, w_flat)
        else:
            w_sum = np.zeros(len(counts), np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "source": batch.column("source"),
                "n_model_tokens": pa.array(counts, pa.int64()),
                "w_sum": pa.array(w_sum, pa.int64()),
            }
        )


def score_documents(
    docs: "ray.data.Dataset", concurrency: Tuple[int, int] | int = (1, 4)
) -> "ray.data.Dataset":
    """documents(doc_id, source, text) → per-doc model scores via the
    actor pool (state in ``__init__``/first use, work in ``__call__``)."""
    return docs.map_batches(
        LinearQualityModel,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )


def quality_report_by_source(scored: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-source classifier report: docs, scored docs (≥1 token),
    passing docs (w_sum > 0), and the exact integer score mass.
    One slim groupby of 5 int64 counters per source."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "source": b.column("source"),
                "n_docs": np.ones(b.num_rows, np.int64),
                "n_scored": pc.cast(
                    pc.greater(b.column("n_model_tokens"), 0), pa.int64()
                ),
                "n_pass": pc.cast(pc.greater(b.column("w_sum"), 0), pa.int64()),
                "sum_w": b.column("w_sum"),
                "sum_tokens": b.column("n_model_tokens"),
            }
        )
        return (
            pa.TableGroupBy(t, ["source"])
            .aggregate(
                [
                    ("n_docs", "sum"),
                    ("n_scored", "sum"),
                    ("n_pass", "sum"),
                    ("sum_w", "sum"),
                    ("sum_tokens", "sum"),
                ]
            )
            .rename_columns(
                ["source", "n_docs", "n_scored", "n_pass", "sum_w", "sum_tokens"]
            )
        )

    agg = (
        scored.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .aggregate(
            Sum("n_docs"), Sum("n_scored"), Sum("n_pass"), Sum("sum_w"), Sum("sum_tokens")
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": b.column("source"),
                "n_docs": pc.cast(b.column("sum(n_docs)"), pa.int64()),
                "n_scored": pc.cast(b.column("sum(n_scored)"), pa.int64()),
                "n_pass": pc.cast(b.column("sum(n_pass)"), pa.int64()),
                "sum_w": pc.cast(b.column("sum(sum_w)"), pa.int64()),
                "sum_tokens": pc.cast(b.column("sum(sum_tokens)"), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Distributed Naive-Bayes TRAINING + inference
# ---------------------------------------------------------------------------
#
# The training half of the classifier story (LinearQualityModel above is
# inference-only): multinomial Naive Bayes over whitespace tokens — the
# classic language-ID / quality-label trainer (fastText's ancestor), and
# the simplest model whose TRAINING is a pure distributed aggregation:
# the sufficient statistics are exact integer counts, so the training
# pass is SQL-checkable end to end.
#
# Scale shape: training = per-batch (label, token) pair counts via one
# dictionary-encode + np.unique (the heavy reduction happens before any
# shuffle), then ONE groupby((label, token)).Sum — shuffled volume is
# the per-batch VOCABULARY, not the token stream. Label priors and
# per-label totals fall out of the same table. Inference = the model's
# top-V token rows broadcast once (ray.put, vocab-capped — the standard
# NB feature-selection step, NOT an approximation bolted on for memory),
# then a map-only scoring pass (one index_in + bincount scatter per
# batch; no per-token Python).


def nb_train_counts(
    ds: "ray.data.Dataset",
    label_col: str = "lang",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Multinomial NB sufficient statistics: (label, token, n) exact
    integer counts over whitespace tokens (``\\S+``, matching the
    repo-wide SQL tokenizer ``regexp_extract_all(text, '\\S+')``).
    Null labels are excluded (SQL GROUP BY semantics); docs with no
    tokens contribute nothing (they still count for priors via
    ``nb_label_stats``)."""
    from ray.data.aggregate import Sum

    from pdf_table_extractor_ray.stages.lm import _flat_tokens

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column(label_col)))
        empty = pa.table(
            {
                "label": pa.array([], pa.string()),
                "token": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
        if b.num_rows == 0:
            return empty
        flat, lens = _flat_tokens(b.column(text_col))
        lab = pc.cast(b.column(label_col), pa.string())
        if isinstance(lab, pa.ChunkedArray):
            lab = lab.combine_chunks()
        lab_enc = lab.dictionary_encode()
        lab_codes = np.repeat(
            lab_enc.indices.to_numpy(zero_copy_only=False).astype(np.int64), lens
        )
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        if not keep.any():
            return empty
        toks = flat.filter(pa.array(keep))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        tok_enc = toks.dictionary_encode()
        tok_codes = tok_enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        V = np.int64(len(tok_enc.dictionary))
        packed = lab_codes[keep] * V + tok_codes
        upair, cnt = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "label": pc.take(lab_enc.dictionary, pa.array(upair // V, pa.int64())),
                "token": pc.take(tok_enc.dictionary, pa.array(upair % V, pa.int64())),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["label", "token"])
        .aggregate(Sum("n"))
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "label": b.column("label"),
                "token": b.column("token"),
                "n": pc.cast(b.column("sum(n)"), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def nb_label_stats(
    ds: "ray.data.Dataset",
    label_col: str = "lang",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Per-label prior statistics: (label, n_docs, n_tokens) — one slim
    groupby of two int64 counters per label; the token stream never
    shuffles (token counts reduce inside the batch)."""
    from ray.data.aggregate import Sum

    from pdf_table_extractor_ray.stages.lm import _flat_tokens

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column(label_col)))
        if b.num_rows == 0:
            return pa.table(
                {
                    "label": pa.array([], pa.string()),
                    "n_docs": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                }
            )
        flat, lens = _flat_tokens(b.column(text_col))
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(b.num_rows), lens)
        ntok = np.bincount(
            doc_idx, weights=nonempty.astype(np.int64), minlength=b.num_rows
        ).astype(np.int64)
        t = pa.table(
            {
                "label": pc.cast(b.column(label_col), pa.string()),
                "n_docs": np.ones(b.num_rows, np.int64),
                "n_tokens": ntok,
            }
        )
        return (
            pa.TableGroupBy(t, ["label"])
            .aggregate([("n_docs", "sum"), ("n_tokens", "sum")])
            .rename_columns(["label", "n_docs", "n_tokens"])
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("label")
        .aggregate(Sum("n_docs"), Sum("n_tokens"))
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "label": b.column("label"),
                "n_docs": pc.cast(b.column("sum(n_docs)"), pa.int64()),
                "n_tokens": pc.cast(b.column("sum(n_tokens)"), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def nb_predict(
    ds: "ray.data.Dataset",
    counts: "ray.data.Dataset",
    label_stats: pa.Table,
    vocab_cap: int = 65_536,
    label_col_out: str = "pred_label",
    text_col: str = "text",
    id_col: str = "doc_id",
    passthrough_cols: tuple = (),
) -> "ray.data.Dataset":
    """Score every document against the trained model and emit
    (id_col, pred_label): argmax over labels of
    ``ln(prior) + Σ_tokens tf·ln((count+1)/(label_tokens+V))``
    (add-one smoothing; V = selected vocab size; out-of-vocab tokens
    hit the smoothing floor of the same denominator).

    The broadcast is the model's TOP-``vocab_cap`` tokens by global
    count (ties → token asc) — NB's standard feature-selection step,
    deterministic, and the bound that keeps the ray.put O(V·labels)
    whatever the corpus vocabulary. Scoring is map-only: one
    ``index_in`` against the vocab, one bincount scatter into the
    (docs × labels) log-prob matrix, one argmax — no per-token Python.
    Ties in the argmax break toward the lexicographically smallest
    label (deterministic)."""
    import ray

    from pdf_table_extractor_ray.stages.lm import _flat_tokens
    from pdf_table_extractor_ray.stages.topk import global_top_k
    from ray.data.aggregate import Sum

    # ---- select the vocab: top-V tokens by total count (bounded pull)
    tok_totals = (
        counts.groupby("token").aggregate(Sum("n")).rename_columns(["token", "tn"])
    )
    vocab_tbl = pa.concat_tables(
        [
            b
            for b in global_top_k(
                tok_totals, [("tn", "descending"), ("token", "ascending")], vocab_cap
            ).iter_batches(batch_format="pyarrow")
        ]
    )
    vocab = vocab_tbl.column("token").combine_chunks()
    v_size = len(vocab)

    # ---- labels sorted asc so argmax tie-break is lexicographic
    lt = label_stats.sort_by([("label", "ascending")])
    labels = lt.column("label").to_pylist()
    n_labels = len(labels)
    label_ntok = lt.column("n_tokens").to_numpy(zero_copy_only=False).astype(np.float64)
    label_ndoc = lt.column("n_docs").to_numpy(zero_copy_only=False).astype(np.float64)
    total_docs = float(label_ndoc.sum())

    # ---- (labels × V) count matrix from the in-vocab model rows only:
    # filter BEFORE the driver pull, so the materialized slice is
    # bounded by labels × vocab_cap whatever the trained vocabulary.
    def in_vocab(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_valid(pc.index_in(b.column("token"), value_set=vocab)))

    model_rows = pa.concat_tables(
        [
            b
            for b in counts.map_batches(
                in_vocab, batch_format="pyarrow", zero_copy_batch=True
            ).iter_batches(batch_format="pyarrow")
        ]
    )
    li = (
        pc.index_in(
            model_rows.column("label").combine_chunks(),
            value_set=pa.array(labels, pa.string()),
        )
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    ti_arr = pc.index_in(model_rows.column("token").combine_chunks(), value_set=vocab)
    ti = ti_arr.to_numpy(zero_copy_only=False).astype(np.int64)
    cnt = model_rows.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
    mat = np.zeros((n_labels, v_size), np.float64)
    mat[li, ti] = cnt
    # log-prob matrix with add-one smoothing
    denom = (label_ntok + float(v_size)).reshape(-1, 1)
    logp = np.log((mat + 1.0) / denom)  # (labels × V)
    floor = np.log(1.0 / denom.ravel())  # OOV per label
    prior = np.log(label_ndoc / total_docs)
    model_ref = ray.put((vocab, logp, floor, prior, labels))

    def score(b: pa.Table) -> pa.Table:
        voc, lp, fl, pr, labs = ray.get(model_ref)
        n = b.num_rows
        flat, lens = _flat_tokens(b.column(text_col))
        doc_idx = np.repeat(np.arange(n), lens)
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        idx = pc.index_in(flat, value_set=voc)
        if isinstance(idx, pa.ChunkedArray):
            idx = idx.combine_chunks()
        idx_np = idx.to_numpy(zero_copy_only=False).astype(np.float64)
        hit = (~np.isnan(idx_np)) & nonempty
        miss = np.isnan(idx_np) & nonempty
        scores = np.tile(pr, (n, 1))  # (docs × labels)
        if hit.any():
            # tf per (doc, vocab-token): bincount on packed key
            packed = doc_idx[hit] * np.int64(len(voc)) + idx_np[hit].astype(np.int64)
            up, tf = np.unique(packed, return_counts=True)
            d = (up // len(voc)).astype(np.int64)
            t = (up % len(voc)).astype(np.int64)
            # scatter-add tf·logp per label: loop over LABELS (bounded,
            # a handful), vectorized over the (doc, token) pairs
            for j in range(len(labs)):
                np.add.at(scores[:, j], d, tf.astype(np.float64) * lp[j, t])
        if miss.any():
            oov = np.bincount(doc_idx[miss], minlength=n).astype(np.float64)
            scores += oov.reshape(-1, 1) * fl.reshape(1, -1)
        best = np.argmax(scores, axis=1)  # first max = smallest label (labs sorted)
        cols = {
            id_col: b.column(id_col),
            label_col_out: pc.take(
                pa.array(labs, pa.string()), pa.array(best, pa.int64())
            ),
        }
        for c in passthrough_cols:
            cols[c] = b.column(c)
        return pa.table(cols)

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def nb_confusion(
    ds: "ray.data.Dataset",
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_cap: int = 65_536,
) -> "ray.data.Dataset":
    """Train-on-all, score-on-all confusion matrix: (true_label,
    pred_label, n) — the training-set sanity report every classifier
    pipeline emits. Two aggregation passes build the model (pair
    counts + label priors), one bounded broadcast ships it, one
    MAP-ONLY scoring pass carries the true label through the batch
    (row alignment, no join), and one final slim groupby reduces the
    (true, pred) pairs — at most |labels|² rows ever reach the driver's
    consumer."""
    from ray.data.aggregate import Sum

    counts = nb_train_counts(ds, label_col, text_col).materialize()
    label_stats = pa.concat_tables(
        [
            b
            for b in nb_label_stats(ds, label_col, text_col).iter_batches(
                batch_format="pyarrow"
            )
        ]
    )

    def project(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column(label_col)))
        return pa.table(
            {
                id_col: b.column(id_col),
                "true_label": pc.cast(b.column(label_col), pa.string()),
                text_col: b.column(text_col),
            }
        )

    pred = nb_predict(
        ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True),
        counts,
        label_stats,
        vocab_cap=vocab_cap,
        id_col=id_col,
        passthrough_cols=("true_label",),
    )

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "true_label": b.column("true_label"),
                "pred_label": b.column("pred_label"),
                "n": np.ones(b.num_rows, np.int64),
            }
        )
        return (
            pa.TableGroupBy(t, ["true_label", "pred_label"])
            .aggregate([("n", "sum")])
            .rename_columns(["true_label", "pred_label", "n"])
        )

    agg = (
        pred.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["true_label", "pred_label"])
        .aggregate(Sum("n"))
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "true_label": b.column("true_label"),
                "pred_label": b.column("pred_label"),
                "n": pc.cast(b.column("sum(n)"), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")




# ---------------------------------------------------------------------------
# Distributed LOGISTIC-REGRESSION training (iterative full-batch GD)
# ---------------------------------------------------------------------------


def _hashed_features(
    batch: pa.Table, text_col: str, n_features: int
) -> np.ndarray:
    """(rows × n_features) hashed bag-of-words count matrix — the
    feature-hashing trick (Weinberger et al. 2009): feature index =
    FNV-1a-64(token) mod n_features. Fully vectorized: one flatten, one
    byte-position hash pass, one bincount scatter."""
    from pdf_table_extractor_ray.stages.lm import _flat_tokens
    from pdf_table_extractor_ray.stages.sketches import _fnv1a_bytes_array

    n = batch.num_rows
    flat, lens = _flat_tokens(batch.column(text_col))
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    doc_idx = np.repeat(np.arange(n), lens)
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    if len(flat) == 0 or not nonempty.any():
        return np.zeros((n, n_features), np.float64)
    h = _fnv1a_bytes_array(flat)
    feat = (h % np.uint64(n_features)).astype(np.int64)
    m = nonempty
    X = np.bincount(
        doc_idx[m] * n_features + feat[m], minlength=n * n_features
    ).reshape(n, n_features)
    return X.astype(np.float64)


def logreg_train(
    ds: "ray.data.Dataset",
    pos_mask_fn,
    text_col: str = "text",
    n_features: int = 64,
    iters: int = 8,
    lr: float = 0.5,
) -> np.ndarray:
    """Binary logistic regression over hashed bag-of-words features by
    FULL-BATCH gradient descent — the distributed-training archetype:
    model state (w ∈ R^{d+1}, d = ``n_features``) lives on the driver,
    each iteration is ONE streaming map pass producing a per-batch
    partial gradient row (d+2 float64 cells: Σ X^T(σ(Xw)−y), bias
    term, and row count for normalization) reduced by ``Dataset.sum``.
    No shuffle ever; per-pass driver traffic is O(d). Features are
    L1-normalized per doc (count / doc token count) so the loss is
    scale-stable across document lengths.

    Returns the trained weight vector (bias last). Deterministic up to
    float-sum association order across blocks (the gradient is a sum
    of per-row terms — mathematically order-free)."""
    import ray  # noqa: F401  (Dataset API only)

    d = n_features
    w = np.zeros(d + 1, np.float64)
    feats = ds.materialize()  # consumed iters times; lives in object store

    for _ in range(iters):
        w_now = w.copy()

        def grad_partial(b: pa.Table) -> pa.Table:
            X = _hashed_features(b, text_col, d)
            tot = X.sum(axis=1, keepdims=True)
            Xn = X / np.maximum(tot, 1.0)
            y = pos_mask_fn(b)
            if isinstance(y, pa.ChunkedArray):
                y = y.combine_chunks()
            y = y.to_numpy(zero_copy_only=False).astype(np.float64)
            z = Xn @ w_now[:d] + w_now[d]
            p = 1.0 / (1.0 + np.exp(-z))
            r = p - y
            g = Xn.T @ r
            cols = {f"g{j}": pa.array([float(g[j])], pa.float64()) for j in range(d)}
            cols["gb"] = pa.array([float(r.sum())], pa.float64())
            cols["n"] = pa.array([float(len(r))], pa.float64())
            return pa.table(cols)

        names = [f"g{j}" for j in range(d)] + ["gb", "n"]
        sums = feats.map_batches(
            grad_partial, batch_format="pyarrow", zero_copy_batch=True
        ).sum(names)
        n_rows = float(sums["sum(n)"])
        if n_rows == 0:
            break
        g = np.array(
            [float(sums[f"sum(g{j})"]) for j in range(d)] + [float(sums["sum(gb)"])],
            np.float64,
        )
        w = w - lr * g / n_rows
    return w


def logreg_confusion_by(
    ds: "ray.data.Dataset",
    pos_mask_fn,
    key_col: str = "source",
    text_col: str = "text",
    n_features: int = 64,
    iters: int = 8,
    lr: float = 0.5,
) -> "ray.data.Dataset":
    """Train (``logreg_train``) then one map-only scoring pass emitting
    the per-``key_col`` confusion counters (key, tp, fp, tn, fn) —
    integer-exact given the trained weights; the weights ship in the
    task closure (O(d), no broadcast machinery needed)."""
    from ray.data.aggregate import Sum

    w = logreg_train(
        ds, pos_mask_fn, text_col=text_col, n_features=n_features, iters=iters, lr=lr
    )
    d = n_features

    def score(b: pa.Table) -> pa.Table:
        X = _hashed_features(b, text_col, d)
        tot = X.sum(axis=1, keepdims=True)
        Xn = X / np.maximum(tot, 1.0)
        y = pos_mask_fn(b)
        if isinstance(y, pa.ChunkedArray):
            y = y.combine_chunks()
        y = y.to_numpy(zero_copy_only=False).astype(bool)
        pred = (Xn @ w[:d] + w[d]) > 0.0
        t = pa.table(
            {
                "key": pc.cast(b.column(key_col), pa.string()),
                "tp": (pred & y).astype(np.int64),
                "fp": (pred & ~y).astype(np.int64),
                "tn": (~pred & ~y).astype(np.int64),
                "fn": (~pred & y).astype(np.int64),
            }
        )
        return (
            pa.TableGroupBy(t, ["key"])
            .aggregate([("tp", "sum"), ("fp", "sum"), ("tn", "sum"), ("fn", "sum")])
            .rename_columns(["key", "tp", "fp", "tn", "fn"])
        )

    agg = (
        ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("key")
        .aggregate(Sum("tp"), Sum("fp"), Sum("tn"), Sum("fn"))
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": b.column("key"),
                "tp": pc.cast(b.column("sum(tp)"), pa.int64()),
                "fp": pc.cast(b.column("sum(fp)"), pa.int64()),
                "tn": pc.cast(b.column("sum(tn)"), pa.int64()),
                "fn": pc.cast(b.column("sum(fn)"), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# K-fold Naive-Bayes cross-validation by COUNT SUBTRACTION
# ---------------------------------------------------------------------------


def nb_cross_validate(
    ds: "ray.data.Dataset",
    k_folds: int = 5,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_cap: int = 65_536,
) -> "ray.data.Dataset":
    """K-fold cross-validated NB accuracy from ONE training pass: count
    sufficient statistics per (fold, label, token) — fold =
    ``id mod k_folds`` — then the leave-fold-out model for fold f is
    total − fold-f counts, a pure subtraction on the driver-side
    (labels × vocab) matrices. One scoring pass routes each doc through
    its own held-out model (k models ride one ray.put; per batch the
    fold id selects score columns). Output: (fold, n_docs, n_correct)
    — integer-exact, k rows.

    The subtraction trick is what makes CV distributed-cheap: k models
    cost one aggregation, not k training passes. Vocab selection (top-V
    by TOTAL count) is shared across folds — standard practice and the
    bound that keeps the broadcast O(k·labels·V)."""
    import ray

    from pdf_table_extractor_ray.stages.lm import _flat_tokens
    from pdf_table_extractor_ray.stages.topk import global_top_k
    from ray.data.aggregate import Sum

    # ---- one pass: (fold, label, token, n) counts
    def pair_partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column(label_col)))
        empty = pa.table(
            {
                "fold": pa.array([], pa.int64()),
                "label": pa.array([], pa.string()),
                "token": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
        if b.num_rows == 0:
            return empty
        flat, lens = _flat_tokens(b.column(text_col))
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        fold = np.repeat(ids % k_folds, lens)
        lab = pc.cast(b.column(label_col), pa.string())
        if isinstance(lab, pa.ChunkedArray):
            lab = lab.combine_chunks()
        lab_enc = lab.dictionary_encode()
        lab_codes = np.repeat(
            lab_enc.indices.to_numpy(zero_copy_only=False).astype(np.int64), lens
        )
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        if not keep.any():
            return empty
        toks = flat.filter(pa.array(keep))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        tok_enc = toks.dictionary_encode()
        tok_codes = tok_enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        V = np.int64(len(tok_enc.dictionary))
        L = np.int64(len(lab_enc.dictionary))
        packed = (fold[keep] * L + lab_codes[keep]) * V + tok_codes
        upair, cnt = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "fold": pa.array((upair // (L * V)).astype(np.int64), pa.int64()),
                "label": pc.take(
                    lab_enc.dictionary, pa.array((upair // V) % L, pa.int64())
                ),
                "token": pc.take(tok_enc.dictionary, pa.array(upair % V, pa.int64())),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    fold_counts = (
        ds.map_batches(pair_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["fold", "label", "token"])
        .aggregate(Sum("n"))
        .map_batches(
            lambda b: pa.table(
                {
                    "fold": b.column("fold"),
                    "label": b.column("label"),
                    "token": b.column("token"),
                    "n": pc.cast(b.column("sum(n)"), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )

    # ---- per-(fold, label) doc + token totals (one slim aggregate)
    def stat_partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column(label_col)))
        if b.num_rows == 0:
            return pa.table(
                {
                    "fold": pa.array([], pa.int64()),
                    "label": pa.array([], pa.string()),
                    "n_docs": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                }
            )
        flat, lens = _flat_tokens(b.column(text_col))
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(b.num_rows), lens)
        ntok = np.bincount(
            doc_idx, weights=nonempty.astype(np.int64), minlength=b.num_rows
        ).astype(np.int64)
        ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table(
            {
                "fold": pa.array(ids % k_folds, pa.int64()),
                "label": pc.cast(b.column(label_col), pa.string()),
                "n_docs": np.ones(b.num_rows, np.int64),
                "n_tokens": ntok,
            }
        )
        return (
            pa.TableGroupBy(t, ["fold", "label"])
            .aggregate([("n_docs", "sum"), ("n_tokens", "sum")])
            .rename_columns(["fold", "label", "n_docs", "n_tokens"])
        )

    stats_tbl = pa.concat_tables(
        [
            b
            for b in ds.map_batches(
                stat_partial, batch_format="pyarrow", zero_copy_batch=True
            )
            .groupby(["fold", "label"])
            .aggregate(Sum("n_docs"), Sum("n_tokens"))
            .iter_batches(batch_format="pyarrow")
        ]
    )  # ≤ k·labels rows

    # ---- shared vocab: top-V tokens by total count
    tok_totals = (
        fold_counts.groupby("token").aggregate(Sum("n")).rename_columns(["token", "tn"])
    )
    vocab = pa.concat_tables(
        [
            b
            for b in global_top_k(
                tok_totals, [("tn", "descending"), ("token", "ascending")], vocab_cap
            ).iter_batches(batch_format="pyarrow")
        ]
    ).column("token").combine_chunks()
    v_size = len(vocab)

    # ---- (k, labels, V) fold count tensor from in-vocab rows (bounded)
    def in_vocab(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_valid(pc.index_in(b.column("token"), value_set=vocab)))

    rows = pa.concat_tables(
        [
            b
            for b in fold_counts.map_batches(
                in_vocab, batch_format="pyarrow", zero_copy_batch=True
            ).iter_batches(batch_format="pyarrow")
        ]
    )
    labels = sorted(set(stats_tbl.column("label").to_pylist()))
    lab_arr = pa.array(labels, pa.string())
    n_labels = len(labels)
    fi = rows.column("fold").to_numpy(zero_copy_only=False).astype(np.int64)
    li = (
        pc.index_in(rows.column("label").combine_chunks(), value_set=lab_arr)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    ti = (
        pc.index_in(rows.column("token").combine_chunks(), value_set=vocab)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    cn = rows.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
    tensor = np.zeros((k_folds, n_labels, v_size), np.float64)
    tensor[fi, li, ti] = cn
    total_mat = tensor.sum(axis=0)  # (labels × V)

    sfi = stats_tbl.column("fold").to_numpy(zero_copy_only=False).astype(np.int64)
    sli = (
        pc.index_in(stats_tbl.column("label").combine_chunks(), value_set=lab_arr)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    sdoc = (
        pc.cast(stats_tbl.column("sum(n_docs)"), pa.int64())
        .to_numpy(zero_copy_only=False)
        .astype(np.float64)
    )
    stok = (
        pc.cast(stats_tbl.column("sum(n_tokens)"), pa.int64())
        .to_numpy(zero_copy_only=False)
        .astype(np.float64)
    )
    docs_fl = np.zeros((k_folds, n_labels), np.float64)
    toks_fl = np.zeros((k_folds, n_labels), np.float64)
    docs_fl[sfi, sli] = sdoc
    toks_fl[sfi, sli] = stok
    docs_total = docs_fl.sum(axis=0)
    toks_total = toks_fl.sum(axis=0)

    # ---- k held-out models by subtraction
    logps, floors, priors = [], [], []
    for f in range(k_folds):
        m = total_mat - tensor[f]
        nt = toks_total - toks_fl[f]
        ndc = docs_total - docs_fl[f]
        denom = (nt + float(v_size)).reshape(-1, 1)
        logps.append(np.log((m + 1.0) / denom))
        floors.append(np.log(1.0 / denom.ravel()))
        tot = ndc.sum()
        # a label absent from the training remainder gets -inf prior
        with np.errstate(divide="ignore"):
            priors.append(np.where(ndc > 0, np.log(ndc / max(tot, 1.0)), -np.inf))
    model_ref = ray.put(
        (vocab, np.stack(logps), np.stack(floors), np.stack(priors), labels)
    )

    def score(b: pa.Table) -> pa.Table:
        voc, lp, fl, pr, labs = ray.get(model_ref)
        b = b.filter(pc.is_valid(b.column(label_col)))
        empty = pa.table(
            {
                "fold": pa.array([], pa.int64()),
                "n_docs": pa.array([], pa.int64()),
                "n_correct": pa.array([], pa.int64()),
            }
        )
        n = b.num_rows
        if n == 0:
            return empty
        ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        fold = ids % k_folds
        flat, lens = _flat_tokens(b.column(text_col))
        doc_idx = np.repeat(np.arange(n), lens)
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        idx = pc.index_in(flat, value_set=voc)
        if isinstance(idx, pa.ChunkedArray):
            idx = idx.combine_chunks()
        idx_np = idx.to_numpy(zero_copy_only=False).astype(np.float64)
        hit = (~np.isnan(idx_np)) & nonempty
        miss = np.isnan(idx_np) & nonempty
        scores = pr[fold]  # (n × labels) fold-selected priors
        scores = scores.copy()
        if hit.any():
            packed = doc_idx[hit] * np.int64(len(voc)) + idx_np[hit].astype(np.int64)
            up, tf = np.unique(packed, return_counts=True)
            d = (up // len(voc)).astype(np.int64)
            t = (up % len(voc)).astype(np.int64)
            fd = fold[d]
            for j in range(len(labs)):
                np.add.at(scores[:, j], d, tf.astype(np.float64) * lp[fd, j, t])
        if miss.any():
            oov = np.bincount(doc_idx[miss], minlength=n).astype(np.float64)
            scores += oov.reshape(-1, 1) * fl[fold]
        best = np.argmax(scores, axis=1)
        true_lab = pc.cast(b.column(label_col), pa.string())
        if isinstance(true_lab, pa.ChunkedArray):
            true_lab = true_lab.combine_chunks()
        true_li = (
            pc.index_in(true_lab, value_set=pa.array(labs, pa.string()))
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        correct = (best == true_li).astype(np.int64)
        t2 = pa.table(
            {
                "fold": pa.array(fold, pa.int64()),
                "n_docs": np.ones(n, np.int64),
                "n_correct": correct,
            }
        )
        return (
            pa.TableGroupBy(t2, ["fold"])
            .aggregate([("n_docs", "sum"), ("n_correct", "sum")])
            .rename_columns(["fold", "n_docs", "n_correct"])
        )

    agg = (
        ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("fold")
        .aggregate(Sum("n_docs"), Sum("n_correct"))
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "fold": b.column("fold"),
                "n_docs": pc.cast(b.column("sum(n_docs)"), pa.int64()),
                "n_correct": pc.cast(b.column("sum(n_correct)"), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def distinctive_tokens_by_label(
    ds: "ray.data.Dataset",
    k: int = 10,
    label_col: str = "lang",
    text_col: str = "text",
    min_count: int = 2,
) -> "ray.data.Dataset":
    """Per-label top-``k`` DISTINCTIVE tokens — the feature-selection
    report over the NB sufficient statistics: score(label, token) =
    ``n_lt·T_other − n_other_t·T_l`` (the cross-multiplied comparison
    of the token's rate inside vs outside the label — positive iff
    the in-label rate is higher, integer-EXACT so the ranking is
    SQL-checkable bit-for-bit; equivalent in ordering to the rate
    ratio, no floats). Ties → token asc. ``min_count`` floors the
    in-label count (rate comparisons on 1-occurrence tokens are
    noise — the standard feature-selection support floor).

    Shape: the (label, token, n) training aggregate (one shuffle),
    one token-keyed groupby for corpus token totals, ONE hash-shuffle
    join on token to attach them (the vocabulary is never broadcast or
    driver-materialized), per-label totals broadcast as a handful of
    scalars in the closure, then the hot-key-safe grouped top-k.

    Contract: score products must fit int64 — per-label token mass ×
    corpus token mass < 2⁶³, i.e. total corpus tokens < ~3·10⁹ per
    training shard; above that, route the same pipeline through
    Python-int (object) partials or 128-bit decimals."""
    from ray.data.aggregate import Sum

    from pdf_table_extractor_ray.stages.joins import hash_shuffle_join
    from pdf_table_extractor_ray.stages.topk import grouped_top_k

    counts = nb_train_counts(ds, label_col, text_col).materialize()

    # per-token corpus totals (vocab-sized, stays distributed)
    tok_tot = (
        counts.groupby("token")
        .aggregate(Sum("n"))
        .map_batches(
            lambda b: pa.table(
                {"token": b.column("token"), "nt": pc.cast(b.column("sum(n)"), pa.int64())}
            ),
            batch_format="pyarrow",
        )
    )

    # per-label totals: bounded by the label domain — ride the closure
    lab_tot_tbl = pa.concat_tables(
        [
            b
            for b in counts.groupby("label")
            .aggregate(Sum("n"))
            .iter_batches(batch_format="pyarrow")
        ]
    )
    lab_names = lab_tot_tbl.column("label").to_pylist()
    lab_sums = (
        pc.cast(lab_tot_tbl.column("sum(n)"), pa.int64())
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    T_total = int(lab_sums.sum())
    lab_arr = pa.array(lab_names, pa.string())
    lab_T = {l: int(s) for l, s in zip(lab_names, lab_sums)}

    floored = counts.filter(
        expr=f"n >= {int(min_count)}"
    )
    joined = hash_shuffle_join(floored, tok_tot, on="token")

    def score(b: pa.Table) -> pa.Table:
        li = pc.index_in(b.column("label").combine_chunks(), value_set=lab_arr)
        Tl = np.array([lab_T[l] for l in lab_names], np.int64)[
            li.to_numpy(zero_copy_only=False).astype(np.int64)
        ]
        n_lt = b.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        nt = b.column("nt").to_numpy(zero_copy_only=False).astype(np.int64)
        n_other = nt - n_lt
        T_other = np.int64(T_total) - Tl
        s = n_lt * T_other - n_other * Tl
        return pa.table(
            {
                "label": b.column("label"),
                "token": b.column("token"),
                "n": pa.array(n_lt, pa.int64()),
                "score": pa.array(s, pa.int64()),
            }
        )

    scored = joined.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_top_k(
        scored, "label", [("score", "descending"), ("token", "ascending")], k
    )
