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


