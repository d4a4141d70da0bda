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
