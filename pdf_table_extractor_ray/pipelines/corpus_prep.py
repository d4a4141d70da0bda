"""Composite training-data preparation pipeline (C4/RefinedWeb-style):

    documents
      → language ID + quality scoring            [vectorized map_batches]
      → quality filter                           [batch predicate]
      → exact dedup (md5 keeper set)             [hash groupby]
      → near dedup (MinHash-LSH keeper set)      [signature banding]
      → per-language token totals                [pre-reduced groupby]

Demonstrates the engine's stages composing into the pipeline a
100-TB pretraining corpus actually needs; every stage streams.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Sum

from pdf_table_extractor_ray.stages.dedup import (
    drop_by_ids,
    exact_dup_drop_ids,
    near_dedup_keep_ids,
)
from pdf_table_extractor_ray.stages.textstats import langid_batch, quality_batch


def prepare_corpus(
    docs: "ray.data.Dataset",
    min_quality: float = 0.3,
    min_tokens: int = 20,
) -> "ray.data.Dataset":
    """Surviving documents with (doc_id, pred_lang, quality_score,
    n_tokens) after quality filtering and exact + near dedup."""

    def annotate(batch: pa.Table) -> pa.Table:
        q = quality_batch(batch)
        lang = langid_batch(batch)
        out = batch.append_column("quality_score", q.column("quality_score"))
        out = out.append_column("n_tokens", q.column("n_tokens"))
        out = out.append_column("pred_lang", lang.column("pred_lang"))
        return out

    annotated = docs.map_batches(annotate, batch_format="pyarrow", zero_copy_batch=True)

    def keep_quality(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.greater_equal(batch.column("quality_score"), min_quality),
            pc.greater_equal(batch.column("n_tokens"), min_tokens),
        )
        return batch.filter(mask)

    filtered = annotated.map_batches(keep_quality, batch_format="pyarrow", zero_copy_batch=True)

    # exact dedup via the DROP set (bounded by duplicate count) — the
    # keeper set is ~the whole surviving corpus and must never be
    # driver-materialized; drop_by_ids escalates broadcast → anti-join
    exact_unique = drop_by_ids(filtered, exact_dup_drop_ids(filtered))
    survivors = near_dedup_keep_ids(exact_unique)
    return survivors.select_columns(["doc_id", "pred_lang", "quality_score", "n_tokens"])


def corpus_token_totals(prepared: "ray.data.Dataset") -> "ray.data.Dataset":
    """(pred_lang, n_docs, total_tokens) over the surviving corpus."""

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {"pred_lang": batch.column("pred_lang"), "n_tokens": batch.column("n_tokens")}
        )
        return (
            pa.TableGroupBy(t, ["pred_lang"])
            .aggregate([("n_tokens", "sum"), ([], "count_all")])
            .rename_columns(["pred_lang", "tokens", "docs"])
        )

    agg = (
        prepared.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("pred_lang")
        .aggregate(Sum("tokens"), Sum("docs"))
    )
    return agg.map_batches(
        lambda b: pa.Table.from_arrays(
            [
                b.column("pred_lang"),
                pc.cast(b.column("sum(docs)"), pa.int64()),
                pc.cast(b.column("sum(tokens)"), pa.int64()),
            ],
            names=["pred_lang", "n_docs", "total_tokens"],
        ),
        batch_format="pyarrow",
    )
