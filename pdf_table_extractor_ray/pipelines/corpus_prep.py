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


def prepare_corpus_v2(
    docs: "ray.data.Dataset",
    bench_modulus: int = 41,
    max_dup_word_frac: float = 0.95,
    max_contamination_frac: float = 0.5,
) -> "ray.data.Dataset":
    """Round-3 composite (Gopher → decontaminate → chunk-dedup):

        documents
          → Gopher repetition filter              [map-only stats + predicate]
          → benchmark-contamination screen        [broadcast set + map-only]
          → corpus-wide chunk dedup + reassembly  [2 bucket shuffles]

    Returns (doc_id, text_dedup, n_kept). The benchmark stand-in is
    the doc_id % bench_modulus == 0 subset (those docs are dropped
    outright, as a real decontamination pass drops eval documents).
    Everything before the chunk-dedup shuffle streams map-only.
    """
    import numpy as np

    from pdf_table_extractor_ray.stages.chunks import (
        benchmark_chunk_set,
        chunk_dedup,
        contamination_batch,
        gopher_stats_batch,
    )

    def is_bench(batch: pa.Table) -> pa.Table:
        doc = batch.column("doc_id").to_numpy()
        return batch.filter(pa.array(doc % bench_modulus == 0))

    bench = benchmark_chunk_set(
        docs.map_batches(is_bench, batch_format="pyarrow", zero_copy_batch=True)
    )
    bench_ref = ray.put(bench)

    def keep(batch: pa.Table) -> pa.Table:
        doc = batch.column("doc_id").to_numpy()
        g = gopher_stats_batch(batch)
        # align per-doc stats back to batch rows (docs with no tokens
        # are absent from g → fail the repetition gate by default)
        batch_doc_arr = pa.array(doc)
        dup = np.ones(len(batch), np.float64)
        idx = pc.index_in(
            g.column("doc_id").combine_chunks(), value_set=batch_doc_arr
        ).to_numpy(zero_copy_only=False)
        dup[idx.astype(np.int64)] = g.column("dup_word_frac").to_numpy()
        c = contamination_batch(batch, ray.get(bench_ref))
        contam = np.ones(len(batch), np.float64)
        cidx = pc.index_in(
            c.column("doc_id").combine_chunks(), value_set=batch_doc_arr
        ).to_numpy(zero_copy_only=False)
        n_chunks = c.column("n_chunks").to_numpy().astype(np.float64)
        n_bad = c.column("n_contaminated").to_numpy().astype(np.float64)
        contam[cidx.astype(np.int64)] = np.where(n_chunks > 0, n_bad / np.where(n_chunks > 0, n_chunks, 1), 1.0)
        mask = (
            (dup <= max_dup_word_frac)
            & (contam <= max_contamination_frac)
            & (doc % bench_modulus != 0)
        )
        return batch.filter(pa.array(mask))

    clean = docs.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
    return chunk_dedup(clean)


def corpus_v2_totals(prepared: "ray.data.Dataset") -> "ray.data.Dataset":
    """One-row summary: (n_docs, total_chunks_kept)."""

    def partial(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_docs": pa.array([batch.num_rows], pa.int64()),
                "total_chunks_kept": pa.array(
                    [int(pc.sum(batch.column("n_kept")).as_py() or 0)], pa.int64()
                ),
            }
        )

    sums = prepared.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).sum(
        ["n_docs", "total_chunks_kept"]
    )
    return ray.data.from_items(
        [
            {
                "n_docs": int(sums["sum(n_docs)"]),
                "total_chunks_kept": int(sums["sum(total_chunks_kept)"]),
            }
        ]
    )


def prepare_corpus_v3(
    docs: "ray.data.Dataset",
    max_entropy_drop_milli: int = 500,
    max_compression_ratio_milli: int = 200,
    **v2_kwargs,
) -> "ray.data.Dataset":
    """Round-4 composite: the v2 pipeline (Gopher → decontaminate →
    chunk-dedup) preceded by the two one-number repetitiveness gates —
    unigram-entropy (milli-nats; near-zero ⇒ one token dominates) and
    zlib compression ratio (milli; templated filler compresses far
    below prose). Both gates are map-only, so they run BEFORE any
    shuffle and cut the dedup's input. Returns v2's
    (doc_id, text_dedup, n_kept)."""
    from pdf_table_extractor_ray.stages.textstats import (
        compression_ratio_batch,
        token_entropy_batch,
    )

    def gate(batch: pa.Table) -> pa.Table:
        ent = token_entropy_batch(batch)
        cr = compression_ratio_batch(batch)
        e = ent.column("entropy_milli").to_numpy(zero_copy_only=False)
        r = cr.column("ratio_milli").to_numpy(zero_copy_only=False)
        keep = (e >= max_entropy_drop_milli) & (r >= max_compression_ratio_milli)
        return batch.filter(pa.array(keep))

    gated = docs.map_batches(gate, batch_format="pyarrow", zero_copy_batch=True)
    return prepare_corpus_v2(gated, **v2_kwargs)


def prepare_corpus_v4(
    docs: "ray.data.Dataset",
    vocab_cap: int = 65_536,
    **v3_kwargs,
) -> "ray.data.Dataset":
    """Round-4 composite with a TRAINED-MODEL gate: the corpus first
    trains the Naive-Bayes language classifier on its own (lang, text)
    labels (one distributed count aggregation,
    stages/classifier.py:nb_train_counts), then drops every document
    whose predicted language disagrees with its label — the standard
    "label-consistency" curation step that catches mislabeled or
    code-switched pages before they pollute per-language training
    mixes. The survivor stream then runs the v3 pipeline (entropy +
    compression gates → Gopher → decontaminate → chunk-dedup).

    Training = two aggregations; the gate itself is MAP-ONLY (model
    broadcast once, argmax per batch), so everything before the
    chunk-dedup shuffle still streams. Requires ``lang`` + ``doc_id``
    + ``text`` columns; returns v2's (doc_id, text_dedup, n_kept)."""
    import pyarrow.compute as pc

    from pdf_table_extractor_ray.stages.classifier import (
        nb_label_stats,
        nb_predict,
        nb_train_counts,
    )

    counts = nb_train_counts(docs, "lang", "text").materialize()
    stats = pa.concat_tables(
        [
            b
            for b in nb_label_stats(docs, "lang", "text").iter_batches(
                batch_format="pyarrow"
            )
        ]
    )
    pred = nb_predict(
        docs,
        counts,
        stats,
        vocab_cap=vocab_cap,
        passthrough_cols=("lang", "text"),
    )

    def keep_consistent(b: pa.Table) -> pa.Table:
        ok = pc.equal(b.column("pred_label"), pc.cast(b.column("lang"), pa.string()))
        kept = b.filter(pc.fill_null(ok, False))
        return kept.select(["doc_id", "text"])

    gated = pred.map_batches(
        keep_consistent, batch_format="pyarrow", zero_copy_batch=True
    )
    return prepare_corpus_v3(gated, **v3_kwargs)


def prepare_corpus_v5(
    docs: "ray.data.Dataset",
    key_col: str = "source",
    min_share: float = 0.5,
    min_count: int = 3,
    **v4_kwargs,
) -> "ray.data.Dataset":
    """Round-4 composite with a corpus-level TEMPLATE-STRIP front
    stage: cross-page frequent lines per key (nav/footer/legal blocks
    a site stamps on every page — the signal per-page heuristics
    cannot see, stages/templates.py) are mined with one slim
    (key, line) groupby-Sum and stripped by a broadcast hash-set actor
    stage, THEN the v4 pipeline runs (NB label-consistency gate →
    entropy + compression gates → Gopher → decontaminate →
    chunk-dedup). Stripping first matters: template lines otherwise
    depress per-doc entropy/quality scores and create spurious
    cross-doc duplicate chunks.

    Requires ``doc_id`` + ``lang`` + ``text`` + the key column;
    returns v2's (doc_id, text_dedup, n_kept) summary stream."""
    from pdf_table_extractor_ray.stages.templates import (
        mine_template_lines,
        strip_template_lines,
    )

    # the corpus is consumed TWICE (mine, then strip) — by re-executing
    # the upstream plan, NOT by materializing: pinning the whole corpus
    # in the object store to save one re-scan is exactly the
    # O(corpus)-resident anti-pattern this repo avoids (inputs are
    # parquet scans; re-reading is cheaper than spilling 100 TB)
    pages = docs
    mined = mine_template_lines(
        pages, key_col, text_col="text", min_share=min_share, min_count=min_count
    )
    # template set is bounded by construction (a line must recur on
    # ≥ min_share of a key's pages) — driver-materialized broadcast
    template = pa.Table.from_pylist(
        mined.take_all(),
        schema=pa.schema(
            [("key", pa.string()), ("line", pa.string()),
             ("n_docs", pa.int64()), ("n_docs_key", pa.int64())]
        ),
    ).select(["key", "line"])
    stripped = strip_template_lines(pages, template, key_col, text_col="text")
    return prepare_corpus_v4(
        stripped.drop_columns(["n_template_lines"]), **v4_kwargs
    )


def prepare_corpus_v6(
    docs: "ray.data.Dataset",
    blocklist_categories=None,
    blocklist_max_hits: int = 3,
    **v5_kwargs,
) -> "ray.data.Dataset":
    """Round-4 composite with the INGEST-HARDENING front stages:

    1. **Mojibake repair** (functions/charset.py) — a latin-1/utf-8
       double-decoded re-crawl of a clean page hashes DIFFERENTLY from
       its original, so broken encodings defeat exact and chunk dedup
       and leak duplicates through every downstream gate; repairing
       first restores hash equality (pinned in pytest: a mojibake
       re-crawl dedups away under v6 where v5 keeps both copies).
    2. **Blocklist admission** (stages/blocklists.py) — the UT1-style
       category word-list gate drops flagged pages BEFORE any
       expensive stage (template mining, NB training, dedup shuffles
       never see them).

    Both stages are map-only; then the v5 pipeline runs (template
    strip → NB label gate → entropy/compression → Gopher →
    decontaminate → chunk-dedup). Returns v2's summary stream."""
    from pdf_table_extractor_ray.functions.charset import repair_mojibake
    from pdf_table_extractor_ray.stages.blocklists import blocklist_admit

    repaired = repair_mojibake(docs)

    def drop_flag(b: pa.Table) -> pa.Table:
        return b.drop_columns(["was_broken"])

    repaired = repaired.map_batches(
        drop_flag, batch_format="pyarrow", zero_copy_batch=True
    )
    if blocklist_categories:
        repaired = blocklist_admit(
            repaired, blocklist_categories, max_hits=blocklist_max_hits
        )
    return prepare_corpus_v5(repaired, **v5_kwargs)
