"""Chunk-level corpus operators over a documents table.

Operators a web-scale training-data pipeline runs between raw text
and tokenization (CCNet / Gopher / benchmark-decontamination
lineage):

- ``chunk_batch`` — explode each document into non-overlapping
  W-token chunks (the "paragraph" analog for this corpus's
  single-line documents; a <W-token tail is dropped).
- ``chunk_dedup`` — corpus-wide exact chunk dedup: keep the FIRST
  occurrence of every distinct chunk (order = (doc_id, chunk_idx))
  and reassemble each document from its surviving chunks.
  CCNet-style paragraph dedup (Wenzek et al., 2020) recast over
  fixed token windows.
- ``gopher_stats_batch`` — per-document repetition signals from the
  Gopher quality rules (Rae et al., 2021): duplicate-word fraction,
  top-word character fraction, duplicate-bigram fraction.
- ``contamination_batch`` / ``benchmark_chunk_set`` — per-document
  overlap against a broadcast benchmark chunk set (the
  benchmark-decontamination screen run before training).

Scale shape (100 TB): gopher stats and contamination are MAP-ONLY —
per-document state never leaves the batch, so the stages stream with
zero shuffle. ``chunk_dedup`` is two partition-level shuffles (by
chunk-hash bucket, then by doc-id bucket); every per-partition kernel
is vectorized numpy/Arrow over whole buckets — groups are hash
buckets, never individual chunks or documents, so there is no
per-group Python lambda at corpus cardinality. Chunk strings are
assembled with ``pc.binary_join`` over a reshaped list array (no
Python join loop).

The benchmark set handed to ``contamination_batch`` is
by-contract bounded (a benchmark suite is KBs–MBs, not corpus-scale)
and is broadcast once via ``ray.put``.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pdf_table_extractor_ray.stages.sketches import _hash64_column

CHUNK_W = 10  # tokens per chunk


def _flat_words(text_col) -> Tuple[pa.Array, np.ndarray, np.ndarray]:
    """Vectorized tokenization of a batch: one ``split_pattern_regex``
    over the column, boundary empties dropped.

    Returns ``(flat_words, parents, n_words)`` where ``flat_words`` is
    the flattened token array, ``parents[i]`` the row index of token
    ``i``, and ``n_words[d]`` the token count of row ``d``.
    """
    n_rows = len(text_col)
    if pa.types.is_null(text_col.type):  # an all-null block types as null
        text_col = pa.array([""] * n_rows, pa.string())
    else:
        text_col = pc.fill_null(text_col, "")
    lists = pc.split_pattern_regex(text_col, pattern=r"\s+")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = lists.flatten()
    parents = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    nonempty = pc.not_equal(flat, "")
    mask = nonempty.to_numpy(zero_copy_only=False)
    if not mask.all():
        flat = flat.filter(nonempty)
        parents = parents[mask]
    n_words = np.bincount(parents, minlength=n_rows).astype(np.int64)
    return flat, parents.astype(np.int64), n_words


def _chunk_arrays(batch: pa.Table, text_col: str, width: int):
    """Shared chunker: returns (doc_rep, chunk_idx, chunks) numpy/Arrow
    arrays for the batch — fully vectorized (list-array reshape +
    ``pc.binary_join``)."""
    flat, _parents, n_words = _flat_words(batch.column(text_col))
    n_docs = len(batch)
    offs = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(n_words, out=offs[1:])
    n_chunks = n_words // width
    total = int(n_chunks.sum())
    if total == 0:
        return (
            np.empty(0, np.int64),
            np.empty(0, np.int64),
            pa.array([], pa.string()),
        )
    doc_rep = np.repeat(np.arange(n_docs, dtype=np.int64), n_chunks)
    cum = np.zeros(n_docs, dtype=np.int64)
    np.cumsum(n_chunks[:-1], out=cum[1:])
    chunk_idx = np.arange(total, dtype=np.int64) - cum[doc_rep]
    starts = offs[doc_rep] + chunk_idx * width
    take_idx = (starts[:, None] + np.arange(width, dtype=np.int64)).ravel()
    values = flat.take(pa.array(take_idx))
    offsets = pa.array(np.arange(total + 1, dtype=np.int32) * width)
    chunk_lists = pa.ListArray.from_arrays(offsets, values)
    chunks = pc.binary_join(chunk_lists, " ")
    return doc_rep, chunk_idx, chunks


def chunk_batch(batch: pa.Table, text_col: str = "text", width: int = CHUNK_W) -> pa.Table:
    """Explode documents into (doc_id, chunk_idx, chunk) rows of
    non-overlapping ``width``-token chunks; a tail shorter than
    ``width`` tokens is dropped (== the SQL ``HAVING count(*)=width``
    chunking oracle)."""
    doc_rep, chunk_idx, chunks = _chunk_arrays(batch, text_col, width)
    doc_ids = batch.column("doc_id").to_numpy()[doc_rep] if len(doc_rep) else np.empty(0, np.int64)
    return pa.Table.from_arrays(
        [pa.array(doc_ids, pa.int64()), pa.array(chunk_idx, pa.int64()), chunks],
        names=["doc_id", "chunk_idx", "chunk"],
    )


def chunk_dedup(
    ds: "ray.data.Dataset",  # noqa: F821
    text_col: str = "text",
    width: int = CHUNK_W,
    num_buckets: int = 64,
) -> "ray.data.Dataset":  # noqa: F821
    """Corpus-wide exact chunk dedup with per-document reassembly.

    Plan (two partition-level shuffles, no per-chunk / per-doc groups):

    1. explode → (doc_id, chunk_idx, chunk) [map-only]
    2. bucket by crc32(chunk) % num_buckets → ``groupby(bucket)`` →
       within each bucket keep the first (doc_id, chunk_idx) occurrence
       of each distinct chunk text — vectorized ``np.lexsort`` +
       boundary mask over the whole bucket.
    3. bucket by doc_id % num_buckets → ``groupby(bucket)`` → reassemble
       ``text_dedup`` per doc with one ``pc.binary_join`` over a
       boundary-offset list array.

    Output: (doc_id, text_dedup, n_kept); documents whose every chunk
    was dropped (or that had <width tokens) are absent — matching the
    SQL oracle's GROUP BY over surviving chunks.

    At 100 TB set ``num_buckets`` ≈ cluster cores: bucket size, not
    corpus size, bounds task memory; the shuffled payload is the chunk
    text each side actually needs (ids + text, no full documents).
    """
    chunks = ds.map_batches(
        lambda b: chunk_batch(b, text_col, width),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def add_chunk_bucket(b: pa.Table) -> pa.Table:
        # vectorized FNV-1a-64 (sketches.py kernel) — bucket id only;
        # hash collisions are exact-safe, grouping is on the chunk TEXT
        h = _hash64_column(b.column("chunk"))
        return b.append_column("bucket", pa.array((h % np.uint64(num_buckets)).astype(np.int64), pa.int64()))

    def keep_first(g: pa.Table) -> pa.Table:
        ch = g.column("chunk").to_numpy(zero_copy_only=False)
        doc = g.column("doc_id").to_numpy()
        idx = g.column("chunk_idx").to_numpy()
        order = np.lexsort((idx, doc, ch))
        sorted_ch = ch[order]
        first = np.empty(len(ch), dtype=bool)
        first[0] = True
        first[1:] = sorted_ch[1:] != sorted_ch[:-1]
        keep = np.sort(order[first])
        return g.select(["doc_id", "chunk_idx", "chunk"]).take(pa.array(keep))

    kept = (
        chunks.map_batches(add_chunk_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(keep_first, batch_format="pyarrow")
    )

    def add_doc_bucket(b: pa.Table) -> pa.Table:
        doc = b.column("doc_id").to_numpy()
        return b.append_column("dbucket", pa.array(doc % num_buckets, pa.int64()))

    def reassemble(g: pa.Table) -> pa.Table:
        doc = g.column("doc_id").to_numpy()
        idx = g.column("chunk_idx").to_numpy()
        ch = g.column("chunk")
        if isinstance(ch, pa.ChunkedArray):
            ch = ch.combine_chunks()
        order = np.lexsort((idx, doc))
        sd = doc[order]
        bounds = np.empty(len(sd), dtype=bool)
        bounds[0] = True
        bounds[1:] = sd[1:] != sd[:-1]
        starts = np.flatnonzero(bounds)
        ends = np.append(starts[1:], len(sd))
        offsets = pa.array(np.append(starts, len(sd)).astype(np.int32))
        joined = pc.binary_join(
            pa.ListArray.from_arrays(offsets, ch.take(pa.array(order))), " "
        )
        return pa.Table.from_arrays(
            [
                pa.array(sd[starts], pa.int64()),
                joined,
                pa.array((ends - starts).astype(np.int64), pa.int64()),
            ],
            names=["doc_id", "text_dedup", "n_kept"],
        )

    return (
        kept.map_batches(add_doc_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("dbucket")
        .map_groups(reassemble, batch_format="pyarrow")
    )


def gopher_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-document Gopher-style repetition stats — map-only, fully
    vectorized (dictionary-encode + ``np.unique`` over (doc, code)
    pairs; no per-document Python).

    Output per doc with ≥1 token (empty docs are absent, matching the
    SQL token-explode oracle):

    - n_words, n_distinct_words
    - dup_word_frac       = (n_words − n_distinct) / n_words
    - top_word_char_frac  = chars of the most frequent word's
      occurrences / total word chars (ties → lexicographically
      smallest word)
    - dup_bigram_frac     = (n_bigrams − distinct bigrams) / n_bigrams
      (0.0 for single-word docs)

    Each fraction is ONE IEEE double division of exact int64s, so the
    values are bit-exact against the DuckDB oracle.
    """
    flat, parents, n_words = _flat_words(batch.column(text_col))
    n_docs = len(batch)
    doc_ids = batch.column("doc_id").to_numpy()

    dic = flat.dictionary_encode()
    codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = dic.dictionary
    V = len(vocab)
    if V == 0:
        return pa.Table.from_arrays(
            [pa.array([], t) for t in (pa.int64(), pa.int64(), pa.int64(), pa.float64(), pa.float64(), pa.float64())],
            names=["doc_id", "n_words", "n_distinct_words", "dup_word_frac", "top_word_char_frac", "dup_bigram_frac"],
        )

    # per-(doc, word) counts
    pair = parents * V + codes
    upair, ucnt = np.unique(pair, return_counts=True)
    udoc = upair // V
    ucode = upair % V
    n_distinct = np.bincount(udoc, minlength=n_docs).astype(np.int64)

    # rank codes by word string order for the deterministic tie-break
    vocab_np = np.asarray(vocab.to_pylist(), dtype=object)
    rank = np.empty(V, dtype=np.int64)
    rank[np.argsort(vocab_np, kind="stable")] = np.arange(V)

    order = np.lexsort((rank[ucode], -ucnt, udoc))
    sorted_doc = udoc[order]
    present = np.flatnonzero(n_words > 0)  # docs with >=1 token
    first = np.searchsorted(sorted_doc, present, side="left")
    top_idx = order[first]
    top_cnt = ucnt[top_idx].astype(np.int64)
    vocab_lens = pc.utf8_length(vocab).to_numpy(zero_copy_only=False).astype(np.int64)
    top_len = vocab_lens[ucode[top_idx]]

    word_lens = vocab_lens[codes]
    total_chars = np.bincount(parents, weights=word_lens, minlength=n_docs).astype(np.int64)

    # bigrams within a doc
    same = parents[:-1] == parents[1:]
    bparent = parents[:-1][same]
    bigram = codes[:-1][same] * V + codes[1:][same]
    tri = bparent * (V * V) + bigram
    utri = np.unique(tri)
    n_bi = np.bincount(bparent, minlength=n_docs).astype(np.int64)
    nd_bi = np.bincount(utri // (V * V), minlength=n_docs).astype(np.int64)

    nw = n_words[present].astype(np.float64)
    dup_word = (n_words[present] - n_distinct[present]).astype(np.float64) / nw
    top_char = (top_cnt * top_len).astype(np.float64) / total_chars[present].astype(np.float64)
    nb = n_bi[present]
    dup_bi = np.where(
        nb > 0,
        (nb - nd_bi[present]).astype(np.float64) / np.where(nb > 0, nb, 1).astype(np.float64),
        0.0,
    )

    return pa.Table.from_arrays(
        [
            pa.array(doc_ids[present], pa.int64()),
            pa.array(n_words[present], pa.int64()),
            pa.array(n_distinct[present], pa.int64()),
            pa.array(dup_word, pa.float64()),
            pa.array(top_char, pa.float64()),
            pa.array(dup_bi, pa.float64()),
        ],
        names=[
            "doc_id",
            "n_words",
            "n_distinct_words",
            "dup_word_frac",
            "top_word_char_frac",
            "dup_bigram_frac",
        ],
    )


def benchmark_chunk_set(
    ds: "ray.data.Dataset",  # noqa: F821
    text_col: str = "text",
    width: int = CHUNK_W,
) -> pa.Array:
    """Distinct chunks of the (by-contract small) benchmark docs —
    the broadcast side of the contamination screen. The take_all here
    is bounded by the benchmark suite's size, not the corpus."""
    chunks = ds.map_batches(
        lambda b: chunk_batch(b, text_col, width),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).select_columns(["chunk"])
    tbls = list(chunks.iter_batches(batch_format="pyarrow"))
    if not tbls:
        return pa.array([], pa.string())
    return pc.unique(pa.concat_tables(tbls).column("chunk").combine_chunks())


def contamination_batch(
    batch: pa.Table,
    bench_chunks: pa.Array,
    text_col: str = "text",
    width: int = CHUNK_W,
) -> pa.Table:
    """Per-document benchmark-overlap counts — map-only: chunk the
    batch, one vectorized ``pc.is_in`` membership probe against the
    broadcast benchmark set, bincount per doc. Docs with zero chunks
    are absent (== SQL GROUP BY over chunks)."""
    doc_rep, _chunk_idx, chunks = _chunk_arrays(batch, text_col, width)
    n_docs = len(batch)
    doc_ids = batch.column("doc_id").to_numpy()
    if len(doc_rep) == 0:
        return pa.Table.from_arrays(
            [pa.array([], pa.int64()), pa.array([], pa.int64()), pa.array([], pa.int64())],
            names=["doc_id", "n_chunks", "n_contaminated"],
        )
    hit = pc.is_in(chunks, value_set=bench_chunks).to_numpy(zero_copy_only=False)
    n_chunks = np.bincount(doc_rep, minlength=n_docs).astype(np.int64)
    n_bad = np.bincount(doc_rep[hit], minlength=n_docs).astype(np.int64)
    present = np.flatnonzero(n_chunks > 0)
    return pa.Table.from_arrays(
        [
            pa.array(doc_ids[present], pa.int64()),
            pa.array(n_chunks[present], pa.int64()),
            pa.array(n_bad[present], pa.int64()),
        ],
        names=["doc_id", "n_chunks", "n_contaminated"],
    )


def contamination_bloom_batch(
    batch: pa.Table,
    bloom_bits,
    text_col: str = "text",
    width: int = CHUNK_W,
) -> pa.Table:
    """Bloom-filter variant of ``contamination_batch`` — the shape that
    survives a benchmark set too large to broadcast verbatim: probe
    each chunk against a fixed-size bitmap instead of the exact value
    set. Zero false negatives (every contaminated chunk is counted);
    false positives can only over-count, so the screen stays safe
    (``n_contaminated_bloom >= n_contaminated`` row-wise). Same output
    schema/doc coverage as the exact screen."""
    from pdf_table_extractor_ray.stages.bloom import bloom_contains

    doc_rep, _chunk_idx, chunks = _chunk_arrays(batch, text_col, width)
    n_docs = len(batch)
    doc_ids = batch.column("doc_id").to_numpy()
    if len(doc_rep) == 0:
        return pa.Table.from_arrays(
            [pa.array([], pa.int64()), pa.array([], pa.int64()), pa.array([], pa.int64())],
            names=["doc_id", "n_chunks", "n_contaminated"],
        )
    hit = bloom_contains(chunks, bloom_bits)
    n_chunks = np.bincount(doc_rep, minlength=n_docs).astype(np.int64)
    n_bad = np.bincount(doc_rep[hit], minlength=n_docs).astype(np.int64)
    present = np.flatnonzero(n_chunks > 0)
    return pa.Table.from_arrays(
        [
            pa.array(doc_ids[present], pa.int64()),
            pa.array(n_chunks[present], pa.int64()),
            pa.array(n_bad[present], pa.int64()),
        ],
        names=["doc_id", "n_chunks", "n_contaminated"],
    )


def contamination_join(
    docs: "ray.data.Dataset",  # noqa: F821
    bench_docs: "ray.data.Dataset",  # noqa: F821
    text_col: str = "text",
    width: int = CHUNK_W,
) -> "ray.data.Dataset":
    """Distributed exact decontamination — the shape for a benchmark
    set too large even for the Bloom screen's build pass to see at
    once: NOTHING broadcasts and NOTHING reaches the driver. Both
    sides explode to (doc_id, chunk) rows; benchmark chunks are
    deduplicated with one slim groupby; a hash-shuffle LEFT SEMI join
    on the chunk string (exact — at real scale you would join on a
    64-bit chunk hash and verify strings per partition) marks the
    contaminated chunk occurrences; two (doc_id, count) groupbys and a
    left join assemble the same (doc_id, n_chunks, n_contaminated)
    rows as ``contamination_batch``. Docs with zero chunks emit no row
    (== the SQL GROUP BY oracle).

    Per-shuffle payload is one string + one int64 column — no text,
    no whole documents.
    """
    import ray.data
    from ray.data.aggregate import Count, Sum

    from pdf_table_extractor_ray.stages.joins import hash_shuffle_join

    corpus = docs.map_batches(
        lambda b: chunk_batch(b, text_col, width),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).select_columns(["doc_id", "chunk"])
    bench = (
        bench_docs.map_batches(
            lambda b: chunk_batch(b, text_col, width),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .select_columns(["chunk"])
        # per-batch unique is the combiner; the groupby makes it global
        .map_batches(
            lambda b: pa.Table.from_arrays(
                [pc.unique(b.column("chunk").combine_chunks())], names=["chunk"]
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("chunk")
        .aggregate(Count())
        # guarded projection: an EMPTY bench side makes the groupby emit
        # zero-column blocks, which the join rejects ("no match for key
        # field chunk") — re-type them to the declared (chunk: string)
        .map_batches(
            lambda b: (
                b.select(["chunk"])
                if "chunk" in b.schema.names
                else pa.Table.from_arrays([pa.array([], pa.string())], names=["chunk"])
            ),
            batch_format="pyarrow",
        )
        # sentinel row: Ray's hash-shuffle join builds a ZERO-COLUMN
        # table for a blockless right side and acero rejects the key
        # lookup. "" can never equal a real chunk (every chunk is
        # `width` non-empty tokens), so semantics are untouched.
        .union(ray.data.from_arrow(pa.Table.from_arrays([pa.array([""], pa.string())], names=["chunk"])))
    )

    names = ["doc_id", "n_chunks", "n_contaminated"]

    def tag_totals(b: pa.Table) -> pa.Table:
        t = _per_doc_chunk_counts(b, text_col, width)
        zero = pa.array(np.zeros(t.num_rows, np.int64), pa.int64())
        return pa.Table.from_arrays([t.column("doc_id"), t.column("n_chunks"), zero], names=names)

    def tag_hits(b: pa.Table) -> pa.Table:
        if "doc_id" not in b.schema.names:  # blockless-groupby empty shape
            return pa.Table.from_arrays([pa.array([], pa.int64())] * 3, names=names)
        zero = pa.array(np.zeros(b.num_rows, np.int64), pa.int64())
        return pa.Table.from_arrays(
            [b.column("doc_id"), zero, pc.cast(b.column("count()"), pa.int64())], names=names
        )

    totals = docs.map_batches(tag_totals, batch_format="pyarrow", zero_copy_batch=True)
    hits = (
        hash_shuffle_join(corpus, bench, on="chunk", how="left_semi")
        .groupby("doc_id")
        .aggregate(Count())
        .map_batches(tag_hits, batch_format="pyarrow")
    )
    # union + ONE slim groupby instead of a second join: both legs emit
    # (doc_id, n_chunks, n_contaminated) with the other column zeroed,
    # so a sum per doc_id assembles the row — no empty-side join shapes
    merged = (
        totals.union(hits)
        .groupby("doc_id")
        .aggregate(Sum("n_chunks"), Sum("n_contaminated"))
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                b.column("doc_id"),
                pc.cast(b.column("sum(n_chunks)"), pa.int64()),
                pc.cast(b.column("sum(n_contaminated)"), pa.int64()),
            ],
            names=names,
        )

    return merged.map_batches(finish, batch_format="pyarrow")


def _per_doc_chunk_counts(batch: pa.Table, text_col: str, width: int) -> pa.Table:
    """(doc_id, n_chunks) per document — computed MAP-SIDE (one doc's
    chunks never span batches), so the totals leg of the join screen
    ships one int per doc instead of one row per chunk."""
    doc_rep, _idx, _chunks = _chunk_arrays(batch, text_col, width)
    n_docs = len(batch)
    n_chunks = np.bincount(doc_rep, minlength=n_docs).astype(np.int64) if len(doc_rep) else np.zeros(n_docs, np.int64)
    present = np.flatnonzero(n_chunks > 0)
    doc_ids = batch.column("doc_id").to_numpy()
    return pa.Table.from_arrays(
        [pa.array(doc_ids[present], pa.int64()), pa.array(n_chunks[present], pa.int64())],
        names=["doc_id", "n_chunks"],
    )
