"""Duplicated-substring span statistics (ExactSubstr-flavored dedup).

Marks every token covered by an n-token shingle that occurs >= 2 times
anywhere in the corpus (including twice within one document) and
reports, per document, how many token positions are covered by at
least one duplicated shingle — the distributed n-gram approximation of
suffix-array ExactSubstr dedup (Lee et al., "Deduplicating Training
Data Makes Language Models Better", ACL 2022). The reference repo has
no corpus-level ops at all (SURVEY §2.6 "absent in the reference");
this is an engine-only training-data operator.

Scale shape:
- shingles travel as two independent 64-bit hash lanes + (doc_id, pos)
  — the text itself is never shuffled;
- BOTH wide steps are bucket-level ``groupby().map_groups`` with
  vectorized within-bucket math (the house pattern from sessions.py —
  never per-key Python): duplicate detection is one lexsort +
  run-length pass per hash bucket; span coverage (interval union with
  fixed width n) is one lexsort + ``np.add.reduceat`` per doc bucket.
- A false duplicate needs BOTH lanes (FNV-1a and FNV-1, computed in a
  single byte-position sweep) to collide on distinct shingles —
  ~2^-128 per pair — the standard trade for not shipping gram strings.

Tokenization contract: ``text.split(' ')`` semantics (single-space
split, empty tokens preserved), bit-compatible with DuckDB
``string_split(text, ' ')`` so the whole operator is SQL-verifiable.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)
# odd multipliers for the positional shingle combine (splitmix64 / xxh3
# mix constants — any odd 64-bit constants work, one per lane)
_MIX1 = np.uint64(0x9E3779B97F4A7C15)
_MIX2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _dual_hash(arr: pa.Array) -> Tuple[np.ndarray, np.ndarray]:
    """FNV-1a (lane 1) and FNV-1 (lane 2) over a string/binary Arrow
    array in ONE numpy pass per byte *position* (bounded by the longest
    token), never per row. Two genuinely independent recurrences: a
    lane-1 collision does not imply a lane-2 collision."""
    arr = pc.cast(arr, pa.large_binary())
    n = len(arr)
    offsets = np.frombuffer(arr.buffers()[1], np.int64)[arr.offset : arr.offset + n + 1]
    starts, lens = offsets[:-1], np.diff(offsets)
    data = np.frombuffer(arr.buffers()[2], np.uint8)
    h1 = np.full(n, _FNV_OFFSET, np.uint64)
    h2 = np.full(n, _FNV_OFFSET, np.uint64)
    for pos in range(int(lens.max()) if n else 0):
        act = lens > pos
        b = data[starts[act] + pos].astype(np.uint64)
        h1[act] = (h1[act] ^ b) * _FNV_PRIME  # FNV-1a: xor then multiply
        h2[act] = (h2[act] * _FNV_PRIME) ^ b  # FNV-1:  multiply then xor
    return h1, h2


def _empty_shingles() -> pa.Table:
    i64 = pa.array([], pa.int64())
    return pa.Table.from_arrays(
        [i64, i64, i64, i64, i64], names=["bucket", "h1", "h2", "doc_id", "pos"]
    )


def shingle_emitter(text_col: str, id_col: str, n: int, n_buckets: int):
    """Batch fn: documents → one row per n-token shingle start:
    (bucket, h1, h2, doc_id, pos). Fully vectorized — tokenize with one
    Arrow ``split_pattern`` kernel, hash the flattened token array once,
    then combine n shifted lanes per gram (n numpy ops, not a loop over
    rows)."""

    def emit(b: pa.Table) -> pa.Table:
        texts = b.column(text_col)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = pc.fill_null(texts, "")
        toks = pc.split_pattern(texts, pattern=" ")
        counts = pc.list_value_length(toks).to_numpy().astype(np.int64)
        flat = toks.flatten()
        total = int(counts.sum())
        if total < n:
            return _empty_shingles()
        t1, t2 = _dual_hash(flat)
        m = total - n + 1  # candidate starts in flattened token space
        g1 = t1[:m].copy()
        g2 = t2[:m].copy()
        for j in range(1, n):
            g1 = (g1 * _MIX1) ^ t1[j : m + j]
            g2 = (g2 * _MIX2) ^ t2[j : m + j]
        doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        valid = doc_idx[:m] == doc_idx[n - 1 :]  # window must not cross a doc
        starts_flat = np.nonzero(valid)[0]
        if not len(starts_flat):
            return _empty_shingles()
        doc_offsets = np.concatenate([[0], np.cumsum(counts)])
        which_doc = doc_idx[starts_flat]
        pos = starts_flat - doc_offsets[which_doc]
        doc_ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_arrays(
            [
                pa.array((g1[starts_flat] % np.uint64(n_buckets)).astype(np.int64)),
                pa.array(g1[starts_flat].view(np.int64)),
                pa.array(g2[starts_flat].view(np.int64)),
                pa.array(doc_ids[which_doc]),
                pa.array(pos.astype(np.int64)),
            ],
            names=["bucket", "h1", "h2", "doc_id", "pos"],
        )

    return emit


def _dup_rows(n_buckets: int, emit: str = "all"):
    """Per hash-bucket: the (doc_id, pos) rows whose (h1, h2) shingle
    occurs >= 2 times in the whole corpus. One lexsort + one
    run-length pass; the group is a hash bucket, never a Python-level
    per-shingle group. ``emit="noncanonical"`` drops each duplicated
    shingle's canonical occurrence — its min (doc_id, pos) — so span
    REMOVAL keeps exactly one copy (the ExactSubstr retention rule)."""

    def dups(g: pa.Table) -> pa.Table:
        h1 = g.column("h1").to_numpy(zero_copy_only=False)
        h2 = g.column("h2").to_numpy(zero_copy_only=False)
        doc_id = g.column("doc_id").to_numpy(zero_copy_only=False)
        pos = g.column("pos").to_numpy(zero_copy_only=False)
        # sort by (h1, h2, doc_id, pos): run head = canonical occurrence
        order = np.lexsort((pos, doc_id, h2, h1))
        s1, s2 = h1[order], h2[order]
        new = np.empty(len(s1), bool)
        new[0] = True
        new[1:] = (s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1])
        grp = np.cumsum(new) - 1
        cnt = np.bincount(grp)
        dup = cnt[grp] >= 2
        if emit == "noncanonical":
            dup &= ~new  # drop each run's head (the kept copy)
        keep = order[dup]
        d = doc_id[keep]
        return pa.Table.from_arrays(
            [pa.array(d), pa.array(pos[keep]), pa.array(d % np.int64(n_buckets))],
            names=["doc_id", "pos", "dbucket"],
        )

    return dups


def _span_union(d: np.ndarray, p: np.ndarray, n: int):
    """Sorted-diff interval union of fixed-width [pos, pos+n-1] spans:
    row i contributes min(n, next_pos - pos) tokens (n for the last
    span of a doc); summed per doc with ``np.add.reduceat``. Returns
    (doc_ids, covered_counts) for docs with >= 1 span."""
    if not len(d):
        return d.astype(np.int64), p.astype(np.int64)
    order = np.lexsort((p, d))
    d, p = d[order], p[order]
    same = d[1:] == d[:-1]
    contrib = np.concatenate(
        [np.where(same, np.minimum(p[1:] - p[:-1], n), n), [n]]
    ).astype(np.int64)
    run_starts = np.nonzero(np.concatenate([[True], d[1:] != d[:-1]]))[0]
    return d[run_starts], np.add.reduceat(contrib, run_starts)


def _coverage(n: int):
    """Per doc-bucket span-union coverage. Rows with pos < 0 are
    roster sentinels (one per document, injected upstream so zero-dup
    documents still produce an output row WITHOUT a corpus-wide join
    against the id table — the sentinel rides the same doc-bucket
    shuffle the coverage rows already pay for). When no sentinels are
    present (bare operator use) only covered docs are emitted."""

    def cover(g: pa.Table) -> pa.Table:
        d = g.column("doc_id").to_numpy(zero_copy_only=False)
        p = g.column("pos").to_numpy(zero_copy_only=False)
        real = p >= 0
        docs_with, sums = _span_union(d[real], p[real], n)
        roster = np.unique(d[~real])
        if not len(roster):  # bare use: covered docs only
            return pa.Table.from_arrays(
                [pa.array(docs_with), pa.array(sums)],
                names=["doc_id", "dup_tokens"],
            )
        out = np.zeros(len(roster), np.int64)
        out[np.searchsorted(roster, docs_with)] = sums
        return pa.Table.from_arrays(
            [pa.array(roster), pa.array(out)], names=["doc_id", "dup_tokens"]
        )

    return cover


def dup_span_stats(
    docs: "ray.data.Dataset",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    n_buckets: int = 256,
    ids: "ray.data.Dataset | None" = None,
) -> "ray.data.Dataset":
    """(doc_id, dup_tokens) per document. With ``ids`` (a one-column
    id roster, e.g. a pruned re-read of the id column): EVERY document
    appears, zero-dup docs as dup_tokens=0 — the roster rides the
    doc-bucket shuffle as one sentinel row per doc (pos=-1), which is
    strictly cheaper than a hash join against the id table (measured:
    the join plan spent its wall time on aggregator-actor startup, not
    data). Without ``ids``, only covered docs are emitted. Two bucket
    shuffles total, both over slim int64 rows."""
    shingles = docs.map_batches(
        shingle_emitter(text_col, id_col, n, n_buckets),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    marked = shingles.groupby("bucket").map_groups(
        _dup_rows(n_buckets), batch_format="pyarrow"
    )
    if ids is not None:

        def sentinels(b: pa.Table) -> pa.Table:
            d = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.Table.from_arrays(
                [
                    pa.array(d),
                    pa.array(np.full(len(d), -1, np.int64)),
                    pa.array(d % np.int64(n_buckets)),
                ],
                names=["doc_id", "pos", "dbucket"],
            )

        marked = marked.union(
            ids.map_batches(sentinels, batch_format="pyarrow", zero_copy_batch=True)
        )
    return marked.groupby("dbucket").map_groups(_coverage(n), batch_format="pyarrow")


def _clean_kernel(n: int):
    """Per doc-bucket: rebuild each document's text with every token
    covered by a non-canonical duplicated-shingle occurrence removed.
    Rows with pos < 0 carry the document text (one per doc, injected
    upstream — same sentinel-rides-the-shuffle trick as dup_span_stats,
    here with the text payload); pos >= 0 rows mark removal spans.
    Fully vectorized: one Arrow split over the bucket's texts, one
    difference-array cumsum for interval union, one filtered
    binary_join for reassembly."""

    def clean(g: pa.Table) -> pa.Table:
        pos = g.column("pos").to_numpy(zero_copy_only=False)
        doc = g.column("doc_id").to_numpy(zero_copy_only=False)
        is_text = pos < 0
        tdoc = doc[is_text]
        order = np.argsort(tdoc)
        tdoc = tdoc[order]
        texts = g.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = texts.filter(pa.array(is_text)).take(pa.array(order))
        toks = pc.split_pattern(pc.fill_null(texts, ""), pattern=" ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        offs = np.concatenate([[0], np.cumsum(lens)])
        md, mp = doc[~is_text], pos[~is_text]
        di = np.searchsorted(tdoc, md)  # one text row per doc by contract
        start = offs[di] + mp
        end = offs[di] + np.minimum(mp + n, lens[di])
        delta = np.zeros(int(offs[-1]) + 1, np.int64)
        np.add.at(delta, start, 1)
        np.add.at(delta, end, -1)
        keep = np.cumsum(delta[:-1]) <= 0
        cum = np.concatenate([[0], np.cumsum(keep)])
        kept_counts = cum[offs[1:]] - cum[offs[:-1]]
        kept_flat = toks.flatten().filter(pa.array(keep))
        kept_lists = pa.LargeListArray.from_arrays(
            pa.array(np.concatenate([[0], np.cumsum(kept_counts)]), pa.int64()),
            pc.cast(kept_flat, pa.large_string()),
        )
        return pa.Table.from_arrays(
            [
                pa.array(tdoc),
                pc.cast(
                    pc.binary_join(kept_lists, pa.scalar(" ", pa.large_string())),
                    pa.string(),
                ),
                pa.array((lens - kept_counts).astype(np.int64)),
            ],
            names=["doc_id", "text_clean", "n_removed"],
        )

    return clean


def dup_span_clean(
    docs: "ray.data.Dataset",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    n_buckets: int = 256,
) -> "ray.data.Dataset":
    """ExactSubstr-style span REMOVAL: every token covered by a
    duplicated n-token shingle occurrence OTHER than the shingle's
    canonical (min (doc_id, pos)) occurrence is dropped, and each
    document's text is rebuilt from the surviving tokens — so exactly
    one copy of each duplicated run survives corpus-wide. Returns
    (doc_id, text_clean, n_removed) for EVERY document. Two bucket
    shuffles; the second carries each doc's text once (the reassembly
    payload, as chunk_dedup does) plus slim mark rows."""
    shingles = docs.map_batches(
        shingle_emitter(text_col, id_col, n, n_buckets),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    marked = shingles.groupby("bucket").map_groups(
        _dup_rows(n_buckets, emit="noncanonical"), batch_format="pyarrow"
    )

    def as_mark_rows(b: pa.Table) -> pa.Table:
        return b.append_column("text", pa.nulls(b.num_rows, pa.string()))

    def as_text_rows(b: pa.Table) -> pa.Table:
        d = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        t = b.column(text_col)
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        return pa.Table.from_arrays(
            [
                pa.array(d),
                pa.array(np.full(len(d), -1, np.int64)),
                pa.array(d % np.int64(n_buckets)),
                pc.cast(t, pa.string()),
            ],
            names=["doc_id", "pos", "dbucket", "text"],
        )

    payload = marked.map_batches(as_mark_rows, batch_format="pyarrow").union(
        docs.map_batches(as_text_rows, batch_format="pyarrow", zero_copy_batch=True)
    )
    return payload.groupby("dbucket").map_groups(
        _clean_kernel(n), batch_format="pyarrow"
    )
