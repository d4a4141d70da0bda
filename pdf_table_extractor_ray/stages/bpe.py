"""Distributed BPE tokenizer training (Sennrich-style merge learning).

Learns byte-pair-encoding merges over a corpus the way a training-data
pipeline would need at 100 TB: word counting is one corpus shuffle;
every merge iteration then runs over the DISTINCT-WORD table only
(vocab-bounded, materialized between iterations by contract), with
pair statistics pre-reduced per batch and combined by one small
groupby-Sum. Symbols are integers end to end — initial symbol id =
Unicode codepoint, the end-of-word marker sits just above the Unicode
range, and each merge mints the next id — so the hot kernels are pure
numpy over flattened int64 arrays + list offsets (no Python loop over
words, no string churn in the data plane). Only the tiny merge table
(one row per learned merge) ever lands on the driver.

Reference: Sennrich, Haddow & Birch, "Neural Machine Translation of
Rare Words with Subword Units" (ACL 2016) — the word-frequency
formulation of BPE learning. The reference repo has no tokenizer
machinery at all; this is an engine-only training-data operator.

Determinism contract (shared with the pytest oracle): the winning pair
each round is max by (count DESC, pair_key ASC) where
pair_key = left_id * 2^22 + right_id.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Sum

END_ID = 0x110000  # one past the Unicode range: the '</w>' marker
FIRST_MERGE_ID = END_ID + 1
_SHIFT = np.int64(1) << np.int64(22)  # ids < 2^22 for any sane n_merges


def word_count_table(
    docs: "ray.data.Dataset", text_col: str = "text"
) -> "ray.data.Dataset":
    """(word, n) over whitespace tokens — per-batch Arrow pre-count,
    then one groupby-Sum shuffle of (word, partial) rows."""

    def partial(b: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern_regex(
            pc.fill_null(b.column(text_col), ""), pattern=r"\s+"
        ))
        toks = toks.filter(pc.greater(pc.utf8_length(toks), 0))
        t = pa.Table.from_arrays([toks], names=["word"])
        g = t.group_by("word").aggregate([("word", "count")])
        return pa.Table.from_arrays(
            [g.column("word"), pc.cast(g.column("word_count"), pa.int64())],
            names=["word", "n_part"],
        )

    agg = (
        docs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("word")
        .aggregate(Sum("n_part"))
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [b.column("word"), pc.cast(b.column("sum(n_part)"), pa.int64())],
            names=["word", "n"],
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def _symbolize(b: pa.Table) -> pa.Table:
    """word → list<int64> of codepoints + END_ID. One utf-32 decode of
    the joined batch, then pure index arithmetic."""
    words = b.column("word")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    py_words = words.to_pylist()
    lens = pc.utf8_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
    cps = np.frombuffer("".join(py_words).encode("utf-32-le"), np.uint32).astype(np.int64)
    out_counts = lens + 1
    out_offsets = np.concatenate([[0], np.cumsum(out_counts)])
    flat = np.empty(int(out_offsets[-1]), np.int64)
    char_offsets = np.concatenate([[0], np.cumsum(lens)])
    word_idx = np.repeat(np.arange(len(lens)), lens)
    char_pos = np.arange(len(cps)) - char_offsets[word_idx]
    flat[out_offsets[:-1][word_idx] + char_pos] = cps
    flat[out_offsets[:-1] + lens] = END_ID
    syms = pa.LargeListArray.from_arrays(pa.array(out_offsets, pa.int64()), pa.array(flat))
    return pa.Table.from_arrays([syms, b.column("n")], names=["syms", "n"])


def _flat_view(b: pa.Table):
    syms = b.column("syms")
    if isinstance(syms, pa.ChunkedArray):
        syms = syms.combine_chunks()
    flat = syms.flatten().to_numpy(zero_copy_only=False)
    counts = pc.list_value_length(syms).to_numpy(zero_copy_only=False).astype(np.int64)
    return syms, flat, counts


def _pair_partial(b: pa.Table) -> pa.Table:
    """Per-batch weighted adjacent-pair counts: (pair_key, cnt)."""
    _, flat, counts = _flat_view(b)
    n = b.column("n").to_numpy(zero_copy_only=False)
    if len(flat) < 2:
        i64 = pa.array([], pa.int64())
        return pa.Table.from_arrays([i64, i64], names=["pair_key", "cnt"])
    word_idx = np.repeat(np.arange(len(counts)), counts)
    same = word_idx[:-1] == word_idx[1:]
    keys = flat[:-1][same] * _SHIFT + flat[1:][same]
    w = n[word_idx[:-1][same]]
    uniq, inv = np.unique(keys, return_inverse=True)
    sums = np.zeros(len(uniq), np.int64)
    np.add.at(sums, inv, w)
    return pa.Table.from_arrays(
        [pa.array(uniq), pa.array(sums)], names=["pair_key", "cnt"]
    )


def _apply_merge(left: int, right: int, new_id: int):
    """Replace every leftmost-non-overlapping (left,right) adjacency
    with new_id. Overlap (only possible when left == right) resolves by
    run parity — positions 0,2,4… of each run of consecutive
    candidates — matching sequential left-to-right greedy merging."""

    def apply(b: pa.Table) -> pa.Table:
        _, flat, counts = _flat_view(b)
        if len(flat) < 2:
            return b
        word_idx = np.repeat(np.arange(len(counts)), counts)
        cand = np.zeros(len(flat), bool)
        cand[:-1] = (
            (flat[:-1] == left) & (flat[1:] == right) & (word_idx[:-1] == word_idx[1:])
        )
        if not cand.any():
            return b
        run_start = cand & ~np.concatenate([[False], cand[:-1]])
        pos = np.arange(len(flat))
        pos_in_run = pos - np.maximum.accumulate(np.where(run_start, pos, 0))
        taken = cand & (pos_in_run % 2 == 0)
        new_flat = np.where(taken, np.int64(new_id), flat)
        drop = np.concatenate([[False], taken[:-1]])  # the absorbed right symbol
        new_flat = new_flat[~drop]
        removed = np.bincount(word_idx[taken], minlength=len(counts))
        new_counts = counts - removed
        offsets = np.concatenate([[0], np.cumsum(new_counts)])
        syms = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()), pa.array(new_flat)
        )
        return pa.Table.from_arrays([syms, b.column("n")], names=["syms", "n"])

    return apply


def _best_pair(pairs: "ray.data.Dataset"):
    """Global argmax by (cnt DESC, pair_key ASC) via per-batch top-1
    partials merged on the driver (tiny)."""

    def top1(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        idx = pc.sort_indices(
            b, sort_keys=[("cnt", "descending"), ("pair_key", "ascending")]
        )
        return b.take(idx.slice(0, 1))

    parts = pairs.map_batches(top1, batch_format="pyarrow").take_all()
    if not parts:
        return None
    best = min(parts, key=lambda r: (-r["cnt"], r["pair_key"]))
    return int(best["pair_key"]), int(best["cnt"])


def _sym_str(sym: int, parts: dict) -> str:
    if sym == END_ID:
        return "</w>"
    if sym < END_ID:
        return chr(sym)
    left, right = parts[sym]
    return _sym_str(left, parts) + _sym_str(right, parts)


def learn_bpe(
    docs: "ray.data.Dataset",
    n_merges: int = 10,
    text_col: str = "text",
    words: Optional["ray.data.Dataset"] = None,
) -> List[dict]:
    """Learn ``n_merges`` BPE merges; returns one record per merge:
    {rank, left, right, pair, pair_count} with human-readable symbol
    strings. Each iteration: pair partials (map) → groupby-Sum over
    the pair-key space → driver top-1 → vectorized merge application →
    materialize the (vocab-bounded by contract) word table."""
    if words is None:
        words = word_count_table(docs, text_col)
    ws = words.map_batches(
        _symbolize, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    # right-size the iterated table: the word-count shuffle hands back
    # one block per hash partition regardless of vocab size, and every
    # merge round pays per-block task overhead × iterations. ~64k words
    # per block; a 10^9-word vocab keeps thousands of blocks, a tiny
    # one collapses to 1.
    n_blocks = max(1, min(ws.num_blocks(), ws.count() // 65536 + 1))
    if n_blocks < ws.num_blocks():
        ws = ws.repartition(n_blocks).materialize()

    merges: List[dict] = []
    parts: dict = {}
    for rank in range(n_merges):
        pair_partials = ws.map_batches(
            _pair_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        agg = pair_partials.groupby("pair_key").aggregate(Sum("cnt"))

        def rename(b: pa.Table) -> pa.Table:
            return pa.Table.from_arrays(
                [b.column("pair_key"), pc.cast(b.column("sum(cnt)"), pa.int64())],
                names=["pair_key", "cnt"],
            )

        best = _best_pair(agg.map_batches(rename, batch_format="pyarrow"))
        if best is None or best[1] < 2:  # nothing repeats: stop early
            break
        key, cnt = best
        left, right = key // int(_SHIFT), key % int(_SHIFT)
        new_id = FIRST_MERGE_ID + rank
        parts[new_id] = (left, right)
        merges.append(
            {
                "rank": rank,
                "left": _sym_str(left, parts),
                "right": _sym_str(right, parts),
                "pair": _sym_str(new_id, parts),
                "pair_count": cnt,
                # integer form, for applying the ladder (BpeEncoder);
                # bpe_merge_table's explicit schema drops these keys
                "left_id": left,
                "right_id": right,
                "new_id": new_id,
            }
        )
        ws = ws.map_batches(
            _apply_merge(left, right, new_id), batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
    return merges


def bpe_merge_table(
    docs: "ray.data.Dataset", n_merges: int = 10, text_col: str = "text"
) -> pa.Table:
    """The learned merge ladder as an Arrow table (queries() shape)."""
    merges = learn_bpe(docs, n_merges=n_merges, text_col=text_col)
    return pa.Table.from_pylist(
        merges,
        schema=pa.schema(
            [
                ("rank", pa.int64()),
                ("left", pa.string()),
                ("right", pa.string()),
                ("pair", pa.string()),
                ("pair_count", pa.int64()),
            ]
        ),
    )


class BpeEncoder:
    """Warm tokenizer-APPLICATION stage: encode documents with a
    learned merge ladder — the "tokenize the corpus with the trained
    tokenizer" pass every pretraining pipeline runs after ``learn_bpe``.

    Actor-pool contract (§2.7): construct once per actor with the
    integer merge ladder (tiny — one (left, right, new_id) triple per
    merge, closure-shipped, never per batch); ``__call__`` encodes one
    Arrow batch. Per batch the work is fully vectorized AND
    Zipf-collapsed: split to words, ``np.unique`` down to the batch's
    DISTINCT words, symbolize those once (shared ``_symbolize``
    kernel), fold the ladder over the one flattened int64 array
    (``_apply_merge`` — the training kernel, so encode≡train
    semantics: leftmost-non-overlapping, run-parity on self-pairs),
    then scatter per-word token counts back to documents through the
    unique-inverse. Cost per batch: O(n_merges × distinct-word chars);
    no Python loop over words or tokens anywhere.

    Output: input id column + ``n_tokens_bpe`` (BPE tokens per doc,
    end-of-word markers merged like any symbol, one token per merged
    symbol) + ``n_words`` (whitespace words).

    Use ``ds.map_batches(BpeEncoder, fn_constructor_kwargs=dict(
    merges=ladder), concurrency=(m, n), batch_size=B)``.
    """

    def __init__(self, merges, text_col: str = "text", id_col: str = "doc_id"):
        self._ladder = [
            (int(m["left_id"]), int(m["right_id"]), int(m["new_id"])) for m in merges
        ]
        self._text_col = text_col
        self._id_col = id_col

    def __call__(self, b: pa.Table) -> pa.Table:
        text = pc.fill_null(b.column(self._text_col), "")
        words_list = pc.split_pattern_regex(text, pattern=r"\s+")
        flat_words = pc.list_flatten(words_list)
        if isinstance(flat_words, pa.ChunkedArray):
            flat_words = flat_words.combine_chunks()
        per_doc = pc.list_value_length(words_list).to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(per_doc)), per_doc)
        w = flat_words.to_numpy(zero_copy_only=False)  # object array of str
        keep = np.array([len(x) > 0 for x in w], bool)  # regex split yields '' on edges
        w, doc_idx = w[keep], doc_idx[keep]
        n_words = np.bincount(doc_idx, minlength=len(per_doc)).astype(np.int64)
        n_tokens = np.zeros(len(per_doc), np.int64)
        if len(w):
            uniq, inv = np.unique(w, return_inverse=True)
            wt = pa.table(
                {
                    "word": pa.array(uniq.tolist(), pa.string()),
                    "n": pa.array(np.ones(len(uniq), np.int64)),
                }
            )
            st = _symbolize(wt)
            for left, right, new_id in self._ladder:
                st = _apply_merge(left, right, new_id)(st)
            tok_per_word = pc.list_value_length(
                st.column("syms").combine_chunks()
                if isinstance(st.column("syms"), pa.ChunkedArray)
                else st.column("syms")
            ).to_numpy(zero_copy_only=False).astype(np.int64)
            np.add.at(n_tokens, doc_idx, tok_per_word[inv])
        return pa.Table.from_arrays(
            [
                b.column(self._id_col),
                pa.array(n_tokens),
                pa.array(n_words),
            ],
            names=[self._id_col, "n_tokens_bpe", "n_words"],
        )


def bpe_encode_lengths(
    docs: "ray.data.Dataset",
    merges,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency=(1, 8),
) -> "ray.data.Dataset":
    """Encode every document with a learned merge ladder via the
    BpeEncoder actor pool; returns (id, n_tokens_bpe, n_words)."""
    return docs.map_batches(
        BpeEncoder,
        fn_constructor_kwargs={"merges": merges, "text_col": text_col, "id_col": id_col},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )
