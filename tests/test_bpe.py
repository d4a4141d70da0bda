"""BPE merge-learning oracle: exact merge-sequence parity between the
distributed learner (stages/bpe.py) and a sequential reference
implementation sharing the same determinism contract — winner by
(count DESC, (left_id, right_id) ASC), leftmost-non-overlapping greedy
application."""

import re

import pyarrow as pa
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"
END_ID = 0x110000
SHIFT = 1 << 22


def _ref_bpe(texts, n_merges):
    """Sequential Sennrich-style reference on the word-count table."""
    vocab = {}
    for t in texts:
        for w in re.split(r"\s+", t or ""):
            if w:
                vocab[w] = vocab.get(w, 0) + 1
    words = [([ord(c) for c in w] + [END_ID], n) for w, n in vocab.items()]
    merges = []
    next_id = END_ID + 1
    for _ in range(n_merges):
        counts = {}
        for syms, n in words:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + n
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0] * SHIFT + kv[0][1]))
        (left, right), cnt = best
        if cnt < 2:
            break
        merges.append((left, right, cnt))
        new_words = []
        for syms, n in words:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(next_id)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words.append((out, n))
        words = new_words
        next_id += 1
    return merges


def _sym_str(sym, parts):
    if sym == END_ID:
        return "</w>"
    if sym < END_ID:
        return chr(sym)
    left, right = parts[sym]
    return _sym_str(left, parts) + _sym_str(right, parts)


def _ref_strings(merges):
    parts, out = {}, []
    for rank, (left, right, cnt) in enumerate(merges):
        new_id = END_ID + 1 + rank
        parts[new_id] = (left, right)
        out.append((rank, _sym_str(left, parts), _sym_str(right, parts), cnt))
    return out


def test_bpe_handcrafted(ray_session):
    import ray.data

    from pdf_table_extractor_ray.stages.bpe import learn_bpe

    rows = [
        {"text": "low low low lower lower lowest"},
        {"text": "wide wide wider widest  widest"},  # double space: empty-token guard
        {"text": "aaaa aaaa"},  # overlap resolution: (a,a) run parity
    ]
    got = learn_bpe(ray.data.from_items(rows), n_merges=8)
    want = _ref_strings(_ref_bpe([r["text"] for r in rows], 8))
    assert [(m["rank"], m["left"], m["right"], m["pair_count"]) for m in got] == want


def test_bpe_real_corpus_parity(ray_session):
    import ray.data

    from pdf_table_extractor_ray.stages.bpe import learn_bpe

    ds = ray.data.read_parquet(f"{SF_DIR}/documents.parquet", columns=["text"])
    texts = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["text"]).column(
        "text"
    ).to_pylist()
    got = learn_bpe(ds, n_merges=10)
    want = _ref_strings(_ref_bpe(texts, 10))
    assert [(m["rank"], m["left"], m["right"], m["pair_count"]) for m in got] == want
    # merged symbol strings compose left+right
    for m in got:
        assert m["pair"] == m["left"] + m["right"]


def _ref_encode(text, int_merges):
    """Sequential encode: apply the ladder in rank order with leftmost
    greedy merging per word; returns total token count."""
    total = 0
    for w in re.split(r"\s+", text or ""):
        if not w:
            continue
        syms = [ord(c) for c in w] + [END_ID]
        for left, right, new_id in int_merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(new_id)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        total += len(syms)
    return total


def test_bpe_encode_matches_sequential(ray_session):
    """BpeEncoder (vectorized ladder fold over batch-distinct words)
    == per-word sequential greedy encode, across block layouts,
    including docs with repeated words, self-pair runs and empties."""
    import ray.data

    from pdf_table_extractor_ray.stages.bpe import bpe_encode_lengths, learn_bpe

    texts = [
        "the cat sat on the mat the cat",
        "aaaa aaa aa a",  # self-pair runs exercise run-parity
        "",
        "low lower lowest newer newest wider wide",
        "the the the the",
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    ds = ray.data.from_arrow(tbl)
    merges = learn_bpe(ds, n_merges=8)
    ladder = [(m["left_id"], m["right_id"], m["new_id"]) for m in merges]
    want = {i: _ref_encode(t, ladder) for i, t in enumerate(texts)}
    for parts in (1, 3):
        out = {
            r["doc_id"]: (r["n_tokens_bpe"], r["n_words"])
            for r in bpe_encode_lengths(
                ds.repartition(parts), merges, concurrency=(1, 2)
            ).take_all()
        }
        assert {k: v[0] for k, v in out.items()} == want
        assert out[2] == (0, 0)  # empty doc
        assert out[4][1] == 4
