"""Unigram-LM tokenizer training (stages/unigram_lm.py)."""

import math

import numpy as np
import pyarrow as pa
import pytest

from pdf_table_extractor_ray.stages.unigram_lm import (
    _lattice_counts,
    train_unigram,
    unigram_token_counts,
    viterbi_segment,
    word_counts,
)


def test_lattice_hand_checked():
    # word "ab", pieces {a, b, ab} uniform 1/3:
    #   [ab] has p 1/3, [a][b] has p 1/9, Z = 4/9
    #   E[ab] = (1/3)/(4/9) = 0.75, E[a] = E[b] = 0.25
    ids = {"a": 0, "b": 1, "ab": 2}
    logp = np.log(np.array([1 / 3, 1 / 3, 1 / 3]))
    counts, ll = _lattice_counts("ab", 1, ids, logp, max_len=2)
    assert counts[2] == pytest.approx(0.75)
    assert counts[0] == pytest.approx(0.25)
    assert counts[1] == pytest.approx(0.25)
    assert ll == pytest.approx(math.log(4 / 9))


def test_lattice_count_weighting_and_unseen():
    ids = {"a": 0}
    logp = np.array([0.0])
    counts, _ = _lattice_counts("aa", 5, ids, logp, max_len=2)
    assert counts[0] == pytest.approx(10.0)  # 2 pieces × count 5
    # unsegmentable word (unseen char) contributes nothing
    counts, ll = _lattice_counts("xz", 3, ids, logp, max_len=2)
    assert counts == {} and ll == 0.0


def test_viterbi_prefers_high_prob_and_handles_unk():
    ids = {"a": 0, "b": 1, "ab": 2}
    logp = np.log(np.array([0.05, 0.05, 0.9]))
    assert viterbi_segment("ab", ids, logp, 2) == ["ab"]
    logp = np.log(np.array([0.45, 0.45, 0.1]))
    assert viterbi_segment("ab", ids, logp, 2) == ["a", "b"]
    assert viterbi_segment("qq", ids, logp, 2) == ["qq"]  # whole-word UNK


def test_word_counts(ray_session):
    import ray

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["a b a", "b  c"], pa.string()),
        }
    )
    out = {
        r["word"]: r["n"]
        for r in word_counts(ray.data.from_arrow(docs).repartition(2)).take_all()
    }
    assert out == {"a": 2, "b": 2, "c": 1}


CORPUS = [
    "the cat sat on the mat",
    "the cats sat on mats",
    "matting and catting",
    "the the the cat cat",
    "on the mat the cat sat",
    "sat and sat and sat",
]


def _ds(ray_session):
    import ray

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(CORPUS))), pa.int64()),
                "text": pa.array(CORPUS, pa.string()),
            }
        )
    ).repartition(3)


def test_train_learns_frequent_words_as_pieces(ray_session):
    vocab = train_unigram(_ds(ray_session), vocab_size=40, n_rounds=3, seed_k=64)
    probs = dict(
        zip(vocab.column("piece").to_pylist(), vocab.column("logp").to_pylist())
    )
    assert vocab.num_rows <= 40
    top = sorted(probs, key=lambda p: -probs[p])[:5]
    assert {"the", "cat", "sat"} <= set(top)
    assert "mat" in probs
    # coverage: every corpus character survives pruning
    chars = {c for t in CORPUS for c in t if c != " "}
    assert chars <= set(probs)


@pytest.mark.parametrize("min_count", [1, 2])
def test_train_single_process_parity(ray_session, min_count):
    """One EM round with no pruning must equal the same math run
    single-process over the plain word-count dict (same seed vocab,
    same lattice function) — the distributed aggregation adds nothing
    but block-order float folding (allclose). Runs with the hapax
    floor ON (default) and OFF."""
    from collections import Counter

    from pdf_table_extractor_ray.stages.unigram_lm import _seed_vocab

    ds = _ds(ray_session)
    vocab = train_unigram(
        ds, vocab_size=10_000, n_rounds=1, seed_k=64, min_count=min_count
    )
    got = dict(zip(vocab.column("piece").to_pylist(), vocab.column("logp").to_pylist()))

    wc = Counter(w for t in CORPUS for w in t.split())
    pieces = _seed_vocab(word_counts(ds), 6, 64, min_count)
    logp0 = np.full(len(pieces), -math.log(len(pieces)))
    ids = {p: i for i, p in enumerate(pieces)}
    expected = np.zeros(len(pieces))
    from pdf_table_extractor_ray.stages.unigram_lm import _lattice_counts as lat

    for w, n in wc.items():
        if n < min_count:
            continue  # the floor drops hapax words from EM
        counts, _ = lat(w, n, ids, logp0, 6)
        for pid, e in counts.items():
            expected[pid] += e
    ref = np.where(expected > 0, np.log(expected / expected.sum()), -1e9)
    for p, i in ids.items():
        assert got[p] == pytest.approx(ref[i], rel=1e-9), p


def test_min_count_floor_keeps_piece_inventory(ray_session):
    """Two invariants of the hapax floor (VERDICT-r4 #4):

    1. When no word is below the floor (every fixture word appears
       ≥ 2×), min_count=2 and min_count=1 train the IDENTICAL piece
       inventory — the floor is exactly a no-op, not a perturbation.
    2. When the floor binds (the real fixture corpus has hapax words
       matting/catting), characters appearing ONLY in floored-out
       words (here 'g') still seed the vocabulary via the unfloored
       coverage pass, so every word stays segmentable."""
    import ray

    # (1) duplicate every doc → every word count ≥ 2 → floor is a no-op
    dup = pa.table(
        {
            "doc_id": pa.array(list(range(2 * len(CORPUS))), pa.int64()),
            "text": pa.array(CORPUS + CORPUS, pa.string()),
        }
    )
    dup_ds = ray.data.from_arrow(dup).repartition(3)
    v_floor = train_unigram(dup_ds, vocab_size=40, n_rounds=3, seed_k=64)
    v_exact = train_unigram(dup_ds, vocab_size=40, n_rounds=3, seed_k=64, min_count=1)
    assert v_floor.column("piece").to_pylist() == v_exact.column("piece").to_pylist()

    # (2) the binding case: hapax-only chars survive the floor
    v_bind = train_unigram(_ds(ray_session), vocab_size=40, n_rounds=3, seed_k=64)
    bind_pieces = set(v_bind.column("piece").to_pylist())
    assert "g" in bind_pieces
    chars = {c for t in CORPUS for c in t if c != " "}
    assert chars <= bind_pieces


def test_unigram_token_counts(ray_session):
    ds = _ds(ray_session)
    vocab = train_unigram(ds, vocab_size=40, n_rounds=3, seed_k=64)
    out = {r["doc_id"]: r["n_pieces"] for r in unigram_token_counts(ds, vocab).take_all()}
    # "the cat sat on the mat" → 6 whole-word pieces
    assert out[0] == 6
    assert all(v > 0 for v in out.values())
