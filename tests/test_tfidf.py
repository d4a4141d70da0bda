"""TF-IDF top-terms and document-frequency (stages/search.py)."""

import math

import numpy as np
import pyarrow as pa
import pytest


WORDS = "red blue green gold iron oak elm ash fir yew".split()


@pytest.fixture(scope="module")
def corpus(ray_session):
    import ray.data

    rng = np.random.default_rng(23)
    texts = [" ".join(rng.choice(WORDS, size=int(n))) for n in rng.integers(1, 30, 60)]
    texts += ["", "solo"]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts})
    return texts, ray.data.from_arrow(tbl).repartition(5)


def test_doc_frequency_matches_brute_force(corpus):
    from pdf_table_extractor_ray.stages.search import doc_frequency

    texts, ds = corpus
    got = {r["token"]: r["df"] for r in doc_frequency(ds).take_all()}
    want = {}
    for t in texts:
        for w in set(t.split()):
            want[w] = want.get(w, 0) + 1
    assert got == want


def test_tfidf_top3_matches_brute_force(corpus):
    from pdf_table_extractor_ray.stages.search import tfidf_top_terms

    texts, ds = corpus
    got = {}
    for r in tfidf_top_terms(ds, k=3).take_all():
        got.setdefault(r["doc_id"], []).append((r["rank"], r["term"]))
    for v in got.values():
        v.sort()

    df = {}
    for t in texts:
        for w in set(t.split()):
            df[w] = df.get(w, 0) + 1
    N = float(len(texts))
    want = {}
    for d, t in enumerate(texts):
        words = t.split()
        if not words:
            continue
        tf = {w: words.count(w) for w in set(words)}
        scored = sorted(
            ((-(tf[w] * math.log(N / df[w])), w) for w in tf),
        )[:3]
        want[d] = [(i + 1, w) for i, (_s, w) in enumerate(scored)]
    assert got == want


def test_tfidf_shuffle_path_bit_identical(corpus):
    """The big-vocab hash-shuffle path (broadcast_vocab_limit exceeded)
    must agree with the broadcast path exactly — same ranks, same
    terms, for every doc (the per-value float ops are identical)."""
    from pdf_table_extractor_ray.stages.search import tfidf_top_terms

    _texts, ds = corpus
    broadcast = sorted(
        (r["doc_id"], r["rank"], r["term"]) for r in tfidf_top_terms(ds, k=3).take_all()
    )
    shuffled = sorted(
        (r["doc_id"], r["rank"], r["term"])
        for r in tfidf_top_terms(ds, k=3, broadcast_vocab_limit=1).take_all()
    )
    assert shuffled == broadcast
    assert len(broadcast) > 0
