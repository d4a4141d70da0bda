"""Naive-Bayes training/inference (stages/classifier.py) and
histogram decision-stump split finding (stages/trees.py)."""

import math

import numpy as np
import pyarrow as pa
import pytest


WORDS_BY_LANG = {
    "aa": "sun moon star sky cloud".split(),
    "bb": "fish whale kelp tide reef".split(),
    "cc": "sun tide rock moss fern".split(),  # overlaps both
}


@pytest.fixture(scope="module")
def labeled_corpus(ray_session):
    import ray.data

    rng = np.random.default_rng(7)
    rows = []
    for i in range(90):
        lang = ("aa", "bb", "cc")[i % 3]
        n = int(rng.integers(3, 20))
        rows.append((i, lang, " ".join(rng.choice(WORDS_BY_LANG[lang], size=n))))
    rows.append((90, "aa", ""))  # empty doc: prior-only prediction
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "lang": pa.array([r[1] for r in rows], pa.string()),
            "text": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    return rows, ray.data.from_arrow(tbl).repartition(6)


def _brute_counts(rows):
    counts, ndocs, ntok = {}, {}, {}
    for _i, lang, text in rows:
        ndocs[lang] = ndocs.get(lang, 0) + 1
        for w in text.split():
            counts[(lang, w)] = counts.get((lang, w), 0) + 1
            ntok[lang] = ntok.get(lang, 0) + 1
    return counts, ndocs, ntok


def test_nb_train_counts_exact(labeled_corpus):
    from pdf_table_extractor_ray.stages.classifier import nb_train_counts

    rows, ds = labeled_corpus
    got = {
        (r["label"], r["token"]): r["n"] for r in nb_train_counts(ds).take_all()
    }
    want, _, _ = _brute_counts(rows)
    assert got == want


def test_nb_label_stats_exact(labeled_corpus):
    from pdf_table_extractor_ray.stages.classifier import nb_label_stats

    rows, ds = labeled_corpus
    got = {
        r["label"]: (r["n_docs"], r["n_tokens"])
        for r in nb_label_stats(ds).take_all()
    }
    _, ndocs, ntok = _brute_counts(rows)
    assert got == {l: (ndocs[l], ntok.get(l, 0)) for l in ndocs}


def test_nb_confusion_matches_local_reference(labeled_corpus):
    """Distributed train+predict == a from-scratch numpy NB on the
    same data (same smoothing, same tie-breaks)."""
    from pdf_table_extractor_ray.stages.classifier import nb_confusion

    rows, ds = labeled_corpus
    got = {
        (r["true_label"], r["pred_label"]): r["n"]
        for r in nb_confusion(ds, vocab_cap=1000).take_all()
    }

    counts, ndocs, ntok = _brute_counts(rows)
    vocab = sorted({t for (_l, t) in counts})  # < cap → all tokens selected
    labels = sorted(ndocs)
    V = len(vocab)
    total = sum(ndocs.values())
    want = {}
    for _i, lang, text in rows:
        best_lab, best_s = None, -math.inf
        for lab in labels:  # asc → ties keep the smallest label
            s = math.log(ndocs[lab] / total)
            denom = ntok.get(lab, 0) + V
            for w in text.split():
                c = counts.get((lab, w), 0) if w in set(vocab) else 0
                s += math.log((c + 1) / denom) if w in set(vocab) else math.log(
                    1 / denom
                )
            if s > best_s:
                best_lab, best_s = lab, s
        key = (lang, best_lab)
        want[key] = want.get(key, 0) + 1
    assert got == want


def test_nb_confusion_diagonal_dominates(labeled_corpus):
    """Training-set self-prediction should be mostly right for
    well-separated vocabularies."""
    from pdf_table_extractor_ray.stages.classifier import nb_confusion

    _rows, ds = labeled_corpus
    rows = nb_confusion(ds).take_all()
    diag = sum(r["n"] for r in rows if r["true_label"] == r["pred_label"])
    total = sum(r["n"] for r in rows)
    assert diag / total > 0.9


def test_nb_predict_vocab_cap_changes_only_feature_set(labeled_corpus):
    """A tiny vocab cap still predicts (priors + the top tokens) and
    keeps the output row-aligned with the input."""
    from pdf_table_extractor_ray.stages.classifier import (
        nb_label_stats,
        nb_predict,
        nb_train_counts,
    )

    rows, ds = labeled_corpus
    counts = nb_train_counts(ds).materialize()
    stats = pa.concat_tables(
        [b for b in nb_label_stats(ds).iter_batches(batch_format="pyarrow")]
    )
    out = nb_predict(ds, counts, stats, vocab_cap=3).take_all()
    assert len(out) == len(rows)
    assert {r["doc_id"] for r in out} == {r[0] for r in rows}
    assert all(r["pred_label"] in WORDS_BY_LANG for r in out)


def test_stump_split_exact_brute_force(ray_session):
    import ray.data

    from pdf_table_extractor_ray.stages.trees import stump_splits

    rng = np.random.default_rng(11)
    n = 400
    key = rng.choice(["g1", "g2"], size=n)
    feat = rng.integers(0, 1000, size=n).astype(np.int64)
    # positives concentrate above 500 in g1, below 300 in g2
    pos = np.where(key == "g1", feat > 500, feat < 300)
    pos ^= rng.random(n) < 0.08  # noise
    tbl = pa.table(
        {
            "k": pa.array(key, pa.string()),
            "f": pa.array(feat, pa.int64()),
            "y": pa.array(pos),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(5)
    got = {
        r["key"]: (
            r["threshold"],
            r["n_left_pos"],
            r["n_left_neg"],
            r["n_right_pos"],
            r["n_right_neg"],
            r["err"],
        )
        for r in stump_splits(
            ds, "k", "f", lambda b: b.column("y"), bin_width=64
        ).take_all()
    }

    want = {}
    for g in ("g1", "g2"):
        m = key == g
        f, y = feat[m], pos[m]
        bins = np.unique(f // 64)
        best = None
        for b in bins[:-1]:
            thr = (int(b) + 1) * 64
            left = f < thr
            lp, lq = int(y[left].sum()), int((~y[left]).sum())
            rp, rq = int(y[~left].sum()), int((~y[~left]).sum())
            err = min(lp, lq) + min(rp, rq)
            cand = (err, thr, lp, lq, rp, rq)
            if best is None or cand[:2] < best[:2]:
                best = cand
        err, thr, lp, lq, rp, rq = best
        want[g] = (thr, lp, lq, rp, rq, err)
    assert got == want
    # the planted structure should be recovered approximately
    assert abs(got["g1"][0] - 512) <= 64
    assert abs(got["g2"][0] - 320) <= 64


def test_stump_split_single_bin_key_absent(ray_session):
    import ray.data

    from pdf_table_extractor_ray.stages.trees import stump_splits

    tbl = pa.table(
        {
            "k": pa.array(["solo"] * 5 + ["multi"] * 6, pa.string()),
            "f": pa.array([10, 11, 12, 13, 14, 0, 100, 200, 300, 400, 500], pa.int64()),
            "y": pa.array([True, False, True, False, True] + [True] * 3 + [False] * 3),
        }
    )
    ds = ray.data.from_arrow(tbl)
    out = stump_splits(ds, "k", "f", lambda b: b.column("y"), bin_width=64).take_all()
    keys = {r["key"] for r in out}
    assert keys == {"multi"}  # solo has one occupied bin → no candidate split
