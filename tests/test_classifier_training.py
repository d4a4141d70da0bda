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


def _local_logreg(texts, labels, d=64, iters=8, lr=0.5):
    """From-scratch reference of logreg_train's math (same hashing,
    same normalization, same schedule)."""
    from pdf_table_extractor_ray.stages.sketches import _fnv1a_bytes_array
    import pyarrow as pa

    n = len(texts)
    X = np.zeros((n, d), np.float64)
    for i, t in enumerate(texts):
        toks = t.split()
        if not toks:
            continue
        h = _fnv1a_bytes_array(pa.array(toks, pa.string()))
        for f in (h % np.uint64(d)).astype(np.int64):
            X[i, f] += 1.0
    tot = X.sum(axis=1, keepdims=True)
    Xn = X / np.maximum(tot, 1.0)
    y = np.asarray(labels, np.float64)
    w = np.zeros(d + 1, np.float64)
    for _ in range(iters):
        z = Xn @ w[:d] + w[d]
        p = 1.0 / (1.0 + np.exp(-z))
        r = p - y
        g = np.concatenate([Xn.T @ r, [r.sum()]])
        w = w - lr * g / n
    return w, Xn


def test_logreg_matches_local_reference(ray_session):
    import ray.data

    from pdf_table_extractor_ray.stages.classifier import (
        logreg_confusion_by,
        logreg_train,
    )

    rng = np.random.default_rng(3)
    texts, labs, srcs = [], [], []
    pos_words = "alpha beta gamma delta".split()
    neg_words = "omega sigma theta kappa".split()
    for i in range(120):
        is_pos = i % 2 == 0
        words = pos_words if is_pos else neg_words
        texts.append(" ".join(rng.choice(words, size=int(rng.integers(3, 12)))))
        labs.append(is_pos)
        srcs.append(f"s{i % 4}")
    texts.append("")  # empty doc: bias-only prediction
    labs.append(False)
    srcs.append("s0")
    tbl = pa.table(
        {
            "source": pa.array(srcs, pa.string()),
            "y": pa.array(labs),
            "text": pa.array(texts, pa.string()),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(6)

    w = logreg_train(ds, lambda b: b.column("y"), text_col="text")
    w_ref, Xn = _local_logreg(texts, labs)
    assert np.allclose(w, w_ref, rtol=1e-9, atol=1e-12)

    got = {
        r["key"]: (r["tp"], r["fp"], r["tn"], r["fn"])
        for r in logreg_confusion_by(ds, lambda b: b.column("y")).take_all()
    }
    pred = (Xn @ w_ref[:64] + w_ref[64]) > 0.0
    want = {}
    for s, p, yv in zip(srcs, pred, labs):
        tp, fp, tn, fn = want.get(s, (0, 0, 0, 0))
        if p and yv:
            tp += 1
        elif p and not yv:
            fp += 1
        elif not p and not yv:
            tn += 1
        else:
            fn += 1
        want[s] = (tp, fp, tn, fn)
    assert got == want
    # the planted separation must actually be learned
    tp = sum(v[0] for v in got.values())
    tn = sum(v[2] for v in got.values())
    assert (tp + tn) / (len(texts)) > 0.95


def test_nb_cross_validate_matches_local_reference(labeled_corpus):
    from pdf_table_extractor_ray.stages.classifier import nb_cross_validate

    rows, ds = labeled_corpus
    K = 4
    got = {
        r["fold"]: (r["n_docs"], r["n_correct"])
        for r in nb_cross_validate(ds, k_folds=K, vocab_cap=1000).take_all()
    }

    counts, ndocs, ntok = _brute_counts(rows)
    # per-fold stats
    fc, fdoc, ftok = {}, {}, {}
    for i, lang, text in rows:
        f = i % K
        fdoc[(f, lang)] = fdoc.get((f, lang), 0) + 1
        for w in text.split():
            fc[(f, lang, w)] = fc.get((f, lang, w), 0) + 1
            ftok[(f, lang)] = ftok.get((f, lang), 0) + 1
    vocab = sorted({t for (_l, t) in counts})
    labels = sorted(ndocs)
    V = len(vocab)
    vset = set(vocab)
    want = {f: [0, 0] for f in range(K)}
    for i, lang, text in rows:
        f = i % K
        best_lab, best_s = None, -math.inf
        for lab in labels:
            nd = ndocs[lab] - fdoc.get((f, lab), 0)
            tot = sum(ndocs.values()) - sum(
                fdoc.get((f, l2), 0) for l2 in labels
            )
            if nd > 0:
                s = math.log(nd / max(tot, 1))
            else:
                s = -math.inf
            denom = (ntok.get(lab, 0) - ftok.get((f, lab), 0)) + V
            for w in text.split():
                if w in vset:
                    c = counts.get((lab, w), 0) - fc.get((f, lab, w), 0)
                    s += math.log((c + 1) / denom)
                else:
                    s += math.log(1 / denom)
            if s > best_s:
                best_lab, best_s = lab, s
        want[f][0] += 1
        want[f][1] += int(best_lab == lang)
    assert got == {f: tuple(v) for f, v in want.items()}
    # a sane corpus should cross-validate well above chance (1/3)
    acc = sum(v[1] for v in got.values()) / sum(v[0] for v in got.values())
    assert acc > 0.6


def test_distinctive_tokens_brute_force(labeled_corpus):
    from pdf_table_extractor_ray.stages.classifier import distinctive_tokens_by_label

    rows, ds = labeled_corpus
    got = {}
    for r in distinctive_tokens_by_label(ds, k=3, min_count=2).take_all():
        got.setdefault(r["label"], []).append((r["score"], r["token"], r["n"]))
    for v in got.values():
        v.sort(key=lambda x: (-x[0], x[1]))

    counts, _nd, ntok = _brute_counts(rows)
    tok_tot = {}
    for (l, t), n in counts.items():
        tok_tot[t] = tok_tot.get(t, 0) + n
    T = sum(ntok.values())
    want = {}
    for (l, t), n in counts.items():
        if n < 2:
            continue
        s = n * (T - ntok[l]) - (tok_tot[t] - n) * ntok[l]
        want.setdefault(l, []).append((s, t, n))
    for l in want:
        want[l].sort(key=lambda x: (-x[0], x[1]))
        want[l] = want[l][:3]
    assert got == want
