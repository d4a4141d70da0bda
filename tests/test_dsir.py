"""DSIR importance resampling (stages/dsir.py): numpy brute parity of
the hashed-feature counts, log-ratio weights and Gumbel top-k draw;
planted style-shift recovery; degenerate inputs."""

import re

import numpy as np
import pyarrow as pa
import pytest

from pdf_table_extractor_ray.stages.dsir import (
    dsir_log_ratios,
    dsir_resample,
    dsir_select,
    dsir_weights,
    hashed_bucket_counts,
)
from pdf_table_extractor_ray.stages.shuffle import shuffle_key

_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_M64 = (1 << 64) - 1
_BIGRAM_MIX = 0x100000001B3


def _fnv(tok: str) -> int:
    h = _FNV_OFFSET
    for b in tok.encode("utf-8"):
        h = ((h ^ b) * _FNV_PRIME) & _M64
    return h


def _ref_features(text: str):
    toks = [t for t in re.split(r"\s+", text or "") if t]
    h = [_fnv(t) for t in toks]
    bg = [((h[i] * _BIGRAM_MIX) & _M64) ^ h[i + 1] for i in range(len(h) - 1)]
    return h + bg


def _ref_counts(texts, n_buckets):
    out = np.zeros(n_buckets, np.int64)
    for t in texts:
        for f in _ref_features(t):
            out[f % n_buckets] += 1
    return out


TARGET = [
    "the quick brown fox jumps over the lazy dog",
    "a quiet morning with coffee and the newspaper",
    "the fox and the dog share the quiet morning",
]
OTHER = [
    "zzz qqq xxx vvv kkk jjj",
    "qqq zzz vvv xxx mmm nnn",
]


@pytest.fixture(scope="module")
def corpus(ray_session):
    import ray.data

    texts = TARGET + OTHER
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(TARGET) + ["xx"] * len(OTHER)),
        }
    )
    return ray.data.from_arrow(tbl).repartition(3)


def test_bucket_counts_brute_parity(corpus):
    nb = 256
    got = {
        int(r["bucket"]): int(r["n"])
        for r in hashed_bucket_counts(corpus, n_buckets=nb).take_all()
    }
    ref = _ref_counts(TARGET + OTHER, nb)
    for b in range(nb):
        assert got.get(b, 0) == int(ref[b])


def test_weights_brute_parity(corpus):
    nb = 256
    texts = TARGET + OTHER
    tc = _ref_counts(TARGET, nb).astype(np.float64)
    rc = _ref_counts(texts, nb).astype(np.float64)
    lam_ref = (np.log(tc + 1) - np.log(tc.sum() + nb)) - (
        np.log(rc + 1) - np.log(rc.sum() + nb)
    )

    import ray.data

    target = ray.data.from_arrow(
        pa.table({"doc_id": np.arange(len(TARGET)), "text": pa.array(TARGET)})
    )
    lam = dsir_log_ratios(
        hashed_bucket_counts(target, n_buckets=nb),
        hashed_bucket_counts(corpus, n_buckets=nb),
        n_buckets=nb,
    )
    assert np.allclose(lam, lam_ref, rtol=0, atol=1e-12)

    got = {
        int(r["doc_id"]): (float(r["logw"]), int(r["n_feats"]))
        for r in dsir_weights(corpus, lam).take_all()
    }
    for i, t in enumerate(texts):
        feats = _ref_features(t)
        ref_w = float(np.sum(lam_ref[[f % nb for f in feats]]))
        assert got[i][1] == len(feats)
        assert abs(got[i][0] - ref_w) < 1e-9


def test_resample_matches_brute_gumbel(corpus):
    nb = 256
    lam = dsir_log_ratios(
        hashed_bucket_counts(corpus, n_buckets=nb),
        hashed_bucket_counts(corpus, n_buckets=nb),
        n_buckets=nb,
    )
    w = dsir_weights(corpus, lam)
    sel = dsir_resample(w, k=3, seed=7).take_all()
    assert len(sel) == 3
    rows = w.take_all()
    ids = np.array([r["doc_id"] for r in rows], np.int64)
    logw = np.array([r["logw"] for r in rows])
    u = (shuffle_key(ids, 7).astype(np.float64) + 0.5) / 2.0**64
    key = logw - np.log(-np.log(u))
    ref_ids = ids[np.argsort(-key, kind="stable")][:3]
    got_ids = [r["doc_id"] for r in sel]
    assert sorted(got_ids) == sorted(int(x) for x in ref_ids)
    # keys descend in the emitted order
    keys = [r["gumbel_key"] for r in sel]
    assert keys == sorted(keys, reverse=True)


def test_select_recovers_target_style(corpus):
    import pyarrow.compute as pc

    sel = dsir_select(
        corpus,
        target_filter=lambda b: pc.equal(b.column("lang"), "en"),
        k=3,
        n_buckets=256,
        seed=0,
    ).take_all()
    # the 3 selected docs should be the 3 target-style docs: their
    # logw advantage dwarfs any Gumbel noise at this separation
    assert sorted(r["doc_id"] for r in sel) == [0, 1, 2]


def test_empty_and_null_texts(ray_session):
    import ray.data

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["", None], pa.string()),
        }
    )
    ds = ray.data.from_arrow(tbl)
    counts = hashed_bucket_counts(ds, n_buckets=64).take_all()
    assert counts == []
    lam = np.zeros(64)
    rows = dsir_weights(ds, lam).take_all()
    assert {r["doc_id"]: r["n_feats"] for r in rows} == {0: 0, 1: 0}


def test_paired_counts_match_separate_passes(corpus):
    import pyarrow.compute as pc

    import ray.data

    from pdf_table_extractor_ray.stages.dsir import (
        dsir_log_ratios_paired,
        hashed_bucket_counts_paired,
    )

    nb = 256
    paired = hashed_bucket_counts_paired(
        corpus, lambda b: pc.equal(b.column("lang"), "en"), n_buckets=nb
    )
    lam_paired = dsir_log_ratios_paired(paired, n_buckets=nb)

    target = ray.data.from_arrow(
        pa.table({"doc_id": np.arange(len(TARGET)), "text": pa.array(TARGET)})
    )
    lam_sep = dsir_log_ratios(
        hashed_bucket_counts(target, n_buckets=nb),
        hashed_bucket_counts(corpus, n_buckets=nb),
        n_buckets=nb,
    )
    assert np.array_equal(lam_paired, lam_sep)
