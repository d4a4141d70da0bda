"""Corpus-level operator tests: dedup (exact / MinHash / SimHash /
n-gram Jaccard / embedding), text stats, similarity search, multimodal
plumbing — over the driver testdata plus planted duplicates."""

import os

import numpy as np
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_with_dups(ray_session):
    import ray.data

    ds = ray.data.read_parquet(f"{SF_DIR}/documents.parquet")
    rows = ds.take(20)
    extra = []
    # exact copies of doc 0/1 under new ids; near copy of doc 2
    extra.append({**rows[0], "doc_id": 100000})
    extra.append({**rows[1], "doc_id": 100001})
    near = dict(rows[2])
    near["doc_id"] = 100002
    near["text"] = near["text"] + " extra tail token"
    extra.append(near)
    return ray.data.from_items(rows + extra)


def test_exact_dedup(docs_with_dups):
    from pdf_table_extractor_ray.stages.dedup import exact_dedup_ids, exact_dup_groups

    keep = sorted(r["doc_id"] for r in exact_dedup_ids(docs_with_dups).take_all())
    assert 100000 not in keep and 100001 not in keep
    assert 100002 in keep  # near-dup is NOT an exact dup
    groups = exact_dup_groups(docs_with_dups).take_all()
    assert len(groups) == 2
    assert all(g["n_copies"] == 2 for g in groups)


def test_minhash_lsh_finds_planted_pairs(docs_with_dups):
    from pdf_table_extractor_ray.stages.dedup import minhash_lsh_pairs

    pairs = {(r["doc_a"], r["doc_b"]): r["est_jaccard"] for r in minhash_lsh_pairs(docs_with_dups).take_all()}
    rows = docs_with_dups.take(3)
    id0, id1, id2 = rows[0]["doc_id"], rows[1]["doc_id"], rows[2]["doc_id"]
    assert pairs.get((id0, 100000)) == 1.0
    assert pairs.get((id1, 100001)) == 1.0
    near = pairs.get((id2, 100002))
    assert near is not None and near >= 0.7


def test_simhash_pairs(docs_with_dups):
    from pdf_table_extractor_ray.stages.dedup import simhash_pairs

    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in simhash_pairs(docs_with_dups).take_all()}
    rows = docs_with_dups.take(2)
    assert pairs.get((rows[0]["doc_id"], 100000)) == 0
    assert pairs.get((rows[1]["doc_id"], 100001)) == 0


def test_ngram_jaccard_verification(docs_with_dups):
    from pdf_table_extractor_ray.stages.dedup import verify_pairs_jaccard

    rows = docs_with_dups.take(3)
    t = verify_pairs_jaccard(
        docs_with_dups,
        [(rows[0]["doc_id"], 100000), (rows[2]["doc_id"], 100002)],
    ).to_pylist()
    assert t[0]["jaccard"] == 1.0
    assert 0.5 < t[1]["jaccard"] < 1.0


def test_ngram_jaccard_pairs_exact(docs_with_dups):
    """The distributed inverted-index pairs match brute-force set
    Jaccard over every doc pair, at a threshold low enough to expose
    non-planted background pairs too."""
    from pdf_table_extractor_ray.stages.dedup import ngram_jaccard_pairs, ngram_set

    rows = docs_with_dups.take_all()
    sets = {r["doc_id"]: ngram_set(r["text"] or "", 3) for r in rows}
    want = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if inter == 0:
                continue
            j = inter / (len(sets[a]) + len(sets[b]) - inter)
            if j >= 0.05:
                want[(a, b)] = (inter, j)
    got = {
        (r["doc_a"], r["doc_b"]): (r["n_common"], r["jaccard"])
        for r in ngram_jaccard_pairs(
            docs_with_dups, width=3, threshold=0.05, num_partitions=8
        ).take_all()
    }
    assert set(got) == set(want)
    for k, (n, j) in want.items():
        assert got[k][0] == n
        assert got[k][1] == pytest.approx(j, abs=1e-12)
    # planted exact copies must surface at jaccard 1.0
    assert got[(rows[0]["doc_id"], 100000)][1] == 1.0


def test_ngram_jaccard_max_df_drops_stop_shingles(ray_session):
    """max_df prunes shingles shared by too many docs (stopword-shingle
    cap): with a shingle common to all docs capped out, only the truly
    similar pair survives."""
    import ray.data

    from pdf_table_extractor_ray.stages.dedup import ngram_jaccard_pairs

    common = "the quick brown"
    docs = ray.data.from_items(
        [
            {"doc_id": 1, "text": f"{common} alpha beta gamma delta"},
            {"doc_id": 2, "text": f"{common} alpha beta gamma epsilon"},
            {"doc_id": 3, "text": f"{common} zeta eta theta iota"},
            {"doc_id": 4, "text": f"{common} kappa lambda mu nu"},
        ]
    )
    uncapped = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(docs, width=3, threshold=0.01, num_partitions=4).take_all()
    }
    assert (3, 4) in uncapped  # joined only via the stop-shingle
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(
            docs, width=3, threshold=0.01, num_partitions=4, max_df=2
        ).take_all()
    }
    assert (1, 2) in capped and (3, 4) not in capped


def test_token_count_matches_split(ray_session):
    import ray.data

    from pdf_table_extractor_ray.stages.textstats import token_count_batch

    ds = ray.data.read_parquet(f"{SF_DIR}/documents.parquet")
    out = ds.map_batches(token_count_batch, batch_format="pyarrow").take_all()
    texts = {r["doc_id"]: r["text"] for r in ds.take_all()}
    for r in out[:100]:
        assert r["n_tokens"] == len(texts[r["doc_id"]].split())


def test_langid_heuristic(ray_session):
    import ray.data

    from pdf_table_extractor_ray.stages.textstats import langid_batch

    ds = ray.data.from_items(
        [
            {"doc_id": 1, "text": "the cat sat on the mat and it was happy with the sun"},
            {"doc_id": 2, "text": "não quero nada com os carros da cidade para você"},
        ]
    )
    out = {r["doc_id"]: r["pred_lang"] for r in ds.map_batches(langid_batch, batch_format="pyarrow").take_all()}
    assert out[1] == "en"
    assert out[2] == "pt"


def test_quality_and_fingerprint(ray_session):
    import hashlib

    import ray.data

    from pdf_table_extractor_ray.stages.textstats import fingerprint_batch, quality_batch

    ds = ray.data.read_parquet(f"{SF_DIR}/documents.parquet")
    q = ds.map_batches(quality_batch, batch_format="pyarrow").take(5)
    for r in q:
        assert 0.0 <= r["quality_score"] <= 1.0
        assert r["n_chars"] > 0
    fp = ds.map_batches(fingerprint_batch, batch_format="pyarrow").take(3)
    texts = {r["doc_id"]: r["text"] for r in ds.take(10)}
    for r in fp:
        assert r["content_md5"] == hashlib.md5(texts[r["doc_id"]].encode()).hexdigest()


def test_knn_bruteforce_self_is_top1(ray_session):
    import ray.data

    from pdf_table_extractor_ray.stages.similarity import knn_bruteforce

    ds = ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet")
    rows = ds.take(3)
    q = np.array([r["embedding"] for r in rows])
    qids = np.array([r["vec_id"] for r in rows])
    out = knn_bruteforce(ds, q, qids, k=3).take_all()
    by_query = {}
    for r in out:
        by_query.setdefault(r["query_id"], []).append(r)
    for qid in qids:
        ranked = sorted(by_query[qid], key=lambda r: r["rank"])
        assert ranked[0]["vec_id"] == qid  # self is nearest
        assert abs(ranked[0]["score"] - 1.0) < 1e-9
        assert len(ranked) == 3


def test_knn_lsh_subset_of_bruteforce_quality(ray_session):
    import ray.data

    from pdf_table_extractor_ray.stages.similarity import knn_lsh

    ds = ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet")
    rows = ds.take(2)
    q = np.array([r["embedding"] for r in rows])
    qids = np.array([r["vec_id"] for r in rows])
    out = knn_lsh(ds, q, qids, k=3).take_all()
    for qid in qids:
        mine = [r for r in out if r["query_id"] == qid]
        assert mine, "query bucket should at least contain the query itself"
        assert min(r["rank"] for r in mine) == 1
        top = [r for r in mine if r["rank"] == 1][0]
        assert top["vec_id"] == qid


def test_ann_recall_vs_bruteforce(ray_session):
    """Quantified 'approximate': recall@5 of knn_lsh (multi-table) and
    knn_ivf against exact brute force on a clustered corpus (the regime
    ANN indexes exist for — on pure gaussian noise every neighbor is
    near-orthogonal and no LSH family can bucket it)."""
    import ray.data

    from pdf_table_extractor_ray.stages.similarity import (
        knn_bruteforce,
        knn_ivf,
        knn_lsh,
        knn_pq,
    )

    rng = np.random.RandomState(7)
    dim, n_clusters, per = 32, 20, 40
    centers = rng.standard_normal((n_clusters, dim)) * 3
    vecs = np.repeat(centers, per, axis=0) + 0.15 * rng.standard_normal(
        (n_clusters * per, dim)
    )
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(len(vecs)), pa.int64()),
                "embedding": pa.array(list(vecs), pa.list_(pa.float64())),
            }
        )
    ).repartition(4)
    q = centers[:8] + 0.1 * rng.standard_normal((8, dim))
    qids = np.arange(1000, 1008)

    def top(out):
        by_q = {}
        for r in out:
            by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
        return by_q

    bf = top(knn_bruteforce(ds, q, qids, k=5).take_all())
    from pdf_table_extractor_ray.stages.similarity import knn_sq8

    for name, fn in (("lsh", knn_lsh), ("ivf", knn_ivf), ("pq", knn_pq), ("sq8", knn_sq8)):
        approx = top(fn(ds, q, qids, k=5).take_all())
        recall = np.mean(
            [len(bf[qid] & approx.get(qid, set())) / len(bf[qid]) for qid in bf]
        )
        assert recall >= 0.8, (name, recall)


def test_embedding_dup_pairs(ray_session):
    import ray.data

    from pdf_table_extractor_ray.stages.similarity import embedding_dup_pairs

    base = ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet").take(10)
    clone = dict(base[0])
    clone["vec_id"] = 999999
    ds = ray.data.from_items(base + [clone])
    pairs = embedding_dup_pairs(ds, threshold=0.999).take_all()
    assert any(
        (p["id_a"] == base[0]["vec_id"] and p["id_b"] == 999999) for p in pairs
    )


def test_embedding_dup_pairs_degenerate_bucket(ray_session):
    """10% byte-identical vectors: the within-bucket verify must collapse
    identical vectors (O(u²) over uniques, not O(n²)), emit the exact
    clique in pairs mode, and a linear spanning star in star mode."""
    import ray.data

    from pdf_table_extractor_ray.stages.similarity import embedding_dup_pairs

    rng = np.random.RandomState(0)
    vecs = rng.standard_normal((1000, 16))
    vecs[:100] = vecs[0]
    ds = ray.data.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(1000)]
    )
    pairs = embedding_dup_pairs(ds, threshold=0.999).take_all()
    clique = [p for p in pairs if p["id_a"] < 100 and p["id_b"] < 100]
    assert len(clique) == 100 * 99 // 2
    assert all(p["cosine"] == 1.0 for p in clique)
    star = embedding_dup_pairs(ds, threshold=0.999, emit="star").take_all()
    star_clique = [p for p in star if p["id_a"] < 100 and p["id_b"] < 100]
    assert len(star_clique) == 99


def test_multimodal_fake_decode(ray_session):
    import ray.data

    from pdf_table_extractor_ray.stages.multimodal import FEATURE_DIM, featurize_media

    items = [{"media_id": i, "payload": bytes([i]) * 100} for i in range(16)]
    ds = ray.data.from_items(items)
    out = featurize_media(ds, concurrency=(1, 2)).take_all()
    assert len(out) == 16
    for r in out:
        assert len(r["feature"]) == FEATURE_DIM
        assert len(r["thumbnail"]) == 8 * 8 * 3
    # determinism: same payload → same feature
    a = [r for r in out if r["media_id"] == 1][0]
    out2 = featurize_media(ds, concurrency=(1, 2)).take_all()
    b = [r for r in out2 if r["media_id"] == 1][0]
    assert list(a["feature"]) == list(b["feature"])


def test_multimodal_real_unsupported_raises(ray_session):
    from pdf_table_extractor_ray.stages.multimodal import DecodeFeaturize

    stage = DecodeFeaturize(mode="real")
    # compressed/unknown formats still hit the PIL/ffmpeg seam
    with pytest.raises(NotImplementedError):
        stage(pa.table({"payload": pa.array([b"\x89PNG\r\n"], pa.binary())}))


def _make_ppm(w, h, rgb):
    import numpy as np

    img = np.tile(np.array(rgb, np.uint8), (h, w, 1))
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes(), img


def _make_bmp(w, h, rgb):
    import struct

    import numpy as np

    img = np.tile(np.array(rgb, np.uint8), (h, w, 1))
    row = (w * 3 + 3) & ~3
    pix = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        r = img[y, :, ::-1].tobytes()  # BGR
        pix += r + b"\x00" * (row - len(r))
    data_off = 54
    hdr = b"BM" + struct.pack("<IHHI", data_off + len(pix), 0, 0, data_off)
    hdr += struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0)
    return hdr + bytes(pix), img


def _make_wav(freq=440, seconds=0.1, rate=8000):
    import io
    import wave

    import numpy as np

    t = np.arange(int(rate * seconds)) / rate
    x = (np.sin(2 * np.pi * freq * t) * 20000).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(x.tobytes())
    return buf.getvalue()


def test_multimodal_real_decode_stdlib_formats(ray_session):
    """mode='real' end-to-end over actual PPM/BMP/WAV payloads through
    the actor-pool stage (stdlib-only decoders)."""
    import ray.data

    from pdf_table_extractor_ray.stages.multimodal import FEATURE_DIM, featurize_media

    ppm, _ = _make_ppm(13, 9, (200, 10, 30))
    bmp, _ = _make_bmp(10, 7, (10, 200, 30))
    wav = _make_wav()
    ds = ray.data.from_items(
        [
            {"media_id": 0, "payload": ppm},
            {"media_id": 1, "payload": bmp},
            {"media_id": 2, "payload": wav},
        ]
    )
    out = {r["media_id"]: r for r in featurize_media(ds, mode="real", concurrency=(1, 2)).take_all()}
    assert len(out) == 3
    # solid-color images: every pooled feature bucket == channel mean
    f_ppm = np.array(out[0]["feature"])
    assert f_ppm.shape == (FEATURE_DIM,) and 0.2 < f_ppm.mean() < 0.4
    assert len(out[0]["thumbnail"]) == 8 * 8 * 3
    f_bmp = np.array(out[1]["feature"])
    assert abs(f_bmp.mean() - f_ppm.mean()) < 0.05  # same channel set, permuted
    f_wav = np.array(out[2]["feature"])
    assert f_wav.shape == (FEATURE_DIM,) and f_wav.max() > 0.3  # sine envelope


def test_multimodal_decoders_roundtrip():
    """Decoders recover exact pixel/sample data."""
    import numpy as np

    from pdf_table_extractor_ray.stages.multimodal import decode_bmp, decode_ppm, decode_wav

    ppm, img = _make_ppm(5, 4, (1, 2, 3))
    assert (decode_ppm(ppm) == img).all()
    bmp, img2 = _make_bmp(5, 4, (9, 8, 7))
    assert (decode_bmp(bmp) == img2).all()
    x = decode_wav(_make_wav(freq=100, seconds=0.05))
    assert len(x) == 400 and abs(x).max() <= 1.0


def test_rvid_container_roundtrip_and_seek():
    """RVID frame extraction by index-table seek is byte-exact vs the
    encoded frames, for every frame."""
    import numpy as np

    from pdf_table_extractor_ray.stages.multimodal import (
        _rvid_index,
        decode_ppm,
        encode_rvid,
    )

    frames = [
        (np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3) + 7 * i) % 256
        for i in range(9)
    ]
    v = encode_rvid(frames, fps=24.0)
    n, fps, offs, lens = _rvid_index(v)
    assert (n, fps) == (9, 24.0)
    for i in range(n):
        assert (decode_ppm(v[offs[i] : offs[i] + lens[i]]) == frames[i]).all()


def test_sample_frame_indices_uniform_and_clamped():
    import numpy as np

    from pdf_table_extractor_ray.stages.multimodal import sample_frame_indices

    # n <= k: all frames, in order
    assert list(sample_frame_indices(3, 8)) == [0, 1, 2]
    # n > k: exactly k strictly-increasing centered picks
    idx = sample_frame_indices(100, 4)
    assert list(idx) == [12, 37, 62, 87]
    for n in (5, 17, 64, 1001):
        s = sample_frame_indices(n, 4)
        assert len(s) == 4 and (np.diff(s) > 0).all() and s[0] >= 0 and s[-1] < n


def test_frame_sampler_stage_and_video_features(ray_session):
    """Decode-free frame-sample explode through the actor stage; the
    sampled frames featurize identically to a direct per-frame decode
    (parity), and the whole-video real decode path agrees with the mean
    of its sampled-frame features."""
    import numpy as np
    import ray.data

    from pdf_table_extractor_ray.stages.multimodal import (
        DecodeFeaturize,
        FEATURE_DIM,
        featurize_media,
        sample_frames,
        sample_video_frames,
        synth_video_corpus,
    )

    tbl = synth_video_corpus(8)
    ds = ray.data.from_arrow(tbl).repartition(2)
    exploded = sample_video_frames(ds, k=4, concurrency=(1, 2))
    rows = exploded.take_all()
    # 8 videos × 4 sampled frames (all synth clips have ≥6 frames)
    assert len(rows) == 32
    assert {r["media_id"] for r in rows} == set(range(8))
    # parity: exploded frame bytes == direct container sampling
    direct = {
        (mid, i): blob
        for mid, payload in zip(tbl["media_id"].to_pylist(), tbl["payload"].to_pylist())
        for i, blob in sample_frames(payload, 4)
    }
    for r in rows:
        assert bytes(r["frame"]) == direct[(r["media_id"], r["frame_idx"])]

    feats = featurize_media(exploded, media_col="frame", mode="real", concurrency=(1, 2))
    per_frame = {}
    for r in feats.take_all():
        per_frame.setdefault(r["media_id"], []).append(np.array(r["feature"]))
    # whole-video decode (DecodeFeaturize real mode on the video payload)
    # = mean of its sampled-frame features
    whole = DecodeFeaturize(mode="real")(tbl)
    for mid, feat in zip(whole["media_id"].to_pylist(), whole["feature"].to_pylist()):
        want = np.mean(per_frame[mid], axis=0)
        assert np.allclose(np.array(feat), want, atol=1e-6)
        assert len(feat) == FEATURE_DIM


def test_resize_images_stage(ray_session):
    """Resize stage: exact pixel math on a block-aligned downscale,
    PNG-codec roundtrip parity, upscale path, and in-band error rows
    for non-image payloads."""
    import numpy as np
    import ray.data

    from pdf_table_extractor_ray.stages.multimodal import (
        decode_png,
        decode_ppm,
        encode_ppm,
        resize_image,
        resize_images,
    )

    # 8×8 → 4×4: each output pixel is the mean of a 2×2 block
    img = (np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3) * 3) % 251
    small = resize_image(img, 4, 4)
    want = img.reshape(4, 2, 4, 2, 3).astype(np.float64).mean(axis=(1, 3))
    assert (small == want.astype(np.uint8)).all()
    # upscale 2×3 → 4×6 is nearest-neighbor repeats (no NaN bins)
    up = resize_image(img[:2, :3], 4, 6)
    assert up.shape == (4, 6, 3)

    rows = [
        {"media_id": 0, "payload": encode_ppm(img)},
        {"media_id": 1, "payload": b"not an image at all"},
    ]
    ds = ray.data.from_items(rows)
    out = {
        r["media_id"]: r
        for r in resize_images(ds, out_w=4, out_h=4, codec="png", concurrency=(1, 2)).take_all()
    }
    assert out[0]["resize_error"] is None
    assert (decode_png(bytes(out[0]["resized"])) == small).all()
    assert out[1]["resized"] is None and "not a decodable image" in out[1]["resize_error"]
    # ppm codec path roundtrips too
    out2 = resize_images(ds, out_w=4, out_h=4, codec="ppm", concurrency=(1, 2)).take_all()
    blob = bytes([r for r in out2 if r["media_id"] == 0][0]["resized"])
    assert (decode_ppm(blob) == small).all()


def test_grouped_top_k_brute_parity_hot_and_null_keys(ray_session):
    """grouped_top_k == per-key brute-force head(k), including a hot key
    (one source dominates), a null key, ties on the first sort column,
    and a key with fewer than k rows; layout-invariant (1 vs 5 blocks).
    The per-batch partial must bound its own output to ≤ k non-null-key
    rows per key."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from pdf_table_extractor_ray.stages.topk import grouped_top_k

    rng = np.random.default_rng(13)
    n = 400
    keys = ["hot"] * 300 + ["mid"] * 80 + ["tiny"] * 2 + [None] * 18
    score = rng.integers(0, 40, n)  # narrow range forces ties
    ident = np.arange(n, dtype=np.int64)
    tbl = pa.table(
        {
            "src": pa.array(keys, pa.string()),
            "score": pa.array(score, pa.int64()),
            "id": pa.array(ident),
        }
    )
    want = {}
    for key in {"hot", "mid", "tiny", None}:
        rows = [
            (s, i)
            for kk, s, i in zip(keys, score.tolist(), ident.tolist())
            if kk == key
        ]
        want[key] = sorted(rows)[:5]
    for parts in (1, 5):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        out = grouped_top_k(
            ds, "src", [("score", "ascending"), ("id", "ascending")], k=5
        ).take_all()
        got = {}
        for r in out:
            got.setdefault(r["src"], []).append((r["score"], r["id"]))
        assert {k2: sorted(v) for k2, v in got.items()} == want, parts

    # the pre-reduce bound that makes this hot-key-safe: one 400-row
    # batch (300 rows of the hot key) reduces to ≤ k rows per non-null
    # key + the null-key rows (only the merge clips those)
    from pdf_table_extractor_ray.stages.topk import _partial_grouped_top_k

    full_keys = [("src", "ascending"), ("score", "ascending"), ("id", "ascending")]
    reduced = _partial_grouped_top_k(tbl, full_keys, 5)
    per_key = {}
    for v in reduced.column("src").to_pylist():
        per_key[v] = per_key.get(v, 0) + 1
    assert per_key["hot"] == 5 and per_key["mid"] == 5 and per_key["tiny"] == 2
    assert per_key[None] == 18  # over-kept, never dropped
    # and the partial's survivors are exactly the rows the brute answer
    # needs (it never discards a true top-k row)
    ids = set(reduced.column("id").to_pylist())
    for key, rows in want.items():
        assert all(i in ids for _s, i in rows), key


def test_winnow_fingerprints_shared_substring():
    from pdf_table_extractor_ray.stages.textstats import winnow_fingerprints

    a = "the quick brown fox jumps over the lazy dog in the morning light"
    b = "yesterday the quick brown fox jumps over the lazy dog again today"
    fa, fb = set(winnow_fingerprints(a)), set(winnow_fingerprints(b))
    # documents sharing a long substring share selected fingerprints
    assert fa & fb
    # disjoint text shares (almost) nothing
    c = "completely different words about rivers mountains valleys skies"
    fc = set(winnow_fingerprints(c))
    assert len(fa & fc) <= len(fa) // 4
    # deterministic
    assert winnow_fingerprints(a) == winnow_fingerprints(a)
    assert winnow_fingerprints("") == []
    assert winnow_fingerprints("short") == []


def test_sessionize(ray_session):
    import ray.data

    from pdf_table_extractor_ray.stages.sessions import sessionize

    M = 1_000_000
    items = [
        {"user_id": 1, "ts": 0},
        {"user_id": 1, "ts": 60 * M},          # same session (1 min gap)
        {"user_id": 1, "ts": 3600 * M},        # new session (59 min gap)
        {"user_id": 2, "ts": 10 * M},
    ]
    import pyarrow as pa

    t = pa.table(
        {
            "user_id": pa.array([r["user_id"] for r in items], pa.int64()),
            "ts": pa.array([r["ts"] for r in items], pa.timestamp("us")),
        }
    )
    ds = ray.data.from_arrow(t)
    out = sorted(
        sessionize(ds).take_all(), key=lambda r: (r["user_id"], r["session_id"])
    )
    assert [(r["user_id"], r["session_id"], r["n_events"]) for r in out] == [
        (1, 1, 2),
        (1, 2, 1),
        (2, 1, 1),
    ]
    assert out[0]["start_ts_us"] == 0 and out[0]["end_ts_us"] == 60 * M


def test_broadcast_join(ray_session):
    import ray.data

    from pdf_table_extractor_ray.stages.joins import broadcast_join

    probe = ray.data.from_items(
        [{"k": 1, "v": "a"}, {"k": 2, "v": "b"}, {"k": 9, "v": "c"}]
    )
    build = ray.data.from_items([{"bk": 1, "name": "one"}, {"bk": 2, "name": "two"}])
    inner = sorted(
        broadcast_join(probe, build, key="k", build_key="bk").take_all(),
        key=lambda r: r["k"],
    )
    assert [(r["k"], r["name"]) for r in inner] == [(1, "one"), (2, "two")]
    left = sorted(
        broadcast_join(probe, build, key="k", build_key="bk", how="left").take_all(),
        key=lambda r: r["k"],
    )
    assert [(r["k"], r["name"]) for r in left] == [(1, "one"), (2, "two"), (9, None)]


def test_broadcast_join_null_keys_never_match(ray_session):
    """SQL semantics: a NULL probe key joins nothing even when the
    build side contains a NULL key."""
    import ray.data

    from pdf_table_extractor_ray.stages.joins import broadcast_join

    probe = ray.data.from_arrow(
        pa.table({"k": pa.array([1, None], pa.int64()), "v": ["a", "b"]})
    )
    build = ray.data.from_arrow(
        pa.table({"bk": pa.array([1, None], pa.int64()), "name": ["one", "NULLROW"]})
    )
    inner = broadcast_join(probe, build, key="k", build_key="bk").take_all()
    assert [(r["k"], r["name"]) for r in inner] == [(1, "one")]
    left = sorted(
        broadcast_join(probe, build, key="k", build_key="bk", how="left").take_all(),
        key=lambda r: (r["k"] is None, r["k"]),
    )
    assert [(r["k"], r["name"]) for r in left] == [(1, "one"), (None, None)]


def test_hll_accuracy_and_determinism(ray_session):
    """HLL estimate within the sketch's error band at several
    cardinalities; identical estimate regardless of block layout."""
    import ray.data

    from pdf_table_extractor_ray.stages.sketches import hll_count_distinct

    for true_n in (50, 150, 5000):
        items = [{"k": f"key-{i % true_n}"} for i in range(true_n * 2)]
        ds = ray.data.from_items(items)
        est = hll_count_distinct(ds, "k").take_all()[0]["approx_distinct"]
        assert abs(est - true_n) / true_n < 0.05, (true_n, est)
        # different block layout → same registers → same estimate
        est2 = hll_count_distinct(
            ds.repartition(7), "k"
        ).take_all()[0]["approx_distinct"]
        assert est2 == est


def test_heavy_hitters_bounds_and_recall(ray_session):
    """Mergeable top-m heavy-hitter sketch on a zipf stream with far
    more distinct items than the per-block budget: every reported
    estimate is a lower bound, est+err an upper bound, and the true
    top-k items are all recovered."""
    from collections import Counter

    import ray.data

    from pdf_table_extractor_ray.stages.sketches import heavy_hitters

    rng = np.random.default_rng(11)
    vals = rng.zipf(1.3, 20_000)
    vals = vals[vals < 5_000]  # ~thousands of distinct items
    truth = Counter(int(v) for v in vals)
    ds = ray.data.from_arrow(
        pa.table({"item": pa.array([str(v) for v in vals], pa.string())})
    ).repartition(8)
    out = heavy_hitters(ds, "item", k=10, m=64).take_all()
    assert len(out) == 10
    for r in out:
        true_n = truth[int(r["item"])]
        assert r["est"] <= true_n <= r["est"] + r["err"], r
    # true top-10 all surface (zipf head is far above the error bound)
    true_top = {str(v) for v, _ in truth.most_common(10)}
    assert {r["item"] for r in out} == true_top
    # layout-invariance of the exact-per-block path: one block → exact
    exact = heavy_hitters(ds.repartition(1), "item", k=10, m=10_000).take_all()
    for r in exact:
        assert r["est"] == truth[int(r["item"])] and r["err"] == 0


def test_approx_quantiles_bracket_exact(ray_session):
    """Histogram-sketch quantiles bracket the exact ceil(q·n)−1
    order statistic, and the bracket is one bin wide."""
    import ray.data

    from pdf_table_extractor_ray.stages.sketches import approx_quantiles

    rng = np.random.default_rng(5)
    x = np.concatenate([rng.lognormal(3, 1, 30_000), rng.uniform(0, 5, 1000)])
    ds = ray.data.from_arrow(pa.table({"v": x})).repartition(6)
    qs = (0.0, 0.25, 0.5, 0.9, 0.99, 1.0)
    out = approx_quantiles(ds, "v", qs, bins=2048).to_pylist()
    xs = np.sort(x)
    width = (xs[-1] - xs[0]) / 2048
    for r in out:
        idx = max(int(np.ceil(r["q"] * len(xs))) - 1, 0)
        exact = xs[idx]
        assert r["lo"] - 1e-9 <= exact <= r["hi"] + 1e-9, (r, exact)
        assert r["hi"] - r["lo"] <= width * 1.0001


def test_bm25_matches_straightline(ray_session):
    """Distributed two-pass BM25 == single-process reference formula
    (same float op order), and the ranking surfaces the obvious hit."""
    import math

    import ray.data

    from pdf_table_extractor_ray.stages.search import bm25_scores, bm25_topk

    docs = [
        {"doc_id": 1, "text": "cat dog cat"},
        {"doc_id": 2, "text": "dog dog dog dog"},
        {"doc_id": 3, "text": "fish"},
        {"doc_id": 4, "text": ""},
        {"doc_id": 5, "text": "cat cat cat cat cat"},
    ]
    terms = ["cat", "dog"]
    ds = ray.data.from_items(docs).repartition(3)
    got = {r["doc_id"]: r["score"] for r in bm25_scores(ds, terms).take_all()}

    toks = {d["doc_id"]: d["text"].split() for d in docs}
    n = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = [sum(1 for t in toks.values() if w in t) for w in terms]
    for d in docs:
        dl = len(toks[d["doc_id"]])
        want = 0.0
        for i, w in enumerate(terms):
            tf = float(toks[d["doc_id"]].count(w))
            idf = math.log((n - df[i] + 0.5) / (df[i] + 0.5) + 1.0)
            want += idf * (tf * (1.2 + 1.0)) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * (dl / avgdl)))
        assert got[d["doc_id"]] == want, (d["doc_id"], got[d["doc_id"]], want)

    top = bm25_topk(ds, ["cat"], k=2).to_pylist()
    assert [r["doc_id"] for r in top] == [5, 1]
    assert [r["rank"] for r in top] == [1, 2]


def test_unigram_lm_perplexity_matches_straightline(ray_session):
    """Distributed LM train+score == single-process reference (exact:
    same float ops in both paths)."""
    import math
    from collections import Counter

    import ray.data

    from pdf_table_extractor_ray.stages.lm import (
        perplexity_scores,
        top_vocab,
        total_tokens,
        train_token_counts,
    )

    docs = [
        {"doc_id": 0, "text": "the cat sat on the mat"},
        {"doc_id": 1, "text": "the dog  ate the cat"},
        {"doc_id": 2, "text": "  zebra quux  "},
        {"doc_id": 3, "text": ""},  # zero tokens → no output row
        {"doc_id": 4, "text": "the the the"},
    ]
    ds = ray.data.from_items(docs)
    counts = train_token_counts(ds)
    vocab = top_vocab(counts, v=4)  # force OOV on the tail
    total = total_tokens(counts)
    out = {r["doc_id"]: r for r in perplexity_scores(ds, vocab, total).take_all()}
    assert 3 not in out and len(out) == 4

    # straight-line reference
    cnt = Counter(t for d in docs for t in d["text"].split())
    assert total == sum(cnt.values())
    vv = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
    denom = total + len(vv) + 1
    lp = {t: math.log((c + 1) / denom) for t, c in vv}
    oov = math.log(1 / denom)
    for d in docs:
        toks = d["text"].split()
        if not toks:
            continue
        nats = -sum(lp.get(t, oov) for t in toks)
        r = out[d["doc_id"]]
        assert r["n_tokens"] == len(toks)
        assert abs(r["nats"] - nats) < 1e-12, (d["doc_id"], r["nats"], nats)
        assert abs(r["ppl"] - math.exp(nats / len(toks))) < 1e-9


def test_asof_join_backward_forward(ray_session):
    import ray.data

    from pdf_table_extractor_ray.stages.asof import asof_join

    left = ray.data.from_items(
        [
            {"k": 1, "lt": 10, "ev": "a"},
            {"k": 1, "lt": 25, "ev": "b"},
            {"k": 1, "lt": 5, "ev": "c"},   # before any right row → miss
            {"k": 2, "lt": 100, "ev": "d"},  # key with no right rows at all
        ]
    )
    right = ray.data.from_items(
        [
            {"rk": 1, "rt": 7, "px": 70},
            {"rk": 1, "rt": 20, "px": 200},
            {"rk": 1, "rt": 30, "px": 300},
        ]
    )
    back = {
        (r["k"], r["lt"]): r["px"]
        for r in asof_join(
            left, right, on="k", right_on="rk", left_ts="lt", right_ts="rt"
        ).take_all()
    }
    assert back[(1, 10)] == 70      # latest rt ≤ 10 is 7
    assert back[(1, 25)] == 200     # latest rt ≤ 25 is 20
    assert back[(1, 5)] is None     # no earlier right row
    assert back[(2, 100)] is None   # key absent on right
    fwd = {
        (r["k"], r["lt"]): r["px"]
        for r in asof_join(
            left, right, on="k", right_on="rk", left_ts="lt", right_ts="rt",
            direction="forward",
        ).take_all()
    }
    assert fwd[(1, 10)] == 200      # earliest rt ≥ 10 is 20
    assert fwd[(1, 25)] == 300
    assert fwd[(1, 5)] == 70


def test_connected_components_matches_union_find_random(ray_session):
    """Distributed CC == driver union-find on seeded random graphs
    (same partition into components, same min-id roots)."""
    import ray.data

    from pdf_table_extractor_ray.stages.dedup import connected_components

    rng = np.random.RandomState(7)
    for _ in range(1):
        # dense graph (avg degree ~5 → diameter ~3): each CC round costs
        # ~10s of fixed shuffle overhead in this sandbox regardless of
        # data size, so the test keeps the round count small; long-chain
        # convergence is covered by test_connected_components_distributed
        n_nodes = 50
        edges = {
            tuple(sorted(p))
            for p in rng.randint(0, n_nodes, size=(120, 2)).tolist()
            if p[0] != p[1]
        }
        pairs = ray.data.from_items([{"doc_a": a, "doc_b": b} for a, b in sorted(edges)])
        got = {r["node"]: r["root"] for r in connected_components(pairs).take_all()}

        parent = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {x: find(x) for x in parent}
        assert got == want


def test_asof_matches_bruteforce_random(ray_session):
    """asof_join == per-row brute force on seeded random inputs (both
    directions, sparse keys → misses included)."""
    import ray.data

    from pdf_table_extractor_ray.stages.asof import asof_join

    rng = np.random.RandomState(11)
    lrows = [
        {"k": int(rng.randint(0, 6)), "lt": int(rng.randint(0, 1000)), "lid": i}
        for i in range(80)
    ]
    # unique (k, rt) on the right — as-of is undefined on ties
    seen = set()
    rrows = []
    for _ in range(60):
        k, rt = int(rng.randint(0, 4)), int(rng.randint(0, 1000))
        if (k, rt) not in seen:
            seen.add((k, rt))
            rrows.append({"rk": k, "rt": rt, "pay": len(rrows)})
    left = ray.data.from_items(lrows)
    right = ray.data.from_items(rrows)
    for direction in ("backward", "forward"):
        got = {
            r["lid"]: r["pay"]
            for r in asof_join(
                left, right, on="k", right_on="rk", left_ts="lt", right_ts="rt",
                direction=direction,
            ).take_all()
        }
        for lr in lrows:
            if direction == "backward":
                cand = [r for r in rrows if r["rk"] == lr["k"] and r["rt"] <= lr["lt"]]
                want = max(cand, key=lambda r: r["rt"])["pay"] if cand else None
            else:
                cand = [r for r in rrows if r["rk"] == lr["k"] and r["rt"] >= lr["lt"]]
                want = min(cand, key=lambda r: r["rt"])["pay"] if cand else None
            assert got[lr["lid"]] == want, (direction, lr)


def test_asof_join_null_timestamps(ray_session):
    """Null left ts → miss (never 'latest right row'); null right ts
    rows are never match candidates. Mixed timestamp units normalize
    to microseconds."""
    import datetime

    import ray.data

    from pdf_table_extractor_ray.stages.asof import asof_join

    left = ray.data.from_items(
        [
            {"k": 1, "lt": 100, "ev": "ok"},
            {"k": 1, "lt": None, "ev": "null-ts"},
        ]
    )
    right = ray.data.from_items(
        [{"rk": 1, "rt": 50, "pay": 5}, {"rk": 1, "rt": None, "pay": 99}]
    )
    out = {
        r["ev"]: r["pay"]
        for r in asof_join(
            left, right, on="k", right_on="rk", left_ts="lt", right_ts="rt"
        ).take_all()
    }
    assert out["ok"] == 5          # the null-rt row (pay=99) is not a candidate
    assert out["null-ts"] is None  # null left ts is a miss, not "latest"

    # unit normalization: timestamp[s] right vs timestamp[us] left
    t = datetime.datetime(2024, 1, 1)
    lt = ray.data.from_arrow(
        pa.table({"k": [1], "lts": pa.array([t], pa.timestamp("us"))})
    )
    rt = ray.data.from_arrow(
        pa.table(
            {
                "rk": [1, 1],
                "rts": pa.array(
                    [t - datetime.timedelta(days=1), t + datetime.timedelta(days=1)],
                    pa.timestamp("s"),
                ),
                "pay": [7, 8],
            }
        )
    )
    got = asof_join(lt, rt, on="k", right_on="rk", left_ts="lts", right_ts="rts").take_all()
    assert got[0]["pay"] == 7  # day-earlier row, not a unit-mangled compare


def test_asof_join_int64_above_2pow53(ray_session):
    """Nanosecond-epoch-scale int timestamps (> 2^53) must compare
    exactly — a float64 null-encoding would collapse adjacent values
    and pick the wrong as-of match."""
    import ray.data

    from pdf_table_extractor_ray.stages.asof import asof_join

    base = 1 << 60
    left = ray.data.from_items([{"k": 1, "lt": base + 1, "ev": "x"}])
    right = ray.data.from_items(
        [
            {"rk": 1, "rt": base, "pay": 1},
            {"rk": 1, "rt": base + 1, "pay": 2},
            {"rk": 1, "rt": base + 2, "pay": 3},
        ]
    )
    out = asof_join(
        left, right, on="k", right_on="rk", left_ts="lt", right_ts="rt"
    ).take_all()
    assert out[0]["pay"] == 2  # exact ≤ match, not a rounded neighbor


def test_lm_null_text(ray_session):
    """Null text rows behave like empty strings (no crash, no row)."""
    import ray.data

    from pdf_table_extractor_ray.stages.lm import (
        familiarity_scores,
        top_vocab,
        train_token_counts,
    )

    ds = ray.data.from_items(
        [{"doc_id": 0, "text": "a b"}, {"doc_id": 1, "text": None}, {"doc_id": 2, "text": "c"}]
    )
    counts = train_token_counts(ds)
    out = {r["doc_id"]: r["n_tokens"] for r in familiarity_scores(ds, top_vocab(counts, 10)).take_all()}
    assert out == {0: 2, 2: 1}  # null-text doc emits no row


def test_register_strategy_reaches_warm_actor(ray_session):
    """A user-registered strategy must be usable by WarmExtractor —
    driver-side registration plus explicit extra_strategies shipping."""
    import ray.data

    from pdf_table_extractor_ray.pipelines.extract import build_extracted_dataset
    from pdf_table_extractor_ray.stages.registry import STRATEGIES, register_strategy, make_strategies
    from pdf_table_extractor_ray.stages.result import ExtractResult

    def custom(doc):
        return ExtractResult(status="ok", extracted_text="CUSTOM:" + (doc.get("text") or ""))

    register_strategy("custom_x", custom)
    try:
        assert "custom_x" in STRATEGIES
        assert "custom_x" in make_strategies(None)  # fresh config-bound tables see it
        ds = ray.data.from_items([{"url": "u", "html": b"", "text": "hello"}])
        out = build_extracted_dataset(
            ds,
            strategy_key="custom_x",
            extra_strategies={"custom_x": custom},  # ships to actor processes
            shard_keys=False,
            concurrency=(1, 1),
        ).take_all()
        assert out[0]["strategy"] == "custom_x"
        assert out[0]["extracted_text"] == "CUSTOM:hello"
    finally:
        from pdf_table_extractor_ray.stages import registry

        registry._USER_STRATEGIES.pop("custom_x", None)
        STRATEGIES.pop("custom_x", None)


def test_hash_shuffle_join(ray_session):
    import ray.data

    from pdf_table_extractor_ray.stages.joins import hash_shuffle_join

    left = ray.data.from_items([{"k": i % 10, "v": i} for i in range(100)])
    right = ray.data.from_items([{"rk": i, "name": f"n{i}"} for i in range(5)])
    inner = hash_shuffle_join(left, right, on="k", right_on="rk", num_partitions=4)
    rows = inner.take_all()
    assert len(rows) == 50  # keys 0-4 × 10 rows each
    assert all(r["name"] == f"n{r['k']}" for r in rows)
    anti = hash_shuffle_join(
        left, right, on="k", right_on="rk", how="left_anti", num_partitions=4
    )
    assert sorted({r["k"] for r in anti.take_all()}) == [5, 6, 7, 8, 9]
    semi = hash_shuffle_join(
        left, right, on="k", right_on="rk", how="left_semi", num_partitions=4
    )
    assert semi.count() == 50 and "name" not in semi.schema().names


def test_hash_shuffle_join_composite_key(ray_session):
    """Multi-column join keys hash as a tuple in one exchange; matches
    require BOTH columns equal, and differing right-key names map
    positionally."""
    import ray.data

    from pdf_table_extractor_ray.stages.joins import hash_shuffle_join

    left = ray.data.from_items(
        [{"a": i % 4, "b": i % 3, "v": i} for i in range(60)]
    )
    right = ray.data.from_items(
        [{"ra": a, "rb": b, "tag": f"{a}-{b}"} for a in range(4) for b in range(2)]
    )
    out = hash_shuffle_join(
        left, right, on=["a", "b"], right_on=["ra", "rb"], num_partitions=4
    ).take_all()
    want = [r for r in range(60) if r % 3 < 2]
    assert sorted(r["v"] for r in out) == want
    assert all(r["tag"] == f"{r['a']}-{r['b']}" for r in out)


def test_near_dedup_keep_ids(docs_with_dups):
    from pdf_table_extractor_ray.stages.dedup import near_dedup_keep_ids

    kept = sorted(r["doc_id"] for r in near_dedup_keep_ids(docs_with_dups).take_all())
    # exact clones and the near-clone all collapse onto the original ids
    assert 100000 not in kept and 100001 not in kept and 100002 not in kept
    rows = docs_with_dups.take(3)
    for r in rows:
        assert r["doc_id"] in kept


def test_connected_components_distributed(ray_session):
    import ray.data

    from pdf_table_extractor_ray.stages.dedup import connected_components

    # a long chain (worst case for flooding), a triangle, an isolated pair
    pairs = ray.data.from_items(
        [{"doc_a": i, "doc_b": i + 1} for i in range(50, 60)]
        + [{"doc_a": 1, "doc_b": 2}, {"doc_a": 2, "doc_b": 3}, {"doc_a": 1, "doc_b": 3}]
        + [{"doc_a": 100, "doc_b": 101}]
    )
    roots = {r["node"]: r["root"] for r in connected_components(pairs).take_all()}
    assert all(roots[n] == 50 for n in range(50, 61))
    assert roots[1] == roots[2] == roots[3] == 1
    assert roots[100] == roots[101] == 100


@pytest.fixture(scope="module")
def dup_heavy_docs(ray_session):
    """≥50% duplicates: 40 base docs, each exact-cloned once and
    near-cloned once (120 rows, 80 redundant)."""
    import ray.data

    ds = ray.data.read_parquet(f"{SF_DIR}/documents.parquet")
    rows = ds.take(40)
    out = []
    for i, r in enumerate(rows):
        out.append(dict(r))
        out.append({**r, "doc_id": 200000 + i})  # exact clone
        near = dict(r)
        near["doc_id"] = 300000 + i
        near["text"] = r["text"] + " tail"
        out.append(near)
    return ray.data.from_items(out)


def test_dup_heavy_near_dedup_both_paths(dup_heavy_docs):
    """Dup-heavy corpus through BOTH drop paths: broadcast (default)
    and the hash-shuffle anti-join (broadcast_limit=0) — proving no
    O(corpus) driver materialization is required for correctness."""
    from pdf_table_extractor_ray.stages.dedup import near_dedup_keep_ids

    import ray.data

    base_rows = [r for r in dup_heavy_docs.take_all() if r["doc_id"] < 200000]
    # expected: near-dedup of the base docs alone (the driver corpus has
    # natural near-dup pairs of its own, e.g. docs 8/12 at sf0.001)
    expected = sorted(
        r["doc_id"]
        for r in near_dedup_keep_ids(ray.data.from_items(base_rows)).take_all()
    )
    kept_bc = sorted(r["doc_id"] for r in near_dedup_keep_ids(dup_heavy_docs).take_all())
    assert kept_bc == expected  # every planted clone family collapses to its base
    kept_aj = sorted(
        r["doc_id"]
        for r in near_dedup_keep_ids(dup_heavy_docs, broadcast_limit=0).take_all()
    )
    assert kept_aj == kept_bc


def test_hot_bucket_skew(ray_session):
    """Skew-adversarial: 10%+ of the corpus is ONE template (identical
    text → one LSH bucket per band). Unique-signature compression makes
    the verify O(u²); star emission keeps the output linear — the run
    must finish quickly instead of emitting ~2M pairs."""
    import time

    import ray.data

    from pdf_table_extractor_ray.stages.dedup import minhash_lsh_pairs, simhash_pairs

    template = "the quick brown fox jumps over the lazy dog " * 20
    n_hot = 2000
    docs = [{"doc_id": i, "text": template} for i in range(n_hot)]
    docs += [
        {"doc_id": 10000 + i, "text": f"unique document number {i} " + "filler words " * i}
        for i in range(50)
    ]
    ds = ray.data.from_items(docs)
    t0 = time.monotonic()
    star = minhash_lsh_pairs(ds, emit="star").take_all()
    elapsed = time.monotonic() - t0
    # spanning star over the 2000-clique: n-1 edges, not n(n-1)/2
    hot = [p for p in star if p["doc_a"] < 10000 and p["doc_b"] < 10000]
    assert len(hot) == n_hot - 1
    assert all(p["doc_a"] == 0 for p in hot)
    assert elapsed < 60, f"hot bucket took {elapsed:.1f}s — O(n²) blowup?"
    sh = simhash_pairs(ds, emit="star").take_all()
    sh_hot = [p for p in sh if p["doc_a"] < 10000 and p["doc_b"] < 10000]
    assert len(sh_hot) == n_hot - 1


def test_star_pairs_connectivity_equivalence(docs_with_dups, ray_session):
    """emit='star' must yield the same connected components (hence the
    same dedup keep-set) as the full pair emission."""
    from pdf_table_extractor_ray.stages.dedup import (
        connected_components,
        minhash_lsh_pairs,
    )

    full = minhash_lsh_pairs(docs_with_dups, emit="pairs")
    star = minhash_lsh_pairs(docs_with_dups, emit="star")
    cc_full = {r["node"]: r["root"] for r in connected_components(full).take_all()}
    cc_star = {r["node"]: r["root"] for r in connected_components(star).take_all()}
    assert cc_full == cc_star


def test_corpus_prep_drop_set_path(dup_heavy_docs):
    """corpus_prep survives a dup-heavy corpus and keeps one doc per
    clone family (drop-set built from dup groups, not a keeper-set
    take_all)."""
    from pdf_table_extractor_ray.pipelines.corpus_prep import prepare_corpus

    docs = dup_heavy_docs.select_columns(["doc_id", "text"])
    survivors = sorted(r["doc_id"] for r in prepare_corpus(docs).take_all())
    assert len(survivors) > 0
    assert all(d < 200000 for d in survivors)  # no clone survives


def test_knn_ivf_self_is_top1(ray_session):
    import ray.data

    from pdf_table_extractor_ray.stages.similarity import knn_ivf

    ds = ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet")
    rows = ds.take(3)
    q = np.array([r["embedding"] for r in rows])
    qids = np.array([r["vec_id"] for r in rows])
    out = knn_ivf(ds, q, qids, k=3).take_all()
    for qid in qids:
        mine = sorted((r for r in out if r["query_id"] == qid), key=lambda r: r["rank"])
        assert mine and mine[0]["vec_id"] == qid  # query's own cell is probed
        assert abs(mine[0]["score"] - 1.0) < 1e-9


def test_corpus_prep_pipeline(docs_with_dups):
    from pdf_table_extractor_ray.pipelines.corpus_prep import (
        corpus_token_totals,
        prepare_corpus,
    )

    prepared = prepare_corpus(docs_with_dups, min_quality=0.0, min_tokens=1)
    rows = prepared.take_all()
    ids = {r["doc_id"] for r in rows}
    # clones must be gone, originals kept
    assert 100000 not in ids and 100001 not in ids and 100002 not in ids
    assert all("pred_lang" in r and "n_tokens" in r for r in rows)
    totals = corpus_token_totals(prepared).take_all()
    assert sum(t["n_docs"] for t in totals) == len(rows)
    assert all(t["total_tokens"] > 0 for t in totals)


def test_hll_by_key_accuracy_and_layout_invariance(ray_session):
    """Per-key HLL: each key's estimate within the sketch's error band
    of its exact distinct count; estimates identical across layouts."""
    import ray.data

    from pdf_table_extractor_ray.stages.sketches import hll_count_distinct_by

    rng = np.random.default_rng(7)
    keys = rng.choice(["a", "b", "c"], 6000)
    # distinct cardinality differs per key: a ~ 2000, b ~ 500, c ~ 50
    spans = {"a": 2000, "b": 500, "c": 50}
    vals = np.array([rng.integers(0, spans[k]) for k in keys], np.int64)
    tbl = pa.table({"k": keys, "v": pa.array(vals, pa.int64())})
    exact = {
        k: len({int(v) for kk, v in zip(keys, vals) if kk == k}) for k in spans
    }
    ds = ray.data.from_arrow(tbl).repartition(6)
    got = {
        r["k"]: r["approx_distinct"]
        for r in hll_count_distinct_by(ds, "k", "v").take_all()
    }
    assert set(got) == set(exact)
    for k in exact:
        assert abs(got[k] - exact[k]) / exact[k] < 0.08, (k, got[k], exact[k])
    got2 = {
        r["k"]: r["approx_distinct"]
        for r in hll_count_distinct_by(
            ray.data.from_arrow(tbl).repartition(2), "k", "v"
        ).take_all()
    }
    assert got == got2


def test_event_gaps_and_timewin_brute_force(ray_session):
    """Bucketized lag() and RANGE time-window queries vs per-user
    brute force on a crafted events table with ties and sparse gaps."""
    import os
    import tempfile

    import ray.data

    import __ray_entry__ as em

    rng = np.random.default_rng(13)
    n = 400
    users = rng.integers(0, 9, n).astype(np.int64)
    ts = np.sort(rng.integers(0, 10_000, n)).astype(np.int64) * 1_000_000  # µs, with ties
    eid = np.arange(n, dtype=np.int64)
    val = np.round(rng.uniform(0, 50, n), 2)
    tbl = pa.table(
        {
            "event_id": pa.array(eid),
            "user_id": pa.array(users),
            "ts": pa.array(ts, pa.timestamp("us")),
            "value": pa.array(val, pa.float64()),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        import pyarrow.parquet as pq

        pq.write_table(tbl, os.path.join(d, "events.parquet"))
        gaps = {r["event_id"]: r["gap_us"] for r in em.queries()["event_gaps"](d).take_all()}
        win = {
            r["event_id"]: r["win30_cents"]
            for r in em.queries()["user_value_timewin"](d).take_all()
        }

    HOP = 1_800_000_000
    for u in set(users.tolist()):
        idx = np.flatnonzero(users == u)
        order = idx[np.lexsort((eid[idx], ts[idx]))]
        prev = None
        for i in order:
            want_gap = None if prev is None else int(ts[i] - ts[prev])
            assert gaps[int(eid[i])] == want_gap, (u, int(eid[i]))
            prev = i
        cents = np.floor(val * 100).astype(np.int64)
        for i in idx:
            mask = (users == u) & (ts >= ts[i] - HOP) & (ts <= ts[i])
            assert win[int(eid[i])] == int(cents[mask].sum()), (u, int(eid[i]))


def test_approx_quantiles_by_brackets_exact_values(ray_session):
    """Per-key histogram quantiles: every key's exact quantile value
    (ceil(q*n)-1 of its sorted values) lies inside the [lo, hi]
    bracket; deterministic across layouts."""
    import ray.data

    from pdf_table_extractor_ray.stages.sketches import approx_quantiles_by

    rng = np.random.default_rng(19)
    keys = rng.choice(["p", "q", "r"], 3000)
    # different distributions per key
    scale = {"p": 10.0, "q": 1000.0, "r": 1.0}
    vals = np.array([rng.uniform(0, scale[k]) for k in keys])
    tbl = pa.table({"k": keys, "v": pa.array(vals, pa.float64())})
    ds = ray.data.from_arrow(tbl).repartition(5)
    qs = [0.5, 0.95]
    out = {r["k"]: r for r in approx_quantiles_by(ds, "k", "v", qs).take_all()}
    assert set(out) == {"p", "q", "r"}
    for k in out:
        s = np.sort(vals[keys == k])
        for q in qs:
            exact = s[max(int(np.ceil(q * len(s))) - 1, 0)]
            lo = out[k][f"q{int(q*100):02d}_lo"]
            hi = out[k][f"q{int(q*100):02d}_hi"]
            assert lo <= exact <= hi, (k, q, lo, exact, hi)
    out2 = {r["k"]: r for r in approx_quantiles_by(ds.repartition(2), "k", "v", qs).take_all()}
    assert out == out2


def test_approx_quantiles_by_drops_nulls(ray_session):
    """Nulls in the value column are dropped before binning (ADVICE
    r3: a null became NaN → top bin, inflating that key's upper
    quantiles): a nullable corpus must give the same brackets as the
    same corpus with nulls pre-removed."""
    import ray.data

    from pdf_table_extractor_ray.stages.sketches import approx_quantiles_by

    rng = np.random.default_rng(29)
    keys = rng.choice(["a", "b"], 2000)
    vals = rng.uniform(0.0, 100.0, 2000)
    null_mask = rng.random(2000) < 0.3
    nullable = pa.table(
        {"k": keys, "v": pa.array(np.where(null_mask, np.nan, vals), mask=null_mask)}
    )
    clean = pa.table({"k": keys[~null_mask], "v": pa.array(vals[~null_mask], pa.float64())})
    qs = [0.5, 0.95]
    got = {r["k"]: r for r in approx_quantiles_by(
        ray.data.from_arrow(nullable).repartition(4), "k", "v", qs).take_all()}
    want = {r["k"]: r for r in approx_quantiles_by(
        ray.data.from_arrow(clean).repartition(4), "k", "v", qs).take_all()}
    assert got == want


class TestPngCodec:
    """Round-4 PNG path: stdlib zlib + the shared PNG row-predictor
    kernel (same filters as PDF 1.5 xref streams)."""

    def test_rgb_roundtrip_all_filters(self):
        from pdf_table_extractor_ray.stages.multimodal import decode_png, encode_png

        rng = np.random.default_rng(42)
        img = rng.integers(0, 256, size=(17, 23, 3)).astype(np.uint8)
        for f in (0, 1, 2, 3, 4, [0, 1, 2, 3, 4], [4, 3, 2, 1, 0]):
            assert (decode_png(encode_png(img, filters=f)) == img).all(), f

    def test_gray_palette_alpha_decode(self):
        import struct
        import zlib

        from pdf_table_extractor_ray.stages.multimodal import (
            PNG_SIG,
            _png_chunk,
            decode_png,
        )

        rng = np.random.default_rng(7)

        def mk(ctype, w, h, ch, extra=b""):
            rows = bytearray()
            hi = 4 if ctype == 3 else 256
            data = rng.integers(0, hi, size=(h, w, ch)).astype(np.uint8)
            for y in range(h):
                rows.append(0)
                rows += data[y].tobytes()
            p = (
                PNG_SIG
                + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
                + extra
                + _png_chunk(b"IDAT", zlib.compress(bytes(rows)))
                + _png_chunk(b"IEND", b"")
            )
            return p, data

        p, d = mk(0, 5, 4, 1)
        assert (decode_png(p) == np.repeat(d, 3, axis=2)).all()
        plte = rng.integers(0, 256, size=(4, 3)).astype(np.uint8)
        from pdf_table_extractor_ray.stages.multimodal import _png_chunk as chunk

        p, d = mk(3, 6, 3, 1, extra=chunk(b"PLTE", plte.tobytes()))
        assert (decode_png(p) == plte[d[:, :, 0]]).all()
        p, d = mk(6, 5, 5, 4)
        assert (decode_png(p) == d[:, :, :3]).all()
        p, d = mk(4, 5, 5, 2)
        assert (decode_png(p) == np.repeat(d[:, :, :1], 3, axis=2)).all()

    def test_unsupported_shapes_raise(self):
        import struct
        import zlib

        from pdf_table_extractor_ray.stages.multimodal import (
            PNG_SIG,
            _png_chunk,
            decode_png,
        )
        import pytest as _pytest

        with _pytest.raises(ValueError):
            decode_png(b"NOTPNG")
        # 16-bit depth rejected cleanly
        p = (
            PNG_SIG
            + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0))
            + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 26))
            + _png_chunk(b"IEND", b"")
        )
        with _pytest.raises(ValueError):
            decode_png(p)

    def test_png_equals_ppm_features(self):
        """The SAME image through PNG vs PPM must featurize identically
        (codec-independence of the feature head)."""
        from pdf_table_extractor_ray.stages.multimodal import (
            DecodeFeaturize,
            encode_png,
            encode_ppm,
        )
        import pyarrow as _pa

        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, size=(12, 16, 3)).astype(np.uint8)
        stage = DecodeFeaturize(mode="real")
        t = _pa.table(
            {
                "media_id": _pa.array([0, 1], _pa.int64()),
                "payload": _pa.array([encode_ppm(img), encode_png(img, filters=2)], _pa.binary()),
            }
        )
        out = stage(t)
        f = out.column("feature").to_pylist()
        assert f[0] == f[1]
        th = out.column("thumbnail").to_pylist()
        assert th[0] == th[1]


def _brute_dup_spans(rows, n=8):
    """Python oracle for dup_span_stats: mark every token covered by an
    n-token shingle occurring >= 2 times corpus-wide (same-doc repeats
    count), return covered-position counts per doc."""
    grams = {}
    for d in rows:
        toks = d["text"].split(" ")
        for i in range(len(toks) - n + 1):
            grams.setdefault(tuple(toks[i : i + n]), []).append((d["doc_id"], i))
    cov = {}
    for occ in grams.values():
        if len(occ) >= 2:
            for doc, i in occ:
                cov.setdefault(doc, set()).update(range(i, i + n))
    return {doc: len(s) for doc, s in cov.items()}


def test_dup_span_stats_planted(ray_session):
    import ray.data

    from pdf_table_extractor_ray.stages.substrings import dup_span_stats

    common = " ".join(f"w{i}" for i in range(10))
    rows = [
        {"doc_id": 1, "text": common + " unique1 ua ub uc"},
        {"doc_id": 2, "text": "pre1 pre2 " + common},
        # within-doc repetition: period-3 phrase -> self-duplicated shingles
        {"doc_id": 3, "text": " ".join(["ta tb tc"] * 5)},
        {"doc_id": 4, "text": "short text only"},
        {"doc_id": 5, "text": ""},
    ]
    out = {
        r["doc_id"]: r["dup_tokens"]
        for r in dup_span_stats(ray.data.from_items(rows), n=8).take_all()
    }
    assert out == _brute_dup_spans(rows)
    assert out[1] == 10 and out[2] == 10  # the shared 10-token run
    assert 4 not in out and 5 not in out  # too short / empty emit nothing

    # roster mode: sentinel rows restore zero-dup docs as 0 (no join)
    ds = ray.data.from_items(rows)
    full = {
        r["doc_id"]: r["dup_tokens"]
        for r in dup_span_stats(ds, n=8, ids=ds.select_columns(["doc_id"])).take_all()
    }
    assert full == {**{d["doc_id"]: 0 for d in rows}, **out}


def test_dup_span_stats_brute_force_real_docs(ray_session):
    import ray.data

    from pdf_table_extractor_ray.stages.substrings import dup_span_stats

    ds = ray.data.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    rows = ds.take_all()
    out = {r["doc_id"]: r["dup_tokens"] for r in dup_span_stats(ds, n=8).take_all()}
    assert out == _brute_dup_spans(rows)


def test_cust_order_dist_matches_pandas(ray_session):
    import pandas as pd

    import __ray_entry__ as em

    got = {
        r["c_count"]: r["custdist"]
        for r in em.queries()["cust_order_dist"](SF_DIR).take_all()
    }
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet", columns=["o_custkey"])
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet", columns=["c_custkey"])
    per = orders.groupby("o_custkey").size()
    counts = cust["c_custkey"].map(per).fillna(0).astype(int)
    want = counts.value_counts().to_dict()
    assert got == want


def _brute_dup_clean(rows, n=8):
    """Reference for dup_span_clean: drop tokens covered by any
    non-canonical (not min (doc_id,pos)) duplicated-shingle occurrence."""
    grams, toks_by = {}, {}
    for d in rows:
        toks = d["text"].split(" ")
        toks_by[d["doc_id"]] = toks
        for i in range(len(toks) - n + 1):
            grams.setdefault(tuple(toks[i : i + n]), []).append((d["doc_id"], i))
    removed = {}
    for occ in grams.values():
        if len(occ) >= 2:
            for doc, i in sorted(occ)[1:]:
                removed.setdefault(doc, set()).update(range(i, i + n))
    out = {}
    for d in rows:
        toks, rm = toks_by[d["doc_id"]], removed.get(d["doc_id"], set())
        out[d["doc_id"]] = (
            " ".join(t for j, t in enumerate(toks) if j not in rm),
            len(rm & set(range(len(toks)))),
        )
    return out


def test_dup_span_clean_planted_and_real(ray_session):
    import ray.data

    from pdf_table_extractor_ray.stages.substrings import dup_span_clean

    common = " ".join(f"w{i}" for i in range(10))
    rows = [
        {"doc_id": 1, "text": common + " unique1 ua ub uc"},  # canonical: kept whole
        {"doc_id": 2, "text": "pre1 pre2 " + common},  # copy: loses the run
        {"doc_id": 3, "text": "nothing shared here at all"},
        {"doc_id": 4, "text": ""},
    ]
    got = {
        r["doc_id"]: (r["text_clean"], r["n_removed"])
        for r in dup_span_clean(ray.data.from_items(rows), n=8).take_all()
    }
    assert got == _brute_dup_clean(rows)
    assert got[1] == (rows[0]["text"], 0)  # canonical doc untouched
    assert got[2] == ("pre1 pre2", 10)  # duplicated run removed

    ds = ray.data.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    real = {
        r["doc_id"]: (r["text_clean"], r["n_removed"])
        for r in dup_span_clean(ds, n=8).take_all()
    }
    assert real == _brute_dup_clean(ds.take_all())


def test_heavy_hitters_by_key_bounds_and_exact(ray_session):
    """Per-key heavy hitters: bounds hold per key in the approximate
    regime (m below per-key distinct), and the exact regime (big m)
    matches a brute-force GROUP BY top-k with err=0."""
    from collections import Counter

    import ray.data

    from pdf_table_extractor_ray.stages.sketches import heavy_hitters_by

    rng = np.random.default_rng(23)
    keys = rng.choice(["a", "b", "c"], 15_000)
    vals = rng.zipf(1.3, 15_000)
    rows = pa.table(
        {
            "k": pa.array([str(k) for k in keys], pa.string()),
            "v": pa.array([str(int(v)) for v in vals], pa.string()),
        }
    )
    truth = {}
    for k, v in zip(keys, vals):
        truth.setdefault(str(k), Counter())[str(int(v))] += 1
    ds = ray.data.from_arrow(rows).repartition(8)

    approx = heavy_hitters_by(ds, "k", "v", k=5, m=32).take_all()
    assert {r["key"] for r in approx} == {"a", "b", "c"}
    for r in approx:
        true_n = truth[r["key"]][r["item"]]
        assert r["est"] <= true_n <= r["est"] + r["err"], r
    # zipf head recovered per key
    for kk in ("a", "b", "c"):
        got = {r["item"] for r in approx if r["key"] == kk}
        want = {v for v, _ in truth[kk].most_common(5)}
        assert got == want

    exact = heavy_hitters_by(ds, "k", "v", k=5, m=100_000).take_all()
    for r in exact:
        assert r["est"] == truth[r["key"]][r["item"]] and r["err"] == 0
    for kk in ("a", "b", "c"):
        got = [
            (r["item"], r["est"])
            for r in sorted(exact, key=lambda r: (-r["est"], r["item"]))
            if r["key"] == kk
        ]
        want = sorted(
            truth[kk].items(), key=lambda kv: (-kv[1], kv[0])
        )[:5]
        assert got == want


def test_inverted_index_postings(ray_session):
    """Inverted index: postings ordered by doc id, tf exact, segment
    split bounds each row, null/empty texts contribute nothing."""
    import ray.data

    from pdf_table_extractor_ray.stages.search import inverted_index

    rows = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 7, 12], pa.int64()),
            "text": pa.array(
                ["a b a", "b c", None, "", "a  b\tc c"], pa.string()
            ),
        }
    )
    ds = ray.data.from_arrow(rows).repartition(3)
    out = {
        (r["token"], r["seg"]): (r["df"], r["postings"])
        for r in inverted_index(ds, seg_size=10).take_all()
    }
    assert out == {
        ("a", 0): (1, "1:2"),
        ("a", 1): (1, "12:1"),
        ("b", 0): (2, "1:1,2:1"),
        ("b", 1): (1, "12:1"),
        ("c", 0): (1, "2:1"),
        ("c", 1): (1, "12:2"),
    }


def test_pmi_collocations_brute_force(ray_session):
    """PMI collocations: exact micro-PMI ranking matches a Python
    brute force, and PMI ranks a rare-but-exclusive pair above a
    frequent-but-promiscuous one (what raw counts get wrong)."""
    from collections import Counter

    import ray.data

    from pdf_table_extractor_ray.stages.lm import pmi_collocations

    docs = (
        ["the cat sat on the mat"] * 30
        + ["zig zag"] * 5
        + ["the dog ran to the cat"] * 20
    )
    ds = ray.data.from_items([{"text": t} for t in docs]).repartition(4)

    uni, bc = Counter(), Counter()
    for t in docs:
        w = t.split()
        uni.update(w)
        bc.update(zip(w, w[1:]))
    n_total = sum(bc.values())
    want = sorted(
        (
            (
                -(1_000_000 * c * n_total) // (uni[a] * uni[b])
                if False
                else (1_000_000 * c * n_total) // (uni[a] * uni[b]),
                a,
                b,
                c,
            )
            for (a, b), c in bc.items()
            if c >= 5
        ),
        key=lambda r: (-r[0], r[1], r[2]),
    )[:10]

    got = pmi_collocations(ds, min_count=5, k=10).take_all()
    assert [
        (r["pmi_micro"], r["w1"], r["w2"], r["n_xy"]) for r in got
    ] == want
    # exclusive pair outranks every 'the *' pair despite lower count
    top = got[0]
    assert (top["w1"], top["w2"]) == ("zig", "zag") and top["n_xy"] == 5


def test_hash_shuffle_join_sparse_partitions(ray_session):
    """Joins whose key count is far below num_partitions must not
    crash on empty partitions (Ray finalizes them as zero-column
    tables), including when CHAINED into a second keyed shuffle —
    the regression that motivated _EmptySafeJoinAggregation."""
    import ray.data

    from pdf_table_extractor_ray.stages.joins import hash_shuffle_join

    left = ray.data.from_items(
        [{"a": "x", "b": "p", "n": 1}, {"a": "y", "b": "q", "n": 2}]
    )
    ra = ray.data.from_items([{"a": "x", "na": 10}, {"a": "y", "na": 20}])
    rb = ray.data.from_items([{"b": "q", "nb": 30}])

    # 8+8 partitions: enough to leave most partitions empty (the
    # pre-fix crash) while two chained joins still fit the 4-CPU
    # session's aggregator-actor budget
    j1 = hash_shuffle_join(left, ra, on="a", num_partitions=8)
    j2 = hash_shuffle_join(j1, rb, on="b", num_partitions=8)
    assert sorted(r["n"] for r in j2.take_all()) == [2]
    row = j2.take_all()[0]
    assert (row["na"], row["nb"]) == (20, 30)

    # left anti with an entirely-empty right partition keeps left rows
    anti = hash_shuffle_join(
        left, rb, on="b", how="left_anti", num_partitions=8
    )
    assert sorted(r["b"] for r in anti.take_all()) == ["p"]

    # semi over sparse partitions
    semi = hash_shuffle_join(
        left, rb, on="b", how="left_semi", num_partitions=8
    )
    assert [r["b"] for r in semi.take_all()] == ["q"]


def test_semantic_dedup_planted_and_parity(ray_session):
    """SemDeDup: planted near-duplicates collapse to one kept copy per
    eps-ball; full output matches a sequential reference given fixed
    centroids; kept set within each cluster is mutually sub-eps."""
    import ray.data

    from pdf_table_extractor_ray.stages.similarity import (
        _normalize,
        semantic_dedup,
    )

    rng = np.random.default_rng(7)
    base = _normalize(rng.normal(size=(40, 16)))
    vecs, ids = [], []
    vid = 0
    for b in base:
        vecs.append(b)
        ids.append(vid)
        vid += 1
    # plant 10 jittered near-dups of the first 10 bases
    for j in range(10):
        v = base[j] + rng.normal(scale=0.01, size=16)
        vecs.append(v / np.linalg.norm(v))
        ids.append(vid)
        vid += 1
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(
                [v.astype(np.float32).tolist() for v in vecs],
                pa.list_(pa.float32()),
            ),
        }
    )
    centroids = _normalize(rng.normal(size=(4, 16)))
    ds = ray.data.from_arrow(tbl).repartition(4)
    out = semantic_dedup(ds, n_clusters=4, eps=0.98, centroids=centroids).take_all()
    by_id = {r["vec_id"]: r for r in out}
    assert len(by_id) == len(ids)

    # sequential reference with the same centroids
    m = _normalize(np.array([np.asarray(v, np.float32) for v in vecs], np.float64))
    cell = np.argmax(m @ centroids.T, axis=1)
    cos = (m @ centroids.T)[np.arange(len(m)), cell]
    want = {}
    for c in np.unique(cell):
        idx = np.nonzero(cell == c)[0]
        order = idx[np.lexsort((np.array(ids)[idx], cos[idx]))]
        kept = []
        for i in order:
            sims = [float(m[k] @ m[i]) for k in kept]
            if sims and max(sims) >= 0.98:
                want[ids[i]] = (int(c), False, ids[kept[int(np.argmax(sims))]])
            else:
                kept.append(i)
                want[ids[i]] = (int(c), True, -1)
    got = {v: (r["cluster"], r["keep"], r["dup_of"]) for v, r in by_id.items()}
    assert got == want
    # each planted near-dup pair collapsed (one of the pair not kept)
    n_dropped = sum(1 for r in out if not r["keep"])
    assert n_dropped >= 8  # jitter at 0.01 ⇒ cosine ≫ 0.98


def test_fixed_width_histogram_negatives_and_nulls(ray_session):
    """Histogram: floor semantics on negative values, nulls dropped,
    counts exact vs numpy brute force."""
    import ray.data

    from pdf_table_extractor_ray.stages.sketches import fixed_width_histogram

    vals = [-7.49, -0.01, 0.0, 0.01, 4.99, 5.0, 12.34, None, -5.0]
    ds = ray.data.from_items([{"v": v} for v in vals]).repartition(3)
    out = {r["bin"]: r["n"] for r in fixed_width_histogram(ds, "v", scale=100, width=500).take_all()}
    good = np.array([v for v in vals if v is not None], np.float64)
    bins = np.floor(good * 100).astype(np.int64) // 500
    want = dict(zip(*np.unique(bins, return_counts=True)))
    assert out == {int(k): int(v) for k, v in want.items()}


def test_extract_outlinks_and_counts(ray_session):
    """Outlink extraction: absolute/relative resolution, tag-stripped
    anchors, non-HTML payloads skipped in-band, duplicate links kept,
    top-target counts exact."""
    import ray.data

    from pdf_table_extractor_ray.stages.links import (
        extract_outlinks,
        link_target_counts,
    )

    html1 = (
        b'<html><body><a href="/local">Loc<b>al</b></a>'
        b"<a href='https://other.test/p'>  Ext \n link </a>"
        b'<a href="/local">Local again</a></body></html>'
    )
    html2 = b'<A HREF="https://other.test/p">CAPS</A><p>no links here</p>'
    rows = [
        {"url": "https://a.test/x", "html": html1},
        {"url": "https://b.test/y", "html": html2},
        {"url": "https://c.test/z", "html": b"%PDF-1.4 not html"},
        {"url": "https://d.test/w", "html": None},
    ]
    ds = ray.data.from_items(rows).repartition(2)
    links = extract_outlinks(ds).take_all()
    got = sorted((r["url"], r["href"], r["target_host"], r["anchor"]) for r in links)
    assert got == [
        ("https://a.test/x", "/local", "a.test", "Local"),
        ("https://a.test/x", "/local", "a.test", "Local again"),
        ("https://a.test/x", "https://other.test/p", "other.test", "Ext link"),
        ("https://b.test/y", "https://other.test/p", "other.test", "CAPS"),
    ]
    top = link_target_counts(extract_outlinks(ds), k=2).take_all()
    assert [(r["target_host"], r["href"], r["n"]) for r in top] == [
        ("a.test", "/local", 2),
        ("other.test", "https://other.test/p", 2),
    ]


def test_kth_smallest_bisection(ray_session):
    """Radix-bisection selection: exact order statistics on floats
    incl. negatives, duplicates, extreme magnitudes and nulls, parity
    vs np.sort across many ranks."""
    import ray.data

    from pdf_table_extractor_ray.stages.sketches import kth_smallest

    rng = np.random.default_rng(11)
    vals = np.concatenate(
        [
            rng.normal(scale=1e6, size=400),
            rng.normal(scale=1e-6, size=400),
            -rng.exponential(size=200),
            np.repeat([3.5, -2.25, 0.0], 50),
        ]
    )
    rows = [{"v": float(x)} for x in vals] + [{"v": None}] * 25
    ds = ray.data.from_items(rows).repartition(6)
    s = np.sort(vals)
    for k in (1, 2, 137, len(vals) // 2, len(vals) - 1, len(vals)):
        assert kth_smallest(ds, "v", k) == s[k - 1], k

    import pytest

    with pytest.raises(ValueError, match="exceeds"):
        kth_smallest(ds, "v", len(vals) + 1)


def test_kth_smallest_by_groups(ray_session):
    """Per-key radix bisection: exact quantile_disc (rank ⌈q·n⌉) per
    key vs np.sort brute force — skewed group sizes, duplicates,
    negatives, null keys/values dropped, tiny nbins to force the
    maximum number of bisection passes."""
    import ray.data

    from pdf_table_extractor_ray.stages.sketches import kth_smallest_by

    rng = np.random.default_rng(23)
    groups = {
        "a": rng.normal(scale=1e5, size=700),
        "b": np.concatenate([-rng.exponential(size=40), np.repeat(1.5, 30)]),
        "c": np.array([42.0]),
    }
    rows = [{"k": g, "v": float(x)} for g, vs in groups.items() for x in vs]
    rows += [{"k": None, "v": 1.0}, {"k": "a", "v": None}] * 5
    ds = ray.data.from_items(rows).repartition(5)
    for q_num, q_den in ((1, 2), (9, 10), (1, 4), (1, 1)):
        got = kth_smallest_by(ds, "k", "v", q_num, q_den, nbins=16)
        got_map = dict(zip(got.column("key").to_pylist(), got.column("kth").to_pylist()))
        for g, vs in groups.items():
            s = np.sort(vs)
            rank = -(-q_num * len(vs) // q_den)  # ceil, exact
            assert got_map[g] == s[rank - 1], (g, q_num, q_den)
        assert set(got_map) == set(groups)  # null key excluded

    # multi-ratio: all (key, q) states bisect in the SAME shared passes
    from pdf_table_extractor_ray.stages.sketches import kth_smallest_by_multi

    ratios = [(1, 10), (1, 2), (9, 10)]
    multi = kth_smallest_by_multi(ds, "k", "v", ratios, nbins=16)
    got_multi = {
        (k, qn, qd): v
        for k, qn, qd, v in zip(
            multi.column("key").to_pylist(),
            multi.column("q_num").to_pylist(),
            multi.column("q_den").to_pylist(),
            multi.column("kth").to_pylist(),
        )
    }
    assert len(got_multi) == len(groups) * len(ratios)
    for g, vs in groups.items():
        s = np.sort(vs)
        for q_num, q_den in ratios:
            rank = -(-q_num * len(vs) // q_den)
            assert got_multi[(g, q_num, q_den)] == s[rank - 1], (g, q_num, q_den)


def test_grouped_centroids_brute(ray_session):
    """Grouped centroid mass: exact integer parity vs numpy brute
    force, null labels dropped, 1-based dims."""
    import ray.data

    from pdf_table_extractor_ray.stages.similarity import grouped_centroids

    rng = np.random.default_rng(3)
    m = rng.normal(size=(30, 5))
    labels = [int(x) for x in rng.integers(0, 3, 30)]
    labels[4] = None
    tbl = pa.table(
        {
            "label": pa.array(labels, pa.int64()),
            "embedding": pa.array(
                [row.astype(np.float32).tolist() for row in m],
                pa.list_(pa.float32()),
            ),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(4)
    got = {
        (r["label"], r["dim"]): (r["sum_micro"], r["n"])
        for r in grouped_centroids(ds).take_all()
    }
    micro = np.floor(m.astype(np.float32).astype(np.float64) * 1_000_000).astype(np.int64)
    want = {}
    for lb in (0, 1, 2):
        idx = [i for i, l in enumerate(labels) if l == lb]
        if not idx:
            continue
        s = micro[idx].sum(axis=0)
        for d in range(5):
            want[(lb, d + 1)] = (int(s[d]), len(idx))
    assert got == want


def test_salted_hash_join_matches_plain(ray_session):
    """Salted join equals the unsalted join for every supported
    ``how`` on a skewed key distribution; unsupported sides rejected."""
    import pytest
    import ray.data

    from pdf_table_extractor_ray.stages.joins import (
        hash_shuffle_join,
        salted_hash_join,
    )

    rng = np.random.default_rng(5)
    keys = np.concatenate([np.zeros(500, np.int64), rng.integers(1, 40, 300)])
    left = ray.data.from_arrow(
        pa.table({"k": pa.array(keys), "v": pa.array(np.arange(len(keys)))})
    ).repartition(5)
    right = ray.data.from_arrow(
        pa.table(
            {
                "rk": pa.array(np.arange(0, 35, dtype=np.int64)),
                "w": pa.array(np.arange(0, 35, dtype=np.int64) * 10),
            }
        )
    ).repartition(3)

    for how in ("inner", "left", "left_semi", "left_anti"):
        plain = sorted(
            tuple(sorted(r.items())) for r in hash_shuffle_join(
                left, right, on="k", right_on="rk", how=how, num_partitions=4
            ).take_all()
        )
        salted = sorted(
            tuple(sorted(r.items())) for r in salted_hash_join(
                left, right, on="k", right_on="rk", how=how, salt=4,
                num_partitions=4,
            ).take_all()
        )
        assert salted == plain, how

    with pytest.raises(ValueError, match="not supported"):
        salted_hash_join(left, right, on="k", right_on="rk", how="full")


def test_bloom_filtered_join_matches_plain(ray_session):
    """Bloom-prefiltered shuffle join equals the plain hash join for
    inner and left_semi (zero false negatives ⇒ no lost matches;
    false positives dropped by the join itself), incl. null probe
    keys and a tiny bitmap that FORCES false positives; preserved-row
    join types rejected."""
    import pytest
    import ray.data

    from pdf_table_extractor_ray.stages.joins import (
        bloom_filtered_join,
        hash_shuffle_join,
    )

    rng = np.random.default_rng(9)
    keys = rng.integers(0, 200, 600)
    lk = pa.array(keys, pa.int64()).to_pylist() + [None] * 5
    left = ray.data.from_arrow(
        pa.table({"k": pa.array(lk, pa.int64()), "v": pa.array(np.arange(len(lk)))})
    ).repartition(5)
    right = ray.data.from_arrow(
        pa.table(
            {
                "rk": pa.array(np.arange(0, 50, dtype=np.int64)),
                "w": pa.array(np.arange(0, 50, dtype=np.int64) * 7),
            }
        )
    ).repartition(3)

    for how in ("inner", "left_semi"):
        # m_bits=256: ~50 keys in 256 bits ⇒ false positives guaranteed
        for m_bits in (1 << 20, 256):
            plain = sorted(
                tuple(sorted(r.items())) for r in hash_shuffle_join(
                    left, right, on="k", right_on="rk", how=how, num_partitions=4
                ).take_all()
            )
            bloomed = sorted(
                tuple(sorted(r.items())) for r in bloom_filtered_join(
                    left, right, on="k", right_on="rk", how=how,
                    m_bits=m_bits, num_partitions=4,
                ).take_all()
            )
            assert bloomed == plain, (how, m_bits)

    with pytest.raises(ValueError, match="preserved"):
        bloom_filtered_join(left, right, on="k", right_on="rk", how="left")


def test_compression_ratios(ray_session):
    """Compression ratio: exact zlib parity, repetitive text scores
    below prose-like text, empty/null in-band -1."""
    import zlib

    import ray.data

    from pdf_table_extractor_ray.stages.textstats import compression_ratios

    rep = "spam " * 400
    rng = np.random.default_rng(9)
    prose = " ".join(
        "".join(rng.choice(list("abcdefghijklmnopqrstuvwxyz"), 7)) for _ in range(300)
    )
    rows = [
        {"doc_id": 1, "text": rep},
        {"doc_id": 2, "text": prose},
        {"doc_id": 3, "text": ""},
        {"doc_id": 4, "text": None},
    ]
    out = {
        r["doc_id"]: r
        for r in compression_ratios(ray.data.from_items(rows).repartition(2)).take_all()
    }
    for did, text in ((1, rep), (2, prose)):
        raw = text.encode()
        assert out[did]["raw_len"] == len(raw)
        assert out[did]["zlib_len"] == len(zlib.compress(raw, 6))
        assert out[did]["ratio_milli"] == 1000 * len(zlib.compress(raw, 6)) // len(raw)
    assert out[1]["ratio_milli"] < out[2]["ratio_milli"]
    assert out[3]["ratio_milli"] == -1 and out[4]["ratio_milli"] == -1


def test_funnel_counts_brute(ray_session):
    """Funnel: strictly-after earliest-completion chaining matches a
    per-user brute force on adversarial orderings (same-ts events,
    step repeats, out-of-order arrivals)."""
    import ray.data

    from pdf_table_extractor_ray.stages.sessions import funnel_counts

    rows = [
        # u1 completes A->B->C
        (1, "A", 10), (1, "B", 20), (1, "C", 30),
        # u2: B before A, then no B after A -> stops at step 1
        (2, "B", 5), (2, "A", 10),
        # u3: A and B same ts (NOT strictly after) then C -> stops at 1
        (3, "A", 10), (3, "B", 10), (3, "C", 50),
        # u4: A, B, C with later duplicate As that must not reset
        (4, "A", 1), (4, "A", 99), (4, "B", 2), (4, "C", 3),
        # u5: only C
        (5, "C", 7),
    ]
    ds = ray.data.from_items(
        [
            {"user_id": u, "event_type": t, "ts": np.datetime64(ts, "us")}
            for u, t, ts in rows
        ]
    ).repartition(3)
    out = {r["step"]: (r["step_type"], r["n_users"]) for r in funnel_counts(
        ds, ["A", "B", "C"]
    ).take_all()}
    assert out == {1: ("A", 4), 2: ("B", 2), 3: ("C", 2)}


def test_uniform_group_cap(ray_session):
    """Uniform per-key cap: exact-k per big key, small keys intact,
    layout-invariant, and the kept set equals the k lowest splitmix64
    hashes (the declared selection rule)."""
    import ray.data

    from pdf_table_extractor_ray.stages.dedup import uniform_group_cap
    from pdf_table_extractor_ray.stages.textstats import _splash64

    rows = [{"doc_id": i, "source": "big" if i < 80 else "small"} for i in range(90)]
    for parts in (2, 7):
        ds = ray.data.from_items(rows).repartition(parts)
        out = uniform_group_cap(ds, "source", k=5, seed=9).take_all()
        got = {
            src: sorted(r["doc_id"] for r in out if r["source"] == src)
            for src in ("big", "small")
        }
        h = _splash64(np.arange(90, dtype=np.uint64) ^ np.uint64(9)) >> np.uint64(1)
        want_big = sorted(np.argsort(h[:80], kind="stable")[:5].tolist())
        assert got["big"] == want_big
        assert got["small"] == list(range(80, 85)) or len(got["small"]) == 5
        want_small = sorted((80 + np.argsort(h[80:90], kind="stable")[:5]).tolist())
        assert got["small"] == want_small


def test_range_partition_counts(ray_session):
    """Range partitioner: bucket counts match a numpy brute force with
    exact order-statistic boundaries; near-balanced on distinct data;
    duplicate mass lands in one bucket (documented)."""
    import ray.data

    from pdf_table_extractor_ray.stages.sketches import range_partition_counts

    rng = np.random.default_rng(17)
    vals = np.concatenate([rng.normal(size=900), np.repeat(1.25, 100)])
    rows = [{"x": float(v)} for v in vals] + [{"x": None}] * 10
    ds = ray.data.from_items(rows).repartition(5)
    out = {r["bucket"]: r["n"] for r in range_partition_counts(ds, "x", 4).take_all()}
    s = np.sort(vals)
    n = len(vals)
    bounds = np.array([s[max(1, (i * n) // 4) - 1] for i in (1, 2, 3)])
    bk = np.searchsorted(bounds, vals, side="right")
    want = dict(zip(*np.unique(bk, return_counts=True)))
    assert out == {int(k): int(v) for k, v in want.items()}
    assert sum(out.values()) == n


def test_grouped_mad_outliers(ray_session):
    """MAD outliers: numpy brute parity on even+odd group sizes with
    planted extremes; nulls dropped; zero-MAD degenerate group."""
    import ray.data

    from pdf_table_extractor_ray.stages.stats import grouped_mad_outliers

    rows = (
        [{"k": "a", "v": float(x)} for x in [1, 2, 3, 4, 100]]          # odd n
        + [{"k": "b", "v": float(x)} for x in [10, 20, 30, 40, 50, -999]]  # even n
        + [{"k": "c", "v": 7.0}] * 4                                     # mad = 0
        + [{"k": "a", "v": None}]
    )
    ds = ray.data.from_items(rows).repartition(3)
    out = {r["k"]: r for r in grouped_mad_outliers(ds, "k", "v").take_all()}

    def brute(xs):
        x = np.sort(np.array(xs, np.float64))
        mid = (len(x) - 1) / 2
        med = x[int(np.floor(mid))] + (x[int(np.ceil(mid))] - x[int(np.floor(mid))]) * 0.5
        dev = np.abs(x - med)
        d = np.sort(dev)
        mad = d[int(np.floor(mid))] + (d[int(np.ceil(mid))] - d[int(np.floor(mid))]) * 0.5
        return len(x), med, mad, int((dev > 3.0 * mad).sum())

    for k, xs in (("a", [1, 2, 3, 4, 100]), ("b", [10, 20, 30, 40, 50, -999]), ("c", [7.0] * 4)):
        n, med, mad, n_out = brute(xs)
        r = out[k]
        assert (r["n"], r["median"], r["mad"], r["n_outliers"]) == (n, med, mad, n_out), k
    assert out["a"]["n_outliers"] == 1 and out["b"]["n_outliers"] == 1
    assert out["c"]["mad"] == 0.0 and out["c"]["n_outliers"] == 0


def test_key_skew_stats(ray_session):
    """Skew diagnostic: exact counts on a planted hot-key layout
    (one key with 50 rows among 10 singleton keys)."""
    import ray.data

    from pdf_table_extractor_ray.stages.stats import key_skew_stats

    rows = [{"k": 0} for _ in range(50)] + [{"k": i} for i in range(1, 11)]
    rows.append({"k": None})
    out = key_skew_stats(
        ray.data.from_items(rows).repartition(4), "k"
    ).take_all()[0]
    assert out == {
        "n_rows": 60,
        "n_keys": 11,
        "max_key_n": 50,
        "median_key_n": 1,
        "top1_share_micro": (1_000_000 * 50) // 60,
    }


def test_retention_cohorts_brute(ray_session):
    """Retention: brute-force parity on a corpus with repeat visits,
    gaps, cross-batch duplicate (user, week) pairs and null rows."""
    import ray.data

    WEEK = 604_800_000_000

    from pdf_table_extractor_ray.stages.sessions import retention_cohorts

    # (user, week) activity; duplicates on purpose
    acts = [
        (1, 0), (1, 0), (1, 1), (1, 3),
        (2, 1), (2, 2),
        (3, 0), (3, 3), (3, 3),
        (4, 2),
    ]
    rows = [
        {"user_id": u, "ts": np.datetime64(w * WEEK + (u * 97) % WEEK, "us")}
        for u, w in acts
    ]
    rows.append({"user_id": None, "ts": np.datetime64(0, "us")})
    ds = ray.data.from_items(rows).repartition(4)
    got = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in retention_cohorts(ds).take_all()
    }
    uw = sorted({(u, w) for u, w in acts})
    fw = {}
    for u, w in uw:
        fw.setdefault(u, w)
    want = {}
    for u, w in uw:
        k = (fw[u], w - fw[u])
        want[k] = want.get(k, 0) + 1
    assert got == want


def test_top_transitions_brute(ray_session):
    """Transitions: brute-force parity incl. same-ts tiebreak by
    event_id, cross-user boundaries excluded."""
    from collections import Counter

    import ray.data

    from pdf_table_extractor_ray.stages.sessions import top_transitions

    rows = [
        # (user, type, ts, event_id); user 2 has same-ts events
        (1, "A", 10, 1), (1, "B", 20, 2), (1, "A", 30, 3),
        (2, "B", 5, 4), (2, "C", 5, 5), (2, "A", 6, 6),
        (3, "C", 1, 7),
    ]
    ds = ray.data.from_items(
        [
            {"user_id": u, "event_type": t, "ts": np.datetime64(s, "us"), "event_id": e}
            for u, t, s, e in rows
        ]
    ).repartition(3)
    got = [
        (r["prev_type"], r["next_type"], r["n"])
        for r in top_transitions(ds, k=10).take_all()
    ]
    c = Counter()
    byu = {}
    for u, t, s, e in rows:
        byu.setdefault(u, []).append((s, e, t))
    for u, evs in byu.items():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            c[(a, b)] += 1
    want = sorted(
        ((a, b, n) for (a, b), n in c.items()),
        key=lambda r: (-r[2], r[0], r[1]),
    )
    assert got == want


def test_cdc_chunking(ray_session):
    """CDC: boundaries match a sequential brute force; identical
    payloads chunk identically; a one-byte PREFIX insertion leaves
    most chunk hashes intact (the shift-resistance fixed blocking
    lacks); dup accounting exact on planted copies."""
    import ray.data

    from pdf_table_extractor_ray.stages.cdc import (
        _P,
        _chunk_boundaries,
        cdc_chunk_rows,
        cdc_dup_stats,
    )

    rng = np.random.default_rng(31)
    base = rng.integers(0, 256, 8000, dtype=np.uint8).tobytes()

    # brute-force boundary check
    data = np.frombuffer(base, np.uint8)
    w, bits = 16, 8
    powers = np.empty(w, np.uint64)
    powers[0] = np.uint64(1)
    for j in range(1, w):
        powers[j] = powers[j - 1] * _P
    ends = []
    for i in range(w - 1, len(data)):
        seg = data[i - w + 1 : i + 1].astype(np.uint64)
        h = int((seg * powers).sum(dtype=np.uint64))
        if h & ((1 << bits) - 1) == 0:
            ends.append(i + 1)
    if not ends or ends[-1] != len(data):
        ends.append(len(data))
    got = _chunk_boundaries(data, w, bits)
    assert got.tolist() == ends

    shifted = b"\x00" + base
    rows = [
        {"url": "a", "html": base},
        {"url": "b", "html": base},          # exact copy
        {"url": "c", "html": shifted},       # 1-byte prefix insert
        {"url": "d", "html": None},
    ]
    ds = ray.data.from_items(rows).repartition(2)
    chunks = cdc_chunk_rows(ds, window=w, mask_bits=bits).take_all()
    by_url = {}
    for r in chunks:
        by_url.setdefault(r["url"], []).append((r["chunk_idx"], r["chunk_hash"]))
    a = [h for _, h in sorted(by_url["a"])]
    b = [h for _, h in sorted(by_url["b"])]
    c = {h for _, h in by_url["c"]}
    assert a == b
    # all but the first chunk of the shifted payload re-align
    assert len(set(a) & c) >= len(a) - 1

    stats = cdc_dup_stats(ds, window=w, mask_bits=bits).take_all()[0]
    assert stats["n_chunks"] == len(chunks)
    assert stats["n_dup_hashes"] >= len(a) - 1
    assert stats["dup_bytes"] > 0


def test_join_overlap_estimate(ray_session):
    """HLL overlap probe: estimates within the sketch's error band of
    exact distinct/union/intersection on a constructed overlap."""
    import ray.data

    from pdf_table_extractor_ray.stages.sketches import join_overlap_estimate

    left = ray.data.from_items([{"k": i} for i in range(8000)]).repartition(4)
    right = ray.data.from_items(
        [{"rk": i} for i in range(6000, 12000)]
    ).repartition(3)
    out = join_overlap_estimate(left, "k", right, "rk").take_all()[0]
    # 4096-register HLL ⇒ ~1.6% σ; allow 6%
    assert abs(out["n_left_approx"] - 8000) < 480
    assert abs(out["n_right_approx"] - 6000) < 360
    assert abs(out["n_union_approx"] - 12000) < 720
    assert abs(out["n_intersect_approx"] - 2000) < 1000  # differences compound


def test_token_entropy(ray_session):
    """Entropy: brute parity, repetitive < varied, empty/null -1."""
    from collections import Counter

    import ray.data

    from pdf_table_extractor_ray.stages.textstats import token_entropies

    rows = [
        {"doc_id": 1, "text": "a a a a a a"},
        {"doc_id": 2, "text": "a b c d e f"},
        {"doc_id": 3, "text": "a a b b c c"},
        {"doc_id": 4, "text": ""},
        {"doc_id": 5, "text": None},
    ]
    out = {
        r["doc_id"]: r
        for r in token_entropies(ray.data.from_items(rows).repartition(2)).take_all()
    }

    def brute(text):
        toks = text.split()
        c = Counter(toks)
        dl = len(toks)
        h = max(0.0, np.log(dl) - sum(n * np.log(n) for n in c.values()) / dl)
        return int(np.floor(h * 1000))

    for did, text in ((1, rows[0]["text"]), (2, rows[1]["text"]), (3, rows[2]["text"])):
        assert out[did]["entropy_milli"] == brute(text), did
        assert out[did]["n_tokens"] == 6
    assert out[1]["entropy_milli"] == 0  # all same token
    assert out[1]["entropy_milli"] < out[3]["entropy_milli"] < out[2]["entropy_milli"]
    assert out[4]["entropy_milli"] == -1 and out[5]["entropy_milli"] == -1


def test_weighted_group_sample(ray_session):
    """Per-key ES sample: exact selection-rule parity vs brute force,
    zero/null weights excluded, heavy items favored across seeds."""
    import ray.data

    from pdf_table_extractor_ray.stages.dedup import weighted_group_sample
    from pdf_table_extractor_ray.stages.textstats import _splash64

    rows = []
    for i in range(60):
        rows.append({"doc_id": i, "src": "a" if i < 40 else "b",
                     "w": 1000.0 if i % 10 == 0 else 1.0})
    rows.append({"doc_id": 60, "src": "a", "w": 0.0})
    rows.append({"doc_id": 61, "src": "a", "w": None})
    ds = ray.data.from_items(rows).repartition(4)
    got = {
        src: sorted(r["doc_id"] for r in weighted_group_sample(
            ds, "src", "w", k=5, seed=3
        ).take_all() if r["src"] == src)
        for src in ("a", "b")
    }

    def es(i, w):
        h = _splash64(np.array([i], np.uint64) ^ np.uint64(3))[0]
        u = (float(h) + 1.0) / 18446744073709551616.0
        return -np.log(u) / w

    want = {}
    for src in ("a", "b"):
        cand = [
            (es(r["doc_id"], r["w"]), r["doc_id"])
            for r in rows
            if r["src"] == src and r["w"]
        ]
        want[src] = sorted(d for _, d in sorted(cand)[:5])
    assert got == want
    # heavy (w=1000) ids dominate: in group a, ids {0,10,20,30} are 4 of 40
    heavy = {0, 10, 20, 30}
    assert len(heavy & set(got["a"])) >= 3


def test_grouped_ffill_brute(ray_session):
    """Forward fill: brute parity incl. leading nulls, all-null users,
    same-ts tiebreaks, cross-user isolation."""
    import ray.data

    from pdf_table_extractor_ray.stages.sessions import grouped_ffill

    rows = [
        # (event_id, user, ts, value)
        (1, 1, 10, None), (2, 1, 20, 5.0), (3, 1, 30, None), (4, 1, 40, 7.0),
        (5, 2, 5, None), (6, 2, 6, None),            # all-null user
        (7, 3, 1, 9.0), (8, 3, 1, None),             # same ts, id tiebreak
        (9, 4, 2, 1.0),
    ]
    ds = ray.data.from_items(
        [
            {"event_id": e, "user_id": u, "ts": np.datetime64(t, "us"), "value": v}
            for e, u, t, v in rows
        ]
    ).repartition(3)
    got = {r["event_id"]: r["filled"] for r in grouped_ffill(ds, "value").take_all()}
    assert got == {
        1: None, 2: 5.0, 3: 5.0, 4: 7.0,
        5: None, 6: None,
        7: 9.0, 8: 9.0,
        9: 1.0,
    }


def test_nn_join_recall(ray_session):
    """ANN join: every left vector matched; recall@1 vs brute force
    ≥ 0.9 at nprobe=8/64 cells; exact on planted identical vectors."""
    import ray.data

    from pdf_table_extractor_ray.stages.similarity import _normalize, nn_join

    rng = np.random.default_rng(41)
    R = _normalize(rng.normal(size=(300, 16)))
    L = _normalize(rng.normal(size=(120, 16)))
    L[:20] = R[:20]  # planted exact matches

    def tbl(mat, ids):
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(
                    [r.astype(np.float32).tolist() for r in mat],
                    pa.list_(pa.float32()),
                ),
            }
        )

    left = ray.data.from_arrow(tbl(L, list(range(1000, 1120)))).repartition(3)
    right = ray.data.from_arrow(tbl(R, list(range(300)))).repartition(4)
    out = {r["vec_id"]: r for r in nn_join(left, right, n_clusters=16, nprobe=8).take_all()}
    assert len(out) == 120  # every left matched at nprobe=8/16 cells

    Lf = _normalize(np.array([np.asarray(v, np.float32) for v in L], np.float64))
    Rf = _normalize(np.array([np.asarray(v, np.float32) for v in R], np.float64))
    truth = np.argmax(Lf @ Rf.T, axis=1)
    hits = sum(
        1 for i in range(120) if out[1000 + i]["nn_id"] == int(truth[i])
    )
    assert hits >= 108  # recall@1 ≥ 0.9
    for i in range(20):  # planted exact matches must be found exactly
        assert out[1000 + i]["nn_id"] == i
        assert out[1000 + i]["cos_micro"] >= 999_990


def test_corpus_prep_v3_gates(ray_session):
    """v3 composite: a degenerate-repetition doc is cut by the new
    map-only gates while normal docs survive to the v2 stages."""
    import ray.data

    from pdf_table_extractor_ray.pipelines.corpus_prep import prepare_corpus_v3

    rng = np.random.default_rng(13)
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    normal = [
        {"doc_id": i, "text": " ".join(rng.choice(words, 60))} for i in range(1, 9)
    ]
    degenerate = [{"doc_id": 9, "text": "spam " * 200}]
    ds = ray.data.from_items(normal + degenerate).repartition(2)
    kept = {r["doc_id"] for r in prepare_corpus_v3(ds).take_all()}
    assert 9 not in kept
    assert len(kept & set(range(1, 9))) >= 6  # normal docs survive


def test_corpus_prep_v4_label_consistency_gate(ray_session):
    """v4 composite: a doc whose text is plainly another language's
    vocabulary gets dropped by the trained-classifier gate; correctly
    labeled docs survive to the v3 stages."""
    import ray.data

    from pdf_table_extractor_ray.pipelines.corpus_prep import prepare_corpus_v4

    rng = np.random.default_rng(17)
    vocab = {
        "aa": ["sun", "moon", "star", "sky", "cloud", "dawn"],
        "bb": ["fish", "whale", "kelp", "tide", "reef", "brine"],
    }
    rows = []
    for i in range(40):
        lang = "aa" if i % 2 == 0 else "bb"
        rows.append(
            {
                "doc_id": i,
                "lang": lang,
                "text": " ".join(rng.choice(vocab[lang], 40)),
            }
        )
    # planted mislabel: bb-vocabulary text labeled aa
    rows.append(
        {"doc_id": 99, "lang": "aa", "text": " ".join(rng.choice(vocab["bb"], 40))}
    )
    ds = ray.data.from_items(rows).repartition(3)
    kept = {r["doc_id"] for r in prepare_corpus_v4(ds).take_all()}
    assert 99 not in kept
    assert len(kept & set(range(40))) >= 30


def test_containment_pairs_superset(ray_session):
    """Containment: a short doc fully embedded in a long one scores
    1.0 where Jaccard stays near |A|/|B|."""
    import ray.data

    from pdf_table_extractor_ray.stages.dedup import ngram_jaccard_pairs

    short = "alpha beta gamma delta epsilon zeta"
    long = short + " " + " ".join(f"w{i}" for i in range(60))
    ds = ray.data.from_items(
        [{"doc_id": 1, "text": short}, {"doc_id": 2, "text": long}]
    )
    cont = ngram_jaccard_pairs(
        ds, width=3, threshold=0.5, metric="containment"
    ).take_all()
    assert len(cont) == 1 and cont[0]["containment"] == 1.0
    jac = ngram_jaccard_pairs(ds, width=3, threshold=0.5).take_all()
    assert jac == []  # Jaccard misses the superset pair entirely


def test_pareto_frontier_brute(ray_session):
    """Skyline vs O(n²) dominance brute force: duplicates collapse,
    nulls drop, many small blocks so the local-then-merge path is
    exercised, canonical (x asc) output order."""
    import ray.data

    from pdf_table_extractor_ray.stages.skyline import pareto_frontier

    rng = np.random.default_rng(7)
    xs = rng.integers(0, 50, 400)
    ys = rng.integers(0, 50, 400)
    rows = [{"x": int(a), "y": int(b)} for a, b in zip(xs, ys)]
    rows += [{"x": 3, "y": None}, {"x": None, "y": 99}]  # dropped
    ds = ray.data.from_items(rows).repartition(8)
    got = pareto_frontier(ds, "x", "y").take_all()
    got_pairs = [(r["x"], r["y"]) for r in got]

    pts = set(zip(xs.tolist(), ys.tolist()))
    expect = sorted(
        (x, y)
        for x, y in pts
        if not any(
            (a <= x and b >= y and (a < x or b > y)) for a, b in pts
        )
    )
    assert got_pairs == expect  # value AND canonical-order parity


def test_run_length_stats_brute(ray_session):
    """Gaps-and-islands collapse vs a per-user python RLE, with ties
    broken by event_id and null users/types excluded."""
    import ray.data

    from pdf_table_extractor_ray.stages.sessions import run_length_stats

    rng = np.random.default_rng(11)
    rows = []
    eid = 0
    for uid in range(1, 8):
        for _ in range(int(rng.integers(1, 40))):
            rows.append(
                {
                    "event_id": eid,
                    "user_id": uid,
                    "ts": int(rng.integers(0, 20)) * 1_000_000,
                    "event_type": str(rng.choice(["a", "b", "c"])),
                }
            )
            eid += 1
    rows.append({"event_id": eid, "user_id": None, "ts": 0, "event_type": "a"})
    rows.append({"event_id": eid + 1, "user_id": 1, "ts": 0, "event_type": None})

    import pyarrow as pa_mod

    tbl = pa_mod.table(
        {
            "event_id": pa_mod.array([r["event_id"] for r in rows], pa_mod.int64()),
            "user_id": pa_mod.array([r["user_id"] for r in rows], pa_mod.int64()),
            "ts": pa_mod.array(
                [r["ts"] for r in rows], pa_mod.timestamp("us")
            ),
            "event_type": pa_mod.array([r["event_type"] for r in rows]),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(4)
    got = {
        r["user_id"]: (r["n_runs"], r["max_run"])
        for r in run_length_stats(ds, n_buckets=4).take_all()
    }

    expect = {}
    by_user: dict = {}
    for r in rows:
        if r["user_id"] is None or r["event_type"] is None:
            continue
        by_user.setdefault(r["user_id"], []).append(r)
    for uid, evs in by_user.items():
        evs.sort(key=lambda r: (r["ts"], r["event_id"]))
        runs = []
        for r in evs:
            if runs and runs[-1][0] == r["event_type"]:
                runs[-1][1] += 1
            else:
                runs.append([r["event_type"], 1])
        expect[uid] = (len(runs), max(n for _, n in runs))
    assert got == expect


def test_dense_time_fill_gaps(ray_session):
    """Gap fill: populated buckets keep their value, missing grid
    buckets appear exactly once with the fill value, out-of-grid agg
    rows drop."""
    import ray.data

    from pdf_table_extractor_ray.stages.calendar import dense_time_fill

    step = 10
    agg = ray.data.from_items(
        [
            {"t": 20, "v": 7},
            {"t": 50, "v": 3},
            {"t": 90, "v": 1},  # outside [20, 60] → dropped
        ]
    )
    out = dense_time_fill(agg, "t", "v", step_us=step, lo_us=20, hi_us=60).take_all()
    got = {r["t"]: r["v"] for r in out}
    assert got == {20: 7, 30: 0, 40: 0, 50: 3, 60: 0}
    assert len(out) == 5


def test_dim_moments_brute(ray_session):
    """Per-dim moment mass vs numpy brute force; null vectors drop."""
    import ray.data

    from pdf_table_extractor_ray.stages.similarity import dim_moments

    rng = np.random.default_rng(3)
    vecs = rng.normal(scale=0.3, size=(40, 5)).astype(np.float32)
    items = [{"embedding": v.tolist()} for v in vecs] + [{"embedding": None}]
    ds = ray.data.from_items(items).repartition(3)
    got = {r["dim"]: r for r in dim_moments(ds).take_all()}

    micro = np.floor(vecs.astype(np.float64) * 1_000_000).astype(np.int64)
    for d in range(5):
        row = got[d + 1]
        assert row["n"] == 40
        assert row["sum_micro"] == int(micro[:, d].sum())
        assert row["sumsq_micro2"] == int((micro[:, d] ** 2).sum())


def test_weighted_median_brute(ray_session):
    """Weighted median vs weight-expanded numpy median: duplicates,
    skewed weights, fractional weights floored, w<1 and nulls dropped,
    tiny nbins to force maximum bisection depth."""
    import ray.data

    from pdf_table_extractor_ray.stages.sketches import weighted_median

    rng = np.random.default_rng(5)
    vals = np.round(rng.normal(scale=100, size=300), 2)
    wts = rng.integers(1, 9, size=300)
    rows = [{"v": float(v), "w": float(w) + 0.7} for v, w in zip(vals, wts)]
    rows += [{"v": 1.0, "w": 0.4}, {"v": None, "w": 3.0}, {"v": 2.0, "w": None}]
    ds = ray.data.from_items(rows).repartition(5)
    got = weighted_median(ds, "v", "w", nbins=16)

    expanded = np.repeat(vals, wts)  # floor(w+0.7) == w
    s = np.sort(expanded)
    rank = (len(s) + 1) // 2
    assert got == s[rank - 1]


def test_weighted_kth_by_groups(ray_session):
    """Per-key weighted quantile vs weight-expanded numpy brute force;
    unweighted path regression-checked in the same dataset."""
    import ray.data

    from pdf_table_extractor_ray.stages.sketches import (
        kth_smallest_by,
        weighted_kth_smallest_by,
    )

    rng = np.random.default_rng(17)
    rows = []
    groups = {}
    for g in ("a", "b", "c"):
        n = int(rng.integers(20, 120))
        vs = np.round(rng.normal(scale=50, size=n), 2)
        ws = rng.integers(1, 7, size=n)
        groups[g] = (vs, ws)
        rows += [
            {"k": g, "v": float(v), "w": float(w)} for v, w in zip(vs, ws)
        ]
    rows.append({"k": "a", "v": 1.0, "w": 0.2})  # floored to 0 → dropped
    ds = ray.data.from_items(rows).repartition(4)

    for q_num, q_den in ((1, 2), (3, 4)):
        got = weighted_kth_smallest_by(ds, "k", "v", "w", q_num, q_den, nbins=16)
        gm = dict(zip(got.column("key").to_pylist(), got.column("kth").to_pylist()))
        for g, (vs, ws) in groups.items():
            s = np.sort(np.repeat(vs, ws))
            rank = -(-q_num * len(s) // q_den)
            assert gm[g] == s[rank - 1], (g, q_num, q_den)

    # unweighted path unchanged (the w=0.2 row COUNTS here: no weight col)
    got_u = kth_smallest_by(ds, "k", "v", 1, 2, nbins=16)
    gm_u = dict(zip(got_u.column("key").to_pylist(), got_u.column("kth").to_pylist()))
    va = np.sort(np.append(groups["a"][0], 1.0))
    assert gm_u["a"] == va[-(-len(va) // 2) - 1]


def test_asof_join_tolerance(ray_session):
    import ray.data

    from pdf_table_extractor_ray.stages.asof import asof_join

    left = ray.data.from_items(
        [
            {"k": 1, "lt": 10, "ev": "a"},   # nearest rt=7, distance 3
            {"k": 1, "lt": 25, "ev": "b"},   # nearest rt=20, distance 5
            {"k": 1, "lt": 40, "ev": "c"},   # nearest rt=30, distance 10
        ]
    )
    right = ray.data.from_items(
        [
            {"rk": 1, "rt": 7, "px": 70},
            {"rk": 1, "rt": 20, "px": 200},
            {"rk": 1, "rt": 30, "px": 300},
        ]
    )
    got = {
        r["lt"]: r["px"]
        for r in asof_join(
            left, right, on="k", right_on="rk", left_ts="lt", right_ts="rt",
            tolerance_us=5,
        ).take_all()
    }
    assert got[10] == 70      # within tolerance
    assert got[25] == 200     # exactly at tolerance (≤)
    assert got[40] is None    # nearest is 10 away → miss
    fwd = {
        r["lt"]: r["px"]
        for r in asof_join(
            left, right, on="k", right_on="rk", left_ts="lt", right_ts="rt",
            direction="forward", tolerance_us=5,
        ).take_all()
    }
    assert fwd[25] == 300     # rt=30, distance 5 ≤ tol
    assert fwd[10] is None    # earliest rt ≥ 10 is 20, distance 10 → miss


def test_session_funnel_brute_force(ray_session):
    """Bucket-vectorized session funnel == a per-user driver oracle on
    seeded random event streams."""
    import numpy as np
    import pyarrow as pa

    import ray.data

    from pdf_table_extractor_ray.stages.sessions import session_funnel

    rng = np.random.default_rng(11)
    n = 4000
    users = rng.integers(0, 150, n)
    ts = rng.integers(0, 3 * 86_400_000_000, n)
    types = rng.choice(["view", "click", "purchase", "error"], n)
    gap = 30 * 60 * 1_000_000

    # driver oracle: per-user sort, explicit session walk
    n_sess = n_first = n_conv = 0
    for u in np.unique(users):
        m = users == u
        order = np.argsort(ts[m], kind="stable")
        ut, uty = ts[m][order], types[m][order]
        sessions = []
        cur = [0]
        for i in range(1, len(ut)):
            if ut[i] - ut[i - 1] > gap:
                sessions.append(cur)
                cur = []
            cur.append(i)
        sessions.append(cur)
        for idxs in sessions:
            n_sess += 1
            vt = [ut[i] for i in idxs if uty[i] == "view"]
            ct = [ut[i] for i in idxs if uty[i] == "click"]
            if vt:
                n_first += 1
                if ct and max(ct) > min(vt):
                    n_conv += 1

    t = pa.table(
        {
            "user_id": pa.array(users, pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "event_type": pa.array(types, pa.string()),
        }
    )
    got = session_funnel(ray.data.from_arrow(t).repartition(8))
    assert got.column("n_sessions").to_pylist() == [n_sess]
    assert got.column("n_first_sessions").to_pylist() == [n_first]
    assert got.column("n_converted").to_pylist() == [n_conv]


def test_adaptive_join_matches_shuffle_join(ray_session):
    """adaptive_join == hash_shuffle_join on BOTH sides of the
    broadcast threshold, for every supported how."""
    import numpy as np
    import pyarrow as pa

    import ray.data

    from pdf_table_extractor_ray.stages.joins import adaptive_join, hash_shuffle_join

    rng = np.random.default_rng(4)
    left = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(rng.integers(0, 50, 500), pa.int64()),
                "lv": pa.array(np.arange(500), pa.int64()),
            }
        )
    ).repartition(4)
    right = ray.data.from_arrow(
        pa.table(
            {
                "rk": pa.array(np.arange(0, 40, 2), pa.int64()),
                "rv": pa.array(np.arange(20) * 10, pa.int64()),
            }
        )
    ).repartition(2)

    def norm(rows, cols):
        return sorted(tuple(r.get(c) for c in cols) for r in rows)

    for how in ("inner", "left", "left_semi", "left_anti"):
        want = hash_shuffle_join(left, right, on="k", right_on="rk", how=how).take_all()
        cols = sorted(want[0].keys()) if want else ["k", "lv"]
        for bmax in (1_000_000, 0):  # broadcast path, then forced shuffle path
            got = adaptive_join(
                left, right, on="k", right_on="rk", how=how, broadcast_max=bmax
            ).take_all()
            assert norm(got, cols) == norm(want, cols), (how, bmax)


def test_adaptive_join_null_keys_never_match(ray_session):
    import pyarrow as pa

    import ray.data

    from pdf_table_extractor_ray.stages.joins import adaptive_join

    left = ray.data.from_arrow(
        pa.table({"k": pa.array([1, None, 3], pa.int64())})
    )
    right = ray.data.from_arrow(
        pa.table({"rk": pa.array([1, None], pa.int64())})
    )
    semi = adaptive_join(left, right, on="k", right_on="rk", how="left_semi").take_all()
    assert [r["k"] for r in semi] == [1]
    anti = adaptive_join(left, right, on="k", right_on="rk", how="left_anti").take_all()
    assert sorted(r["k"] is None or r["k"] == 3 for r in anti) == [True, True]


def test_linear_quality_model_brute_force(ray_session):
    """Actor-pool classifier == direct per-doc python scoring, and the
    report is invariant to batch/partition layout."""
    import hashlib
    import re as _re

    import pyarrow as pa

    import ray.data

    from pdf_table_extractor_ray.stages.classifier import (
        quality_report_by_source,
        score_documents,
        token_weight,
    )

    docs = [
        ("a", "Hello World hello 42"),
        ("a", ""),
        ("b", None),
        ("b", "x" * 50 + " the THE The!"),
        ("a", "unique tokens only once"),
        ("c", "repeat repeat repeat repeat"),
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "source": pa.array([s for s, _ in docs], pa.string()),
            "text": pa.array([t for _, t in docs], pa.string()),
        }
    )
    tok_re = _re.compile(r"[a-z0-9]+")
    # direct per-doc oracle
    want = {}
    for i, (src, txt) in enumerate(docs):
        toks = tok_re.findall((txt or "").lower())
        w = sum(token_weight(t) for t in toks)
        want[i] = (src, len(toks), w)
    # md5 device sanity: matches hashlib directly
    assert token_weight("hello") == int(
        hashlib.md5(b"hello").hexdigest()[:8], 16
    ) % 1001 - 500

    for nparts in (1, 3):
        ds = ray.data.from_arrow(tbl).repartition(nparts)
        scored = {r["doc_id"]: r for r in score_documents(ds, concurrency=(1, 2)).take_all()}
        assert len(scored) == len(docs)
        for i, (src, ntok, w) in want.items():
            assert scored[i]["n_model_tokens"] == ntok, i
            assert scored[i]["w_sum"] == w, i
        rep = {
            r["source"]: r
            for r in quality_report_by_source(score_documents(ds)).take_all()
        }
        assert rep["a"]["n_docs"] == 3 and rep["a"]["n_scored"] == 2
        assert rep["b"]["n_scored"] == 1  # None-text doc scores 0 tokens
        assert rep["c"]["sum_w"] == 4 * token_weight("repeat")
        assert rep["c"]["n_pass"] == (1 if 4 * token_weight("repeat") > 0 else 0)


def test_mmr_matches_reference(ray_session):
    """mmr_select with pool >= corpus == exact greedy MMR computed
    directly in numpy, and the result is partition-layout invariant."""
    import numpy as np
    import pyarrow as pa

    import ray.data

    from pdf_table_extractor_ray.stages.similarity import mmr_select

    rng = np.random.RandomState(7)
    n, dim, k, lam = 40, 8, 6, 0.7
    vecs = rng.standard_normal((n, dim))
    ids = np.arange(100, 100 + n, dtype=np.int64)
    q = rng.standard_normal(dim)

    # direct greedy reference
    def norm(m):
        nn = np.linalg.norm(m, axis=-1, keepdims=True)
        nn[nn == 0] = 1.0
        return m / nn

    vn = norm(vecs)
    rel = vn @ (q / np.linalg.norm(q))
    sel, max_sim = [], np.zeros(n)
    avail = np.ones(n, bool)
    for _ in range(k):
        s = lam * rel - (1 - lam) * max_sim
        s[~avail] = -np.inf
        best = np.flatnonzero(s == s.max())
        pick = best[np.argmin(ids[best])]
        avail[pick] = False
        sel.append(int(ids[pick]))
        max_sim = np.maximum(max_sim, vn @ vn[pick])

    tbl = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.array(list(vecs), pa.list_(pa.float64())),
        }
    )
    for nparts in (1, 4):
        ds = ray.data.from_arrow(tbl).repartition(nparts)
        out = mmr_select(ds, q, k=k, lam=lam, pool=n)
        assert out.column("vec_id").to_pylist() == sel, nparts
        assert out.column("rank").to_pylist() == list(range(1, k + 1))
        # rank-1 is the plain relevance argmax
        assert out.column("vec_id")[0].as_py() == int(ids[np.argmax(rel)])


def test_canonicalize_url_rules():
    from pdf_table_extractor_ray.stages.links import canonicalize_url as c

    assert c("HTTP://Example.COM:80/a/b") == "http://example.com/a/b"
    assert c("https://example.com:443/x") == "https://example.com/x"
    assert c("https://example.com:8443/x") == "https://example.com:8443/x"
    assert c("https://example.com/p?utm_source=a&b=2&a=1&gclid=Z") == (
        "https://example.com/p?a=1&b=2"
    )
    assert c("https://example.com/p#frag") == "https://example.com/p"
    assert c("https://example.com") == "https://example.com/"
    # junk passes through unharmed
    assert c("not a url") == "not a url"
    assert c("") == ""


def test_url_dup_groups_collapses_variants(ray_session):
    import pyarrow as pa

    import ray.data

    from pdf_table_extractor_ray.stages.links import url_dup_groups

    urls = [
        "https://a.test/page",
        "https://a.test/page?utm_source=x",
        "HTTPS://A.test:443/page#top",
        "https://b.test/solo",
        "https://c.test/q?x=1&y=2",
        "https://c.test/q?y=2&x=1",  # param order variant
        None,
    ]
    for nparts in (1, 3):
        ds = ray.data.from_arrow(
            pa.table({"url": pa.array(urls, pa.string())})
        ).repartition(nparts)
        got = {
            r["canonical_url"]: r["n_variants"] for r in url_dup_groups(ds).take_all()
        }
        assert got == {
            "https://a.test/page": 3,
            "https://c.test/q?x=1&y=2": 2,
        }, nparts


def test_keep_max_per_key_matches_pandas(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data

    from pdf_table_extractor_ray.stages.topk import keep_max_per_key

    rng = np.random.RandomState(3)
    n = 500
    k1 = rng.randint(0, 40, n).astype(np.int64)
    k2 = rng.randint(0, 5, n).astype(np.int64)
    arg = rng.permutation(n).astype(np.int64)  # unique per row
    val = rng.randint(0, 1000, n).astype(np.int64)
    tbl = pa.table({"k1": k1, "k2": k2, "arg": arg, "val": val})

    import pandas as pd

    pdf = tbl.to_pandas()
    want = (
        pdf.sort_values("arg").groupby(["k1", "k2"]).tail(1).sort_values(["k1", "k2"])
    )[["k1", "k2", "arg", "val"]].reset_index(drop=True)

    for nparts in (1, 5):
        ds = ray.data.from_arrow(tbl).repartition(nparts)
        got = (
            keep_max_per_key(ds, ["k1", "k2"], "arg")
            .to_pandas()
            .sort_values(["k1", "k2"])[["k1", "k2", "arg", "val"]]
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want), nparts


def test_collect_sorted_distinct_brute_force(ray_session):
    """collect_sorted_distinct == sorted-distinct join per key, for
    string AND int keys, with nulls on both axes excluded, across
    enough keys that every hash bucket path is exercised."""
    import random

    import pyarrow as pa
    import ray.data

    from pdf_table_extractor_ray.stages.collect import collect_sorted_distinct

    rng = random.Random(7)
    keys, vals = [], []
    for _ in range(3000):
        keys.append(rng.choice([f"s{i}" for i in range(40)] + [None]))
        vals.append(rng.choice([f"v{i}" for i in range(9)] + [None]))
    ds = ray.data.from_arrow(pa.table({"k": keys, "v": vals}))
    got = {
        r["k"]: (r["values"], r["n_values"])
        for r in collect_sorted_distinct(ds, "k", "v", sep="|").take_all()
    }
    expect = {}
    for k, v in zip(keys, vals):
        if k is not None and v is not None:
            expect.setdefault(k, set()).add(v)
    assert got == {
        k: ("|".join(sorted(vs)), len(vs)) for k, vs in expect.items()
    }
    # int keys round-trip with their type preserved
    ds2 = ray.data.from_arrow(
        pa.table({"k": [2, 1, 2, 1], "v": ["b", "z", "a", "z"]})
    )
    rows = sorted(
        collect_sorted_distinct(ds2, "k", "v").take_all(), key=lambda r: r["k"]
    )
    assert [(r["k"], r["values"], r["n_values"]) for r in rows] == [
        (1, "z", 1),
        (2, "a,b", 2),
    ]


def test_collect_ranked_brute_force(ray_session):
    """collect_ranked orders by (weight desc, value asc) per key."""
    import pyarrow as pa
    import ray.data

    from pdf_table_extractor_ray.stages.collect import collect_ranked

    pairs = pa.table(
        {
            "k": ["a", "a", "a", "b", "b", None],
            "v": ["x", "y", "z", "q", "p", "r"],
            "w": [2, 9, 2, 1, 1, 5],
        }
    )
    rows = sorted(
        collect_ranked(
            ray.data.from_arrow(pairs), "k", "v", "w", out_col="r"
        ).take_all(),
        key=lambda r: r["k"],
    )
    assert [(r["k"], r["r"], r["n_values"]) for r in rows] == [
        ("a", "y,x,z", 3),  # 9 first; tie 2-2 broken by value asc
        ("b", "p,q", 2),  # tie broken by value asc
    ]


def test_extract_page_metadata(ray_session):
    """Crawl-index head fields: first-wins semantics, attribute-order
    invariance, relative canonical resolution, robots token split,
    charset-sniffed decode, non-HTML payloads skipped in-band."""
    import ray.data

    from pdf_table_extractor_ray.stages.links import extract_page_metadata

    html1 = (
        b"<html lang='pt-BR'><head>"
        b"<title>  First \n Title &amp; Co </title>"
        b"<title>second ignored</title>"
        b'<meta content="Desc one" name="DESCRIPTION">'
        b'<meta name="description" content="desc two ignored">'
        b"<meta property='og:title' content='OG &quot;T&quot;'>"
        b'<meta name="robots" content=" NOINDEX , follow ">'
        b'<link rel="alternate canonical" href="/canon/page">'
        b'<link rel="canonical" href="https://late.test/x">'
        b"</head><body>hi</body></html>"
    )
    # latin-1 payload with meta charset: title must decode without U+FFFD
    html2 = (
        '<html><head><meta charset="iso-8859-1">'
        "<title>Ação</title></head></html>"
    ).encode("iso-8859-1")
    html3 = b"<p>bare page: no head fields at all</p>"
    rows = [
        {"url": "https://a.test/dir/p", "html": html1},
        {"url": "https://b.test/q", "html": html2},
        {"url": "https://c.test/r", "html": html3},
        {"url": "https://d.test/pdf", "html": b"%PDF-1.4 binary"},
        {"url": "https://e.test/none", "html": None},
    ]
    ds = ray.data.from_items(rows).repartition(2)
    got = {r["url"]: r for r in extract_page_metadata(ds).take_all()}
    assert sorted(got) == ["https://a.test/dir/p", "https://b.test/q", "https://c.test/r"]

    a = got["https://a.test/dir/p"]
    assert a["title"] == "First Title & Co"  # first wins, ws-collapsed, entity
    assert a["meta_description"] == "Desc one"  # attr order + case invariant
    assert a["og_title"] == 'OG "T"'
    assert a["canonical_url"] == "https://a.test/canon/page"  # rel token list + relative resolve
    assert a["robots_noindex"] is True and a["robots_nofollow"] is False
    assert a["html_lang"] == "pt-BR"
    assert a["n_meta_tags"] == 4

    b = got["https://b.test/q"]
    assert b["title"] == "Ação"  # charset-sniffed, no U+FFFD
    assert b["canonical_url"] == "" and b["meta_description"] == ""

    c = got["https://c.test/r"]
    assert c["title"] == "" and c["html_lang"] == "" and c["n_meta_tags"] == 0
    assert c["robots_noindex"] is False


def test_term_contexts_kwic(ray_session):
    """KWIC windows: width clamp at both string edges, first-hit
    window when the term recurs, exact occurrence counts, non-matching
    and null docs absent."""
    import ray.data

    from pdf_table_extractor_ray.stages.search import term_contexts

    rows = [
        {"doc_id": 1, "text": "data at the very start of this document body"},
        {"doc_id": 2, "text": "x" * 50 + " data " + "y" * 50},
        {"doc_id": 3, "text": "a data b data c data d"},
        {"doc_id": 4, "text": "nothing to see here"},
        {"doc_id": 5, "text": None},
        {"doc_id": 6, "text": "tail hit ends with data"},
    ]
    ds = ray.data.from_items(rows).repartition(2)
    got = {r["doc_id"]: r for r in term_contexts(ds, "data", width=5).take_all()}
    assert sorted(got) == [1, 2, 3, 6]
    assert got[1]["n_occ"] == 1 and got[1]["context"] == "data at t"
    assert got[2]["n_occ"] == 1 and got[2]["context"] == "xxxx data yyyy"
    # greedy leftmost RE2 window anchored at the FIRST occurrence
    assert got[3]["n_occ"] == 3 and got[3]["context"] == "a data b da"
    assert got[6]["n_occ"] == 1 and got[6]["context"] == "with data"


def test_weighted_prefix_threshold_greedy_parity(ray_session):
    """Budget-head threshold vs brute-force greedy prefix: unique keys,
    zero-weight rows ride free, budget edges (0, exactly-total,
    over-total), tiny nbins to force maximum bisection depth."""
    import ray.data

    from pdf_table_extractor_ray.stages.sketches import weighted_prefix_threshold

    rng = np.random.default_rng(11)
    n = 200
    keys = rng.permutation(n).astype(np.int64)  # unique, shuffled
    wts = rng.integers(0, 9, size=n).astype(np.int64)  # zeros included
    rows = [{"k": float(k), "w": float(w)} for k, w in zip(keys, wts)]
    ds = ray.data.from_items(rows).repartition(7)

    order = np.argsort(keys)
    sk, sw = keys[order], wts[order]
    cum = np.cumsum(sw)
    total = int(sw.sum())

    for budget in (0, 1, total // 3, total // 2, total - 1, total, total + 5):
        thr, tw = weighted_prefix_threshold(ds, "k", "w", budget, nbins=16)
        assert tw == total
        if budget >= total:
            assert thr is None
            continue
        got = set(sk[sk < thr].tolist())
        want = set(sk[cum <= budget].tolist())
        assert got == want, budget


def test_doclen_ks_brute(ray_session):
    """KS integer numerator vs a direct two-sample scan over the same
    synthetic table written to parquet (src0/src1 only, other sources
    and null lengths ignored)."""
    import importlib

    import pyarrow.parquet as pq

    entry = importlib.import_module("__ray_entry__")
    rng = np.random.default_rng(23)
    na, nb = 120, 80
    xa = rng.integers(10, 60, size=na)
    xb = rng.integers(20, 80, size=nb)
    t = pa.table(
        {
            "doc_id": pa.array(range(na + nb + 2), pa.int64()),
            "text": ["w"] * (na + nb + 2),
            "lang": ["en"] * (na + nb + 2),
            "source": ["src0"] * na + ["src1"] * nb + ["src9", "src0"],
            "n_chars": pa.array(
                list(xa) + list(xb) + [999, None], pa.int64()
            ),
        }
    )
    d = "/tmp/pdfx_test_ks"
    os.makedirs(d, exist_ok=True)
    pq.write_table(t, f"{d}/documents.parquet")
    row = entry._q_doclen_ks(d).take_all()[0]

    support = np.unique(np.concatenate([xa, xb]))
    cuma = np.searchsorted(np.sort(xa), support, side="right")
    cumb = np.searchsorted(np.sort(xb), support, side="right")
    dv = np.abs(nb * cuma - na * cumb)
    assert row["n_a"] == na and row["n_b"] == nb
    assert row["ks_num"] == int(dv.max())
    assert row["ks_at"] == int(support[int(np.argmax(dv))])


def test_doclen_mwu_brute(ray_session):
    """Doubled Mann-Whitney U vs direct midrank computation over the
    same parquet table (ties present by construction)."""
    import importlib

    import pyarrow.parquet as pq

    entry = importlib.import_module("__ray_entry__")
    rng = np.random.default_rng(31)
    na, nb = 90, 110
    xa = rng.integers(5, 25, size=na)  # narrow range forces heavy ties
    xb = rng.integers(10, 30, size=nb)
    t = pa.table(
        {
            "doc_id": pa.array(range(na + nb), pa.int64()),
            "text": ["w"] * (na + nb),
            "lang": ["en"] * (na + nb),
            "source": ["src0"] * na + ["src1"] * nb,
            "n_chars": pa.array(list(xa) + list(xb), pa.int64()),
        }
    )
    d = "/tmp/pdfx_test_mwu"
    os.makedirs(d, exist_ok=True)
    pq.write_table(t, f"{d}/documents.parquet")
    row = entry._q_doclen_mwu(d).take_all()[0]

    pooled = np.concatenate([xa, xb])
    order = np.argsort(pooled, kind="stable")
    ranks2 = np.empty(len(pooled), np.int64)  # doubled midranks
    sp = pooled[order]
    i = 0
    while i < len(sp):
        j = i
        while j < len(sp) and sp[j] == sp[i]:
            j += 1
        ranks2[order[i:j]] = (i + 1) + j  # 2·midrank = (i+1 + j)
        i = j
    u2 = int(ranks2[:na].sum()) - na * (na + 1)
    assert row["n_a"] == na and row["n_b"] == nb
    assert row["u2_a"] == u2
    # rank-sum identity: 2·U_a + 2·U_b = 2·n_a·n_b
    assert 0 <= u2 <= 2 * na * nb


def test_pca_power_iteration_matches_eigh(ray_session):
    """Block power iteration vs numpy eigh on an anisotropic gaussian:
    eigenvalue parity (rtol 1e-3), loading direction parity
    (|cos| >= 0.999), and block-layout invariance (repartition)."""
    import ray.data

    from pdf_table_extractor_ray.stages.similarity import pca_top_components

    rng = np.random.default_rng(3)
    d, n = 12, 400
    scales = np.array([9.0, 4.0, 2.0] + [0.3] * (d - 3))
    q = np.linalg.qr(rng.standard_normal((d, d)))[0]
    x = (rng.standard_normal((n, d)) * scales) @ q.T + rng.standard_normal(d)
    rows = [{"embedding": r.tolist()} for r in x]

    xc = x - x.mean(axis=0)
    evals, evecs = np.linalg.eigh(xc.T @ xc / (n - 1))
    evals, evecs = evals[::-1], evecs[:, ::-1]

    got = pca_top_components(
        ray.data.from_items(rows).repartition(6), n_components=3, iters=60
    )
    lam = got.column("eigenvalue").to_pylist()
    loads = got.column("loading").to_pylist()
    for j in range(3):
        assert abs(lam[j] - evals[j]) <= 1e-3 * evals[j], (j, lam[j], evals[j])
        cos = abs(float(np.dot(loads[j], evecs[:, j])))
        assert cos >= 0.999, (j, cos)

    got2 = pca_top_components(
        ray.data.from_items(rows).repartition(2), n_components=3, iters=60
    )
    lam2 = got2.column("eigenvalue").to_pylist()
    for j in range(3):
        assert abs(lam2[j] - lam[j]) <= 1e-6 * max(abs(lam[j]), 1.0)


def test_mutual_nn_pairs_exhaustive_parity(ray_session):
    """mutual_nn_pairs in exhaustive mode (n_clusters=1) vs numpy
    brute-force reciprocal-NN over two disjoint random sides."""
    import ray.data

    from pdf_table_extractor_ray.stages.similarity import mutual_nn_pairs

    rng = np.random.default_rng(19)
    na, nb, d = 60, 50, 16
    a = rng.standard_normal((na, d))
    b = rng.standard_normal((nb, d))
    # plant two strong mutual pairs
    b[7] = a[3] * 1.1
    b[12] = a[40] * 0.9
    left = ray.data.from_items(
        [{"vec_id": i, "embedding": a[i].tolist()} for i in range(na)]
    ).repartition(3)
    right = ray.data.from_items(
        [{"vec_id": 1000 + j, "embedding": b[j].tolist()} for j in range(nb)]
    ).repartition(3)

    got = {
        (r["a_id"], r["b_id"])
        for r in mutual_nn_pairs(left, right, n_clusters=1, nprobe=1).take_all()
    }

    an = a / np.linalg.norm(a, axis=1, keepdims=True)
    bn = b / np.linalg.norm(b, axis=1, keepdims=True)
    sims = an @ bn.T
    fwd = np.argmax(sims, axis=1)
    bwd = np.argmax(sims, axis=0)
    want = {(i, 1000 + int(fwd[i])) for i in range(na) if bwd[int(fwd[i])] == i}
    assert got == want
    assert (3, 1007) in got and (40, 1012) in got


def test_dp_segmentation_exhaustive_parity():
    """Bellman k-segmentation vs exhaustive enumeration of all split
    placements on small series (ties -> earliest split)."""
    import importlib
    from itertools import combinations

    entry = importlib.import_module("__ray_entry__")

    def brute(x, k):
        n = len(x)
        best, best_sse = None, np.inf
        for splits in combinations(range(1, n), k - 1):
            cuts = [0, *splits, n]
            sse = 0.0
            for lo, hi in zip(cuts, cuts[1:]):
                seg = x[lo:hi]
                sse += float(((seg - seg.mean()) ** 2).sum())
            if sse < best_sse - 1e-9:
                best_sse, best = sse, list(zip(cuts, cuts[1:]))
        return best, best_sse

    rng = np.random.default_rng(41)
    for trial in range(6):
        n = int(rng.integers(6, 14))
        k = int(rng.integers(2, min(5, n)))
        x = np.concatenate(
            [rng.normal(loc, 0.5, size=rng.integers(2, 5)) for loc in (0, 8, -4)]
        )[:n]
        if len(x) < k:
            continue
        got = entry._dp_segment_bounds(x, k)
        want, want_sse = brute(x, k)
        got_sse = sum(
            float(((x[lo:hi] - x[lo:hi].mean()) ** 2).sum()) for lo, hi in got
        )
        assert abs(got_sse - want_sse) <= 1e-6 * max(want_sse, 1.0), trial
        # every segment non-empty and covering
        assert got[0][0] == 0 and got[-1][1] == len(x)
        assert all(hi > lo for lo, hi in got)


def test_revenue_segments_planted_shifts(ray_session):
    """End-to-end: a series with two planted level shifts recovers the
    true boundaries as segment starts."""
    import importlib

    import pyarrow.parquet as pq

    entry = importlib.import_module("__ray_entry__")
    day_us = 86_400_000_000
    days = np.arange(40, dtype=np.int64) * day_us
    level = np.where(np.arange(40) < 15, 100.0, np.where(np.arange(40) < 25, 900.0, 300.0))
    t = pa.table(
        {
            "o_orderdate": pa.array(days, pa.timestamp("us")),
            "o_totalprice": pa.array(level, pa.float64()),
        }
    )
    d = "/tmp/pdfx_test_seg"
    os.makedirs(d, exist_ok=True)
    pq.write_table(t, f"{d}/orders.parquet")
    rows = entry._q_revenue_segments(d).take_all()
    # K=4 splits a 3-level series: the two true shifts must appear
    starts = {r["start_day_us"] for r in rows}
    assert 15 * day_us in starts and 25 * day_us in starts
    assert sum(r["n_days"] for r in rows) == 40
    assert sum(r["sum_cents"] for r in rows) == int((level * 100).sum())


def test_sq8_roundtrip_error_bound():
    """SQ8 encode→decode error per dim is ≤ span/255/2 + float fuzz."""
    from pdf_table_extractor_ray.stages.similarity import sq8_decode, sq8_encode

    rng = np.random.RandomState(3)
    m = rng.standard_normal((200, 16))
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    lo, hi = m.min(axis=0), m.max(axis=0)
    rec = sq8_decode(sq8_encode(m, lo, hi), lo, hi)
    bound = (hi - lo) / 255.0 / 2.0 + 1e-12
    assert (np.abs(rec - m) <= bound[None, :]).all()


def test_sq8_degenerate_dim():
    """A constant dimension must survive encode/decode exactly."""
    from pdf_table_extractor_ray.stages.similarity import sq8_decode, sq8_encode

    m = np.array([[0.5, 1.0], [0.5, -1.0], [0.5, 0.25]])
    lo, hi = m.min(axis=0), m.max(axis=0)
    rec = sq8_decode(sq8_encode(m, lo, hi), lo, hi)
    assert np.allclose(rec[:, 0], 0.5)


def test_daily_revenue_interp_trunc_semantics(ray_session, tmp_path):
    """Linear gap fill: handmade sparse series with a NEGATIVE slope
    gap — fills must use truncating division (DuckDB // semantics)."""
    import datetime as dt

    import pyarrow.parquet as pq
    import ray.data  # noqa: F401

    import __ray_entry__ as entrymod

    base = dt.datetime(1995, 1, 1)
    rows = {
        0: 1000,  # day 0
        3: 250,   # gap days 1, 2 (slope -750/3 = -250)
        4: 999,   # no gap
        7: 1006,  # gap days 5, 6 (slope +7/3 -> trunc 2.33 -> 2)
    }
    days, prices = [], []
    for d, cents in rows.items():
        days.append(base + dt.timedelta(days=d))
        prices.append(cents / 100.0)
    pq.write_table(
        pa.table(
            {
                "o_orderdate": pa.array(days, pa.timestamp("us")),
                "o_totalprice": pa.array(prices, pa.float64()),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    out = entrymod._q_daily_revenue_interp(str(tmp_path))
    got = {
        (r["day_us"] // 86_400_000_000): (r["cents"], r["interpolated"])
        for r in [dict(x) for x in out.take_all()]
    }
    d0 = next(iter(got))  # smallest day index present
    rel = {k - min(got): v for k, v in got.items()}
    assert rel[0] == (1000, 0)
    assert rel[1] == (750, 1)   # 1000 + trunc(-750*1/3) = 1000 - 250
    assert rel[2] == (500, 1)
    assert rel[3] == (250, 0)
    assert rel[4] == (999, 0)
    assert rel[5] == (1001, 1)  # 999 + trunc(7*1/3) = 999 + 2
    assert rel[6] == (1003, 1)  # 999 + trunc(7*2/3) = 999 + 4
    assert rel[7] == (1006, 0)


def test_corpus_prep_v5_template_strip_equivalence(ray_session):
    """v5 composite: per-source template sentinels injected into every
    page are mined + stripped, so v5(injected) must equal v4(clean) —
    the strip restores the clean corpus byte-exactly before the gates."""
    import ray.data

    from pdf_table_extractor_ray.pipelines.corpus_prep import (
        prepare_corpus_v4,
        prepare_corpus_v5,
    )

    rng = np.random.default_rng(23)
    vocab = {
        "aa": ["sun", "moon", "star", "sky", "cloud", "dawn"],
        "bb": ["fish", "whale", "kelp", "tide", "reef", "brine"],
    }
    clean = []
    for i in range(40):
        lang = "aa" if i % 2 == 0 else "bb"
        clean.append(
            {
                "doc_id": i,
                "source": f"site{i % 4}",
                "lang": lang,
                "text": " ".join(rng.choice(vocab[lang], 40)),
            }
        )
    injected = [
        {**r, "text": f"NAV {r['source']} MENU\n{r['text']}\nCOPYRIGHT {r['source']}"}
        for r in clean
    ]
    v4 = {
        r["doc_id"]: r["text_dedup"]
        for r in prepare_corpus_v4(ray.data.from_items(clean).repartition(3)).take_all()
    }
    v5 = {
        r["doc_id"]: r["text_dedup"]
        for r in prepare_corpus_v5(
            ray.data.from_items(injected).repartition(3), min_count=2
        ).take_all()
    }
    assert v4 == v5
    assert len(v4) >= 30


def test_ccnet_ppl_buckets_brute_parity(ray_session):
    """head/middle/tail counts match a straight-line numpy reference
    (same LM, same quantile_disc tercile semantics)."""
    import ray.data

    from pdf_table_extractor_ray.stages.lm import (
        ccnet_ppl_buckets,
        perplexity_scores,
        top_vocab,
        total_tokens,
        train_token_counts,
    )

    rng = np.random.default_rng(11)
    words = [f"w{i}" for i in range(30)]
    texts, langs = [], []
    for i in range(90):
        k = int(rng.integers(3, 12))
        texts.append(" ".join(rng.choice(words, size=k)))
        langs.append("en" if i % 3 else "pt")
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(langs),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(4)

    got = {
        (r["lang"], r["bucket"]): r["n_docs"]
        for r in ccnet_ppl_buckets(ds).take_all()
    }

    counts = train_token_counts(ds)
    vocab = top_vocab(counts)
    total = total_tokens(counts)
    rows = perplexity_scores(ds, vocab, total, keep_cols=("lang",)).take_all()
    ref = {}
    for lang in ("en", "pt"):
        ppl = np.sort([r["ppl"] for r in rows if r["lang"] == lang])
        n = len(ppl)
        t1 = ppl[int(np.ceil(n / 3)) - 1]  # quantile_disc rank ceil(q*n)
        t2 = ppl[int(np.ceil(2 * n / 3)) - 1]
        vals = np.array([r["ppl"] for r in rows if r["lang"] == lang])
        ref[(lang, "head")] = int((vals <= t1).sum())
        ref[(lang, "middle")] = int(((vals > t1) & (vals <= t2)).sum())
        ref[(lang, "tail")] = int((vals > t2).sum())
    ref = {k: v for k, v in ref.items() if v > 0}
    assert got == ref
    # terciles: buckets within one tie of n/3 on this tie-free corpus
    for lang, n_lang in (("en", 60), ("pt", 30)):
        for b in ("head", "middle", "tail"):
            assert abs(got[(lang, b)] - n_lang / 3) <= 1


def test_png_adam7_interlaced_roundtrip():
    """Adam7 decode: 7 independently filtered passes scatter back to
    the exact source pixels — roundtrip across filter cycles, odd
    dims (partial passes) and tiny images (empty passes)."""
    import numpy as np

    from pdf_table_extractor_ray.stages.multimodal import decode_png, encode_png

    rng = np.random.default_rng(21)
    for h, w in ((16, 16), (13, 29), (7, 5), (1, 1), (2, 11)):
        img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        blob = encode_png(img, filters=[0, 1, 2, 3, 4], interlace=True)
        assert np.array_equal(decode_png(blob), img), (h, w)
        # and the plain encode of the same image still matches
        assert np.array_equal(
            decode_png(encode_png(img, filters=[0, 1, 2, 3, 4])), img
        )


def test_webp_recognized_but_declared_seam():
    import pytest

    from pdf_table_extractor_ray.stages.multimodal import (
        DecodeFeaturize,
        _sniff,
        decode_image,
    )

    fake_webp = b"RIFF\x10\x00\x00\x00WEBPVP8 " + b"\x00" * 16
    assert _sniff(fake_webp) == "webp"
    with pytest.raises(ValueError, match="webp"):
        decode_image(fake_webp)
    import pyarrow as pa

    stage = DecodeFeaturize(mode="real")
    with pytest.raises(NotImplementedError, match="webp"):
        stage(pa.table({"payload": pa.array([fake_webp], pa.binary())}))
