"""Mojibake repair (functions/charset.py) and audio fingerprinting
(multimodal.audio_fingerprint64)."""

import numpy as np
import pyarrow as pa

from pdf_table_extractor_ray.functions.charset import (
    fix_mojibake_str,
    repair_mojibake,
)
from pdf_table_extractor_ray.stages.multimodal import (
    AudioFingerprint,
    audio_fingerprint64,
    audio_fingerprint_dups,
    decode_wav,
    encode_wav,
)


def _break(s: str, times: int = 1) -> str:
    for _ in range(times):
        s = s.encode("utf-8").decode("latin-1")
    return s


def test_fix_single_and_double_encoding():
    s = "café naïve — ação"
    assert fix_mojibake_str(_break(s)) == s
    assert fix_mojibake_str(_break(s, 2)) == s


def test_fix_leaves_clean_text_alone():
    for s in ["plain ascii", "café clean", "naïve — fine", "", "日本語"]:
        assert fix_mojibake_str(s) == s


def test_fix_rejects_invalid_roundtrip():
    # carries the marker shape but is NOT valid utf-8 after encode
    s = "Ã zzz"  # 0xC3 followed by space — not a continuation byte
    assert fix_mojibake_str(s) == s


def test_repair_stage(ray_session):
    import ray

    clean = "résumé déjà"
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([_break(clean), clean, None], pa.string()),
        }
    )
    out = {
        r["doc_id"]: r
        for r in repair_mojibake(ray.data.from_arrow(docs)).take_all()
    }
    assert out[1]["text"] == clean and out[1]["was_broken"] == 1
    assert out[2]["text"] == clean and out[2]["was_broken"] == 0
    assert out[3]["text"] is None and out[3]["was_broken"] == 0


def _clip(seed=1, n=2048, scale=1):
    x = np.random.default_rng(seed).normal(0, 3000, n)
    return (np.clip(x, -15000, 15000).astype(np.int16).astype(np.int32) * scale).astype(
        np.int16
    )


def test_audio_fingerprint_scale_invariance():
    base = _clip()
    h = audio_fingerprint64(decode_wav(encode_wav(base)))
    h2 = audio_fingerprint64(decode_wav(encode_wav(_clip(scale=2))))
    assert h == h2
    assert 0 <= h < 2**64


def test_audio_fingerprint_content_sensitivity():
    a = audio_fingerprint64(decode_wav(encode_wav(_clip(1))))
    b = audio_fingerprint64(decode_wav(encode_wav(_clip(2))))
    assert bin(a ^ b).count("1") > 8


def test_audio_fingerprint_stage_fault_isolation():
    batch = pa.table(
        {
            "media_id": pa.array([1, 2], pa.int64()),
            "payload": pa.array([encode_wav(_clip()), b"P6 not audio"], pa.binary()),
        }
    )
    out = AudioFingerprint()(batch)
    assert out.column("afp64").null_count == 1
    assert out.column("error").to_pylist() == [None, "ValueError: not a WAV payload"]


def test_audio_fingerprint_dups_e2e(ray_session):
    import ray

    ids, payloads = [], []
    for i in range(6):
        base = _clip(50 + i)
        ids.append(i)
        payloads.append(encode_wav(base))
        if i % 2 == 0:
            ids.append(i + 1000)
            payloads.append(encode_wav((base.astype(np.int32) * 2).astype(np.int16)))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )
    )
    out = audio_fingerprint_dups(ds, max_hamming=4, concurrency=(1, 2)).take_all()
    got = {(r["doc_a"], r["doc_b"]) for r in out}
    assert got == {(0, 1000), (2, 1002), (4, 1004)}
    assert all(r["hamming"] == 0 for r in out)


def test_video_fingerprint_invariances():
    from pdf_table_extractor_ray.stages.multimodal import (
        encode_rvid,
        video_fingerprint64,
    )

    rng = np.random.default_rng(42)
    frames = [rng.integers(0, 240, (12, 12, 3)).astype(np.uint8) for _ in range(12)]
    h = video_fingerprint64(encode_rvid(frames))
    assert 0 <= h < 2**64
    # uniform brightness shift cancels in every band compare
    assert video_fingerprint64(encode_rvid([f + 5 for f in frames])) == h
    # frame-rate doubling by repetition keeps the sampled trajectory
    assert video_fingerprint64(encode_rvid([f for f in frames for _ in (0, 1)])) == h
    # different content diverges
    other = [rng.integers(0, 240, (12, 12, 3)).astype(np.uint8) for _ in range(12)]
    assert bin(h ^ video_fingerprint64(encode_rvid(other))).count("1") > 8


def test_video_fingerprint_dups_e2e(ray_session):
    import ray

    from pdf_table_extractor_ray.stages.multimodal import (
        encode_rvid,
        video_fingerprint_dups,
    )

    ids, payloads = [], []
    for i in range(5):
        rng = np.random.default_rng(500 + i)
        frames = [rng.integers(0, 240, (12, 12, 3)).astype(np.uint8) for _ in range(12)]
        ids.append(i)
        payloads.append(encode_rvid(frames))
        if i % 2 == 0:
            ids.append(i + 1000)
            payloads.append(encode_rvid([f + 5 for f in frames]))
    ids.append(9999)  # undecodable payload must not kill the job
    payloads.append(b"not a video")
    ds = ray.data.from_arrow(
        pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )
    )
    out = video_fingerprint_dups(ds, max_hamming=4, concurrency=(1, 2)).take_all()
    got = {(r["doc_a"], r["doc_b"]) for r in out}
    assert got == {(0, 1000), (2, 1002), (4, 1004)}
    assert all(r["hamming"] == 0 for r in out)


def test_corpus_v6_repair_restores_dedup(ray_session):
    """The v6 interaction that motivates repairing BEFORE dedup: a
    mojibake re-crawl of a clean page hashes differently, so v5 keeps
    both copies; v6 repairs first and the re-crawl dedups away."""
    import ray.data

    from pdf_table_extractor_ray.pipelines.corpus_prep import (
        prepare_corpus_v5,
        prepare_corpus_v6,
    )

    rng = np.random.default_rng(31)
    # accented vocabulary: the mis-decode then alters EVERY word, so
    # no chunk of the broken re-crawl matches its original — chunk
    # dedup alone cannot catch it, only repair-then-hash can
    vocab = ["sóley", "mañana", "stjärna", "himmelsblå", "molnigt", "gryningen"]
    rows = []
    for i in range(30):
        rows.append(
            {
                "doc_id": i,
                "source": f"site{i % 3}",
                "lang": "aa",
                "text": " ".join(rng.choice(vocab, 40)),
            }
        )
    # re-crawls of docs 0 and 1, broken by the classic mis-decode
    for j, base in enumerate([0, 1]):
        rows.append(
            {
                "doc_id": 100 + j,
                "source": rows[base]["source"],
                "lang": "aa",
                "text": rows[base]["text"].encode("utf-8").decode("latin-1"),
            }
        )
    from pdf_table_extractor_ray.pipelines.corpus_prep import prepare_corpus_v4

    ds = ray.data.from_items(rows).repartition(3)
    v5 = {r["doc_id"] for r in prepare_corpus_v5(ds).take_all()}
    v6 = {r["doc_id"] for r in prepare_corpus_v6(ds).take_all()}
    # v5 sees broken bytes as distinct content → re-crawls survive
    assert {100, 101} <= v5
    # v6 repairs first → re-crawls hash-equal their originals and the
    # whole distorted corpus reduces to exactly the clean-corpus output
    assert not ({100, 101} & v6)
    clean = ray.data.from_items(rows[:30]).repartition(3)
    v4_clean = {r["doc_id"] for r in prepare_corpus_v4(clean).take_all()}
    assert v6 == v4_clean and len(v4_clean) >= 25


def test_corpus_v6_blocklist_gate(ray_session):
    import ray.data

    from pdf_table_extractor_ray.pipelines.corpus_prep import prepare_corpus_v6

    rng = np.random.default_rng(33)
    vocab = ["sun", "moon", "star", "sky", "cloud", "dawn"]
    rows = []
    for i in range(20):
        t = " ".join(rng.choice(vocab, 40))
        if i == 5:
            t += " casino jackpot casino jackpot casino jackpot casino"
        rows.append({"doc_id": i, "source": "s", "lang": "aa", "text": t})
    out = {
        r["doc_id"]
        for r in prepare_corpus_v6(
            ray.data.from_items(rows).repartition(2),
            blocklist_categories={"gambling": ["casino", "jackpot"]},
            blocklist_max_hits=3,
        ).take_all()
    }
    assert 5 not in out and len(out) >= 15
