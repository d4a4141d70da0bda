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
