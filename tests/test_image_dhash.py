"""Perceptual image hashing (multimodal.dhash64) and the generic
64-bit Hamming pair join (dedup.hash64_hamming_pairs)."""

import numpy as np
import pyarrow as pa
import pytest

from pdf_table_extractor_ray.stages.dedup import hash64_hamming_pairs
from pdf_table_extractor_ray.stages.multimodal import (
    ImageDHash,
    decode_image,
    dhash64,
    encode_png,
    encode_ppm,
    image_dhash_pairs,
)


def _img(seed=1, h=18, w=16, cap=240):
    return np.random.default_rng(seed).integers(0, cap, (h, w, 3)).astype(np.uint8)


def test_dhash_brightness_invariance():
    img = _img()
    assert dhash64(img) == dhash64(img + 5)
    assert dhash64(img) == dhash64(img + 15)


def test_dhash_codec_invariance():
    img = _img(2)
    h = dhash64(img)
    assert dhash64(decode_image(encode_ppm(img))) == h
    assert dhash64(decode_image(encode_png(img))) == h


def test_dhash_block_upscale_invariance():
    img = _img(3, h=8, w=9)
    up = np.repeat(np.repeat(img, 2, axis=0), 2, axis=1)
    assert dhash64(img) == dhash64(up)


def test_dhash_content_sensitivity():
    img = _img(4)
    other = img.copy()
    other[:9] = 255 - other[:9]
    a, b = dhash64(img), dhash64(other)
    assert bin(a ^ b).count("1") > 8


def test_dhash_range_and_determinism():
    h = dhash64(_img(5))
    assert 0 <= h < 2**64
    assert h == dhash64(_img(5))


def test_decode_image_rejects_non_image():
    with pytest.raises(ValueError):
        decode_image(b"RIFFxxxxWAVEnot-an-image")


def test_hamming_pairs_small(ray_session):
    import ray

    # 0 and 1 differ in 1 bit; 0 and mid in 33 bits; two identical
    hashes = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "hash64": pa.array(
                [0, 1, 0x1FFFFFFFF << 16, 0], pa.uint64()
            ),
        }
    )
    out = hash64_hamming_pairs(
        ray.data.from_arrow(hashes), hash_col="hash64", max_hamming=3
    ).take_all()
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in out}
    assert pairs == {(1, 2): 1, (1, 4): 0, (2, 4): 1}


def test_hamming_pairs_wide_threshold_pigeonhole(ray_session):
    import ray

    # 7 bits apart — needs the max_hamming+1=8-band split to guarantee
    # one agreeing band (4 bands would only guarantee ≤3)
    a = 0
    b = (1 << 0) | (1 << 9) | (1 << 18) | (1 << 27) | (1 << 36) | (1 << 45) | (1 << 54)
    hashes = pa.table(
        {
            "doc_id": pa.array([10, 20], pa.int64()),
            "hash64": pa.array([a, b], pa.uint64()),
        }
    )
    out = hash64_hamming_pairs(
        ray.data.from_arrow(hashes), hash_col="hash64", max_hamming=7
    ).take_all()
    assert len(out) == 1 and out[0]["hamming"] == 7


def test_image_dhash_stage_fault_isolation():
    batch = pa.table(
        {
            "media_id": pa.array([1, 2], pa.int64()),
            "payload": pa.array([encode_ppm(_img(6)), b"garbage"], pa.binary()),
        }
    )
    out = ImageDHash()(batch)
    assert out.column("dhash64").null_count == 1
    assert out.column("error").to_pylist()[1] is not None
    assert out.column("error").to_pylist()[0] is None


def test_image_dhash_pairs_e2e(ray_session):
    import ray

    rows_id, rows_payload = [], []
    for i in range(8):
        base = _img(100 + i)
        enc = [encode_ppm, encode_png][i % 2]
        rows_id.append(i)
        rows_payload.append(enc(base))
        if i % 2 == 0:  # planted brightness-shifted copy
            rows_id.append(i + 1000)
            rows_payload.append(enc(base + 5))
    rows_id.append(9999)  # undecodable row must not kill the job
    rows_payload.append(b"not an image")
    ds = ray.data.from_arrow(
        pa.table(
            {
                "media_id": pa.array(rows_id, pa.int64()),
                "payload": pa.array(rows_payload, pa.binary()),
            }
        )
    )
    out = image_dhash_pairs(ds, max_hamming=4, concurrency=(1, 2)).take_all()
    got = {(r["doc_a"], r["doc_b"]) for r in out}
    assert got == {(i, i + 1000) for i in range(8) if i % 2 == 0}
    assert all(r["hamming"] == 0 for r in out)


def test_image_dedup_keep_e2e(ray_session):
    import ray

    from pdf_table_extractor_ray.stages.multimodal import image_dedup_keep

    ids, payloads = [], []
    for i in range(6):
        base = _img(200 + i)
        ids.append(i)
        payloads.append(encode_ppm(base))
        if i < 2:  # two copies of image 0, one of image 1 → chain via CC
            ids.append(i + 100)
            payloads.append(encode_ppm(base + 5))
            ids.append(i + 200)
            payloads.append(encode_ppm(base + 10))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )
    )
    kept = sorted(r["media_id"] for r in image_dedup_keep(ds).take_all())
    assert kept == [0, 1, 2, 3, 4, 5]


def test_image_dedup_keep_no_dups_passthrough(ray_session):
    import ray

    from pdf_table_extractor_ray.stages.multimodal import image_dedup_keep

    ds = ray.data.from_arrow(
        pa.table(
            {
                "media_id": pa.array([7, 8], pa.int64()),
                "payload": pa.array(
                    [encode_ppm(_img(301)), encode_ppm(_img(302))], pa.binary()
                ),
            }
        )
    )
    kept = sorted(r["media_id"] for r in image_dedup_keep(ds).take_all())
    assert kept == [7, 8]


def test_hamming_pairs_radius_over_15_raises(ray_session):
    """max_hamming > 15 used to silently clamp to 16 bands, losing the
    pigeonhole guarantee for distances 16..h (ADVICE-r4) — now loud."""
    import ray

    hashes = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "hash64": pa.array([0, 1], pa.uint64()),
        }
    )
    with pytest.raises(ValueError, match="max_hamming"):
        hash64_hamming_pairs(
            ray.data.from_arrow(hashes), hash_col="hash64", max_hamming=16
        )


def test_hamming_pairs_radius_15_recall(ray_session):
    """The new maximum radius: 15 bits apart, 16 bands of 4 bits —
    exactly one all-zero band survives the pigeonhole."""
    import ray

    a = 0
    b = 0
    for i in range(15):  # set one bit in each of the first 15 nibbles
        b |= 1 << (4 * i)
    hashes = pa.table(
        {
            "doc_id": pa.array([10, 20], pa.int64()),
            "hash64": pa.array([a, b], pa.uint64()),
        }
    )
    out = hash64_hamming_pairs(
        ray.data.from_arrow(hashes), hash_col="hash64", max_hamming=15
    ).take_all()
    assert len(out) == 1 and out[0]["hamming"] == 15
