"""Baseline JPEG codec (stages/jpeg.py) and its multimodal wiring."""

import numpy as np
import pyarrow as pa
import pytest

from pdf_table_extractor_ray.stages.jpeg import (
    HUFF_AC_LUM,
    HUFF_DC_LUM,
    QT_LUM,
    ZIGZAG,
    _canonical_codes,
    _decode_table,
    _quality_tables,
    decode_jpeg,
    encode_jpeg,
)


def _gradient(h, w, seed=0):
    rng = np.random.default_rng(seed)
    x = np.linspace(0, 1, w)
    y = np.linspace(0, 1, h)
    img = np.stack(
        [
            np.clip(255 * np.outer(y, x), 0, 255),
            np.clip(255 * np.outer(1 - y, x), 0, 255),
            np.clip(128 + 90 * np.sin(np.outer(y * 5, x * 5)), 0, 255),
        ],
        axis=2,
    )
    img += rng.normal(0, 6, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


# --- reference pieces, independent of the codec's own _A matrix -----------


def _ref_idct(block64):
    """Direct T.81 Annex A IDCT double sum — no shared code with _A."""
    import math

    f = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / math.sqrt(2) if u == 0 else 1.0
                    cv = 1 / math.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu
                        * cv
                        * block64[u * 8 + v]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            f[x, y] = s / 4.0
    return f


def test_huffman_tables_roundtrip():
    """Canonical codes are prefix-free and the decode walk inverts the
    encode map for every symbol of the standard tables."""
    for spec in (HUFF_DC_LUM, HUFF_AC_LUM):
        enc = _canonical_codes(*spec)
        dec = _decode_table(*spec)
        assert len(enc) == len(dec)
        for sym, (code, ln) in enc.items():
            assert dec[(ln, code)] == sym
        # prefix-free: no code is a prefix of a longer one
        codes = sorted(((ln, code) for code, ln in enc.values()))
        for i, (l1, c1) in enumerate(codes):
            for l2, c2 in codes[i + 1 :]:
                if l2 > l1:
                    assert (c2 >> (l2 - l1)) != c1


@pytest.mark.parametrize("sub", ["4:4:4", "4:2:0"])
@pytest.mark.parametrize("ri", [0, 3])
def test_roundtrip_psnr(sub, ri):
    img = _gradient(29, 37, seed=3)
    blob = encode_jpeg(img, quality=95, subsampling=sub, restart_interval=ri)
    dec = decode_jpeg(blob)
    assert dec.shape == img.shape
    mse = np.mean((dec.astype(float) - img.astype(float)) ** 2)
    psnr = 10 * np.log10(255**2 / mse)
    assert psnr > (36 if sub == "4:4:4" else 24), psnr


def test_decode_recovers_exact_coefficients():
    """Entropy coding is lossless: the decoded image must equal the
    reconstruction from the encoder's own quantized coefficients,
    computed here with an INDEPENDENT direct-double-sum IDCT (no shared
    transform code) — luma-only single-MCU case, bit-exact."""
    from pdf_table_extractor_ray.stages.jpeg import _encode_plane

    img = _gradient(8, 8, seed=1)
    # grayscale input (equal channels) → Cb=Cr=128 exactly, chroma
    # blocks quantize to all-zero, luma carries everything
    gray = np.repeat(img[:, :, :1], 3, axis=2)
    blob = encode_jpeg(gray, quality=85, subsampling="4:4:4")
    dec = decode_jpeg(blob)

    y = 0.299 * gray[:, :, 0] + 0.587 * gray[:, :, 1] + 0.114 * gray[:, :, 2]
    qlum, _ = _quality_tables(85)
    zz = _encode_plane(y.astype(np.float64), qlum)[0, 0]  # zigzag quantized
    deq = np.zeros(64)
    deq[ZIGZAG] = zz * qlum[ZIGZAG]  # dequantized raster vector
    ref = _ref_idct(deq) + 128.0
    ref_px = np.clip(np.round(np.clip(ref, -1e9, 1e9)), 0, 255).astype(np.uint8)
    # decoder applies the same YCbCr->RGB with Cb=Cr=128 → R=G=B=Y
    assert np.array_equal(dec[:, :, 0], ref_px)
    assert np.array_equal(dec[:, :, 1], ref_px)
    assert np.array_equal(dec[:, :, 2], ref_px)


def test_restart_interval_equals_no_restart():
    """RSTn markers change the byte stream, not the pixels."""
    img = _gradient(24, 40, seed=7)
    a = decode_jpeg(encode_jpeg(img, quality=90, restart_interval=0))
    b = decode_jpeg(encode_jpeg(img, quality=90, restart_interval=1))
    c = decode_jpeg(encode_jpeg(img, quality=90, restart_interval=5))
    assert np.array_equal(a, b) and np.array_equal(a, c)


def test_rejects_unsupported_modes_and_truncation():
    img = _gradient(16, 16)
    blob = bytearray(encode_jpeg(img, quality=90))
    sof = blob.find(b"\xff\xc0")
    blob[sof + 1] = 0xC9  # pretend arithmetic-coded (SOF9)
    with pytest.raises(ValueError, match="0xC9"):
        decode_jpeg(bytes(blob))
    with pytest.raises(ValueError):
        decode_jpeg(encode_jpeg(img)[:40])  # truncated header
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"nope")


def test_decode_image_dispatch_and_dhash_invariance():
    """The JPEG twin of a PNG image must decode through the shared
    sniffer and produce the SAME dHash (q=97, 4:4:4 — re-encoding
    noise far below the dHash gradient margins)."""
    from pdf_table_extractor_ray.stages.multimodal import (
        decode_image,
        dhash64,
        encode_png,
    )

    # strong monotone gradient → every dHash compare has a wide margin
    x = np.linspace(0, 220, 64)
    img = np.repeat(
        np.stack([x, x, x], axis=1)[None, :, :], 48, axis=0
    ).astype(np.uint8)
    png_hash = dhash64(decode_image(encode_png(img)))
    jpg = encode_jpeg(img, quality=97, subsampling="4:4:4")
    jpg_img = decode_image(jpg)  # dispatches through _sniff
    assert dhash64(jpg_img) == png_hash


def test_featurize_and_resize_over_jpeg_corpus(ray_session):
    """synth_media_corpus now plants JPEG members (ids % 8 == 2):
    the featurize and resize actor pools must decode them with zero
    in-band errors."""
    import ray.data

    from pdf_table_extractor_ray.stages.multimodal import (
        _sniff,
        featurize_media,
        resize_images,
        synth_media_corpus,
    )

    corpus = synth_media_corpus()
    kinds = [
        _sniff(p.as_py()) for p in corpus.column("payload")
    ]
    n_jpeg = sum(1 for k in kinds if k == "jpeg")
    assert n_jpeg >= 10  # the corpus really carries JPEG members

    ds = ray.data.from_arrow(corpus).repartition(4)
    feats = featurize_media(ds, mode="real", concurrency=(1, 2)).take_all()
    assert len(feats) == corpus.num_rows  # no row lost, no exception

    resized = resize_images(ds, out_w=8, out_h=8, concurrency=(1, 2)).take_all()
    by_id = {r["media_id"]: r for r in resized}
    for mid, k in zip(corpus.column("media_id").to_pylist(), kinds):
        r = by_id[mid]
        if k in ("ppm", "png", "gif", "jpeg"):
            assert r["resize_error"] is None, (mid, k, r["resize_error"])
            assert r["resized"] is not None
        else:  # wav rows surface the in-band error
            assert r["resize_error"] is not None


def test_grayscale_jpeg_decode():
    """1-component scans (no chroma at all) decode and replicate."""
    import struct

    from pdf_table_extractor_ray.stages import jpeg as J

    # build a minimal grayscale JPEG by hand from the encoder's pieces
    img = _gradient(16, 16, seed=5)
    y = (
        0.299 * img[:, :, 0] + 0.587 * img[:, :, 1] + 0.114 * img[:, :, 2]
    ).astype(np.float64)
    qlum, _ = J._quality_tables(90)
    blocks = J._encode_plane(y, qlum)
    dc_codes = J._canonical_codes(*J.HUFF_DC_LUM)
    ac_codes = J._canonical_codes(*J.HUFF_AC_LUM)
    w = J._BitWriter()
    pred = 0
    for by in range(2):
        for bx in range(2):
            blk = blocks[by, bx]
            diff = int(blk[0]) - pred
            pred = int(blk[0])
            s, code = J._magnitude(diff)
            c, ln = dc_codes[s]
            w.write(c, ln)
            if s:
                w.write(code, s)
            run = 0
            nz = np.nonzero(blk[1:])[0]
            last = int(nz[-1]) + 1 if len(nz) else 0
            for k in range(1, last + 1):
                v = int(blk[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    c, ln = ac_codes[0xF0]
                    w.write(c, ln)
                    run -= 16
                s, code = J._magnitude(v)
                c, ln = ac_codes[(run << 4) | s]
                w.write(c, ln)
                w.write(code, s)
                run = 0
            if last < 63:
                c, ln = ac_codes[0x00]
                w.write(c, ln)
    w.flush()
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) + qlum[J.ZIGZAG].astype(np.uint8).tobytes()
    out += b"\xff\xc0" + struct.pack(">H", 11) + bytes([8]) + struct.pack(">HH", 16, 16) + bytes([1, 1, 0x11, 0])
    dht = J._dht_segment(0, 0, J.HUFF_DC_LUM) + J._dht_segment(1, 0, J.HUFF_AC_LUM)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    out += b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])
    out += w.out + b"\xff\xd9"
    dec = decode_jpeg(bytes(out))
    assert dec.shape == (16, 16, 3)
    assert np.array_equal(dec[:, :, 0], dec[:, :, 1])
    err = np.abs(dec[:, :, 0].astype(float) - y)
    assert err.mean() < 6.0


# --- progressive (SOF2) -----------------------------------------------------


@pytest.mark.parametrize("sub", ["4:4:4", "4:2:0"])
@pytest.mark.parametrize("q", [95, 75, 40])
def test_progressive_decode_equals_baseline(sub, q):
    """Entropy coding is lossless and both modes share the quantized
    coefficients, so the progressive decode must be PIXEL-IDENTICAL to
    the baseline decode of the same image — one equality pins the DC
    first/refine scans, AC spectral bands, successive approximation,
    EOB runs and the correction-bit walk at once."""
    from pdf_table_extractor_ray.stages.jpeg import encode_jpeg_progressive

    img = _gradient(29, 37, seed=5)
    base = decode_jpeg(encode_jpeg(img, quality=q, subsampling=sub))
    prog = decode_jpeg(encode_jpeg_progressive(img, quality=q, subsampling=sub))
    assert np.array_equal(base, prog)


def test_progressive_eob_runs_across_blocks():
    """A nearly-flat image quantizes to long zero tails — EOBn symbols
    with r > 0 (runs spanning many blocks) must decode exactly."""
    from pdf_table_extractor_ray.stages.jpeg import encode_jpeg_progressive

    img = np.full((48, 64, 3), 130, np.uint8)
    img[20, 30] = 180  # one feature so not every block is identical
    base = decode_jpeg(encode_jpeg(img, quality=60))
    blob = encode_jpeg_progressive(img, quality=60)
    assert np.array_equal(base, decode_jpeg(blob))
    # the stream really is multi-scan SOF2
    assert blob.count(b"\xff\xda") == 10 and b"\xff\xc2" in blob


def test_progressive_dispatch_and_truncation():
    from pdf_table_extractor_ray.stages.jpeg import encode_jpeg_progressive
    from pdf_table_extractor_ray.stages.multimodal import decode_image

    img = _gradient(16, 24, seed=9)
    blob = encode_jpeg_progressive(img, quality=90)
    assert decode_image(blob).shape == (16, 24, 3)  # sniffs as jpeg
    with pytest.raises(ValueError):
        decode_jpeg(blob[: len(blob) // 2])  # truncated mid-scan


def test_synth_corpus_carries_progressive_members(ray_session):
    import ray.data

    from pdf_table_extractor_ray.stages.multimodal import (
        featurize_media,
        synth_media_corpus,
    )

    corpus = synth_media_corpus()
    n_prog = sum(
        1
        for p in corpus.column("payload").to_pylist()
        if p.startswith(b"\xff\xd8") and b"\xff\xc2" in p
    )
    assert n_prog >= 3
    ds = ray.data.from_arrow(corpus).repartition(4)
    feats = featurize_media(ds, mode="real", concurrency=(1, 2)).take_all()
    assert len(feats) == corpus.num_rows
