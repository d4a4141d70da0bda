"""GIF codec (stages/multimodal.py): LZW round-trips, interlace,
sub-rectangle composite, dictionary growth, in-band errors."""

import numpy as np
import pytest

from pdf_table_extractor_ray.stages.multimodal import (
    _GIF_INTERLACE_PASSES,
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)


def _img(h, w, seed=5, colors=17):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (colors, 3)).astype(np.uint8)
    return pal[rng.integers(0, colors, (h, w))]


def test_gif_roundtrip_exact():
    for h, w in ((1, 1), (7, 13), (33, 21), (64, 64)):
        img = _img(h, w)
        assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_gif_roundtrip_gradient_and_solid():
    grad = np.repeat(
        np.linspace(0, 255, 48).astype(np.uint8)[None, :, None], 3, axis=2
    ).repeat(20, axis=0)
    assert np.array_equal(decode_gif(encode_gif(grad)), grad)
    solid = np.full((9, 9, 3), 200, np.uint8)
    assert np.array_equal(decode_gif(encode_gif(solid)), solid)


def test_lzw_dictionary_growth_and_reset():
    # long repetitive stream: dictionary grows through several code
    # widths and past 4095 → CLEAR reset path
    idx = np.tile(np.arange(4, dtype=np.int64), 8000)
    back = _lzw_decode(_lzw_encode(idx, 2), 2)
    assert np.array_equal(back, idx.astype(np.uint8))


def test_lzw_kwkwk_case():
    # 'aaaa...' triggers the code-not-yet-in-table branch immediately
    idx = np.zeros(50, np.int64)
    back = _lzw_decode(_lzw_encode(idx, 2), 2)
    assert np.array_equal(back, np.zeros(50, np.uint8))


def test_gif_interlaced_decodes_to_original():
    img = _img(19, 11, seed=9)
    blob = bytearray(encode_gif(img))
    # rewrite the single full-frame image block as interlaced: set the
    # flag and re-encode pixel rows in the four-pass order
    pos = blob.index(0x2C, 13 + 3 * (2 << (blob[10] & 7)))
    h, w = img.shape[:2]
    order = np.concatenate(
        [np.arange(start, h, step) for start, step in _GIF_INTERLACE_PASSES]
    )
    pal, idx = np.unique(img.reshape(-1, 3), axis=0, return_inverse=True)
    rows = idx.reshape(h, w)[order]
    mcs = blob[pos + 10]
    data = _lzw_encode(rows.ravel().astype(np.int64), mcs)
    out = bytes(blob[: pos + 9]) + bytes([blob[pos + 9] | 0x40, mcs])
    for s in range(0, len(data), 255):
        chunk = data[s : s + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    assert np.array_equal(decode_gif(out), img)


def test_gif_subrect_composites_on_background():
    inner = np.full((2, 3, 3), 7, np.uint8)
    blob = bytearray(encode_gif(inner))
    # enlarge the logical screen to 5x6; frame stays a 2x3 sub-rect at (1,2)
    blob[6:8] = (6).to_bytes(2, "little")
    blob[8:10] = (5).to_bytes(2, "little")
    pos = blob.index(0x2C, 13 + 3 * (2 << (blob[10] & 7)))
    blob[pos + 1 : pos + 3] = (2).to_bytes(2, "little")  # left
    blob[pos + 3 : pos + 5] = (1).to_bytes(2, "little")  # top
    got = decode_gif(bytes(blob))
    assert got.shape == (5, 6, 3)
    assert np.array_equal(got[1:3, 2:5], inner)
    # background = palette color 0 (the only color here is 7,7,7)
    assert np.array_equal(got[0, 0], np.array([7, 7, 7], np.uint8))


def test_gif_errors():
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF")
    with pytest.raises(ValueError):
        encode_gif(_img(20, 20, colors=17, seed=1) + _img(20, 20, colors=250, seed=2))
    # truncated data: fewer pixels than the frame declares
    img = _img(8, 8)
    blob = bytearray(encode_gif(img))
    pos = blob.index(0x2C, 13 + 3 * (2 << (blob[10] & 7)))
    blob[pos + 7 : pos + 9] = (200).to_bytes(2, "little")  # claim 200 rows
    with pytest.raises(ValueError):
        decode_gif(bytes(blob))


def test_gif_through_stages(ray_session):
    import ray.data

    from pdf_table_extractor_ray.stages.multimodal import (
        decode_ppm,
        featurize_media,
        resize_images,
    )

    img = _img(12, 10, seed=3)
    ds = ray.data.from_items([{"media_id": 0, "payload": encode_gif(img)}])
    feats = featurize_media(ds, mode="real", concurrency=(1, 1)).take_all()
    assert len(feats) == 1 and len(feats[0]["feature"]) > 0
    resized = resize_images(ds, out_w=4, out_h=4, concurrency=(1, 1)).take_all()
    assert resized[0]["resize_error"] is None
    assert decode_ppm(resized[0]["resized"]).shape == (4, 4, 3)
