"""Audio spectral features: rfft math against a direct oracle,
dominant-frequency recovery of synthetic sines, in-band faults."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pdf_table_extractor_ray.stages.multimodal import (
    AudioSpectral,
    decode_wav_meta,
    encode_wav,
    synth_media_corpus,
)


def _clip(freq: float, n: int = 800, rate: int = 8000) -> bytes:
    t = np.arange(n) / rate
    return encode_wav(np.sin(2 * np.pi * freq * t) * 12000, rate)


def test_dominant_frequency_recovered():
    stage = AudioSpectral()
    batch = pa.table(
        {
            "media_id": pa.array([0, 1, 2], pa.int64()),
            "payload": pa.array([_clip(f) for f in (200.0, 450.0, 790.0)], pa.binary()),
        }
    )
    out = stage(batch)
    dom = out.column("dominant_hz").to_pylist()
    # 800 samples @ 8 kHz → 10 Hz bins; windowing keeps the peak on-bin
    for got, want in zip(dom, (200.0, 450.0, 790.0)):
        assert abs(got - want) <= 10.0, (got, want)
    assert out.column("error").null_count == 3


def test_features_match_direct_oracle():
    payload = _clip(330.0)
    stage = AudioSpectral()
    out = stage(
        pa.table(
            {"media_id": pa.array([7], pa.int64()), "payload": pa.array([payload], pa.binary())}
        )
    )
    x, rate = decode_wav_meta(payload)
    xf = x.astype(np.float64)
    spec = np.abs(np.fft.rfft(xf * np.hanning(len(x))))
    freqs = np.fft.rfftfreq(len(x), 1.0 / rate)
    tot = spec.sum()
    centroid = (freqs * spec).sum() / tot
    assert out.column("n_samples").to_pylist() == [len(x)]
    assert out.column("rms").to_pylist()[0] == float(np.sqrt(np.mean(xf * xf)))
    assert out.column("centroid_hz").to_pylist()[0] == float(centroid)
    roll = freqs[int(np.searchsorted(np.cumsum(spec), 0.95 * tot))]
    assert out.column("rolloff95_hz").to_pylist()[0] == float(roll)


def test_bad_payloads_are_in_band():
    stage = AudioSpectral()
    out = stage(
        pa.table(
            {
                "media_id": pa.array([0, 1], pa.int64()),
                "payload": pa.array([b"not audio", None], pa.binary()),
            }
        )
    )
    assert out.column("rms").null_count == 2
    assert out.column("error").null_count == 0  # both rows explain themselves


def test_pipeline_over_synth_corpus(ray_session):
    import ray.data
    import pyarrow.compute as pc

    from pdf_table_extractor_ray.stages.multimodal import audio_spectral_features

    corpus = synth_media_corpus()
    audio = corpus.filter(pc.equal(corpus.column("kind"), "audio"))
    ds = ray.data.from_arrow(audio).repartition(4)
    feats = audio_spectral_features(ds, concurrency=(1, 2)).take_all()
    assert len(feats) == audio.num_rows
    assert all(r["error"] is None for r in feats)
    # synth clips are 100–900 Hz sine mixes: centroids must sit in-band
    assert all(50.0 < r["centroid_hz"] < 3500.0 for r in feats)
