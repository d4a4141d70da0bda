"""Multimodal-column plumbing: opaque binary payloads with typed
metadata, processed by actor-pool ``map_batches`` stages.

The decode kernels themselves are STUBBED (no image/audio libraries in
this environment): ``mode="fake"`` produces a deterministic
feature/thumbnail derived from the payload bytes so the Ray-side
plumbing — schema, batch sizing, actor signature, output layout — is
real and testable; ``mode="real"`` raises ``NotImplementedError`` at
the exact seam where PIL/ffmpeg would plug in.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

FEATURE_DIM = 32
THUMB_W = THUMB_H = 8


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in 'decoded image': seeded by payload digest."""
    digest = hashlib.sha256(payload or b"").digest()
    seed = int.from_bytes(digest[:8], "little") % (2**32)
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(THUMB_H, THUMB_W, 3), dtype=np.uint8)


class DecodeFeaturize:
    """Actor-pool stage: binary media column → fixed-dim feature vector
    + thumbnail bytes. Use small ``batch_size`` (media payloads are
    large); model/codec state loads once per actor in ``__init__``."""

    def __init__(self, mode: str = "fake", media_col: str = "payload"):
        if mode not in ("fake", "real"):
            raise ValueError(mode)
        self.mode = mode
        self.media_col = media_col
        # real mode would load codecs/models HERE (once per actor)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.mode == "real":
            raise NotImplementedError(
                "real media decode requires an image/audio library not present "
                "in this environment; plug PIL/torchvision/ffmpeg in here"
            )
        payloads = batch.column(self.media_col).to_pylist()
        feats = np.zeros((len(payloads), FEATURE_DIM), np.float32)
        thumbs = []
        for i, p in enumerate(payloads):
            img = _fake_decode(p)
            flat = img.astype(np.float32).ravel()
            # 'feature' = bucketed mean pooling of the fake decode
            feats[i] = flat[: FEATURE_DIM * (flat.size // FEATURE_DIM)].reshape(
                FEATURE_DIM, -1
            ).mean(axis=1) / 255.0
            thumbs.append(img.tobytes())
        feat_arr = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.ravel(), pa.float32()), FEATURE_DIM
        )
        out = batch.drop_columns([self.media_col])
        out = out.append_column("feature", feat_arr)
        out = out.append_column("thumbnail", pa.array(thumbs, pa.binary()))
        return out


def featurize_media(
    ds,
    media_col: str = "payload",
    mode: str = "fake",
    batch_size: int = 8,
    concurrency=(1, 8),
):
    """media Dataset → features: actor pool, small batches (payloads are
    MB-scale; batch × concurrency must fit worker heaps)."""
    return ds.map_batches(
        DecodeFeaturize,
        fn_constructor_kwargs={"mode": mode, "media_col": media_col},
        batch_size=batch_size,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        num_cpus=1,
    )
