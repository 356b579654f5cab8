"""Multimodal column handling — image/audio/video as opaque ``binary``
columns with typed metadata.

The decode kernels are STUBBED (no image/audio libraries in this
container): ``decode_image`` raises ``NotImplementedError`` unless given
the deterministic fake codec used by tests.  The Ray-side plumbing —
schema, actor-pool signature, batch sizing for large binary payloads,
output layout — is real and tested; swapping in PIL/torchaudio later only
changes the kernel body.

Batch-size guidance: binary payload stages must keep
``batch_size × payload`` under the worker heap — pass small batch_size
(e.g. 32) and let block splitting handle the rest (SURVEY.md §4 memory).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("kind", pa.string()),          # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),          # images: pixel dims; audio: 0
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),    # audio/video; images: 0
    ]
)

#: deterministic fake codec: payload = b"FAKEIMG" + w:u16 + h:u16 + seed byte
FAKE_MAGIC = b"FAKEIMG"


def encode_fake_image(width: int, height: int, seed: int) -> bytes:
    return FAKE_MAGIC + struct.pack("<HHB", width, height, seed & 0xFF)


def decode_image(payload: bytes) -> np.ndarray:
    """Decode one image to an (h, w, 3) uint8 array.

    STUB: real decoding needs an image library not present in this
    container; only the deterministic fake codec is implemented."""
    if payload[: len(FAKE_MAGIC)] == FAKE_MAGIC:
        w, h, seed = struct.unpack("<HHB", payload[len(FAKE_MAGIC):len(FAKE_MAGIC) + 5])
        base = np.arange(h * w * 3, dtype=np.uint64) * np.uint64(2654435761) + np.uint64(seed)
        return (base % 256).astype(np.uint8).reshape(h, w, 3)
    raise NotImplementedError(
        "real image decoding requires an image library (PIL/cv2) "
        "not available in this environment; see module docstring"
    )


class ImageFeatureExtractor:
    """Actor-pool stage: decode → resize (nearest-neighbor, pure numpy) →
    channel-mean features.  ``__init__`` is where a real model would load."""

    def __init__(self, target: tuple[int, int] = (8, 8)):
        self.target = target

    def _resize(self, img: np.ndarray) -> np.ndarray:
        th, tw = self.target
        h, w = img.shape[:2]
        ys = (np.arange(th) * h // th).clip(0, h - 1)
        xs = (np.arange(tw) * w // tw).clip(0, w - 1)
        return img[ys][:, xs]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, feats, ok = [], [], []
        for mid, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            ids.append(mid)
            try:
                img = decode_image(payload)
                small = self._resize(img).astype(np.float64) / 255.0
                feats.append([round(float(x), 6) for x in small.mean(axis=(0, 1))])
                ok.append(True)
            except NotImplementedError:
                feats.append([0.0, 0.0, 0.0])
                ok.append(False)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "features": pa.array(feats, pa.list_(pa.float64())),
                "decoded": pa.array(ok, pa.bool_()),
            }
        )


def frame_sample_stub(batch: pa.Table, every_ms: int = 1000) -> pa.Table:
    """Video frame-sampling plumbing: emits (media_id, frame_ts_ms) rows for
    each sample point based on duration metadata; the decode itself is the
    stubbed kernel above."""
    ids, ts = [], []
    for mid, dur in zip(
        batch.column("media_id").to_pylist(),
        batch.column("duration_ms").to_pylist(),
    ):
        for t in range(0, max(0, int(dur or 0)), every_ms):
            ids.append(mid)
            ts.append(t)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.string()),
            "frame_ts_ms": pa.array(ts, pa.int32()),
        }
    )


def media_content_hash(batch: pa.Table) -> pa.Table:
    """Exact-dedup signature for binary payloads."""
    hashes = [
        hashlib.sha1(p or b"").hexdigest()
        for p in batch.column("payload").to_pylist()
    ]
    return pa.table(
        {
            "media_id": batch.column("media_id"),
            "payload_sha1": pa.array(hashes, pa.string()),
        }
    )
