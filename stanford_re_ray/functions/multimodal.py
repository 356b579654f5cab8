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


def _decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6), pure parsing — no image library needed."""
    # header: "P6" <ws> width <ws> height <ws> maxval <single ws> raster
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = fields
    raster = np.frombuffer(payload, dtype=np.uint8, count=h * w * 3,
                           offset=pos)
    img = raster.reshape(h, w, 3)
    if maxval != 255:
        img = (img.astype(np.uint32) * 255 // max(maxval, 1)).astype(np.uint8)
    return img.copy()


def _decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER), pure struct/numpy."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack("<I", payload[10:14])[0]
    header_size = struct.unpack("<I", payload[14:18])[0]
    if header_size < 40:
        raise NotImplementedError("BMP core-header variant not supported")
    w, h = struct.unpack("<ii", payload[18:26])
    planes, bpp = struct.unpack("<HH", payload[26:30])
    compression = struct.unpack("<I", payload[30:34])[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, "
            f"compression={compression})")
    flip = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    raster = np.frombuffer(payload, dtype=np.uint8, count=row_bytes * h,
                           offset=data_offset)
    rows = raster.reshape(h, row_bytes)[:, :w * 3].reshape(h, w, 3)
    img = rows[::-1] if flip else rows  # bottom-up storage
    return img[:, :, ::-1].copy()       # BGR → RGB


def decode_image(payload: bytes) -> np.ndarray:
    """Decode one image to an (h, w, 3) uint8 array.

    REAL decoders for library-free formats: binary PPM (P6) and
    uncompressed 24-bit BMP, plus the deterministic fake codec for tests.
    Compressed formats (JPEG/PNG) still need an image library absent from
    this container and raise ``NotImplementedError`` — the Ray-side
    plumbing is identical either way."""
    if payload[: len(FAKE_MAGIC)] == FAKE_MAGIC:
        w, h, seed = struct.unpack("<HHB", payload[len(FAKE_MAGIC):len(FAKE_MAGIC) + 5])
        base = np.arange(h * w * 3, dtype=np.uint64) * np.uint64(2654435761) + np.uint64(seed)
        return (base % 256).astype(np.uint8).reshape(h, w, 3)
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    raise NotImplementedError(
        "compressed image decoding (JPEG/PNG) requires an image library "
        "(PIL/cv2) not available in this environment; see module docstring"
    )


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV decode via the stdlib: returns (samples[n, channels] int16,
    sample_rate).  A real audio kernel, no external library."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as f:
        n = f.getnframes()
        ch = f.getnchannels()
        width = f.getsampwidth()
        rate = f.getframerate()
        raw = f.readframes(n)
    if width != 2:
        raise NotImplementedError("only 16-bit PCM WAV supported")
    return np.frombuffer(raw, dtype=np.int16).reshape(-1, ch), rate


def audio_features_batch(batch: pa.Table) -> pa.Table:
    """Audio feature extraction over WAV payloads: duration, RMS energy,
    zero-crossing rate (the audio analog of ImageFeatureExtractor)."""
    ids, dur, rms, zcr, ok = [], [], [], [], []
    for mid, payload in zip(batch.column("media_id").to_pylist(),
                            batch.column("payload").to_pylist()):
        ids.append(mid)
        try:
            samples, rate = decode_wav(payload or b"")
            x = samples.astype(np.float64).mean(axis=1) / 32768.0
            dur.append(int(len(x) * 1000 / max(rate, 1)))
            rms.append(round(float(np.sqrt(np.mean(x * x))) if len(x) else 0.0, 6))
            zc = np.count_nonzero(np.diff(np.signbit(x))) if len(x) > 1 else 0
            zcr.append(round(zc / max(len(x) - 1, 1), 6))
            ok.append(True)
        except Exception:
            dur.append(0)
            rms.append(0.0)
            zcr.append(0.0)
            ok.append(False)
    return pa.table({
        "media_id": pa.array(ids, pa.string()),
        "duration_ms": pa.array(dur, pa.int32()),
        "rms": pa.array(rms, pa.float64()),
        "zero_crossing_rate": pa.array(zcr, pa.float64()),
        "decoded": pa.array(ok, pa.bool_()),
    })


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
