"""Multimodal column handling — image/audio/video as opaque ``binary``
columns with typed metadata.

Decode kernels are REAL and library-free for every format the stdlib can
reach: binary PPM, uncompressed 24-bit BMP, 8-bit PNG (zlib inflate +
numpy scanline unfiltering, all five spec filters), and 16-bit PCM WAV —
plus an ``encode_png`` sink twin.  Only JPEG (which needs a DCT codec
library absent from this container) raises ``NotImplementedError``; the
Ray-side plumbing — schema, actor-pool signature, batch sizing for large
binary payloads, output layout — is identical either way, so swapping in
PIL/cv2 later only changes that one kernel body.

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


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
#: PNG color type → samples per pixel (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_unfilter(data: np.ndarray, h: int, w: int, ch: int) -> np.ndarray:
    """Reverse PNG scanline filtering (spec §9: None/Sub/Up/Average/Paeth)
    on the raw inflate output → (h, w, ch) uint8.  Sub rows reconstruct
    as a vectorized per-channel prefix sum (addition mod 256 chains);
    Average/Paeth carry a true left dependency and walk the row."""
    stride = w * ch
    rows = data.reshape(h, stride + 1)
    ftype = rows[:, 0]
    raw = rows[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f, r = int(ftype[y]), raw[y]
        if f == 0:
            cur = r
        elif f == 1:
            cur = np.cumsum(r.reshape(w, ch), axis=0).reshape(stride)
        elif f == 2:
            cur = r + prev
        elif f == 3:
            cur = r.copy()
            for i in range(stride):
                left = cur[i - ch] if i >= ch else 0
                cur[i] = (r[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:
            cur = r.copy()
            for i in range(stride):
                a = cur[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                p = a + b - c
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc_) else \
                    (b if pb <= pc_ else c)
                cur[i] = (r[i] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f}")
        cur = cur & 0xFF
        out[y] = cur
        prev = cur
    return out.astype(np.uint8).reshape(h, w, ch)


def _decode_png(payload: bytes) -> np.ndarray:
    """8-bit non-interlaced PNG (gray / gray+alpha / RGB / RGBA) via
    stdlib zlib + numpy unfiltering — a REAL compressed-format decoder,
    no image library.  Palette/16-bit/interlaced variants raise."""
    import zlib as _z

    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, idat, meta = 8, [], None
    while pos + 8 <= len(payload):
        ln, typ = struct.unpack(">I4s", payload[pos:pos + 8])
        chunk = payload[pos + 8:pos + 8 + ln]
        if typ == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", chunk)
            if depth != 8 or interlace != 0 or color not in _PNG_CHANNELS:
                raise NotImplementedError(
                    f"PNG variant unsupported (depth={depth}, "
                    f"color={color}, interlace={interlace}); 8-bit "
                    "non-interlaced gray/GA/RGB/RGBA only")
            meta = (w, h, _PNG_CHANNELS[color])
        elif typ == b"IDAT":
            idat.append(chunk)
        elif typ == b"IEND":
            break
        pos += 12 + ln  # length + type + data + crc
    if meta is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, ch = meta
    data = np.frombuffer(_z.decompress(b"".join(idat)), dtype=np.uint8)
    if len(data) != h * (w * ch + 1):
        raise ValueError("PNG inflate size mismatch")
    img = _png_unfilter(data, h, w, ch)
    if ch == 1:
        return np.repeat(img, 3, axis=2)
    if ch == 2:
        return np.repeat(img[:, :, :1], 3, axis=2)
    return img[:, :, :3].copy()


def encode_png(img: np.ndarray) -> bytes:
    """Minimal PNG writer (filter 0, one IDAT) for (h, w) grayscale or
    (h, w, 3|4) uint8 arrays — the sink twin of ``_decode_png``."""
    import zlib as _z

    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    scan = np.concatenate(
        [np.zeros((h, 1), np.uint8), img.reshape(h, w * ch)], axis=1)

    def chunk(typ: bytes, data: bytes) -> bytes:
        import zlib as z2

        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", z2.crc32(typ + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (_PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", _z.compress(scan.tobytes(), 6))
            + chunk(b"IEND", b""))


def decode_image(payload: bytes) -> np.ndarray:
    """Decode one image to an (h, w, 3) uint8 array.

    REAL decoders, no image library: binary PPM (P6), uncompressed
    24-bit BMP, 8-bit non-interlaced PNG (stdlib zlib inflate + numpy
    unfiltering), plus the deterministic fake codec for tests.  JPEG
    alone still needs a codec library absent from this container and
    raises ``NotImplementedError`` — the Ray-side plumbing is identical
    either way."""
    if payload[: len(FAKE_MAGIC)] == FAKE_MAGIC:
        w, h, seed = struct.unpack("<HHB", payload[len(FAKE_MAGIC):len(FAKE_MAGIC) + 5])
        base = np.arange(h * w * 3, dtype=np.uint64) * np.uint64(2654435761) + np.uint64(seed)
        return (base % 256).astype(np.uint8).reshape(h, w, 3)
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:8] == _PNG_MAGIC:
        return _decode_png(payload)
    raise NotImplementedError(
        "JPEG decoding requires an image library (PIL/cv2) not available "
        "in this environment; see module docstring"
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
