"""Multimodal column handling — image/audio/video as opaque ``binary``
columns with typed metadata.

Decode kernels are REAL and library-free: binary PPM, uncompressed
24-bit BMP, 8-bit PNG (zlib inflate + numpy scanline unfiltering, all
five spec filters), baseline sequential JPEG (marker parse, Annex-K
Huffman, dequantize + float IDCT, 4:2:0/4:2:2 chroma upsample, DRI
restart resync), GIF87a/89a (LZW, interlace, transparency; animated
GIFs decode frame 1), and 16-bit PCM WAV — plus ``encode_png`` /
``encode_jpeg`` / ``encode_gif`` sink twins that generate the codecs'
test vectors.
Progressive/arithmetic/12-bit JPEG raises ``NotImplementedError``.
The Ray-side plumbing — schema, actor-pool signature, batch sizing for
large binary payloads, output layout — is codec-independent.

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


# --- JPEG (baseline DCT, ITU-T T.81) ---------------------------------------
# A real baseline-sequential JPEG codec in stdlib + numpy: marker parse,
# Annex-K Huffman/quantization tables, bitstream with 0xFF00 unstuffing and
# DRI restart markers, per-block dequantize → dezigzag → separable float
# IDCT, chroma upsampling (4:4:4 / 4:2:2 / 4:2:0), YCbCr→RGB.  The encoder
# twin below produces the streams the tests round-trip (no image library in
# this container to cross-check against, so correctness is gated by
# encode→decode PSNR + a pinned golden digest).  Progressive/arithmetic/
# 12-bit variants raise NotImplementedError.

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

#: orthonormal 8-point DCT-II basis: _DCT_A[u, x] = c(u)/2 · cos((2x+1)uπ/16)
_DCT_A = np.array([
    [(np.sqrt(0.5) if u == 0 else 1.0) / 2.0
     * np.cos((2 * x + 1) * u * np.pi / 16) for x in range(8)]
    for u in range(8)
])

# Annex K.1/K.2 base quantization tables (zigzag-ordered when emitted)
_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)
_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

# Annex K.3 typical Huffman tables: (bits[1..16], values)
_HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)


def _huff_decode_table(bits: list[int], values: list[int]) -> dict:
    """(length, code) → value lookup built by T.81 C.2 canonical order."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """Entropy-segment bit reader: 0xFF00 unstuffing, RSTn handling."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        while self.nbits <= 24 and self.pos < len(d):
            byte = d[self.pos]
            if byte == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7 or nxt == 0xD9:
                    break          # restart/EOI: stop at marker
                else:
                    break
            else:
                self.pos += 1
            self.bitbuf = (self.bitbuf << 8) | byte
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
            if self.nbits == 0:
                return 0           # T.81 F.2.2.5: pad past the end
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huff(self, table: dict) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read_bit()
            v = table.get((ln, code))
            if v is not None:
                return v
        raise ValueError("invalid JPEG Huffman code")

    def sync_restart(self):
        """Byte-align and consume an RSTn marker."""
        self.bitbuf = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1


def _extend(v: int, n: int) -> int:
    """T.81 F.2.2.1 sign extension of an n-bit magnitude."""
    return v - (1 << n) + 1 if n and v < (1 << (n - 1)) else v


def _decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline sequential JPEG (SOF0) → (h, w, 3) uint8 RGB."""
    if payload[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}   # (class 0=DC/1=AC, id) → table
    comps: list[dict] = []
    w = h = 0
    restart = 0
    scan_order: list[dict] = []
    data_start = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        ln = struct.unpack(">H", payload[pos + 2:pos + 4])[0]
        seg = payload[pos + 4:pos + 2 + ln]
        if marker == 0xDB:                       # DQT
            s = 0
            while s < len(seg):
                prec, tid = seg[s] >> 4, seg[s] & 0xF
                s += 1
                if prec:
                    tbl = np.frombuffer(seg[s:s + 128], dtype=">u2")
                    s += 128
                else:
                    tbl = np.frombuffer(seg[s:s + 64], dtype=np.uint8)
                    s += 64
                q = np.zeros(64, dtype=np.int32)
                q[_ZIGZAG] = tbl.astype(np.int32)
                qt[tid] = q.reshape(8, 8)
        elif marker in (0xC0, 0xC1):             # SOF0/SOF1 (baseline)
            _prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            comps = []
            for c in range(nc):
                cid, samp, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF,
                              "tq": tq})
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"only baseline sequential JPEG supported (SOF marker "
                f"0x{marker:02X})")
        elif marker == 0xC4:                     # DHT
            s = 0
            while s < len(seg):
                tc, th = seg[s] >> 4, seg[s] & 0xF
                bits = list(seg[s + 1:s + 17])
                nv = sum(bits)
                vals = list(seg[s + 17:s + 17 + nv])
                huff[(tc, th)] = _huff_decode_table(bits, vals)
                s += 17 + nv
        elif marker == 0xDD:                     # DRI
            restart = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:                     # SOS
            ns = seg[0]
            scan_order = []
            for c in range(ns):
                cs, tabs = seg[1 + 2 * c:3 + 2 * c]
                comp = next(x for x in comps if x["id"] == cs)
                scan_order.append({**comp, "dc": tabs >> 4, "ac": tabs & 0xF})
            data_start = pos + 2 + ln
            break
        pos += 2 + ln
    if data_start is None or not scan_order or not qt:
        raise ValueError("JPEG missing SOS/SOF/DQT")
    hmax = max(c["h"] for c in scan_order)
    vmax = max(c["v"] for c in scan_order)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in scan_order:
        planes.append(np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8),
                               dtype=np.float64))
    reader = _BitReader(payload[data_start:])
    pred = [0] * len(scan_order)
    At = _DCT_A.T
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and n_mcu and n_mcu % restart == 0:
                reader.sync_restart()
                pred = [0] * len(scan_order)
            n_mcu += 1
            for ci, c in enumerate(scan_order):
                dc_tbl = huff[(0, c["dc"])]
                ac_tbl = huff[(1, c["ac"])]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int32)
                        t = reader.decode_huff(dc_tbl)
                        diff = _extend(reader.receive(t), t)
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode_huff(ac_tbl)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16      # ZRL
                                    continue
                                break            # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            zz[k] = _extend(reader.receive(s), s)
                            k += 1
                        blk = np.zeros(64, dtype=np.float64)
                        blk[_ZIGZAG] = zz
                        blk = blk.reshape(8, 8) * q
                        pix = At @ blk @ _DCT_A + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = pix
    # upsample subsampled chroma to full grid, crop, color-convert
    full = []
    for ci, c in enumerate(scan_order):
        p = planes[ci]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        y = np.clip(full[0], 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=2).round(), 0, 255).astype(
        np.uint8)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)     # byte stuffing

    def flush(self):
        r = self.n % 8
        if r:
            self.write((1 << (8 - r)) - 1, 8 - r)  # pad to byte with 1s


def _huff_encode_table(bits: list[int], values: list[int]) -> dict:
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[values[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


def _magnitude(v: int) -> tuple[int, int]:
    """(size, amplitude bits) of a coefficient per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    n = a.bit_length()
    return n, (v if v > 0 else v + (1 << n) - 1)


def encode_jpeg(img: np.ndarray, quality: int = 85,
                subsample: str = "444", restart_interval: int = 0) -> bytes:
    """Baseline sequential JPEG encoder (Annex-K tables scaled by the
    conventional quality formula) for (h, w, 3) or (h, w) uint8 — the
    sink twin of ``_decode_jpeg`` and the generator of its test vectors.
    ``subsample``: "444" (one block per component per MCU) or "420"
    (2×2 luma blocks + mean-downsampled chroma).  ``restart_interval``
    emits DRI + RSTn markers every that many MCUs (exercises the
    decoder's restart resync)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    if gray:
        img = img[:, :, None]
    if subsample not in ("444", "420"):
        raise ValueError("subsample must be '444' or '420'")
    sub420 = subsample == "420" and not gray
    h, w = img.shape[:2]
    scale = 5000 // max(1, min(100, quality)) if quality < 50 else \
        200 - 2 * max(1, min(100, quality))
    qts = []
    for base in ((_Q_LUMA,) if gray else (_Q_LUMA, _Q_CHROMA)):
        qts.append(np.clip((base * scale + 50) // 100, 1, 255).astype(
            np.int32))
    if gray:
        planes = [img[:, :, 0].astype(np.float64) - 128.0]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y - 128.0, cb - 128.0, cr - 128.0]
    mcu = 16 if sub420 else 8

    def _pad(p: np.ndarray, mult: int) -> np.ndarray:
        hh, ww = p.shape
        q = np.zeros((-(-hh // mult) * mult, -(-ww // mult) * mult))
        q[:hh, :ww] = p
        q[hh:, :ww] = p[-1:, :]          # edge-replicate padding
        q[:, ww:] = q[:, ww - 1:ww]
        return q

    if sub420:
        luma = _pad(planes[0], 16)
        # 2×2 mean chroma downsample (over the edge-padded even-dim plane)
        chroma = []
        for p in planes[1:]:
            p2 = _pad(p, 2)
            small = (p2[0::2, 0::2] + p2[1::2, 0::2] + p2[0::2, 1::2]
                     + p2[1::2, 1::2]) / 4.0
            chroma.append(_pad(small, 8))
        padded = [luma] + chroma
    else:
        padded = [_pad(p, 8) for p in planes]

    out = bytearray(b"\xFF\xD8")

    def seg(marker: int, body: bytes):
        out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2))
        out.extend(body)

    for tid, q in enumerate(qts):
        seg(0xDB, bytes([tid]) + bytes(q.reshape(-1)[_ZIGZAG].astype(
            np.uint8).tolist()))
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for c in range(nc):
        samp = 0x22 if (sub420 and c == 0) else 0x11
        sof += bytes([c + 1, samp, 0 if c == 0 else 1])
    seg(0xC0, sof)
    tables = ([(_HUFF_DC_LUMA, 0, 0), (_HUFF_AC_LUMA, 1, 0)] if gray else
              [(_HUFF_DC_LUMA, 0, 0), (_HUFF_AC_LUMA, 1, 0),
               (_HUFF_DC_CHROMA, 0, 1), (_HUFF_AC_CHROMA, 1, 1)])
    for (bits, vals), tc, th in tables:
        seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nc])
    for c in range(nc):
        sos += bytes([c + 1, 0x00 if c == 0 else 0x11])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)

    dc_codes = [_huff_encode_table(*_HUFF_DC_LUMA),
                _huff_encode_table(*_HUFF_DC_CHROMA)]
    ac_codes = [_huff_encode_table(*_HUFF_AC_LUMA),
                _huff_encode_table(*_HUFF_AC_CHROMA)]
    bw = _BitWriter()
    pred = [0] * nc

    def encode_block(ci: int, plane: np.ndarray, by: int, bx: int):
        tsel = 0 if ci == 0 else 1
        q = qts[tsel]
        blk = plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
        coef = _DCT_A @ blk @ _DCT_A.T
        zz = np.round(coef / q).astype(np.int32).reshape(-1)[_ZIGZAG]
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        n, amp = _magnitude(diff)
        code, ln2 = dc_codes[tsel][n]
        bw.write(code, ln2)
        if n:
            bw.write(amp, n)
        run = 0
        last_nz = np.nonzero(zz[1:])[0]
        end = last_nz[-1] + 2 if len(last_nz) else 1
        for k in range(1, int(end)):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln2 = ac_codes[tsel][0xF0]
                bw.write(code, ln2)
                run -= 16
            n, amp = _magnitude(v)
            code, ln2 = ac_codes[tsel][(run << 4) | n]
            bw.write(code, ln2)
            bw.write(amp, n)
            run = 0
        if end < 64:
            code, ln2 = ac_codes[tsel][0x00]
            bw.write(code, ln2)

    ph, pw = padded[0].shape
    n_mcu = 0
    rst = 0
    for my in range(ph // mcu):
        for mx in range(pw // mcu):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                bw.flush()
                bw.out.extend(bytes([0xFF, 0xD0 + (rst % 8)]))
                rst += 1
                for ci in range(nc):
                    pred[ci] = 0
            n_mcu += 1
            if sub420:
                for by in range(2):
                    for bx in range(2):
                        encode_block(0, padded[0], my * 2 + by, mx * 2 + bx)
                encode_block(1, padded[1], my, mx)
                encode_block(2, padded[2], my, mx)
            else:
                for ci in range(nc):
                    encode_block(ci, padded[ci], my, mx)
    bw.flush()
    out.extend(bw.out)
    out.extend(b"\xFF\xD9")
    return bytes(out)


_GIF_MAGIC = (b"GIF87a", b"GIF89a")


def _gif_lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """GIF-variant LZW (LSB-first bit packing, CLEAR/END codes, 12-bit
    cap): the decoder adds its dictionary entry one step behind the
    encoder and bumps the code width when next_code reaches
    2^code_size — the exact handshake ``_gif_lzw_encode`` emits."""
    clear = 1 << min_code_size
    end = clear + 1

    def fresh():
        return ({i: (i,) for i in range(clear)}, clear + 2,
                min_code_size + 1)

    table, next_code, code_size = fresh()
    out: list[int] = []
    acc = nbits = pos = 0
    prev: tuple[int, ...] | None = None
    while True:
        while nbits < code_size and pos < len(data):
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        if nbits < code_size:
            break                      # ran out without END (tolerated)
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table, next_code, code_size = fresh()
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < next_code:
            entry = table[code]
            if next_code < 4096:
                table[next_code] = prev + (entry[0],)
                next_code += 1
        elif code == next_code and next_code < 4096:
            entry = prev + (prev[0],)
            table[next_code] = entry
            next_code += 1
        else:
            raise ValueError("corrupt GIF LZW stream")
        out.extend(entry)
        prev = entry
        if next_code == (1 << code_size) and code_size < 12:
            code_size += 1
    return out


def _decode_gif(payload: bytes) -> np.ndarray:
    """GIF87a/89a decode (first frame): LZW, global/local color tables,
    interlace de-pass, 89a transparency (transparent pixels keep the
    background color).  Animated GIFs decode frame 1 — frame sampling
    is the actor-pool stage's job, not the codec's."""
    if payload[:6] not in _GIF_MAGIC:
        raise ValueError("not a GIF")
    sw, sh = struct.unpack_from("<HH", payload, 6)
    packed, bg_idx, _aspect = payload[10], payload[11], payload[12]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    transparent = -1
    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:                         # extension
            label = payload[pos + 1]
            pos += 2
            if label == 0xF9 and payload[pos] >= 4:
                gc_packed = payload[pos + 1]
                if gc_packed & 0x01:
                    transparent = payload[pos + 4]
            while payload[pos]:               # skip sub-blocks
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:                       # image descriptor
            left, top, w, h = struct.unpack_from("<HHHH", payload, pos + 1)
            ipacked = payload[pos + 9]
            pos += 10
            ct = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                ct = np.frombuffer(payload, np.uint8, 3 * n,
                                   pos).reshape(n, 3)
                pos += 3 * n
            min_code = payload[pos]
            pos += 1
            chunks = []
            while payload[pos]:
                ln = payload[pos]
                chunks.append(payload[pos + 1:pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            if ct is None:
                raise ValueError("GIF image with no color table")
            idx = np.array(_gif_lzw_decode(b"".join(chunks), min_code),
                           dtype=np.int32)[:h * w]
            if idx.size < h * w:              # short stream: pad with bg
                idx = np.concatenate(
                    [idx, np.full(h * w - idx.size,
                                  bg_idx if gct is not None else 0,
                                  np.int32)])
            grid = idx.reshape(h, w)
            if ipacked & 0x40:                # interlace: 4-pass rows
                order = np.concatenate([np.arange(0, h, 8),
                                        np.arange(4, h, 8),
                                        np.arange(2, h, 4),
                                        np.arange(1, h, 2)])
                deinter = np.empty_like(grid)
                deinter[order] = grid
                grid = deinter
            bg = (gct[bg_idx] if gct is not None and bg_idx < len(gct)
                  else np.zeros(3, np.uint8))
            img = np.broadcast_to(bg, (sh, sw, 3)).copy()
            # clip a frame rect that overhangs the logical screen (some
            # real encoders emit these; browsers clip the same way)
            h2 = max(0, min(h, sh - top))
            w2 = max(0, min(w, sw - left))
            grid = grid[:h2, :w2]
            frame = ct[np.clip(grid, 0, len(ct) - 1)]
            if transparent >= 0:
                mask = grid == transparent
                region = img[top:top + h2, left:left + w2]
                frame = np.where(mask[:, :, None], region, frame)
            img[top:top + h2, left:left + w2] = frame
            return img
        elif b == 0x3B:                       # trailer before any image
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
    raise ValueError("GIF contains no image data")


def _gif_lzw_encode(inverse, min_code: int) -> bytes:
    """LZW-encode a palette-index stream (CLEAR-on-full, the decoder's
    one-behind code-width rule).  Shared by the single-frame and
    animated encoders."""
    clear = 1 << min_code
    end = clear + 1
    out_bits = bytearray()
    acc = nbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out_bits.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    next_code = clear + 2
    code_size = min_code + 1
    emit(clear, code_size)
    wseq: tuple[int, ...] = ()
    for k in map(int, inverse):
        wk = wseq + (k,)
        if wk in table:
            wseq = wk
            continue
        emit(table[wseq], code_size)
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            # one later than the decoder's bump: the decoder's table is
            # one entry behind, so it widens only after the code that
            # overflows the old width has been DEFINED on its side too
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
        else:                                  # table full: reset
            emit(clear, code_size)
            table = {(i,): i for i in range(clear)}
            next_code = clear + 2
            code_size = min_code + 1
        wseq = (k,)
    if wseq:
        emit(table[wseq], code_size)
    emit(end, code_size)
    if nbits:
        out_bits.append(acc & 0xFF)
    return bytes(out_bits)


def encode_gif(img: np.ndarray) -> bytes:
    """GIF89a sink twin of ``_decode_gif``: palette from the image's
    unique colors (≤256 required), non-interlaced, single frame, LZW
    with CLEAR-on-full — generates the decoder's test vectors the same
    way ``encode_png``/``encode_jpeg`` do for theirs."""
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError("encode_gif: more than 256 unique colors")
    ct_bits = max(1, int(len(palette) - 1).bit_length())
    n_ct = 1 << ct_bits
    min_code = max(2, ct_bits)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out.append(0x80 | (ct_bits - 1))           # GCT present, size bits
    out += b"\x00\x00"                         # bg index, aspect
    ct = np.zeros((n_ct, 3), np.uint8)
    ct[:len(palette)] = palette
    out += ct.tobytes()
    out += b"\x2C" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    out.append(min_code)
    data = _gif_lzw_encode(inverse, min_code)
    for i in range(0, len(data), 255):
        block = data[i:i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3B"
    return bytes(out)


def encode_gif_animated(frames: list[np.ndarray],
                        delays_ms: list[int]) -> bytes:
    """Animated GIF89a sink twin of ``decode_gif_frames``: one global
    palette over ALL frames' colors (≤256 required), full-screen frames,
    per-frame Graphic Control Extension carrying the delay (centisecond
    resolution — pass multiples of 10 ms for exact round-trips),
    disposal 'leave' — the test-vector generator for the video-style
    frame-sampling stage."""
    if len(frames) != len(delays_ms) or not frames:
        raise ValueError("frames/delays length mismatch or empty")
    arrs = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w = arrs[0].shape[:2]
    if any(a.shape[:2] != (h, w) for a in arrs):
        raise ValueError("all frames must share one size")
    flat = np.concatenate([a.reshape(-1, 3) for a in arrs])
    palette, inverse_all = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError("encode_gif_animated: more than 256 colors")
    ct_bits = max(1, int(len(palette) - 1).bit_length())
    n_ct = 1 << ct_bits
    min_code = max(2, ct_bits)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out.append(0x80 | (ct_bits - 1))
    out += b"\x00\x00"
    ct = np.zeros((n_ct, 3), np.uint8)
    ct[:len(palette)] = palette
    out += ct.tobytes()
    per = h * w
    for fi, delay in enumerate(delays_ms):
        cs = max(0, int(delay) // 10)
        out += b"\x21\xF9\x04\x00" + struct.pack("<H", cs) + b"\x00\x00"
        out += b"\x2C" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        out.append(min_code)
        data = _gif_lzw_encode(inverse_all[fi * per:(fi + 1) * per],
                               min_code)
        for i in range(0, len(data), 255):
            block = data[i:i + 255]
            out.append(len(block))
            out += block
        out += b"\x00"
    out += b"\x3B"
    return bytes(out)


def decode_gif_frames(payload: bytes) -> tuple[np.ndarray, list[int]]:
    """All frames of a (possibly animated) GIF → ((n, h, w, 3) uint8,
    per-frame delays in ms).  Maintains the canvas across frames with
    disposal methods 0/1 (leave) and 2 (restore background); disposal 3
    (restore previous) raises NotImplementedError like the other
    unsupported format variants.  Single-frame GIFs return n = 1 with
    delay [0] — ``_decode_gif``'s output is frame 0 of this one."""
    if payload[:6] not in _GIF_MAGIC:
        raise ValueError("not a GIF")
    sw, sh = struct.unpack_from("<HH", payload, 6)
    packed, bg_idx = payload[10], payload[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    bg = (gct[bg_idx] if gct is not None and bg_idx < len(gct)
          else np.zeros(3, np.uint8))
    canvas = np.broadcast_to(bg, (sh, sw, 3)).copy()
    frames: list[np.ndarray] = []
    delays: list[int] = []
    transparent, delay_ms, disposal = -1, 0, 0
    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:                         # extension
            label = payload[pos + 1]
            pos += 2
            if label == 0xF9 and payload[pos] >= 4:
                gc_packed = payload[pos + 1]
                delay_ms = struct.unpack_from("<H", payload,
                                              pos + 2)[0] * 10
                disposal = (gc_packed >> 2) & 0x07
                transparent = (payload[pos + 4]
                               if gc_packed & 0x01 else -1)
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:                       # image descriptor
            left, top, w, h = struct.unpack_from("<HHHH", payload,
                                                 pos + 1)
            ipacked = payload[pos + 9]
            pos += 10
            ct = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                ct = np.frombuffer(payload, np.uint8, 3 * n,
                                   pos).reshape(n, 3)
                pos += 3 * n
            min_code = payload[pos]
            pos += 1
            chunks = []
            while payload[pos]:
                ln = payload[pos]
                chunks.append(payload[pos + 1:pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            if ct is None:
                raise ValueError("GIF image with no color table")
            if disposal >= 3:
                raise NotImplementedError(
                    "GIF disposal 'restore previous' unsupported")
            idx = np.array(_gif_lzw_decode(b"".join(chunks), min_code),
                           dtype=np.int32)[:h * w]
            if idx.size < h * w:
                idx = np.concatenate(
                    [idx, np.full(h * w - idx.size,
                                  bg_idx if gct is not None else 0,
                                  np.int32)])
            grid = idx.reshape(h, w)
            if ipacked & 0x40:
                order = np.concatenate([np.arange(0, h, 8),
                                        np.arange(4, h, 8),
                                        np.arange(2, h, 4),
                                        np.arange(1, h, 2)])
                deinter = np.empty_like(grid)
                deinter[order] = grid
                grid = deinter
            h2 = max(0, min(h, sh - top))
            w2 = max(0, min(w, sw - left))
            grid = grid[:h2, :w2]
            frame = ct[np.clip(grid, 0, len(ct) - 1)]
            if transparent >= 0:
                mask = grid == transparent
                region = canvas[top:top + h2, left:left + w2]
                frame = np.where(mask[:, :, None], region, frame)
            canvas[top:top + h2, left:left + w2] = frame
            frames.append(canvas.copy())
            delays.append(delay_ms)
            if disposal == 2:                 # restore background
                canvas[top:top + h2, left:left + w2] = bg
            transparent, delay_ms, disposal = -1, 0, 0
        elif b == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
    if not frames:
        raise ValueError("GIF contains no image data")
    return np.stack(frames), delays


def gif_frame_sample(batch: pa.Table, every_ms: int = 1000) -> pa.Table:
    """REAL video-style frame sampling over animated-GIF payloads (the
    one multi-frame container this engine decodes library-free): decode
    all frames + delays, take the frame on display at each ``every_ms``
    tick, emit per-sample mean-RGB features.  The decoded kernel
    replaces ``frame_sample_stub``'s duration-metadata plumbing wherever
    payloads are GIFs; non-GIF payloads emit ``decoded = false`` rows so
    the stage composes with mixed media like ``ImageFeatureExtractor``."""
    ids, ts, fidx, feats, ok = [], [], [], [], []
    for mid, payload in zip(batch.column("media_id").to_pylist(),
                            batch.column("payload").to_pylist()):
        try:
            frames, delays = decode_gif_frames(payload or b"")
            starts = np.concatenate([[0], np.cumsum(delays)])
            total = int(starts[-1])
            means = frames.reshape(len(frames), -1, 3).mean(axis=1)
            for t in range(0, max(total, 1), every_ms):
                j = int(np.searchsorted(starts, t, side="right") - 1)
                j = min(j, len(frames) - 1)
                ids.append(mid)
                ts.append(t)
                fidx.append(j)
                feats.append([round(float(x) / 255.0, 6)
                              for x in means[j]])
                ok.append(True)
        except (ValueError, NotImplementedError):
            ids.append(mid)
            ts.append(0)
            fidx.append(-1)
            feats.append([0.0, 0.0, 0.0])
            ok.append(False)
    return pa.table({
        "media_id": pa.array(ids, pa.string()),
        "frame_ts_ms": pa.array(ts, pa.int64()),
        "frame_idx": pa.array(fidx, pa.int64()),
        "features": pa.array(feats, pa.list_(pa.float64())),
        "decoded": pa.array(ok, pa.bool_()),
    })


def decode_image(payload: bytes) -> np.ndarray:
    """Decode one image to an (h, w, 3) uint8 array.

    REAL decoders, no image library: binary PPM (P6), uncompressed
    24-bit BMP, 8-bit non-interlaced PNG (stdlib zlib inflate + numpy
    unfiltering), baseline sequential JPEG (marker parse + Huffman +
    dequantize + float IDCT + chroma upsample), plus the deterministic
    fake codec for tests.  Progressive JPEG / exotic variants raise
    ``NotImplementedError`` — the Ray-side plumbing is identical either
    way."""
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
    if payload[:2] == b"\xFF\xD8":
        return _decode_jpeg(payload)
    if payload[:6] in _GIF_MAGIC:
        return _decode_gif(payload)
    raise NotImplementedError(
        "unrecognized image payload (PPM/BMP/PNG/JPEG/GIF supported)"
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
    """Video frame-sampling plumbing for containers this engine cannot
    decode (mp4 etc.): emits (media_id, frame_ts_ms) rows from duration
    METADATA only.  For animated GIFs use ``gif_frame_sample`` — the
    real decoded-pixel sampler."""
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


def spectral_features_batch(batch: pa.Table, frame: int = 1024,
                            hop: int = 512) -> pa.Table:
    """Spectral audio features over WAV payloads — the DSP step up from
    ``audio_features_batch``'s time-domain stats: per-file mean spectral
    CENTROID and BANDWIDTH (Hz) plus spectral FLATNESS over framed
    power spectra (hand-rolled STFT: Hann window + numpy rFFT — no
    audio library).  Frames are ``frame`` samples with ``hop`` overlap;
    per-frame features are power-weighted then averaged, matching the
    common MIR definitions; silent/too-short files emit zeros with
    ``decoded = true``; non-WAV payloads emit ``decoded = false``."""
    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(frame) / frame)
    ids, cent, bw, flat, ok = [], [], [], [], []
    for mid, payload in zip(batch.column("media_id").to_pylist(),
                            batch.column("payload").to_pylist()):
        ids.append(mid)
        try:
            samples, rate = decode_wav(payload or b"")
        except Exception:
            cent.append(0.0)
            bw.append(0.0)
            flat.append(0.0)
            ok.append(False)
            continue
        x = samples.astype(np.float64).mean(axis=1) / 32768.0
        n_frames = max((len(x) - frame) // hop + 1, 0)
        if n_frames == 0:
            cent.append(0.0)
            bw.append(0.0)
            flat.append(0.0)
            ok.append(True)
            continue
        idx = (np.arange(n_frames)[:, None] * hop
               + np.arange(frame)[None, :])
        spec = np.abs(np.fft.rfft(x[idx] * win, axis=1)) ** 2
        freqs = np.fft.rfftfreq(frame, d=1.0 / rate)
        power = spec.sum(axis=1)
        live = power > 0
        if not live.any():
            cent.append(0.0)
            bw.append(0.0)
            flat.append(0.0)
            ok.append(True)
            continue
        sp = spec[live]
        pw = power[live]
        c = (sp * freqs).sum(axis=1) / pw
        b = np.sqrt((sp * (freqs[None, :] - c[:, None]) ** 2
                     ).sum(axis=1) / pw)
        # flatness: geometric / arithmetic mean of the power spectrum
        nz = sp + 1e-30
        f = np.exp(np.log(nz).mean(axis=1)) / nz.mean(axis=1)
        cent.append(round(float(c.mean()), 3))
        bw.append(round(float(b.mean()), 3))
        flat.append(round(float(f.mean()), 6))
        ok.append(True)
    return pa.table({
        "media_id": pa.array(ids, pa.string()),
        "spectral_centroid_hz": pa.array(cent, pa.float64()),
        "spectral_bandwidth_hz": pa.array(bw, pa.float64()),
        "spectral_flatness": pa.array(flat, pa.float64()),
        "decoded": pa.array(ok, pa.bool_()),
    })


def image_dhash(img: np.ndarray) -> int:
    """64-bit difference hash (dHash): grayscale → 9×8 nearest resize →
    horizontal gradient sign bits.  The standard perceptual fingerprint:
    stable under re-encoding/resize/small noise, so exact-matching (or
    small-Hamming banding, the SimHash machinery) finds visual
    near-duplicates that byte hashes miss."""
    g = img.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = g.shape
    ys = (np.arange(8) * h // 8).clip(0, h - 1)
    xs = (np.arange(9) * w // 9).clip(0, w - 1)
    small = g[ys][:, xs]
    bits = (small[:, 1:] > small[:, :-1]).reshape(-1)
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    return out


def image_dhash_batch(batch: pa.Table) -> pa.Table:
    """Actor-pool stage: decode → dHash per image payload; undecodable
    payloads emit hash 0 with ``decoded = false``.  Downstream: group on
    the hash for exact visual dedup, or band the 64 bits through the
    SimHash pair machinery for Hamming-tolerant near-dup."""
    ids, hashes, ok = [], [], []
    for mid, payload in zip(batch.column("media_id").to_pylist(),
                            batch.column("payload").to_pylist()):
        ids.append(mid)
        try:
            img = decode_image(payload or b"")
            hashes.append(image_dhash(img))
            ok.append(True)
        except Exception:
            hashes.append(0)
            ok.append(False)
    return pa.table({
        "media_id": pa.array(ids, pa.string()),
        "dhash": pa.array(np.array(hashes, dtype=np.uint64)),
        "decoded": pa.array(ok, pa.bool_()),
    })


def gif_keyframes(payload: bytes, threshold: float = 8.0
                  ) -> list[tuple[int, int]]:
    """Scene-cut / keyframe detection over an animated GIF: frame 0 plus
    every frame whose mean absolute pixel difference from its
    predecessor exceeds ``threshold`` (0–255 scale) → [(frame_idx,
    start_ms)].  The video-pipeline primitive that decides WHICH frames
    feed the (expensive) image featurizer — sample keyframes, not every
    tick."""
    frames, delays = decode_gif_frames(payload)
    starts = np.concatenate([[0], np.cumsum(delays)])[:len(frames)]
    keep = [(0, int(starts[0]))]
    for i in range(1, len(frames)):
        diff = np.abs(frames[i].astype(np.int32)
                      - frames[i - 1].astype(np.int32)).mean()
        if diff > threshold:
            keep.append((i, int(starts[i])))
    return keep


def image_resize(img: np.ndarray, th: int, tw: int,
                 method: str = "bilinear") -> np.ndarray:
    """Pure-numpy image resize: ``nearest`` (index sampling) or
    ``bilinear`` (half-pixel-center sampling, the standard
    align_corners=False convention), rounding half-up to uint8 — fully
    vectorized, deterministic across processes.  The resize step of a
    production thumbnail/feature pipeline; heavyweight codecs stay at
    the decode boundary (``decode_image``)."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w = img.shape[:2]
    if th <= 0 or tw <= 0:
        raise ValueError(f"bad target {(th, tw)}")
    if method == "nearest":
        ys = (np.arange(th) * h // th).clip(0, h - 1)
        xs = (np.arange(tw) * w // tw).clip(0, w - 1)
        out = img[ys][:, xs]
        return out if out.shape[2] > 1 else out[:, :, 0]
    if method != "bilinear":
        raise ValueError(f"unknown method {method!r}")
    fy = np.clip((np.arange(th) + 0.5) * h / th - 0.5, 0, h - 1)
    fx = np.clip((np.arange(tw) + 0.5) * w / tw - 0.5, 0, w - 1)
    y0 = np.floor(fy).astype(np.int64)
    x0 = np.floor(fx).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (fy - y0)[:, None, None]
    wx = (fx - x0)[None, :, None]
    p = img.astype(np.float64)
    top = p[y0][:, x0] * (1 - wx) + p[y0][:, x1] * wx
    bot = p[y1][:, x0] * (1 - wx) + p[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    out = np.floor(out + 0.5).clip(0, 255).astype(np.uint8)
    return out if out.shape[2] > 1 else out[:, :, 0]


class ImageResizer:
    """Actor-pool stage: decode → ``image_resize`` → re-encode PNG —
    the thumbnail-generation step of a media ingest pipeline.  Payloads
    the decoder cannot handle pass through with ``decoded=false`` and a
    null payload rather than poisoning the batch (the multimodal
    error-row convention)."""

    def __init__(self, target: tuple[int, int] = (32, 32),
                 method: str = "bilinear"):
        self.target = target
        self.method = method

    def __call__(self, batch: pa.Table) -> pa.Table:
        th, tw = self.target
        ids, payloads, ws, hs, ok = [], [], [], [], []
        for mid, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            ids.append(mid)
            try:
                img = decode_image(payload)
                small = image_resize(img, th, tw, method=self.method)
                payloads.append(encode_png(
                    small if small.ndim == 3 else small[:, :, None]))
                hs.append(th)
                ws.append(tw)
                ok.append(True)
            except (NotImplementedError, ValueError):
                payloads.append(None)
                hs.append(0)
                ws.append(0)
                ok.append(False)
        return pa.table({
            "media_id": pa.array(ids, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "height": pa.array(hs, pa.int32()),
            "width": pa.array(ws, pa.int32()),
            "decoded": pa.array(ok, pa.bool_()),
        })


def image_neardup_pairs(media, max_hamming: int = 3):
    """Visual near-duplicate image pairs: decode → 64-bit dHash
    (``image_dhash_batch``) → generic 4×16-bit banded-Hamming blocking +
    exact verification (``dedup.hash_neardup_pairs``).  Finds re-encoded
    / brightness-shifted / lightly-edited copies that byte hashes miss;
    recall guaranteed for Hamming ≤ 3 by band pigeonhole.

    Returns (id_a, id_b, hamming), id_a < id_b, decode failures
    excluded.  Scale shape: payloads are touched ONCE in the hashing
    map stage; only (media_id, band, hash) rows shuffle — the dedup
    contract that keeps 100 TB of images viable.  Run an exact
    byte-hash dedup (``media_content_hash``) first so identical files
    don't form quadratic band buckets."""
    import pyarrow.compute as pc

    from .dedup import hash_neardup_pairs

    def drop_failed(batch: pa.Table) -> pa.Table:
        keep = batch.filter(pc.equal(batch.column("decoded"), True))
        return keep.drop_columns(["decoded"])

    hashed = (media.map_batches(image_dhash_batch, batch_format="pyarrow")
              .map_batches(drop_failed, batch_format="pyarrow"))
    return hash_neardup_pairs(hashed, id_col="media_id", hash_col="dhash",
                              max_hamming=max_hamming)


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """16-bit PCM WAV sink twin of ``decode_wav`` (stdlib ``wave``):
    samples int16, shape (n,) mono or (n, channels)."""
    import io
    import wave

    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(s.shape[1])
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(s.tobytes())
    return buf.getvalue()


def audio_fingerprint(samples: np.ndarray, rate: int,
                      frame: int = 1024, hop: int = 512) -> int:
    """64-bit perceptual audio fingerprint — the dHash analog for sound
    (a chromaprint-style simplification): framed Hann-window power
    spectra (the ``spectral_features_batch`` STFT) → 8 equal linear
    frequency bands × 9 equal time segments of mean band energy →
    8×8 signs of ADJACENT-SEGMENT energy deltas packed row-major.
    Linear (not octave) bands: every band spans ≥ 64 FFT bins, so any
    broadband signal keeps all 8 energies well away from zero — octave
    bands leave the lowest ones nearly empty and their delta signs
    become quantization coin flips (measured: 14-27 flipped bits under
    0.4% noise with octave bands, ≤ 4 with linear).

    Delta signs are invariant under global gain (volume-scaled copies
    hash identically) and stable under mild noise/re-encoding — so
    exact-matching or small-Hamming banding (``hash_neardup_pairs``)
    finds perceptual audio duplicates that byte hashes miss.  Clips
    shorter than 9 frames zero-pad trailing segments; pure silence
    hashes to 0."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 2:
        x = x.mean(axis=1)
    x = x / 32768.0
    n_frames = max((len(x) - frame) // hop + 1, 0)
    if n_frames == 0:
        # too short for one frame: treat the whole clip as one frame,
        # zero-padded (keeps tiny fixtures fingerprintable)
        pad = np.zeros(frame)
        pad[:len(x)] = x
        x, n_frames = pad, 1
    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(frame) / frame)
    idx = (np.arange(n_frames)[:, None] * hop + np.arange(frame)[None, :])
    spec = np.abs(np.fft.rfft(x[idx] * win, axis=1)) ** 2
    freqs = np.fft.rfftfreq(frame, d=1.0 / max(rate, 1))
    nyq = max(freqs[-1], 1.0)
    band_of = np.clip((freqs / nyq * 8).astype(np.int64), 0, 7)
    bands = np.zeros((n_frames, 8))
    np.add.at(bands.T, band_of, spec.T)
    # 9 equal time segments (array_split: first segments one longer)
    seg = np.zeros((9, 8))
    for i, chunk in enumerate(np.array_split(np.arange(n_frames), 9)):
        if len(chunk):
            seg[i] = bands[chunk].mean(axis=0)
    bits = (seg[1:, :] > seg[:-1, :]).reshape(-1)
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    return out


def audio_fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Map stage: WAV decode → ``audio_fingerprint`` per payload;
    undecodable payloads emit hash 0 with ``decoded = false`` (the
    multimodal error-row convention)."""
    ids, fps, ok = [], [], []
    for mid, payload in zip(batch.column("media_id").to_pylist(),
                            batch.column("payload").to_pylist()):
        ids.append(mid)
        try:
            samples, rate = decode_wav(payload or b"")
            fps.append(audio_fingerprint(samples, rate))
            ok.append(True)
        except Exception:
            fps.append(0)
            ok.append(False)
    return pa.table({
        "media_id": pa.array(ids, pa.string()),
        "afp": pa.array(np.array(fps, dtype=np.uint64)),
        "decoded": pa.array(ok, pa.bool_()),
    })


def audio_neardup_pairs(media, max_hamming: int = 3):
    """Perceptual audio near-duplicate pairs: decode → 64-bit spectral
    fingerprint → the generic 4×16-bit banded-Hamming blocking
    (``dedup.hash_neardup_pairs``) — volume-rescaled and lightly-noised
    copies found without shuffling payloads, the audio twin of
    ``image_neardup_pairs``."""
    import pyarrow.compute as pc

    from .dedup import hash_neardup_pairs

    def drop_failed(batch: pa.Table) -> pa.Table:
        keep = batch.filter(pc.equal(batch.column("decoded"), True))
        return keep.drop_columns(["decoded"])

    hashed = (media.map_batches(audio_fingerprint_batch,
                                batch_format="pyarrow")
              .map_batches(drop_failed, batch_format="pyarrow"))
    return hash_neardup_pairs(hashed, id_col="media_id", hash_col="afp",
                              max_hamming=max_hamming)


def video_fingerprint(payload: bytes) -> int:
    """64-bit perceptual video fingerprint over an animated GIF: per-frame
    ``image_dhash``, folded by PER-BIT MAJORITY VOTE across frames
    (strict > half; ties → 0).  Majority folding is invariant to frame
    ORDER and duration metadata and degrades gracefully under dropped /
    duplicated frames — the re-encode transformations a byte hash
    can't see.  Single-frame payloads reduce to the still-image dHash."""
    frames, _ = decode_gif_frames(payload)
    shifts = np.arange(63, -1, -1, dtype=np.uint64)
    cnt = np.zeros(64, dtype=np.int64)
    for f in frames:
        h = np.uint64(image_dhash(f))
        cnt += ((h >> shifts) & np.uint64(1)).astype(np.int64)
    maj = cnt * 2 > len(frames)
    out = 0
    for b in maj:
        out = (out << 1) | int(b)
    return out


def video_fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Map stage: GIF decode → ``video_fingerprint`` per payload;
    undecodable payloads emit hash 0 with ``decoded = false``."""
    ids, fps, ok = [], [], []
    for mid, payload in zip(batch.column("media_id").to_pylist(),
                            batch.column("payload").to_pylist()):
        ids.append(mid)
        try:
            fps.append(video_fingerprint(payload or b""))
            ok.append(True)
        except Exception:
            fps.append(0)
            ok.append(False)
    return pa.table({
        "media_id": pa.array(ids, pa.string()),
        "vfp": pa.array(np.array(fps, dtype=np.uint64)),
        "decoded": pa.array(ok, pa.bool_()),
    })


def video_neardup_pairs(media, max_hamming: int = 3):
    """Perceptual video near-duplicate pairs: GIF decode → majority-vote
    frame-dHash fingerprint → the generic banded-Hamming blocking
    (``dedup.hash_neardup_pairs``) — duration-re-encoded,
    frame-reordered and brightness-shifted copies found without
    shuffling payloads; completes the q142/q144 image/audio family."""
    import pyarrow.compute as pc

    from .dedup import hash_neardup_pairs

    def drop_failed(batch: pa.Table) -> pa.Table:
        keep = batch.filter(pc.equal(batch.column("decoded"), True))
        return keep.drop_columns(["decoded"])

    hashed = (media.map_batches(video_fingerprint_batch,
                                batch_format="pyarrow")
              .map_batches(drop_failed, batch_format="pyarrow"))
    return hash_neardup_pairs(hashed, id_col="media_id", hash_col="vfp",
                              max_hamming=max_hamming)


# --- header-only metadata probe ---------------------------------------------

def media_header_probe(payload: bytes) -> dict:
    """Parse format + geometry/rate from a payload's HEADER bytes only —
    no pixel/sample decode, no decompression.  This is the cheap first
    pass a 100 TB media pipeline runs over every blob (schema audit,
    size-bucketed routing, corrupt-file quarantine) before committing to
    the expensive actor-pool decode stages; cost is O(header), not
    O(payload).  Returns {format, width, height, channels, sample_rate,
    n_samples, ok}; unknown/truncated payloads come back ok=False with
    format='unknown' instead of raising."""
    out = {"format": "unknown", "width": 0, "height": 0, "channels": 0,
           "sample_rate": 0, "n_samples": 0, "ok": False}
    try:
        if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 26 \
                and payload[12:16] == b"IHDR":
            out["format"] = "png"
            out["width"] = int.from_bytes(payload[16:20], "big")
            out["height"] = int.from_bytes(payload[20:24], "big")
            ct = payload[25]
            out["channels"] = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ct, 0)
            out["ok"] = out["channels"] > 0
        elif payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
            out["format"] = "gif"
            out["width"] = int.from_bytes(payload[6:8], "little")
            out["height"] = int.from_bytes(payload[8:10], "little")
            out["channels"] = 3
            out["ok"] = True
        elif payload[:2] == b"BM" and len(payload) >= 30:
            out["format"] = "bmp"
            hdr_size = int.from_bytes(payload[14:18], "little")
            if hdr_size >= 40:
                out["width"] = int.from_bytes(payload[18:22], "little",
                                              signed=True)
                h = int.from_bytes(payload[22:26], "little", signed=True)
                out["height"] = abs(h)
                bpp = int.from_bytes(payload[28:30], "little")
                out["channels"] = bpp // 8
                out["ok"] = out["channels"] > 0
        elif payload[:2] == b"P6":
            toks, i, n = [], 2, len(payload)
            while len(toks) < 3 and i < n:
                while i < n and payload[i:i + 1].isspace():
                    i += 1
                if payload[i:i + 1] == b"#":
                    while i < n and payload[i] != 0x0A:
                        i += 1
                    continue
                j = i
                while j < n and not payload[j:j + 1].isspace():
                    j += 1
                if j > i:
                    toks.append(payload[i:j])
                i = j
            if len(toks) == 3:
                out["format"] = "ppm"
                out["width"] = int(toks[0])
                out["height"] = int(toks[1])
                out["channels"] = 3
                out["ok"] = True
        elif payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            out["format"] = "wav"
            i, n = 12, len(payload)
            ch = bits = rate = data_size = 0
            while i + 8 <= n:
                cid = payload[i:i + 4]
                sz = int.from_bytes(payload[i + 4:i + 8], "little")
                if cid == b"fmt " and i + 24 <= n:
                    ch = int.from_bytes(payload[i + 10:i + 12], "little")
                    rate = int.from_bytes(payload[i + 12:i + 16],
                                          "little")
                    bits = int.from_bytes(payload[i + 22:i + 24],
                                          "little")
                elif cid == b"data":
                    data_size = sz
                    break  # samples follow — the probe stops here
                i += 8 + sz + (sz & 1)
            out["channels"] = ch
            out["sample_rate"] = rate
            if ch and bits:
                out["n_samples"] = data_size // (ch * (bits // 8))
            out["ok"] = bool(ch and rate and bits)
        elif payload[:2] == b"\xff\xd8":
            out["format"] = "jpeg"
            i, n = 2, len(payload)
            while i + 4 <= n:
                if payload[i] != 0xFF:
                    break
                marker = payload[i + 1]
                if marker in (0xC0, 0xC1, 0xC2):
                    out["height"] = int.from_bytes(
                        payload[i + 5:i + 7], "big")
                    out["width"] = int.from_bytes(
                        payload[i + 7:i + 9], "big")
                    out["channels"] = payload[i + 9]
                    out["ok"] = True
                    break
                if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
                    i += 2
                    continue
                i += 2 + int.from_bytes(payload[i + 2:i + 4], "big")
    except (IndexError, ValueError):
        out["ok"] = False
    return out


def media_header_probe_batch(batch: pa.Table) -> pa.Table:
    """Vector wrapper over ``media_header_probe`` for map_batches:
    (media_id, payload) → per-blob header metadata + byte size."""
    ids = batch.column("media_id").to_pylist()
    payloads = batch.column("payload").to_pylist()
    probes = [media_header_probe(p or b"") for p in payloads]
    return pa.table({
        "media_id": pa.array(ids, pa.string()),
        "format": pa.array([p["format"] for p in probes], pa.string()),
        "width": pa.array([p["width"] for p in probes], pa.int64()),
        "height": pa.array([p["height"] for p in probes], pa.int64()),
        "channels": pa.array([p["channels"] for p in probes],
                             pa.int64()),
        "sample_rate": pa.array([p["sample_rate"] for p in probes],
                                pa.int64()),
        "n_samples": pa.array([p["n_samples"] for p in probes],
                              pa.int64()),
        "n_bytes": pa.array([len(p or b"") for p in payloads],
                            pa.int64()),
        "ok": pa.array([p["ok"] for p in probes], pa.bool_())})
