"""Multimodal plumbing: fake codec, actor-pool feature extraction,
frame-sampling layout, binary dedup signatures."""

import numpy as np
import pyarrow as pa
import pytest

from stanford_re_ray.functions.multimodal import (
    ImageFeatureExtractor,
    decode_image,
    encode_fake_image,
    frame_sample_stub,
    media_content_hash,
)


def _media_table():
    payloads = [encode_fake_image(16, 12, s) for s in (1, 2, 1)]
    return pa.table({
        "media_id": ["m1", "m2", "m3"],
        "kind": ["image"] * 3,
        "payload": payloads,
        "mime": ["image/fake"] * 3,
        "width": pa.array([16, 16, 16], pa.int32()),
        "height": pa.array([12, 12, 12], pa.int32()),
        "duration_ms": pa.array([0, 2500, 0], pa.int32()),
    })


def test_fake_codec_deterministic():
    img = decode_image(encode_fake_image(8, 4, 7))
    assert img.shape == (4, 8, 3)
    img2 = decode_image(encode_fake_image(8, 4, 7))
    assert (img == img2).all()


def _gradient_img(h=41, w=67):
    import numpy as np

    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([(xx * 255 / w), (yy * 255 / h),
                     ((xx + yy) * 255 / (h + w))], axis=2).astype(np.uint8)


def test_jpeg_roundtrip_444_and_420():
    import numpy as np

    from stanford_re_ray.functions.multimodal import encode_jpeg

    img = _gradient_img()
    for sub, tol in (("444", 4), ("420", 8)):
        for ri in (0, 3):   # ri>0 exercises DRI + RSTn resync
            dec = decode_image(encode_jpeg(img, quality=90, subsample=sub,
                                           restart_interval=ri))
            assert dec.shape == img.shape
            assert np.abs(dec.astype(int) - img.astype(int)).max() <= tol


def test_jpeg_flat_block_exact_and_gray():
    import numpy as np

    from stanford_re_ray.functions.multimodal import encode_jpeg

    flat = np.full((16, 24, 3), 130, np.uint8)
    assert (decode_image(encode_jpeg(flat, 95)) == flat).all()
    g = _gradient_img()[:, :, 0]
    dec = decode_image(encode_jpeg(g, 90))
    assert dec.shape == (*g.shape, 3)
    assert (dec[:, :, 0] == dec[:, :, 1]).all()   # gray replicated
    assert np.abs(dec[:, :, 0].astype(int) - g.astype(int)).max() <= 2


def test_jpeg_golden_digest_pinned():
    """The codec is frozen the same way the extractor is: a fixed input
    must produce byte-identical encode and pixel-identical decode
    across processes and numpy versions in this container."""
    import hashlib

    from stanford_re_ray.functions.multimodal import encode_jpeg

    enc = encode_jpeg(_gradient_img(), quality=85, subsample="420")
    assert hashlib.sha256(enc).hexdigest() == (
        "b4278d3cc06dbcba69fa6ba9112bb55d6b959ad93a526e0bc04d2e8fcb3f3f17")
    dec = decode_image(enc)
    assert hashlib.sha256(dec.tobytes()).hexdigest() == (
        "12de7319000a65de8bdafebd03f45222e01abc6e1ee7424ca202ec8d99ba1bad")


def test_jpeg_progressive_raises():
    import struct

    # SOI + minimal DQT + SOF2 (progressive) header
    dqt = b"\x00" + bytes(range(1, 65))
    sof2 = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    payload = (b"\xFF\xD8"
               + b"\xFF\xDB" + struct.pack(">H", len(dqt) + 2) + dqt
               + b"\xFF\xC2" + struct.pack(">H", len(sof2) + 2) + sof2)
    with pytest.raises(NotImplementedError):
        decode_image(payload)


def test_png_roundtrip_all_channel_layouts():
    import numpy as np

    from stanford_re_ray.functions.multimodal import decode_image, encode_png

    rng = np.arange(5 * 7 * 4, dtype=np.uint8).reshape(5, 7, 4) * 11 % 256
    rgb = decode_image(encode_png(rng[:, :, :3]))
    np.testing.assert_array_equal(rgb, rng[:, :, :3])
    rgba = decode_image(encode_png(rng))
    np.testing.assert_array_equal(rgba, rng[:, :, :3])  # alpha dropped
    gray = decode_image(encode_png(rng[:, :, 0]))
    np.testing.assert_array_equal(gray, np.repeat(rng[:, :, :1], 3, axis=2))


def test_png_unfilter_every_filter_type():
    """Hand-filter a known image with each of the 5 PNG filters and check
    the decoder reconstructs it exactly (spec §9 reference math)."""
    import struct
    import zlib

    import numpy as np

    from stanford_re_ray.functions.multimodal import (
        _PNG_MAGIC,
        _decode_png,
    )

    h, w, ch = 5, 6, 3
    img = (np.arange(h * w * ch, dtype=np.int32) * 37 % 256).reshape(
        h, w, ch)

    def paeth(a, b, c):
        p = a + b - c
        pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else c)

    scan = bytearray()
    prev = np.zeros(w * ch, dtype=np.int32)
    for y in range(h):
        cur = img[y].reshape(-1)
        f = y % 5
        scan.append(f)
        for i in range(w * ch):
            left = int(cur[i - ch]) if i >= ch else 0
            up = int(prev[i])
            ul = int(prev[i - ch]) if i >= ch else 0
            if f == 0:
                v = cur[i]
            elif f == 1:
                v = cur[i] - left
            elif f == 2:
                v = cur[i] - up
            elif f == 3:
                v = cur[i] - ((left + up) >> 1)
            else:
                v = cur[i] - paeth(left, up, ul)
            scan.append(int(v) & 0xFF)
        prev = cur

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    payload = (_PNG_MAGIC
               + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(bytes(scan)))
               + chunk(b"IEND", b""))
    np.testing.assert_array_equal(_decode_png(payload),
                                  img.astype(np.uint8))


def test_feature_extractor_batch():
    out = ImageFeatureExtractor(target=(4, 4))(_media_table())
    assert out.num_rows == 3
    assert out.column("decoded").to_pylist() == [True, True, True]
    f1, _, f3 = out.column("features").to_pylist()
    assert f1 == f3  # same payload → same features
    assert len(f1) == 3


def test_feature_extractor_gif_payload():
    """The actor-pool extractor decodes GIF payloads like any other
    codec — plumbing is codec-independent."""
    from stanford_re_ray.functions.multimodal import encode_gif

    img = np.zeros((6, 5, 3), np.uint8)
    img[2:, 1:3] = [200, 10, 40]
    tbl = pa.table({
        "media_id": ["g1"],
        "kind": ["image"],
        "payload": [encode_gif(img)],
        "mime": ["image/gif"],
        "width": pa.array([5], pa.int32()),
        "height": pa.array([6], pa.int32()),
        "duration_ms": pa.array([0], pa.int32()),
    })
    out = ImageFeatureExtractor(target=(4, 4))(tbl)
    assert out.column("decoded").to_pylist() == [True]
    assert len(out.column("features")[0].as_py()) == 3


def test_frame_sampling_layout():
    out = frame_sample_stub(_media_table(), every_ms=1000)
    rows = list(zip(out.column("media_id").to_pylist(),
                    out.column("frame_ts_ms").to_pylist()))
    assert rows == [("m2", 0), ("m2", 1000), ("m2", 2000)]


def test_media_exact_dedup_signature():
    out = media_content_hash(_media_table())
    h = out.column("payload_sha1").to_pylist()
    assert h[0] == h[2] and h[0] != h[1]


def test_decode_ppm_real():
    import numpy as np

    from stanford_re_ray.functions.multimodal import decode_image

    # 2x2 P6 with a comment in the header
    raster = bytes([255, 0, 0,  0, 255, 0,
                    0, 0, 255,  9, 9, 9])
    payload = b"P6\n# test comment\n2 2\n255\n" + raster
    img = decode_image(payload)
    assert img.shape == (2, 2, 3)
    assert tuple(img[0, 0]) == (255, 0, 0)
    assert tuple(img[1, 1]) == (9, 9, 9)


def test_decode_bmp_real():
    import struct

    import numpy as np

    from stanford_re_ray.functions.multimodal import decode_image

    # hand-built 2x2 uncompressed 24-bit BMP (bottom-up, BGR, 4-byte rows)
    w = h = 2
    row = lambda px: b"".join(bytes(p[::-1]) for p in px) + b"\x00\x00"
    raster = row([(10, 20, 30), (40, 50, 60)])      # bottom row
    raster += row([(70, 80, 90), (1, 2, 3)])        # top row
    header = b"BM" + struct.pack("<IHHI", 54 + len(raster), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster),
                       2835, 2835, 0, 0)
    img = decode_image(header + info + raster)
    assert img.shape == (2, 2, 3)
    assert tuple(img[0, 0]) == (70, 80, 90)   # top-left after flip
    assert tuple(img[1, 1]) == (40, 50, 60)


def test_decode_wav_and_audio_features():
    import io
    import wave

    import numpy as np
    import pyarrow as pa

    from stanford_re_ray.functions.multimodal import (audio_features_batch,
                                                      decode_wav)

    # 100ms 440-ish square wave at 8kHz mono
    rate, n = 8000, 800
    t = np.arange(n)
    samples = (np.where((t // 9) % 2 == 0, 12000, -12000)).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(samples.tobytes())
    payload = buf.getvalue()
    x, r = decode_wav(payload)
    assert r == rate and x.shape == (n, 1)
    out = audio_features_batch(pa.table({
        "media_id": ["a1", "bad"],
        "payload": [payload, b"nope"],
    }))
    rec = out.to_pylist()
    assert rec[0]["decoded"] and rec[0]["duration_ms"] == 100
    assert rec[0]["rms"] > 0.3 and rec[0]["zero_crossing_rate"] > 0.05
    assert not rec[1]["decoded"]


def test_gif_hand_fixture():
    """Spec pin: a hand-assembled 2x2 GIF (indices 0,1,1,0; LZW codes
    clear,0,1,1,0,end hand-packed to 44 02 0A, code width bumping 3->4
    after dictionary entry 7) decodes to [[black,white],[white,black]]."""
    import struct

    from stanford_re_ray.functions.multimodal import decode_image

    payload = (
        b"GIF89a" + struct.pack("<HH", 2, 2) + bytes([0x80, 0, 0])
        + b"\x00\x00\x00\xff\xff\xff"
        + b"\x2C" + struct.pack("<HHHH", 0, 0, 2, 2) + b"\x00"
        + bytes([2])
        + bytes([3, 0x44, 0x02, 0x05])
        + b"\x00\x3B"
    )
    img = decode_image(payload)
    exp = np.array([[[0, 0, 0], [255, 255, 255]],
                    [[255, 255, 255], [0, 0, 0]]], np.uint8)
    assert (img == exp).all()


def test_gif_roundtrip_random_images():
    """encode_gif -> decode_image is the identity for any <=256-color
    image, including palettes big enough to force several LZW code-width
    bumps and a dictionary reset."""
    from stanford_re_ray.functions.multimodal import (decode_image,
                                                      encode_gif)

    rng = np.random.RandomState(7)
    for h, w, ncol in ((1, 1, 1), (3, 5, 2), (16, 16, 7), (40, 37, 200),
                       (90, 90, 256)):
        pal = rng.randint(0, 256, (ncol, 3), np.uint8)
        # ensure distinct colors (uniques may collide): reseed dupes
        pal = np.unique(pal, axis=0)
        img = pal[rng.randint(0, len(pal), (h, w))]
        out = decode_image(encode_gif(img))
        assert out.shape == img.shape
        assert (out == img).all(), (h, w, ncol)


def test_gif_interlace_and_transparency():
    """Interlaced row order (8/8/4/2 passes) is undone, and 89a
    transparent pixels keep the background color."""
    import struct

    from stanford_re_ray.functions.multimodal import (_gif_lzw_decode,
                                                      decode_image,
                                                      encode_gif)

    # build a 4x2 interlaced GIF by re-ordering the rows of a plain
    # encode: pass order for h=4 is rows [0, 2, 1, 3]
    img = np.array([[i * 16 + j for j in range(2)] for i in range(4)],
                   np.uint8)
    rgb = np.stack([img, img, img], axis=-1)
    plain = encode_gif(rgb)
    # patch: set interlace flag and swap the index stream row order
    # (decode the plain LZW, reorder, re-encode via encode_gif's LZW on a
    # synthetic image with the interlaced row order)
    inter_rows = rgb[[0, 2, 1, 3]]
    enc = bytearray(encode_gif(inter_rows))
    # image descriptor packed byte: find 0x2C, its packed byte is +9
    i = enc.index(0x2C, 13)
    enc[i + 9] |= 0x40
    out = decode_image(bytes(enc))
    assert (out == rgb).all()

    # transparency: transparent index pixels keep the background color
    payload = (
        b"GIF89a" + struct.pack("<HH", 2, 1) + bytes([0x80, 1, 0])
        + b"\x11\x22\x33\xaa\xbb\xcc"          # bg = color 1 (aabbcc)
        + b"\x21\xf9\x04\x01\x00\x00\x00\x00"  # GCE: transparent idx 0
        + b"\x2C" + struct.pack("<HHHH", 0, 0, 2, 1) + b"\x00"
        + bytes([2])
    )
    # indices [0, 1]: LZW clear,0,1,end @3 bits = bits 100 000 100 101
    stream = bytes([0x44, 0x0A])
    assert _gif_lzw_decode(stream, 2) == [0, 1]
    payload += bytes([2]) + stream + b"\x00\x3B"
    out2 = decode_image(payload)
    assert (out2[0, 0] == [0xAA, 0xBB, 0xCC]).all()   # transparent -> bg
    assert (out2[0, 1] == [0xAA, 0xBB, 0xCC]).all()   # color 1 itself


def test_gif_frame_rect_clipped():
    """A frame rect overhanging the logical screen is clipped (browser
    behavior) instead of crashing the numpy composite."""
    import struct

    from stanford_re_ray.functions.multimodal import decode_image, encode_gif

    img = np.full((2, 2, 3), 9, np.uint8)
    enc = bytearray(encode_gif(img))
    i = enc.index(0x2C, 13)
    # move the frame to (1, 1) on a 2x2 screen: only the top-left pixel
    # of the frame lands on-screen
    enc[i + 1:i + 5] = struct.pack("<HH", 1, 1)
    out = decode_image(bytes(enc))
    assert out.shape == (2, 2, 3)
    assert (out[1, 1] == 9).all()


def test_animated_gif_roundtrip_and_frame_sample():
    """encode_gif_animated -> decode_gif_frames is the identity (pixels
    and 10ms-quantized delays), _decode_gif still reads frame 0, and
    gif_frame_sample picks the frame on display at each tick."""
    import numpy as np
    import pyarrow as pa

    from stanford_re_ray.functions.multimodal import (
        _decode_gif, decode_gif_frames, encode_gif_animated,
        gif_frame_sample)

    rng = np.random.default_rng(7)
    f0 = np.full((6, 8, 3), (255, 0, 0), np.uint8)
    f1 = np.full((6, 8, 3), (0, 255, 0), np.uint8)
    f2 = rng.integers(0, 4, size=(6, 8, 3), dtype=np.uint8) * 60
    frames = [f0, f1, f2]
    delays = [100, 200, 300]
    payload = encode_gif_animated(frames, delays)

    dec, ddelays = decode_gif_frames(payload)
    assert dec.shape == (3, 6, 8, 3)
    assert ddelays == delays
    for a, b in zip(dec, frames):
        assert np.array_equal(a, b)
    assert np.array_equal(_decode_gif(payload), f0)

    batch = pa.table({"media_id": pa.array(["m1"], pa.string()),
                      "payload": pa.array([payload], pa.binary())})
    out = gif_frame_sample(batch, every_ms=150)
    # timeline: f0 [0,100), f1 [100,300), f2 [300,600)
    assert out.column("frame_ts_ms").to_pylist() == [0, 150, 300, 450]
    assert out.column("frame_idx").to_pylist() == [0, 1, 2, 2]
    assert out.column("decoded").to_pylist() == [True] * 4
    r0 = out.column("features").to_pylist()[0]
    assert r0 == [1.0, 0.0, 0.0]

    bad = pa.table({"media_id": pa.array(["x"], pa.string()),
                    "payload": pa.array([b"not a gif"], pa.binary())})
    fb = gif_frame_sample(bad, every_ms=100)
    assert fb.column("decoded").to_pylist() == [False]
    assert fb.column("frame_idx").to_pylist() == [-1]


def test_animated_gif_disposal_restore_background():
    """A hand-built two-frame GIF whose first frame uses disposal 2:
    the second frame's transparent pixels must show BACKGROUND, not
    frame 1's pixels."""
    import struct

    import numpy as np

    from stanford_re_ray.functions.multimodal import (_gif_lzw_encode,
                                                      decode_gif_frames)

    # palette: 0=white(bg) 1=red 2=blue 3=unused
    w = h = 4
    out = bytearray(b"GIF89a") + struct.pack("<HH", w, h)
    out.append(0x80 | 1)          # GCT, 4 entries
    out += b"\x00\x00"
    out += bytes([255, 255, 255,  255, 0, 0,  0, 0, 255,  0, 0, 0])

    def frame(indices, gce_packed, delay_cs, transparent):
        blk = bytearray(b"\x21\xF9\x04")
        blk.append(gce_packed)
        blk += struct.pack("<H", delay_cs)
        blk.append(transparent)
        blk += b"\x00"
        blk += b"\x2C" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        blk.append(2)             # min code size
        data = _gif_lzw_encode(indices, 2)
        for i in range(0, len(data), 255):
            b2 = data[i:i + 255]
            blk.append(len(b2))
            blk += b2
        blk += b"\x00"
        return blk

    # frame 1: all red, disposal=2 (restore bg)
    out += frame([1] * (w * h), 0x08, 10, 0)
    # frame 2: all transparent (idx 3), transparency on
    out += frame([3] * (w * h), 0x01, 10, 3)
    out += b"\x3B"

    frames, delays = decode_gif_frames(bytes(out))
    assert delays == [100, 100]
    assert (frames[0] == (255, 0, 0)).all()
    # disposal 2 cleared the canvas to white before the transparent frame
    assert (frames[1] == (255, 255, 255)).all()


def test_spectral_features_analytic_signals():
    """Spectral features against analytic signals: a pure 1 kHz sine
    must center at ~1 kHz with narrow bandwidth and near-zero flatness;
    deterministic uniform noise must be broadband and much flatter."""
    import io
    import wave

    import numpy as np
    import pyarrow as pa

    from stanford_re_ray.functions.multimodal import spectral_features_batch

    rate, n = 16000, 16000

    def wav(x):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(rate)
            f.writeframes((x * 20000).astype(np.int16).tobytes())
        return buf.getvalue()

    t = np.arange(n) / rate
    sine = wav(np.sin(2 * np.pi * 1000.0 * t))
    rng = np.random.default_rng(11)
    noise = wav(rng.uniform(-1, 1, n))

    out = spectral_features_batch(pa.table({
        "media_id": ["sine", "noise", "bad"],
        "payload": [sine, noise, b"xx"],
    })).to_pylist()
    s, z, bad = out
    assert s["decoded"] and z["decoded"] and not bad["decoded"]
    assert abs(s["spectral_centroid_hz"] - 1000.0) < 30.0
    assert s["spectral_bandwidth_hz"] < 120.0
    assert s["spectral_flatness"] < 0.01
    # white noise: centroid near rate/4, broad, much flatter
    assert abs(z["spectral_centroid_hz"] - rate / 4) < 600.0
    assert z["spectral_bandwidth_hz"] > 1500.0
    assert z["spectral_flatness"] > 0.3


def test_image_dhash_near_dup_and_keyframes():
    """dHash must be identical for an image and its lightly-perturbed
    copy but differ for unrelated images; gif_keyframes must pick
    exactly the scene cuts."""
    import numpy as np
    import pyarrow as pa

    from stanford_re_ray.functions.multimodal import (encode_gif_animated,
                                                      encode_png,
                                                      gif_keyframes,
                                                      image_dhash_batch)

    rng = np.random.default_rng(5)
    base = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    # gentle noise: +-2 levels, gradient signs at 9x8 scale survive
    noisy = np.clip(base.astype(np.int16)
                    + rng.integers(-2, 3, size=base.shape), 0, 255
                    ).astype(np.uint8)
    other = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)

    out = image_dhash_batch(pa.table({
        "media_id": ["a", "a2", "b", "bad"],
        "payload": [encode_png(base), encode_png(noisy),
                    encode_png(other), b"junk"],
    })).to_pylist()
    ha, ha2, hb, bad = out
    assert ha["decoded"] and ha2["decoded"] and hb["decoded"]
    assert not bad["decoded"]
    ham_near = bin(ha["dhash"] ^ ha2["dhash"]).count("1")
    ham_far = bin(ha["dhash"] ^ hb["dhash"]).count("1")
    assert ham_near <= 6 < ham_far

    # three scenes: solid red x2 frames, solid green x2, solid blue
    r = np.full((8, 8, 3), (200, 0, 0), np.uint8)
    g = np.full((8, 8, 3), (0, 200, 0), np.uint8)
    b2 = np.full((8, 8, 3), (0, 0, 200), np.uint8)
    gif = encode_gif_animated([r, r, g, g, b2],
                              [100, 100, 100, 100, 100])
    keys = gif_keyframes(gif, threshold=8.0)
    assert keys == [(0, 0), (2, 200), (4, 400)]


def test_multimodal_dataset_pipeline_end_to_end(ray_session):
    """The Ray-side plumbing, end to end over one mixed-media Dataset:
    binary payload column + typed metadata → exact content-hash dedup →
    ACTOR-POOL image featurizer (callable class, concurrency + small
    batch_size for binary payloads) → dHash near-dup grouping →
    GIF frame sampling → audio time-domain + spectral features."""
    import io
    import wave

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from stanford_re_ray.functions.multimodal import (
        ImageFeatureExtractor, audio_features_batch, encode_gif_animated,
        encode_png, gif_frame_sample, image_dhash_batch,
        media_content_hash, spectral_features_batch)

    rng = np.random.default_rng(9)
    base = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    noisy = np.clip(base.astype(np.int16)
                    + rng.integers(-2, 3, size=base.shape),
                    0, 255).astype(np.uint8)
    png_a = encode_png(base)
    png_b = encode_png(noisy)          # visual near-dup, different bytes
    gif = encode_gif_animated(
        [np.full((8, 8, 3), c, np.uint8)
         for c in ((200, 0, 0), (0, 200, 0))], [100, 100])

    def wav(freq):
        t = np.arange(8000) / 8000
        buf = io.BytesIO()
        with wave.open(buf, "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(8000)
            f.writeframes((np.sin(2 * np.pi * freq * t) * 20000)
                          .astype(np.int16).tobytes())
        return buf.getvalue()

    rows = [
        ("img1", "image", png_a), ("img1_copy", "image", png_a),
        ("img2", "image", png_b), ("anim", "video", gif),
        ("snd1", "audio", wav(500)), ("snd2", "audio", wav(1500)),
        ("junk", "image", b"not media"),
    ]
    media = rd.from_arrow(pa.table({
        "media_id": pa.array([r[0] for r in rows], pa.string()),
        "kind": pa.array([r[1] for r in rows], pa.string()),
        "payload": pa.array([r[2] for r in rows], pa.binary()),
    })).repartition(3)

    # 1. exact dedup on content hash
    hashes = media.map_batches(media_content_hash,
                               batch_format="pyarrow").to_pandas()
    groups = hashes.groupby("payload_sha1")["media_id"].apply(sorted)
    assert ["img1", "img1_copy"] in groups.to_list()

    # 2. actor-pool image featurizer (stateful class, small batches)
    imgs = media.filter(lambda r: r["kind"] == "image")
    feats = imgs.map_batches(ImageFeatureExtractor,
                             batch_format="pyarrow", batch_size=4,
                             concurrency=2).to_pandas()
    byid = feats.set_index("media_id")
    assert bool(byid.loc["img1", "decoded"])
    assert not bool(byid.loc["junk", "decoded"])
    assert (list(byid.loc["img1", "features"])
            == list(byid.loc["img1_copy", "features"]))

    # 3. dHash near-dup: img1/img2 visually close, not byte-equal
    dh = (media.filter(lambda r: r["kind"] == "image")
          .map_batches(image_dhash_batch, batch_format="pyarrow")
          .to_pandas().set_index("media_id"))
    ham = bin(int(dh.loc["img1", "dhash"])
              ^ int(dh.loc["img2", "dhash"])).count("1")
    assert dh.loc["img2", "decoded"] and ham <= 6

    # 4. GIF frame sampling over the video row
    fs = (media.filter(lambda r: r["kind"] == "video")
          .map_batches(gif_frame_sample, batch_format="pyarrow")
          .to_pandas())
    assert list(fs["frame_idx"]) == [0] and fs["decoded"].all()

    # 5. audio: time-domain + spectral
    aud = media.filter(lambda r: r["kind"] == "audio")
    td = (aud.map_batches(audio_features_batch, batch_format="pyarrow")
          .to_pandas().set_index("media_id"))
    sp = (aud.map_batches(spectral_features_batch,
                          batch_format="pyarrow")
          .to_pandas().set_index("media_id"))
    assert td.loc["snd1", "duration_ms"] == 1000
    assert (sp.loc["snd2", "spectral_centroid_hz"]
            > sp.loc["snd1", "spectral_centroid_hz"] + 500)


def test_image_resize_kernels():
    import numpy as np

    from stanford_re_ray.functions.multimodal import image_resize

    # nearest: 2x2 checker upsampled 2x replicates blocks
    img = np.array([[[0], [255]], [[255], [0]]], np.uint8)
    up = image_resize(img, 4, 4, method="nearest")
    assert up.shape == (4, 4)
    assert up[0, 0] == 0 and up[0, 3] == 255
    assert (up[:2, :2] == 0).all() and (up[2:, 2:] == 0).all()

    # bilinear on a horizontal ramp: half-pixel centers land between
    # the two source columns at 25%/75% → 64 and 191 (half-up)
    ramp = np.array([[[0], [255]]], np.uint8)          # 1x2
    out = image_resize(ramp, 1, 4, method="bilinear")
    assert out.tolist() == [[0, 64, 191, 255]]

    # identity resize is exact for both kernels
    rgb = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    for m in ("nearest", "bilinear"):
        np.testing.assert_array_equal(image_resize(rgb, 2, 3, method=m),
                                      rgb)


def test_image_resizer_stage(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd

    from stanford_re_ray.functions.multimodal import (ImageResizer,
                                                      decode_image,
                                                      encode_fake_image)

    rows = [("a", encode_fake_image(24, 16, seed=1)),
            ("b", encode_fake_image(9, 9, seed=2)),
            ("junk", b"\x00\x01not an image")]
    tbl = pa.table({"media_id": pa.array([r[0] for r in rows]),
                    "payload": pa.array([r[1] for r in rows],
                                        pa.binary())})
    outs = []
    for blocks in (1, 3):
        ds = rd.from_arrow(tbl).repartition(blocks)
        out = (ds.map_batches(ImageResizer,
                              fn_constructor_kwargs={"target": (8, 8)},
                              batch_format="pyarrow",
                              batch_size=2, concurrency=(1, 2))
               .to_pandas().sort_values("media_id")
               .reset_index(drop=True))
        outs.append(out)
        byid = out.set_index("media_id")
        assert bool(byid.loc["a", "decoded"])
        assert not bool(byid.loc["junk", "decoded"])
        thumb = decode_image(byid.loc["a", "payload"])
        assert thumb.shape[:2] == (8, 8)
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_hash_neardup_pairs_pigeonhole_and_ids(ray_session):
    """Generic banded-Hamming near-dup: recall GUARANTEED at distance
    <= 3 (any 3 flipped bits leave one of the 4 disjoint 16-bit bands
    intact), id ordering and multi-band dedup correct for both string
    and int64 ids, distance-4 spread across all 4 bands correctly
    missed (the documented approximation boundary)."""
    import pandas as pd

    import ray.data as rd

    from stanford_re_ray.functions.dedup import hash_neardup_pairs

    base = 0x0123456789ABCDEF
    flip3 = base ^ 0b111                       # 3 bits, one band
    spread3 = base ^ (1 << 0) ^ (1 << 16) ^ (1 << 32)   # 3 bits, 3 bands
    spread4 = base ^ (1 << 0) ^ (1 << 16) ^ (1 << 32) ^ (1 << 48)
    far = base ^ ((1 << 40) - 1)
    tbl = pa.table({
        "media_id": pa.array(["a", "b", "c", "d", "e"], pa.string()),
        "hash": pa.array(
            np.array([base, flip3, spread3, spread4, far], np.uint64)),
    })
    out = (hash_neardup_pairs(rd.from_arrow(tbl).repartition(3),
                              id_col="media_id", hash_col="hash",
                              max_hamming=3)
           .to_pandas().sort_values(["id_a", "id_b"])
           .reset_index(drop=True))
    got = set(zip(out["id_a"], out["id_b"], out["hamming"]))
    # a-b (3 bits one band), a-c (3 bits across 3 of 4 bands: band 3
    # intact), b-c (6 bits) excluded, a-d (4 bits, all four bands
    # touched) MISSED by design even though <= hamming would pass
    assert ("a", "b", 3) in got
    assert ("a", "c", 3) in got
    assert all(p[:2] != ("a", "d") for p in got)
    assert all(h <= 3 for *_, h in got)
    # int64 ids round-trip with the same pairs
    tbl_i = pa.table({
        "doc_id": pa.array([10, 20, 30, 40, 50], pa.int64()),
        "hash": tbl.column("hash"),
    })
    out_i = (hash_neardup_pairs(rd.from_arrow(tbl_i).repartition(2),
                                id_col="doc_id", hash_col="hash",
                                max_hamming=3)
             .to_pandas())
    got_i = set(zip(out_i["id_a"], out_i["id_b"], out_i["hamming"]))
    assert ("a", "b", 3) in got and (10, 20, 3) in got_i
    assert (10, 30, 3) in got_i
    assert pd.api.types.is_integer_dtype(out_i["id_a"])


def test_image_neardup_pairs_vs_serial_reference(ray_session):
    """q142's engine path == a serial quadratic all-pairs dHash sweep on
    the identical synthetic corpus (brightness twins at Hamming 0, edit
    twins <= 2, junk excluded), at the driver's own construction."""
    import sys

    import ray.data as rd

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    from stanford_re_ray.functions.multimodal import (decode_image,
                                                      image_dhash,
                                                      image_neardup_pairs)

    media = entrymod._image_neardup_media(12)
    recs = []
    for mid, payload in zip(media.column("media_id").to_pylist(),
                            media.column("payload").to_pylist()):
        try:
            recs.append((mid, image_dhash(decode_image(payload))))
        except Exception:
            pass
    assert len(recs) == media.num_rows - 1      # junk excluded
    exp = sorted(
        (*sorted((a, b)), bin(ha ^ hb).count("1"))
        for i, (a, ha) in enumerate(recs)
        for b, hb in recs[i + 1:]
        if bin(ha ^ hb).count("1") <= 3
    )
    out = (image_neardup_pairs(rd.from_arrow(media).repartition(4),
                               max_hamming=3)
           .to_pandas())
    got = sorted(zip(out["id_a"], out["id_b"], out["hamming"]))
    assert got == exp
    # the corpus exercises both twin kinds
    assert any(a.endswith("_bright") or b.endswith("_bright")
               for a, b, _ in got)
    assert any((a.endswith("_edit") or b.endswith("_edit")) and h > 0
               for a, b, h in got)


def test_audio_fingerprint_invariances():
    """Gain (exact half on even samples) and mono→stereo re-encode leave
    the fingerprint bit-identical; mild noise flips ≤ 4 bits; distinct
    broadband clips stay ≥ 12 bits apart (the near-dup radius 3 never
    false-positives across these)."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    from stanford_re_ray.functions.multimodal import (audio_fingerprint,
                                                      decode_wav)

    media = entrymod._audio_neardup_media(8)
    fps = {}
    for mid, payload in zip(media.column("media_id").to_pylist(),
                            media.column("payload").to_pylist()):
        if mid == "junk0":
            continue
        samples, rate = decode_wav(payload)
        fps[mid] = audio_fingerprint(samples, rate)
    for i in range(8):
        base = fps[f"aud{i:05d}"]
        if i % 3 == 0:
            assert fps[f"aud{i:05d}_half"] == base
        if i % 5 == 0:
            assert fps[f"aud{i:05d}_stereo"] == base
        if i % 7 == 0:
            ham = bin(fps[f"aud{i:05d}_noise"] ^ base).count("1")
            assert ham <= 4, f"noise twin of {i} flipped {ham} bits"
    bases = [fps[f"aud{i:05d}"] for i in range(8)]
    cross = [bin(a ^ b).count("1")
             for i, a in enumerate(bases) for b in bases[i + 1:]]
    assert min(cross) >= 12


def test_audio_neardup_pairs_vs_serial_reference(ray_session):
    """q144's engine path == a serial quadratic fingerprint sweep on the
    identical synthetic corpus (half-volume and stereo twins at
    Hamming 0, junk excluded)."""
    import sys

    import ray.data as rd

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    from stanford_re_ray.functions.multimodal import (audio_fingerprint,
                                                      audio_neardup_pairs,
                                                      decode_wav)

    media = entrymod._audio_neardup_media(10)
    recs = []
    for mid, payload in zip(media.column("media_id").to_pylist(),
                            media.column("payload").to_pylist()):
        try:
            samples, rate = decode_wav(payload)
            recs.append((mid, audio_fingerprint(samples, rate)))
        except Exception:
            pass
    assert len(recs) == media.num_rows - 1
    exp = sorted(
        (*sorted((a, b)), bin(ha ^ hb).count("1"))
        for i, (a, ha) in enumerate(recs)
        for b, hb in recs[i + 1:]
        if bin(ha ^ hb).count("1") <= 3
    )
    out = (audio_neardup_pairs(rd.from_arrow(media).repartition(4),
                               max_hamming=3)
           .to_pandas())
    got = sorted(zip(out["id_a"], out["id_b"], out["hamming"]))
    assert got == exp
    assert any(a.endswith("_half") or b.endswith("_half")
               for a, b, _ in got)
    assert any(a.endswith("_stereo") or b.endswith("_stereo")
               for a, b, _ in got)


def test_video_fingerprint_invariances_and_neardup(ray_session):
    """Duration re-encode, +6 brightness, and frame-order shuffle leave
    the majority-vote video fingerprint bit-identical; distinct clips
    stay far apart; and the distributed pair finder equals a serial
    quadratic sweep on the identical q145 corpus."""
    import sys

    import ray.data as rd

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    from stanford_re_ray.functions.multimodal import (video_fingerprint,
                                                      video_neardup_pairs)

    media = entrymod._video_neardup_media(10)
    fps = {}
    for mid, payload in zip(media.column("media_id").to_pylist(),
                            media.column("payload").to_pylist()):
        if mid == "junk0":
            continue
        fps[mid] = video_fingerprint(payload)
    for m, h in fps.items():
        if "_" in m:
            assert h == fps[m.split("_")[0]], m
    bases = [h for m, h in fps.items() if "_" not in m]
    cross = [bin(a ^ b).count("1")
             for i, a in enumerate(bases) for b in bases[i + 1:]]
    assert min(cross) > 3
    exp = sorted(
        (*sorted((a, b)), bin(ha ^ hb).count("1"))
        for i, (a, ha) in enumerate(sorted(fps.items()))
        for b, hb in sorted(fps.items())[i + 1:]
        if bin(ha ^ hb).count("1") <= 3
    )
    out = (video_neardup_pairs(rd.from_arrow(media).repartition(4),
                               max_hamming=3)
           .to_pandas())
    got = sorted(zip(out["id_a"], out["id_b"], out["hamming"]))
    assert got == exp and len(got) > 0
    assert any(a.endswith("_slow") or b.endswith("_slow")
               for a, b, _ in got)
    assert any(a.endswith("_shuf") or b.endswith("_shuf")
               for a, b, _ in got)


def test_media_header_probe_matches_decoders():
    """Header-only probe agrees with the full decoders on geometry /
    rate for every format the repo can encode, and never raises on
    junk or truncated payloads."""
    import struct

    import numpy as np

    from stanford_re_ray.functions.multimodal import (
        decode_image, decode_wav, encode_gif, encode_jpeg, encode_png,
        encode_wav, media_header_probe)

    rng_img = (np.arange(7 * 5 * 3, dtype=np.uint8).reshape(7, 5, 3)
               * 11 % 251)

    png = encode_png(rng_img)
    p = media_header_probe(png)
    assert (p["format"], p["ok"]) == ("png", True)
    assert (p["height"], p["width"], p["channels"]) == \
        decode_image(png).shape

    jpg = encode_jpeg(rng_img)
    p = media_header_probe(jpg)
    assert (p["format"], p["ok"]) == ("jpeg", True)
    assert (p["height"], p["width"], p["channels"]) == \
        decode_image(jpg).shape

    gif = encode_gif(rng_img)
    p = media_header_probe(gif)
    assert (p["format"], p["ok"]) == ("gif", True)
    assert (p["height"], p["width"]) == decode_image(gif).shape[:2]

    # PPM with a comment line in the header
    raster = bytes(range(12))
    ppm = b"P6\n# c\n2 2\n255\n" + raster
    p = media_header_probe(ppm)
    assert (p["format"], p["width"], p["height"], p["ok"]) == \
        ("ppm", 2, 2, True)

    # hand-built 24-bit BMP (same fixture as test_decode_bmp_real)
    w = h = 2
    row = lambda px: b"".join(bytes(q[::-1]) for q in px) + b"\x00\x00"
    raster = row([(10, 20, 30), (40, 50, 60)]) + \
        row([(70, 80, 90), (1, 2, 3)])
    bmp = (b"BM" + struct.pack("<IHHI", 54 + len(raster), 0, 0, 54)
           + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                         len(raster), 2835, 2835, 0, 0) + raster)
    p = media_header_probe(bmp)
    assert (p["format"], p["width"], p["height"], p["channels"],
            p["ok"]) == ("bmp", 2, 2, 3, True)

    samples = (np.sin(np.arange(800) / 7.0) * 20000).astype(np.int16)
    wav = encode_wav(samples, 16000)
    p = media_header_probe(wav)
    got, rate = decode_wav(wav)
    assert (p["format"], p["ok"]) == ("wav", True)
    assert p["sample_rate"] == rate == 16000
    assert p["n_samples"] == len(got) == 800
    assert p["channels"] == 1

    for junk in (b"", b"x", b"not media at all", png[:10], wav[:6],
                 b"\xff\xd8\xff"):
        p = media_header_probe(junk)
        assert p["ok"] is False


def test_media_header_probe_batch_layout(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from stanford_re_ray.functions.multimodal import (
        encode_png, media_header_probe_batch)

    img = np.zeros((3, 4, 3), np.uint8)
    tbl = pa.table({
        "media_id": pa.array(["a", "b", "c"], pa.string()),
        "payload": pa.array([encode_png(img), b"junk", None],
                            pa.binary())})
    out = (rd.from_arrow(tbl).repartition(2)
           .map_batches(media_header_probe_batch,
                        batch_format="pyarrow")
           .to_pandas().sort_values("media_id").reset_index(drop=True))
    assert out["format"].tolist() == ["png", "unknown", "unknown"]
    assert out["ok"].tolist() == [True, False, False]
    assert out.loc[0, "width"] == 4 and out.loc[0, "height"] == 3
    assert out["n_bytes"].tolist()[1:] == [4, 0]
