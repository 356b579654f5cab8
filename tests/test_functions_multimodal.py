"""Multimodal plumbing: fake codec, actor-pool feature extraction,
frame-sampling layout, binary dedup signatures."""

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


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\n....")


def test_feature_extractor_batch():
    out = ImageFeatureExtractor(target=(4, 4))(_media_table())
    assert out.num_rows == 3
    assert out.column("decoded").to_pylist() == [True, True, True]
    f1, _, f3 = out.column("features").to_pylist()
    assert f1 == f3  # same payload → same features
    assert len(f1) == 3


def test_frame_sampling_layout():
    out = frame_sample_stub(_media_table(), every_ms=1000)
    rows = list(zip(out.column("media_id").to_pylist(),
                    out.column("frame_ts_ms").to_pylist()))
    assert rows == [("m2", 0), ("m2", 1000), ("m2", 2000)]


def test_media_exact_dedup_signature():
    out = media_content_hash(_media_table())
    h = out.column("payload_sha1").to_pylist()
    assert h[0] == h[2] and h[0] != h[1]
