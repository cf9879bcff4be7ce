"""AVI video codec (pipeline/codecs.py decode_avi/encode_avi) and the real
video feature-extraction / frame-sampling paths (pipeline/multimodal.py
extract_video_features, frame_sample)."""

import pytest

from steel_datafusion_spark.pipeline.codecs import (
    DecodedImage, decode_avi, decode_image_bytes, encode_avi, sniff_format,
)


def _solid(w, h, rgb):
    return DecodedImage(w, h, "RGB", bytes(rgb) * (w * h))


def _gradient(w, h):
    px = bytearray()
    for y in range(h):
        for x in range(w):
            px += bytes(((x * 37) % 256, (y * 53) % 256, (x + y) % 256))
    return DecodedImage(w, h, "RGB", bytes(px))


def test_avi_dib_roundtrip_exact():
    # odd width exercises the 4-byte row padding of BI_RGB
    frames = [_gradient(5, 4), _solid(5, 4, (200, 100, 0)),
              _solid(5, 4, (1, 2, 3))]
    payload = encode_avi(frames, rate=7, scale=1)
    assert sniff_format(payload) == "avi"
    v = decode_avi(payload)
    assert (v.width, v.height, v.n_frames, v.codec) == (5, 4, 3, "DIB ")
    assert v.fps == 7.0
    assert v.duration_ms == 3 * 1000 // 7
    assert v.frames == frames           # bit-exact: flip + swizzle invert


def test_avi_frame_step_and_max_frames_skip_pixel_work():
    frames = [_solid(4, 4, (i, i, i)) for i in range(10)]
    payload = encode_avi(frames, rate=10)
    v = decode_avi(payload, frame_step=3)
    assert v.frame_indices == [0, 3, 6, 9]
    assert [f.pixels[0] for f in v.frames] == [0, 3, 6, 9]
    assert v.n_frames == 10             # stream length, not sampled count
    v2 = decode_avi(payload, frame_step=3, max_frames=2)
    assert v2.frame_indices == [0, 3]


def test_avi_mjpg_roundtrip_near_exact():
    frames = [DecodedImage(16, 16, "L", bytes([g]) * 256) for g in (32, 128)]
    payload = encode_avi(frames, rate=5, codec="MJPG")
    v = decode_avi(payload)
    assert v.codec == "MJPG" and v.n_frames == 2
    for orig, dec in zip(frames, v.frames):
        mean_orig = sum(orig.pixels) / len(orig.pixels)
        mean_dec = sum(dec.pixels) / len(dec.pixels)
        assert abs(mean_dec - mean_orig) < 3   # constant block, DC-only


def test_avi_grayscale_dib_replicates_to_rgb():
    payload = encode_avi([DecodedImage(4, 2, "L", bytes(range(8)))])
    img = decode_avi(payload).frames[0]
    assert img.mode == "RGB"
    assert img.pixels[:6] == bytes([0, 0, 0, 1, 1, 1])


def test_avi_rejects_malformed():
    with pytest.raises(ValueError):
        decode_avi(b"RIFF\x00\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        decode_avi(b"nonsense")
    with pytest.raises(ValueError):
        encode_avi([])
    with pytest.raises(ValueError):
        encode_avi([_solid(4, 4, (0, 0, 0)), _solid(8, 4, (0, 0, 0))])
    # unsupported stream codec is an explicit error, not garbage pixels
    good = encode_avi([_solid(4, 4, (9, 9, 9))])
    bad = good.replace(b"vidsDIB ", b"vidsXVID")
    with pytest.raises(ValueError):
        decode_avi(bad)


def test_extract_video_features_real_and_fallback(spark):
    import pandas as pd

    from steel_datafusion_spark.pipeline.multimodal import (
        MEDIA_SCHEMA, extract_video_features,
    )

    avi = encode_avi([_solid(8, 6, (30, 60, 90)) for _ in range(4)], rate=8)
    rows = pd.DataFrame({
        "media_id": [1, 2],
        "kind": ["video", "video"],
        "payload": [avi, b"not a container"],
        "meta": [{"width": 8, "height": 6, "duration_ms": 0},
                 {"width": 3, "height": 4, "duration_ms": 777}],
    })
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    got = {r["media_id"]: r.asDict()
           for r in extract_video_features(media).collect()}
    real = got[1]
    assert real["decoded"] is True
    assert (real["width"], real["height"]) == (8, 6)
    assert real["fps"] == 8.0 and real["n_frames"] == 4
    assert real["duration_ms"] == 500
    assert abs(real["mean_luma"] - 60.0) < 1e-9
    fb = got[2]
    assert fb["decoded"] is False and fb["duration_ms"] == 777


def test_frame_sample_decodes_real_avi_frames(spark):
    import pandas as pd

    from steel_datafusion_spark.pipeline.multimodal import (
        MEDIA_SCHEMA, frame_sample,
    )

    # 10 fps, 10 frames = 1 s; every_ms=500 -> step 5 -> frames 0 and 5
    frames = [_solid(4, 4, (i * 10, 0, 0)) for i in range(10)]
    avi = encode_avi(frames, rate=10)
    rows = pd.DataFrame({
        "media_id": [7],
        "kind": ["video"],
        "payload": [avi],
        "meta": [{"width": 4, "height": 4, "duration_ms": 1000}],
    })
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    out = sorted(frame_sample(media, every_ms=500, max_frames=8).collect(),
                 key=lambda r: r["frame_idx"])
    assert [r["frame_ts_ms"] for r in out] == [0, 500]
    decoded = [decode_image_bytes(bytes(r["frame_payload"])) for r in out]
    assert [d.pixels[0] for d in decoded] == [0, 50]   # frames 0 and 5
    assert all(d.width == 4 and d.height == 4 for d in decoded)
