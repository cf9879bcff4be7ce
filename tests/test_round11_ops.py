"""Round-11 fixes: adversarial-input codec hardening (reserved MP4
fullbox versions, MP3 Layer I/II tables), streaming replay identity,
and the IVF fixed-nlist growth law."""

import pytest


# ---------------------------------------------------------------------------
# MP4: reserved fullbox version must hit the honest fallback, not TypeError
# ---------------------------------------------------------------------------

def _corrupt_mvhd_version(payload: bytes, version: int) -> bytes:
    i = payload.find(b"mvhd")
    assert i > 0
    buf = bytearray(payload)
    buf[i + 4] = version  # fullbox version byte follows the box type
    return bytes(buf)


def test_mp4_reserved_fullbox_version_raises_value_error():
    from steel_datafusion_spark.pipeline.codecs import encode_mp4, probe_mp4

    good = encode_mp4(2000, [{"kind": "video", "codec": "avc1",
                              "width": 64, "height": 48,
                              "duration_ms": 2000}])
    assert probe_mp4(good).duration_ms == 2000
    bad = _corrupt_mvhd_version(good, 2)
    with pytest.raises(ValueError, match="reserved fullbox version"):
        probe_mp4(bad)


def test_mp4_reserved_fullbox_version_probed_false(spark):
    """One malformed mvhd in a crawl corpus must degrade to probed=false,
    never kill the Spark task (ADVICE round-10)."""
    from steel_datafusion_spark.pipeline.codecs import encode_mp4
    from steel_datafusion_spark.pipeline.multimodal import (
        MEDIA_SCHEMA, extract_container_metadata,
    )

    good = encode_mp4(1000, [{"kind": "audio", "codec": "mp4a", "width": 0,
                              "height": 0, "duration_ms": 1000}])
    bad = _corrupt_mvhd_version(good, 7)
    df = spark.createDataFrame(
        [(1, "video", bytearray(good), (0, 0, 0)),
         (2, "video", bytearray(bad), (0, 0, 0))],
        MEDIA_SCHEMA)
    rows = {r.media_id: r.probed
            for r in extract_container_metadata(df).collect()}
    assert rows == {1: True, 2: False}


# ---------------------------------------------------------------------------
# MP3: Layer I / II headers probe with their OWN bitrate/spf tables
# ---------------------------------------------------------------------------

def _mp3_frame_header(ver_bits: int, layer_bits: int, br_idx: int,
                      sr_idx: int, mode: int = 0) -> bytes:
    return bytes([0xFF, 0xE0 | (ver_bits << 3) | (layer_bits << 1) | 1,
                  (br_idx << 4) | (sr_idx << 2), mode << 6])


def test_mp3_layer2_uses_layer2_tables():
    from steel_datafusion_spark.pipeline.codecs import probe_mp3

    # MPEG-1 (ver_bits=3) Layer II (layer_bits=2), 128 kbps (V1L2 idx 8),
    # 44100 Hz (idx 0), stereo
    hdr = _mp3_frame_header(3, 2, 8, 0)
    frame_len = 144 * 128 * 1000 // 44100  # layer II: 1152 spf
    payload = (hdr + b"\x00" * (frame_len - 4)) * 10
    m = probe_mp3(payload)
    assert (m.version, m.layer) == ("1", 2)
    assert m.bitrate_kbps == 128
    assert m.sample_rate == 44100
    assert not m.vbr
    assert m.n_frames == 10
    assert m.duration_ms == 10 * 1152 * 1000 // 44100


def test_mp3_layer1_uses_layer1_tables():
    from steel_datafusion_spark.pipeline.codecs import probe_mp3

    # MPEG-1 (3) Layer I (layer_bits=3), 256 kbps (V1L1 idx 8), 48 kHz
    # (idx 1), mono
    hdr = _mp3_frame_header(3, 3, 8, 1, mode=3)
    frame_len = (12 * 256 * 1000 // 48000) * 4  # 4-byte slots
    payload = (hdr + b"\x00" * (frame_len - 4)) * 8
    m = probe_mp3(payload)
    assert (m.version, m.layer) == ("1", 1)
    assert m.bitrate_kbps == 256
    assert m.channels == 1
    assert m.n_frames == 8
    assert m.duration_ms == 8 * 384 * 1000 // 48000


def test_mp3_layer3_still_exact():
    from steel_datafusion_spark.pipeline.codecs import encode_mp3, probe_mp3

    m = probe_mp3(encode_mp3(n_frames=5, bitrate_kbps=128))
    assert (m.layer, m.bitrate_kbps, m.n_frames) == (3, 128, 5)


# ---------------------------------------------------------------------------
# Streaming replay identity (Delta txnAppId+txnVersion pattern)
# ---------------------------------------------------------------------------

def test_replayed_batch_same_identity_skips():
    from steel_datafusion_spark.streaming.operators import _replayed_batch

    cur = {"meta": {"batch_id": 3, "txn_app": "/ckpt/a"}}
    assert _replayed_batch(cur, "/ckpt/a", 3) is True
    assert _replayed_batch(cur, "/ckpt/a", 0) is True
    assert _replayed_batch(cur, "/ckpt/a", 4) is False
    assert _replayed_batch(None, "/ckpt/a", 0) is False


def test_replayed_batch_fresh_checkpoint_raises_not_skips():
    """batch_id 0 from a NEW checkpoint against an existing table is a
    restart, not a replay — silent skip would lose data (ADVICE r10)."""
    from steel_datafusion_spark.streaming.operators import _replayed_batch

    cur = {"meta": {"batch_id": 3, "txn_app": "/ckpt/a"}}
    with pytest.raises(ValueError, match="fresh checkpoint"):
        _replayed_batch(cur, "/ckpt/B", 0)
    # legacy tables (no txn_app recorded) keep the old skip behavior
    legacy = {"meta": {"batch_id": 3}}
    assert _replayed_batch(legacy, "/ckpt/B", 0) is True
