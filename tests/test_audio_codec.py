"""WAV/PCM audio codec (pipeline/codecs.py decode_wav/encode_wav) and the
real audio feature extraction path (pipeline/multimodal.py
extract_audio_features)."""

import math

import pytest

from steel_datafusion_spark.pipeline.codecs import (
    decode_wav, encode_wav, sniff_format,
)


def _sine(n=800, rate=8000, freq=440.0, amp=0.5, channels=1):
    out = []
    for i in range(n):
        v = amp * math.sin(2 * math.pi * freq * i / rate)
        out.extend([v] * channels)
    return out


@pytest.mark.parametrize("bits,tol", [(8, 1 / 64), (16, 1 / 16384),
                                      (24, 1 / 4194304), (32, 1e-9)])
def test_wav_roundtrip_bit_depths(bits, tol):
    samples = _sine()
    payload = encode_wav(samples, sample_rate=8000, n_channels=1, bits=bits)
    assert sniff_format(payload) == "wav"
    a = decode_wav(payload)
    assert (a.n_channels, a.sample_rate, a.bits) == (1, 8000, bits)
    assert a.n_frames == len(samples)
    assert a.duration_ms == len(samples) * 1000 // 8000
    assert max(abs(x - y) for x, y in zip(a.samples, samples)) <= tol
    # RMS of a 0.5-amplitude sine ~ 0.5/sqrt(2)
    assert abs(a.rms() - 0.5 / math.sqrt(2)) < 0.01


def test_wav_stereo_interleaving():
    samples = _sine(n=400, channels=2)
    payload = encode_wav(samples, sample_rate=16000, n_channels=2, bits=16)
    a = decode_wav(payload)
    assert a.n_channels == 2
    assert a.n_frames == 400
    assert len(a.samples) == 800


def test_wav_ieee_float_decode():
    import struct
    samples = _sine(n=100)
    body = b"".join(struct.pack("<f", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 8000 * 4, 4, 32)
    chunks = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(body)) + body)
    payload = b"RIFF" + struct.pack("<I", len(chunks)) + chunks
    a = decode_wav(payload)
    assert a.bits == 32 and a.n_frames == 100
    assert max(abs(x - y) for x, y in zip(a.samples, samples)) < 1e-6


def test_wav_rejects_malformed():
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxWAVE")           # no fmt/data
    with pytest.raises(ValueError):
        decode_wav(b"not audio at all")
    import struct
    fmt = struct.pack("<HHIIHH", 2, 1, 8000, 8000, 1, 4)  # ADPCM tag
    chunks = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", 0))
    with pytest.raises(ValueError):
        decode_wav(b"RIFF" + struct.pack("<I", len(chunks)) + chunks)


def test_extract_audio_features_real_and_fallback(spark):
    from steel_datafusion_spark.pipeline.multimodal import (
        extract_audio_features,
    )
    wav = encode_wav(_sine(n=1600, rate=16000), sample_rate=16000,
                     n_channels=1, bits=16)
    rows = [
        (1, "audio", bytearray(wav), (0, 0, 0)),
        (2, "audio", bytearray(b"opus-ish opaque payload"), (0, 0, 1234)),
        (3, "image", bytearray(b"not audio"), (4, 3, 0)),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, "
        "meta struct<width:int,height:int,duration_ms:int>")
    got = {r.media_id: r for r in extract_audio_features(media).collect()}
    assert set(got) == {1, 2}           # image rows don't appear
    a = got[1]
    assert a.decoded and a.n_channels == 1 and a.sample_rate == 16000
    assert a.bits == 16 and a.n_frames == 1600 and a.duration_ms == 100
    assert abs(a.rms - 0.5 / math.sqrt(2)) < 0.01
    fb = got[2]
    assert not fb.decoded and fb.duration_ms == 1234 and fb.rms == 0.0
