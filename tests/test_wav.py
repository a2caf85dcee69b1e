"""WAV codec: round-trips for every supported bit depth, malformed-input
contract, and the distributed audio_features stage (degrade-to-stub).

Audio analog of the image-path parity suite (test_png/test_gif/test_jpeg):
the reference carries audio as opaque bytes; here the dominant
uncompressed container decodes for real (functions/wav.py)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from go_tfdata_spark.functions.wav import (
    decode_wav,
    encode_wav,
    sniff_wav,
    wav_features,
)


def _saw(n, ch=1, k=257):
    t = np.arange(n * ch, dtype=np.int64)
    return ((t * k) % 65536 - 32768).astype(np.int16).reshape(n, ch)


def test_pcm16_roundtrip_mono_and_stereo():
    for ch in (1, 2):
        s = _saw(500, ch)
        rate, x = decode_wav(encode_wav(s, 16000))
        assert rate == 16000 and x.shape == (500, ch)
        # float32(int16/32768) is exact for every int16 value
        np.testing.assert_array_equal(x, s.astype(np.float32) / 32768.0)


def _wav_raw(fmt_code, bits, ch, rate, data, extensible=False):
    """Hand-rolled WAV container for depths encode_wav doesn't emit."""
    block = ch * bits // 8
    if extensible:
        # cbSize=22, validBits, channelMask, then the 16-byte sub-format
        # GUID whose first two bytes are the real format code
        fmt = struct.pack("<HHIIHH", 0xFFFE, ch, rate, rate * block, block, bits)
        fmt += struct.pack("<HHI", 22, bits, 0) + struct.pack("<H", fmt_code) + b"\x00" * 14
    else:
        fmt = struct.pack("<HHIIHH", fmt_code, ch, rate, rate * block, block, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_pcm8_24_32_and_float_depths():
    # 8-bit unsigned
    raw8 = bytes([0, 128, 255, 64])
    rate, x = decode_wav(_wav_raw(1, 8, 1, 8000, raw8))
    np.testing.assert_allclose(x[:, 0], [(v - 128) / 128.0 for v in raw8])
    # 24-bit signed little-endian
    vals24 = [1 << 22, -(1 << 22), 0]
    raw24 = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals24)
    _, x = decode_wav(_wav_raw(1, 24, 1, 8000, raw24))
    np.testing.assert_allclose(x[:, 0], [v / float(1 << 23) for v in vals24])
    # 32-bit signed
    vals32 = np.array([1 << 30, -(1 << 30), 123456], dtype="<i4")
    _, x = decode_wav(_wav_raw(1, 32, 1, 8000, vals32.tobytes()))
    np.testing.assert_allclose(x[:, 0], vals32.astype(np.float64) / (1 << 31), rtol=1e-6)
    # IEEE float 32 and 64
    f32 = np.array([0.5, -0.25, 1.0], dtype="<f4")
    _, x = decode_wav(_wav_raw(3, 32, 1, 8000, f32.tobytes()))
    np.testing.assert_array_equal(x[:, 0], f32)
    f64 = np.array([0.125, -0.5], dtype="<f8")
    _, x = decode_wav(_wav_raw(3, 64, 1, 8000, f64.tobytes()))
    np.testing.assert_allclose(x[:, 0], f64)


def test_extensible_subformat_and_chunk_skipping():
    s = _saw(100)
    pcm = s.astype("<i2").tobytes()
    wav = _wav_raw(1, 16, 1, 44100, pcm, extensible=True)
    rate, x = decode_wav(wav)
    assert rate == 44100
    np.testing.assert_array_equal(x[:, 0], s[:, 0].astype(np.float32) / 32768.0)
    # LIST chunk (odd size -> word alignment) before data must be skipped
    junk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    plain = encode_wav(s, 44100)
    spliced = plain[:12] + junk + plain[12:]
    # RIFF size field now lies; decoder must still walk to fmt/data
    rate, x2 = decode_wav(spliced)
    assert rate == 44100
    np.testing.assert_array_equal(x2, x)


@pytest.mark.parametrize(
    "payload",
    [
        b"",
        b"ID3\x03junkjunkjunk",
        b"RIFF\x00\x00\x00\x00WAVE",  # no chunks at all
        encode_wav(_saw(10), 8000)[:30],  # truncated mid-fmt
        _wav_raw(1, 12, 1, 8000, b"\x00" * 6),  # unsupported depth
        _wav_raw(99, 16, 1, 8000, b"\x00" * 4),  # unknown format code
    ],
)
def test_malformed_raises_valueerror(payload):
    with pytest.raises(ValueError):
        decode_wav(payload)
    assert not sniff_wav(payload) or True  # sniff never raises


def test_features_closed_form():
    s = _saw(441, 2)
    f = wav_features(encode_wav(s, 44100))
    assert f["sample_rate"] == 44100 and f["channels"] == 2
    assert f["n_samples"] == 441
    assert f["duration_ms"] == pytest.approx(10.0)
    x = s.astype(np.float32) / 32768.0
    assert f["rms"] == pytest.approx(float(np.sqrt(np.mean(x.astype(np.float64) ** 2))))
    zc = int(np.count_nonzero(np.signbit(x[1:, 0]) != np.signbit(x[:-1, 0])))
    assert f["zero_crossings"] == zc


def test_audio_features_stage_decodes_and_degrades(spark):
    from go_tfdata_spark.functions.multimodal import audio_features

    s = _saw(300)
    rows = [
        (0, "audio", bytearray(encode_wav(s, 8000)), None),
        (1, "audio", bytearray(b"OggSnotreally" * 4), None),
        (2, "audio", bytearray(encode_wav(s, 8000)[:20]), None),  # truncated
    ]
    df = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, meta map<string,string>"
    )
    out = {r["media_id"]: r.asDict() for r in audio_features(df).collect()}
    assert out[0]["decoded"] and out[0]["sample_rate"] == 8000
    assert out[0]["n_samples"] == 300
    assert not out[1]["decoded"] and not out[2]["decoded"]
    # stub is deterministic: byte-derived, never null
    assert out[1]["sample_rate"] == 8000 and out[1]["rms"] is not None
