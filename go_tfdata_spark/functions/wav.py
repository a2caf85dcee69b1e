"""Dependency-free WAV (RIFF/WAVE) codec — real audio decode for the
multimodal column surface.

The reference's typed accessors decode images for real (GetImage,
tfdata/core/example.go:137-146) but carry audio/video as opaque bytes;
a training-data engine at 100 TB meets audio constantly (speech corpora
ship as PCM WAV), so the audio path gets the same treatment the image
path got: a real decoder for the dominant uncompressed container, with
compressed codecs (mp3/ogg/flac) degrading to the deterministic stub.

Scope (from the public RIFF/WAVE spec, multimedia programming interface
rev 1.0 + the WAVE_FORMAT_EXTENSIBLE addendum):
  - chunk-walking parser (fmt /data required; LIST/fact/cue skipped),
    tolerant of the common "RIFF size lies" corruption;
  - PCM integer 8 (unsigned) / 16 / 24 / 32-bit (signed little-endian);
  - IEEE float 32/64 (format code 3);
  - WAVE_FORMAT_EXTENSIBLE (0xFFFE) with PCM or float sub-format;
  - interleaved multi-channel; output normalized float32 (n, ch).

Encoder emits canonical PCM16 (the interchange baseline). All numpy
vectorized — no per-sample Python; a 10-minute stereo file decodes as
two frombuffer calls and one scale.
"""

from __future__ import annotations

import struct

import numpy as np

_PCM, _FLOAT, _EXTENSIBLE = 1, 3, 0xFFFE


def sniff_wav(payload: bytes | None) -> bool:
    return (
        payload is not None
        and len(payload) >= 12
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"WAVE"
    )


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """int16 (n,) or (n, ch) interleaved -> canonical PCM16 WAV bytes."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.tobytes()  # C order == interleaved frames
    block = ch * 2
    fmt = struct.pack("<HHIIHH", _PCM, ch, rate, rate * block, block, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes -> (sample_rate, float32 samples (n, ch) in [-1, 1]).

    Raises ValueError on anything malformed (callers route that to the
    deterministic stub, mirroring the image path's degrade contract).
    """
    if not sniff_wav(payload):
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, len(payload)
    fmt = None
    data = None
    while pos + 8 <= end:
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("fmt chunk truncated")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    code, ch, rate, _brate, block, bits = fmt
    if code == _EXTENSIBLE:
        # sub-format GUID's first two bytes are the real format code
        code = _ext_subformat(payload)
    if ch < 1 or rate < 1:
        raise ValueError("bad channel count / rate")
    if code == _PCM:
        if bits == 8:
            x = np.frombuffer(data, dtype=np.uint8).astype(np.float32)
            x = (x - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
        elif bits == 24:
            b = np.frombuffer(data, dtype=np.uint8)
            b = b[: (len(b) // 3) * 3].reshape(-1, 3).astype(np.uint32)
            v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
            v = v.astype(np.int32)
            v[v >= 1 << 23] -= 1 << 24
            x = v.astype(np.float32) / float(1 << 23)
        elif bits == 32:
            x = np.frombuffer(data, dtype="<i4").astype(np.float32) / float(1 << 31)
        else:
            raise ValueError(f"unsupported PCM bit depth {bits}")
    elif code == _FLOAT:
        if bits == 32:
            x = np.frombuffer(data, dtype="<f4").astype(np.float32)
        elif bits == 64:
            x = np.frombuffer(data, dtype="<f8").astype(np.float32)
        else:
            raise ValueError(f"unsupported float bit depth {bits}")
    else:
        raise ValueError(f"unsupported format code {code}")
    n = len(x) // ch
    if n == 0:
        raise ValueError("empty data chunk")
    return rate, x[: n * ch].reshape(n, ch)


def _ext_subformat(payload: bytes) -> int:
    """Re-walk to the fmt chunk and read the EXTENSIBLE sub-format code."""
    pos, end = 12, len(payload)
    while pos + 8 <= end:
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        if cid == b"fmt ":
            if size < 26:
                raise ValueError("extensible fmt chunk truncated")
            return struct.unpack_from("<H", payload, pos + 8 + 24)[0]
        pos += 8 + size + (size & 1)
    raise ValueError("fmt chunk vanished")


def wav_features(payload: bytes) -> dict:
    """Decode + the standard cheap audio features (all closed-form numpy):
    duration_ms, per-file RMS, zero-crossing count of channel 0."""
    rate, s = decode_wav(payload)
    mono = s[:, 0]
    return {
        "sample_rate": int(rate),
        "channels": int(s.shape[1]),
        "n_samples": int(s.shape[0]),
        "duration_ms": float(s.shape[0] * 1000.0 / rate),
        "rms": float(np.sqrt(np.mean(s.astype(np.float64) ** 2))),
        "zero_crossings": int(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1]))),
    }
