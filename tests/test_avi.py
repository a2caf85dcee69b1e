"""AVI container codec: DIB round-trips, MJPEG frames through the shared
JPEG entropy decoder (fixtures encoded by javax.imageio — an independent
implementation), malformed-input contract, and the distributed
video_frames stage (subsampling + degrade-to-stub)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from go_tfdata_spark.functions.avi import decode_avi_frames, encode_avi, sniff_avi


def _frames(n=4, h=10, w=14, seed=5):
    rng = np.random.RandomState(seed)
    return [rng.randint(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(n)]


def test_dib_roundtrip_lossless():
    for h, w in [(10, 14), (7, 9), (16, 16)]:  # incl. stride-padded widths
        frames = _frames(3, h, w)
        out = list(decode_avi_frames(encode_avi(frames, fps=12)))
        assert [i for i, _ in out] == [0, 1, 2]
        for (_, got), want in zip(out, frames):
            np.testing.assert_array_equal(got, want)


def test_audio_chunks_and_index_are_skipped():
    frames = _frames(2)
    b = encode_avi(frames)
    # splice an audio chunk into movi and an idx1 after it: both ignored
    movi_at = b.index(b"movi")
    audio = b"01wb" + struct.pack("<I", 6) + b"\x01\x02\x03\x04\x05\x06"
    spliced = b[: movi_at + 4] + audio + b[movi_at + 4 :] + b"idx1" + struct.pack("<I", 0)
    out = list(decode_avi_frames(spliced))
    assert len(out) == 2
    np.testing.assert_array_equal(out[0][1], frames[0])


def test_mjpeg_frames_via_imageio(spark):
    """MJPEG = JPEG-per-frame: frames encoded by javax.imageio (independent
    implementation), wrapped in an AVI by hand, decoded by our container
    walk + jpeg.py. Smooth gradients keep JPEG loss small and uniform."""
    from tests.test_jpeg import _jvm_encode_jpeg

    jvm = spark.sparkContext._jvm
    h, w = 24, 32
    frames = []
    for t in range(2):
        base = np.add.outer(np.arange(h) * 2, np.arange(w) * 2) + 40 * t
        rgb = np.stack([base % 200 + 20] * 3, axis=2).astype(np.uint8)
        frames.append(rgb)
    jpegs = [_jvm_encode_jpeg(jvm, fr) for fr in frames]
    # hand-rolled MJPG AVI: reuse encode_avi's header, swap movi payload
    shell = encode_avi(frames)
    movi_at = shell.index(b"movi")
    chunks = b""
    for j in jpegs:
        chunks += b"00dc" + struct.pack("<I", len(j)) + j + (b"\x00" if len(j) & 1 else b"")
    movi = b"movi" + chunks
    head = shell[: movi_at - 8]  # everything up to the movi LIST header
    avi = head + b"LIST" + struct.pack("<I", len(movi)) + movi
    avi = avi[:4] + struct.pack("<I", len(avi) - 8) + avi[8:]
    out = list(decode_avi_frames(avi))
    assert len(out) == 2
    for (_, got), want in zip(out, frames):
        assert got.shape == want.shape
        # JPEG is lossy: tolerate small uniform error on smooth gradients
        assert np.abs(got.astype(int) - want.astype(int)).mean() < 3.0


@pytest.mark.parametrize(
    "payload,sniffs",
    [
        (b"", False),
        (b"RIFF\x00\x00\x00\x00WAVE", False),  # RIFF but not AVI
        (b"RIFF\x10\x00\x00\x00AVI ", True),  # valid magic, no lists
        (None, False),
    ],
)
def test_malformed_raises(payload, sniffs):
    assert sniff_avi(payload) is sniffs
    with pytest.raises(ValueError):
        list(decode_avi_frames(payload))


def test_truncation_anywhere_raises_valueerror():
    b = encode_avi(_frames(2))
    for cut in (13, 40, 90, len(b) // 2, len(b) - 5):
        with pytest.raises(ValueError):
            list(decode_avi_frames(b[:cut]))


def test_video_frames_stage_subsamples_and_degrades(spark):
    from go_tfdata_spark.functions.multimodal import video_frames

    frames = _frames(5)
    rows = [
        (0, "video", bytearray(encode_avi(frames)), None),
        (1, "video", bytearray(b"not a video at all"), None),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, meta map<string,string>"
    )
    out = video_frames(df, every_nth=2).collect()
    good = sorted(r["frame_idx"] for r in out if r["media_id"] == 0)
    assert good == [0, 2, 4] and all(r["decoded"] for r in out if r["media_id"] == 0)
    stub = [r for r in out if r["media_id"] == 1]
    assert len(stub) == 1 and stub[0]["frame_idx"] == -1 and not stub[0]["decoded"]
