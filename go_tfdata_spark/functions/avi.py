"""Dependency-free AVI (RIFF 'AVI ') container codec — real video decode
for the multimodal column surface.

Completes the media trio: images decode for real (png/gif/jpeg.py — the
reference's GetImage set, tfdata/core/example.go:137-146), audio decodes
for real (wav.py), and video was plumbing-only until now. This parses the
dominant simple video container (public RIFF/AVI spec, multimedia
programming interface rev 1.0) and decodes two frame codings:

  - '00db' raw DIB frames (BI_RGB BITMAPINFOHEADER: bottom-up rows, BGR
    byte order, 4-byte row stride padding) — fully self-contained;
  - '00dc' MJPEG frames — each chunk is a complete baseline/progressive
    JPEG, decoded by functions/jpeg.py (the same entropy decoder the
    image path uses; motion-JPEG is just JPEG-per-frame).

Out-of-scope codings (H.264 etc.) and malformed containers raise
ValueError; the Spark featurize stage degrades those to the deterministic
stub row, mirroring the image/audio contract. Non-video streams (audio
'01wb' chunks, index 'idx1') are walked over, not parsed.
"""

from __future__ import annotations

import struct

import numpy as np


def sniff_avi(payload: bytes | None) -> bool:
    return (
        payload is not None
        and len(payload) >= 12
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"AVI "
    )


def _walk(data: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_size) over a RIFF chunk run.
    `end` is clamped to the real buffer — RIFF size fields lie in
    truncated/corrupt files and must not drive reads past the data."""
    pos, end = start, min(end, len(data))
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        yield cid, pos + 8, size
        pos += 8 + size + (size & 1)  # word alignment


def encode_avi(frames: list[np.ndarray], fps: int = 10) -> bytes:
    """(H, W, 3) uint8 RGB frames -> AVI with raw '00db' DIB frames
    (bottom-up BGR rows, stride padded to 4 bytes) — the canonical
    uncompressed interchange form; every AVI reader decodes it."""
    if not frames:
        raise ValueError("no frames")
    h, w, _ = frames[0].shape
    stride = (w * 3 + 3) & ~3
    chunks = []
    for fr in frames:
        if fr.shape != (h, w, 3):
            raise ValueError("all frames must share one shape")
        bgr = fr[::-1, :, ::-1].astype(np.uint8)  # bottom-up, BGR
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, : w * 3] = bgr.reshape(h, w * 3)
        data = rows.tobytes()
        chunks.append(b"00db" + struct.pack("<I", len(data)) + data + (b"\x00" if len(data) & 1 else b""))
    movi = b"movi" + b"".join(chunks)
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 0, 0, 0, 0)
    # AVISTREAMHEADER: flags, priority, language, initialFrames, scale,
    # rate, start, length, suggestedBuffer, quality, sampleSize, rcFrame
    strh = (
        b"vids" + b"DIB " + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0,
                                        len(frames), stride * h, 0xFFFFFFFF, 0)
        + struct.pack("<hhhh", 0, 0, w, h)
    )
    strl = b"strl" + b"strh" + struct.pack("<I", len(strh)) + strh \
        + b"strf" + struct.pack("<I", len(strf)) + strf
    avih = struct.pack(
        "<IIIIIIIIIIIIII", 1_000_000 // fps, stride * h * fps, 0, 0x10,
        len(frames), 0, 1, stride * h, w, h, 0, 0, 0, 0,
    )
    hdrl = b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih \
        + b"LIST" + struct.pack("<I", len(strl)) + strl
    body = b"AVI " + b"LIST" + struct.pack("<I", len(hdrl)) + hdrl \
        + b"LIST" + struct.pack("<I", len(movi)) + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _parse_strf(data: bytes, start: int, end: int) -> tuple[int, int, int, bytes]:
    """Find the first video stream's BITMAPINFOHEADER inside hdrl:
    returns (width, height, bitcount, compression fourcc)."""
    for cid, off, size in _walk(data, start, end):
        if cid == b"LIST" and data[off : off + 4] == b"strl":
            is_video = False
            for sid, soff, ssize in _walk(data, off + 4, off + size):
                if sid == b"strh":
                    is_video = data[soff : soff + 4] == b"vids"
                elif sid == b"strf" and is_video:
                    if ssize < 20:
                        raise ValueError("strf truncated")
                    _, w, h, _, bits = struct.unpack_from("<IiiHH", data, soff)
                    comp = data[soff + 16 : soff + 20]
                    return w, abs(h), bits, comp
    raise ValueError("no video stream header")


def decode_avi_frames(payload: bytes):
    """AVI bytes -> yields (frame_idx, (H, W, 3) uint8 RGB) per video
    frame. '00db' DIB and '00dc' MJPEG supported; anything else raises."""
    if not sniff_avi(payload):
        raise ValueError("not a RIFF/AVI payload")
    hdr = None
    movi = None
    for cid, off, size in _walk(payload, 12, len(payload)):
        if cid == b"LIST":
            kind = payload[off : off + 4]
            if kind == b"hdrl":
                hdr = _parse_strf(payload, off + 4, off + size)
            elif kind == b"movi":
                movi = (off + 4, off + size)
    if hdr is None or movi is None:
        raise ValueError("missing hdrl/movi")
    w, h, bits, comp = hdr
    if w < 1 or h < 1:
        raise ValueError("bad dimensions")
    idx = 0
    for cid, off, size in _walk(payload, movi[0], movi[1]):
        if cid[2:4] == b"db":  # uncompressed DIB
            if bits != 24 or comp not in (b"\x00\x00\x00\x00", b"DIB "):
                raise ValueError(f"unsupported DIB coding bits={bits}")
            stride = (w * 3 + 3) & ~3
            if size < stride * h:
                raise ValueError("DIB frame truncated")
            rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=off)
            rgb = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)[::-1, :, ::-1]
            yield idx, rgb.copy()
            idx += 1
        elif cid[2:4] == b"dc":  # compressed — MJPEG only
            from go_tfdata_spark.functions.jpeg import decode_jpeg

            frame = payload[off : off + size]
            if frame[:3] != b"\xff\xd8\xff":
                raise ValueError(f"unsupported compressed coding {comp!r}")
            img = decode_jpeg(frame)
            if img.ndim == 2:
                img = np.repeat(img[:, :, None], 3, axis=2)
            yield idx, img
            idx += 1
