"""Dependency-free PNG + PPM image codecs (stdlib zlib + numpy).

The reference attaches real image codecs to its typed rows: AddImage
PNG-encodes an image.Image into the example, GetImage decodes JPEG/PNG/GIF
(tfdata/core/example.go:131-146). This sandbox carries no imaging library,
but PNG itself needs only DEFLATE (stdlib ``zlib``) plus the five scanline
filters — so the PRIMARY reference format is implemented for real here:

- ``decode_png``: 8-bit greyscale / RGB / RGBA, all five filter types
  (None/Sub/Up/Average/Paeth), non-interlaced. Sub and Up unfilter
  vectorized (per-lane cumsum / row add); Average and Paeth run the spec
  recurrence per scanline.
- ``encode_png``: valid non-interlaced PNG from a (H,W[,C]) uint8 array;
  filter type selectable (0 by default; others exist so tests can exercise
  every decode path).
- ``decode_ppm`` / ``encode_ppm``: binary P6/P5 NetPBM, trivially exact.

GIF decode/encode lives in functions/gif.py (pure-Python LZW). JPEG decode
stays out of scope (a DCT/Huffman codec); ``sniff_format`` reports it so
callers can route to the deterministic stub instead of mis-decoding.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# colour type -> channels (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def sniff_format(payload: bytes) -> str | None:
    """'png' | 'ppm' | 'jpeg' | 'gif' | None by magic bytes."""
    if payload is None:
        return None
    if payload[:8] == _PNG_SIG:
        return "png"
    if payload[:2] in (b"P5", b"P6"):
        return "ppm"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    return None


def _chunks(data: bytes):
    off = 8
    while off + 8 <= len(data):
        (length,) = struct.unpack(">I", data[off : off + 4])
        ctype = data[off + 4 : off + 8]
        body = data[off + 8 : off + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        (want_crc,) = struct.unpack(">I", data[off + 8 + length : off + 12 + length])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != want_crc:
            raise ValueError(f"PNG chunk CRC mismatch in {ctype!r}")
        yield ctype, body
        off += 12 + length
        if ctype == b"IEND":
            return


def decode_png(payload: bytes) -> np.ndarray:
    """PNG -> uint8 array (H,W) for greyscale, (H,W,C) otherwise."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    width = height = None
    channels = None
    idat = []
    for ctype, body in _chunks(payload):
        if ctype == b"IHDR":
            width, height, depth, colour, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if colour not in _CHANNELS:
                raise ValueError(f"unsupported PNG colour type {colour}")
            if interlace:
                raise ValueError("interlaced PNG not supported")
            channels = _CHANNELS[colour]
        elif ctype == b"IDAT":
            idat.append(body)
    if width is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(b"".join(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    ftypes = raw[:, 0]
    rows = raw[:, 1:]
    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = channels  # 8-bit depth: bytes per pixel == channels
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        f = int(ftypes[y])
        cur = rows[y]
        if f == 0:  # None
            rec = cur.copy()
        elif f == 1:  # Sub: per-lane prefix sum mod 256
            rec = cur.reshape(-1, bpp).cumsum(axis=0, dtype=np.uint64).astype(
                np.uint8
            ).reshape(-1)
        elif f == 2:  # Up
            rec = cur + prev
        elif f == 3:  # Average
            rec = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                left = int(rec[x - bpp]) if x >= bpp else 0
                rec[x] = (int(cur[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            rec = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (int(cur[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = rec
        prev = rec
    img = out.reshape(height, width, channels)
    return img[:, :, 0] if channels == 1 else img


def _filter_row(cur, prev, bpp: int, ftype: int) -> np.ndarray:
    left = np.zeros_like(cur)
    left[bpp:] = cur[:-bpp]
    ul = np.zeros_like(prev)
    ul[bpp:] = prev[:-bpp]
    if ftype == 0:
        return cur.copy()
    if ftype == 1:
        return cur - left
    if ftype == 2:
        return cur - prev
    if ftype == 3:
        return cur - (((left.astype(np.uint16) + prev) >> 1).astype(np.uint8))
    if ftype == 4:
        a, b, c = left.astype(np.int16), prev.astype(np.int16), ul.astype(np.int16)
        p = a + b - c
        pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
        pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
        return cur - pred.astype(np.uint8)
    raise ValueError(f"bad filter type {ftype}")


def encode_png(img: np.ndarray, filter_type: int = 0, level: int = 6) -> bytes:
    """(H,W) or (H,W,C in {1,2,3,4}) uint8 -> non-interlaced 8-bit PNG."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    colour = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
    if colour is None:
        raise ValueError(f"unsupported channel count {ch}")
    flat = img.reshape(h, w * ch)
    lines = []
    prev = np.zeros(w * ch, dtype=np.uint8)
    for y in range(h):
        lines.append(bytes([filter_type]))
        lines.append(_filter_row(flat[y], prev, ch, filter_type).tobytes())
        prev = flat[y]
    idat = zlib.compress(b"".join(lines), level)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, colour, 0, 0, 0)
    return _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary NetPBM: P6 (RGB) -> (H,W,3), P5 (grey) -> (H,W)."""
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError("not a binary PPM/PGM")
    # header: magic, width, height, maxval — whitespace/comment separated
    toks: list[bytes] = []
    i = 2
    while len(toks) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        toks.append(payload[i:j])
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = int(toks[0]), int(toks[1]), int(toks[2])
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    ch = 3 if magic == b"P6" else 1
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h * ch, offset=i)
    img = px.reshape(h, w, ch)
    return img[:, :, 0] if ch == 1 else img


def encode_ppm(img: np.ndarray) -> bytes:
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        return b"P5 %d %d 255\n" % (img.shape[1], img.shape[0]) + img.tobytes()
    if img.ndim == 3 and img.shape[2] == 3:
        return b"P6 %d %d 255\n" % (img.shape[1], img.shape[0]) + img.tobytes()
    raise ValueError("PPM supports grey (H,W) or RGB (H,W,3)")


def decode_image(payload: bytes) -> np.ndarray:
    """Decode PNG, PPM, GIF, or baseline JPEG by magic — the full GetImage
    format set (example.go:137-146); raises on unrecognized payloads and
    on JPEG modes outside baseline (progressive/arithmetic)."""
    fmt = sniff_format(payload)
    if fmt == "png":
        return decode_png(payload)
    if fmt == "ppm":
        return decode_ppm(payload)
    if fmt == "gif":
        from go_tfdata_spark.functions.gif import decode_gif

        return decode_gif(payload)
    if fmt == "jpeg":
        from go_tfdata_spark.functions.jpeg import decode_jpeg

        return decode_jpeg(payload)
    raise ValueError(f"unsupported or unrecognized image format: {fmt!r}")
