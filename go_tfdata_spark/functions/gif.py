"""Dependency-free GIF codec (pure Python LZW + numpy).

Closes the GetImage format gap (tfdata/core/example.go:137-146 decodes
JPEG/PNG/GIF): PNG/PPM are handled by functions/png.py; this module decodes
GIF87a/GIF89a for real — LZW with variable code widths and deferred-clear,
global/local color tables, interlacing, and the GIF89a graphic-control
transparency index — and encodes a valid non-interlaced (or interlaced)
GIF89a for round-trip and cross-implementation testing. Implemented from
the public GIF89a specification; cross-validated against the JVM's
javax.imageio GIF reader/writer in tests (an independent implementation
reachable through the Spark gateway).

`decode_gif` returns the FIRST frame composed onto the logical-screen
canvas as (H, W, 3) uint8 RGB: the canvas starts as the global background
color and transparent pixels leave it untouched (the single-frame analog
of how Go's image/gif presents frame 0 over the screen bounds).
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_CODE_WIDTH = 12


class _BitReader:
    """LSB-first bit reader over the concatenated LZW data sub-blocks."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int | None:
        while self.nbits < n:
            if self.pos >= len(self.data):
                return None
            self.acc |= self.data[self.pos] << self.nbits
            self.nbits += 8
            self.pos += 1
        v = self.acc & ((1 << n) - 1)
        self.acc >>= n
        self.nbits -= n
        return v


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytearray:
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    code_size = min_code_size + 1
    br = _BitReader(data)
    out = bytearray()
    prev: bytes | None = None
    while len(out) < n_pixels:
        code = br.read(code_size)
        if code is None:
            break  # truncated stream: return what decoded (lenient, like readers do)
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"corrupt GIF LZW stream: code {code} out of range")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
            if len(table) == (1 << code_size) and code_size < _MAX_CODE_WIDTH:
                code_size += 1
        prev = entry
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc |= v << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = self.nbits = 0
        return bytes(self.out)


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    bw = _BitWriter()
    code_size = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    bw.write(clear, code_size)
    w = b""
    for b in indices:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        bw.write(table[w], code_size)
        if next_code < (1 << _MAX_CODE_WIDTH):
            table[wk] = next_code
            next_code += 1
            # encoder bumps one entry LATER than the decoder reaches the
            # same count (the decoder adds its entry after the next code)
            if next_code == (1 << code_size) + 1 and code_size < _MAX_CODE_WIDTH:
                code_size += 1
        else:
            bw.write(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            code_size = min_code_size + 1
            next_code = eoi + 1
        w = bytes([b])
    if w:
        bw.write(table[w], code_size)
    bw.write(eoi, code_size)
    return bw.flush()


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> list[int]:
    rows: list[int] = []
    for start, step in _INTERLACE_PASSES:
        rows.extend(range(start, h, step))
    return rows


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF87a/89a -> (H, W, 3) uint8 RGB of the first frame on the
    logical-screen canvas (background-filled; transparency respected)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    sw, sh, packed, bg_idx, _aspect = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n

    transparent_idx: int | None = None
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            label = payload[pos]
            pos += 1
            sub_start = pos
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            if label == 0xF9:  # graphic control: packed, delay, transparent
                gce = payload[sub_start + 1 : sub_start + 1 + payload[sub_start]]
                if gce[0] & 0x01:
                    transparent_idx = gce[3]
            pos += 1  # block terminator
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        # image descriptor
        left, top, w, h, ipacked = struct.unpack("<HHHHB", payload[pos : pos + 9])
        pos += 9
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            ct = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF image has no color table")
        min_code_size = payload[pos]
        pos += 1
        parts = []
        while payload[pos] != 0:
            ln = payload[pos]
            parts.append(payload[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        pos += 1  # terminator
        idx = np.frombuffer(
            _lzw_decode(b"".join(parts), min_code_size, w * h), dtype=np.uint8
        )
        if len(idx) < w * h:
            idx = np.pad(idx, (0, w * h - len(idx)))
        frame = idx[: w * h].reshape(h, w)
        if ipacked & 0x40:  # interlaced: rows arrive in 4-pass order
            de = np.empty_like(frame)
            de[_interlace_order(h)] = frame
            frame = de
        canvas_idx = np.full((sh, sw), bg_idx, dtype=np.uint8)
        canvas = ct[np.minimum(canvas_idx, len(ct) - 1)]
        fr_rgb = ct[np.minimum(frame, len(ct) - 1)]
        region = canvas[top : top + h, left : left + w]
        if transparent_idx is not None:
            opaque = frame != transparent_idx
            region[opaque] = fr_rgb[opaque]
        else:
            region[:, :] = fr_rgb
        return canvas  # first frame only (GetImage parity)
    raise ValueError("GIF contains no image data")


def encode_gif(
    img: np.ndarray,
    interlace: bool = False,
    transparent_idx: int | None = None,
) -> bytes:
    """(H, W) grey or (H, W, 3) RGB uint8 (<=256 distinct colors) ->
    single-frame GIF89a with a global color table."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        palette = np.arange(256, dtype=np.uint8).repeat(3).reshape(256, 3)
        indices = img
    elif img.ndim == 3 and img.shape[2] == 3:
        flat = img.reshape(-1, 3)
        palette, inverse = np.unique(flat, axis=0, return_inverse=True)
        if len(palette) > 256:
            raise ValueError(f"GIF encode needs <=256 colors, got {len(palette)}")
        indices = inverse.astype(np.uint8).reshape(img.shape[:2])
    else:
        raise ValueError("GIF supports grey (H,W) or RGB (H,W,3)")
    h, w = indices.shape
    depth = max(1, int(np.ceil(np.log2(max(len(palette), 2)))))
    n_ct = 1 << depth
    ct = np.zeros((n_ct, 3), dtype=np.uint8)
    ct[: len(palette)] = palette

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((depth - 1) & 0x07), 0, 0)
    out += ct.tobytes()
    if transparent_idx is not None:
        out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent_idx, 0])
    ipacked = 0x40 if interlace else 0x00
    out += bytes([0x2C]) + struct.pack("<HHHHB", 0, 0, w, h, ipacked)
    rows = indices[_interlace_order(h)] if interlace else indices
    min_code_size = max(2, depth)
    out += bytes([min_code_size])
    data = _lzw_encode(rows.tobytes(), min_code_size)
    for off in range(0, len(data), 255):
        chunk = data[off : off + 255]
        out += bytes([len(chunk)]) + chunk
    out += bytes([0, 0x3B])
    return bytes(out)
