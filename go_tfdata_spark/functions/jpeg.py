"""Dependency-free baseline JPEG decoder (pure Python + numpy).

Closes the last GetImage format gap (tfdata/core/example.go:137-146
decodes JPEG/PNG/GIF; PNG/PPM live in functions/png.py, GIF in
functions/gif.py). Implemented from the public ITU-T T.81 specification:

- baseline sequential DCT (SOF0), 8-bit samples, Huffman entropy coding,
  restart markers, interleaved single-scan streams (what every camera /
  ImageIO / libjpeg default-writes);
- progressive DCT (SOF2, T.81 annex G): spectral selection + successive
  approximation, multi-scan coefficient accumulation with EOB runs,
  interleaved DC scans and non-interleaved AC/refinement scans, restart
  markers per scan — the form web encoders emit for crawl-scale images;
- grayscale (1 component) and YCbCr (3 components) with arbitrary h/v
  chroma subsampling factors (4:4:4, 4:2:2, 4:2:0, ...), nearest-neighbor
  chroma upsampling, JFIF YCbCr -> RGB;
- the IDCT is the exact orthonormal float DCT-III via one 8x8 basis-matrix
  product per block (T.81 permits implementation-defined IDCT precision;
  tests bound the difference against the JVM's javax.imageio decoder).

Arithmetic-coded and hierarchical streams raise ValueError — the
deterministic stub handles them upstream.

Entropy decoding is pure Python (a table-driven state machine per
coefficient); the dequantize/IDCT/upsample/color stages are vectorized
numpy over all blocks at once. This is the media-ingest side path, not
the CDC hot path — decode runs inside Arrow-batched `mapInPandas` tasks.
"""

from __future__ import annotations

import struct

import numpy as np

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# Orthonormal 8-point DCT-II basis; IDCT(block) = C.T @ block @ C
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16) * (
            np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8)
        )


class _HuffTable:
    """Canonical Huffman per T.81 annex C: (mincode, maxcode, valptr)."""

    def __init__(self, bits: list[int], values: bytes):
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for ln in range(1, 17):
            if bits[ln - 1]:
                self.valptr[ln] = k
                self.mincode[ln] = code
                code += bits[ln - 1]
                k += bits[ln - 1]
                self.maxcode[ln] = code - 1
            code <<= 1
        self.values = values


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing;
    stops at any marker (caller handles RSTn)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> bool:
        d = self.data
        p = self.pos
        if p >= len(d):
            return False
        b = d[p]
        if b == 0xFF:
            nxt = d[p + 1] if p + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos = p + 2
            elif 0xD0 <= nxt <= 0xD7:
                self.marker = nxt  # restart: caller consumes via reset()
                return False
            else:
                self.marker = nxt
                return False
        else:
            self.pos = p + 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8
        return True

    def read_bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            return 0  # past the end: T.81 pads with 1s; 0 keeps EXTEND sane
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huff(self, table: _HuffTable) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read_bit()
            if table.maxcode[ln] >= code >= table.mincode[ln]:
                return table.values[table.valptr[ln] + code - table.mincode[ln]]
        raise ValueError("corrupt JPEG: invalid Huffman code")

    def reset_at_restart(self) -> None:
        """Consume an RSTn marker and resync the bit stream."""
        self.acc = 0
        self.nbits = 0
        # skip to the marker bytes and past them
        d = self.data
        p = self.pos
        while p + 1 < len(d) and not (d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7):
            p += 1
        self.pos = p + 2
        self.marker = None


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 sign extension of a t-bit magnitude."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline or progressive JPEG -> uint8 (H, W) grey or (H, W, 3) RGB."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (bad SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    restart_interval = 0
    frame = None  # (h, w, components)
    geom = None  # (hmax, vmax, mcux, mcuy) once storage is initialized
    progressive = False
    scanned = False
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                if pq:
                    tbl = np.frombuffer(body[i : i + 128], dtype=">u2").astype(np.int32)
                    i += 128
                else:
                    tbl = np.frombuffer(body[i : i + 64], dtype=np.uint8).astype(np.int32)
                    i += 64
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = bytes(body[i + 17 : i + 17 + n])
                (huff_ac if tc else huff_dc)[th] = _HuffTable(bits, vals)
                i += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            progressive = marker == 0xC2
            _prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = (h, w, comps)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG mode (SOF{marker - 0xC0}): baseline/progressive only"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS: entropy-coded data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            h, w, comps = frame
            if geom is None:
                geom = _init_storage(h, w, comps)
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tdta = body[1 + 2 * c], body[2 + 2 * c]
                comp = next(x for x in comps if x["id"] == cs)
                scan.append({"comp": comp, "dc": tdta >> 4, "ac": tdta & 0x0F})
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0x0F
            if progressive:
                pos = _progressive_scan(
                    payload, pos + 2 + seglen, geom, scan, ss, se, ah, al,
                    huff_dc, huff_ac, restart_interval,
                )
                scanned = True
                continue
            _baseline_scan(
                payload, pos + 2 + seglen, geom, scan, huff_dc, huff_ac,
                restart_interval,
            )
            scanned = True
            break  # baseline is single-scan by construction
        pos += 2 + seglen
    if not scanned or frame is None:
        raise ValueError("JPEG contains no scan data")
    return _finish(frame, geom, qt)


def _init_storage(h, w, comps):
    """Per-component coefficient stores (one 64-vector per 8x8 block, in
    zigzag order) sized to the MCU-padded grid; also the non-interleaved
    scan dims (T.81 A.2.2: ceil of the component's own sample dims)."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        c["bw"] = mcux * c["h"]  # blocks across (storage stride)
        c["bh"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int32)
        c["pred"] = 0
        cx = -(-(w * c["h"]) // hmax)  # component sample dims
        cy = -(-(h * c["v"]) // vmax)
        c["bw_n"] = -(-cx // 8)  # non-interleaved block dims
        c["bh_n"] = -(-cy // 8)
    return hmax, vmax, mcux, mcuy


def _baseline_scan(data, pos, geom, scan, huff_dc, huff_ac, restart_interval):
    """Sequential DCT scan: every block's full DC+AC in one interleaved pass."""
    _hmax, _vmax, mcux, mcuy = geom
    br = _BitReader(data, pos)
    for sc in scan:
        sc["comp"]["pred"] = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            br.reset_at_restart()
            for sc in scan:
                sc["comp"]["pred"] = 0
        my, mx = divmod(m, mcux)
        for sc in scan:
            c = sc["comp"]
            dct, act = huff_dc[sc["dc"]], huff_ac[sc["ac"]]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    blk = np.zeros(64, dtype=np.int32)
                    t = br.decode_huff(dct)
                    diff = _extend(br.read_bits(t), t)
                    c["pred"] += diff
                    blk[0] = c["pred"]
                    k = 1
                    while k < 64:
                        rs = br.decode_huff(act)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:  # ZRL: 16 zeros
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("corrupt JPEG: AC index overflow")
                        blk[k] = _extend(br.read_bits(s), s)
                        k += 1
                    row = (my * c["v"] + by) * c["bw"] + (mx * c["h"] + bx)
                    c["coef"][row] = blk


def _progressive_scan(data, pos, geom, scan, ss, se, ah, al,
                      huff_dc, huff_ac, restart_interval) -> int:
    """One progressive scan (T.81 annex G): DC scans may be interleaved;
    AC scans are single-component over the component's OWN block grid.
    Coefficients accumulate across scans (spectral selection bands x
    successive-approximation bit planes). Returns the offset of the next
    marker after the scan's entropy data."""
    _hmax, _vmax, mcux, mcuy = geom
    if ss == 0 and se != 0:
        raise ValueError("corrupt JPEG: progressive scan mixes DC and AC")
    if ss != 0 and len(scan) != 1:
        raise ValueError("corrupt JPEG: interleaved progressive AC scan")
    br = _BitReader(data, pos)
    eobrun = 0
    for sc in scan:
        sc["comp"]["pred"] = 0
    if len(scan) > 1:  # interleaved DC scan
        for m in range(mcux * mcuy):
            if restart_interval and m and m % restart_interval == 0:
                br.reset_at_restart()
                eobrun = 0
                for sc in scan:
                    sc["comp"]["pred"] = 0
            my, mx = divmod(m, mcux)
            for sc in scan:
                c = sc["comp"]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        row = (my * c["v"] + by) * c["bw"] + (mx * c["h"] + bx)
                        _prog_dc(br, c, sc, row, ah, al, huff_dc)
    else:
        sc = scan[0]
        c = sc["comp"]
        for m in range(c["bw_n"] * c["bh_n"]):
            if restart_interval and m and m % restart_interval == 0:
                br.reset_at_restart()
                eobrun = 0
                c["pred"] = 0
            by, bx = divmod(m, c["bw_n"])
            row = by * c["bw"] + bx
            if ss == 0:
                _prog_dc(br, c, sc, row, ah, al, huff_dc)
            else:
                blk = c["coef"][row]
                act = huff_ac[sc["ac"]]
                if ah == 0:
                    eobrun = _prog_ac_first(br, blk, act, ss, se, al, eobrun)
                else:
                    eobrun = _prog_ac_refine(br, blk, act, ss, se, al, eobrun)
    # entropy data ends at the next non-RST marker; resume parsing there
    p = br.pos
    while p + 1 < len(data):
        if data[p] == 0xFF and data[p + 1] != 0x00 and not (0xD0 <= data[p + 1] <= 0xD7):
            break
        p += 1
    return p


def _prog_dc(br, c, sc, row, ah, al, huff_dc):
    blk = c["coef"][row]
    if ah == 0:  # first DC scan: diff-coded in the 2^Al-divided domain
        t = br.decode_huff(huff_dc[sc["dc"]])
        c["pred"] += _extend(br.read_bits(t), t)
        blk[0] = c["pred"] << al
    elif br.read_bit():  # refinement: one correction bit per block
        blk[0] |= 1 << al


def _prog_ac_first(br, blk, act, ss, se, al, eobrun) -> int:
    """First scan of an AC band (Ah=0): baseline-style run/size coding plus
    EOB runs spanning (1<<r)+bits blocks; values enter at magnitude << Al."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = br.decode_huff(act)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r != 15:
                eobrun = (1 << r) - 1
                if r:
                    eobrun += br.read_bits(r)
                break
            k += 16  # ZRL
        else:
            k += r
            if k > se:
                raise ValueError("corrupt JPEG: AC index overflow")
            blk[k] = _extend(br.read_bits(s), s) << al
            k += 1
    return eobrun


def _prog_ac_refine(br, blk, act, ss, se, al, eobrun) -> int:
    """AC refinement scan (Ah=Al+1): every already-nonzero coefficient in
    the band reads one correction bit as it is passed; zero-history
    positions count toward the run, and new +-(1<<Al) coefficients are
    inserted where the run ends (T.81 G.1.2.3 / the jdphuff algorithm)."""
    p1, m1 = 1 << al, -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = br.decode_huff(act)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read_bits(r)
                    break
                # r == 15: pass 16 zero-history coefficients
            else:
                val = p1 if br.read_bit() else m1
            while k <= se:
                coef = blk[k]
                if coef != 0:
                    if br.read_bit() and (coef & p1) == 0:
                        blk[k] = coef + (p1 if coef >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:  # EOB run still corrects nonzero history in the band
            coef = blk[k]
            if coef != 0:
                if br.read_bit() and (coef & p1) == 0:
                    blk[k] = coef + (p1 if coef >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _finish(frame, geom, qt):
    """Dequantize -> de-zigzag -> IDCT for ALL blocks per component
    (vectorized numpy), then upsample chroma and convert color."""
    h, w, comps = frame
    hmax, vmax, _mcux, _mcuy = geom
    planes = []
    for c in comps:
        deq = c["coef"] * qt[c["tq"]][None, :]
        blocks = np.zeros((len(deq), 64))
        blocks[:, _ZIGZAG] = deq
        blocks = blocks.reshape(-1, 8, 8)
        spatial = np.einsum("ij,njk,kl->nil", _C.T, blocks, _C)
        px = np.clip(np.round(spatial) + 128, 0, 255).astype(np.uint8)
        plane = (
            px.reshape(c["bh"], c["bw"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c["bh"] * 8, c["bw"] * 8)
        )
        # upsample to full resolution (nearest) and crop to (h, w)
        plane = plane.repeat(vmax // c["v"], axis=0).repeat(hmax // c["h"], axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return planes[0]
    if len(planes) != 3:
        raise ValueError(f"unsupported JPEG component count {len(planes)}")
    y, cb, cr = (p.astype(np.float64) for p in planes)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)
