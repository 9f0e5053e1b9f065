"""Baseline JPEG (ITU-T T.81) codec in pure Python/numpy — no codec
library.

Decoder: marker walk, DQT (8/16-bit), DHT, SOF0/SOF1 frame header,
DRI + RSTn restart handling, byte-unstuffed Huffman scan decode,
dequantization, float IDCT (orthonormal 8x8 DCT-III via a precomputed
basis matrix), per-component replication upsampling, JFIF YCbCr->RGB.
Progressive (SOF2) and the other non-baseline frame types raise
NotImplementedError so callers can fall back to a codec library seam.

Encoder: a deliberately tiny DC-ONLY 4:2:0 writer used for test
fixtures. Every 8x8 luma block is a constant v(bx, by); constant
blocks quantized with DC step 8 decode EXACTLY (quantized DC =
v - 128, IDCT of a lone DC coefficient is a constant plane), and
chroma held at 128 makes YCbCr->RGB the identity on Y — so the decoded
pixel sum of encode_dc_jpeg(w, h, seed) has a closed form a SQL oracle
can re-derive: 3 * sum over blocks of crop_w * crop_h * v(bx, by).

The Huffman tables are the example tables of T.81 Annex K (the public
spec's own recommendation, shipped by every JPEG implementation).

Graft of the reference's "decode the format for real, not via a
wrapped library" stance (reference struct-parses ESRI shapefiles in
src/read_shp.cpp where shapelib would have been the wrapper).
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag[i] = natural-order index of the i-th coefficient in scan order
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# T.81 Annex K.3 example Huffman table specs: (BITS[1..16], HUFFVAL)
K3_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
K3_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
K3_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
K3_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

_NON_BASELINE_SOF = {0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                     0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def _huff_codes(bits, vals):
    """T.81 C.2 canonical code assignment -> list of (length, code, symbol)."""
    out = []
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out.append((length, code, vals[k]))
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits, vals):
    return {(ln, code): sym for ln, code, sym in _huff_codes(bits, vals)}


def _encode_table(bits, vals):
    return {sym: (ln, code) for ln, code, sym in _huff_codes(bits, vals)}


# orthonormal 8x8 DCT basis: M[u, x] = 0.5 * c(u) * cos((2x+1) u pi / 16)
_M = np.array([[0.5 * (1 / np.sqrt(2) if u == 0 else 1.0)
                * np.cos((2 * x + 1) * u * np.pi / 16)
                for x in range(8)] for u in range(8)])


def _idct2(block: np.ndarray) -> np.ndarray:
    return _M.T @ block @ _M


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; restart markers are consumed by restart()."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.cur = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif nxt == 0xD9:  # EOI inside fill: treat as endless 1-pad
                self.cur = (self.cur << 8) | 0xFF
                self.nbits += 8
                return
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
        else:
            self.pos += 1
        self.cur = (self.cur << 8) | b
        self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.cur >> self.nbits) & ((1 << n) - 1)
        self.cur &= (1 << self.nbits) - 1
        return v

    def huff(self, table) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read(1)
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in scan")

    def restart(self, n: int):
        """Byte-align and consume the expected RSTn marker."""
        self.cur = 0
        self.nbits = 0
        d = self.data
        while d[self.pos] == 0xFF and d[self.pos + 1] == 0xFF:
            self.pos += 1  # fill bytes before the marker
        if d[self.pos] != 0xFF or d[self.pos + 1] != 0xD0 + (n & 7):
            raise ValueError("missing restart marker")
        self.pos += 2


def _extend(v: int, s: int) -> int:
    if s == 0:
        return 0
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


def decode_jpeg(buf: bytes):
    """Decode a baseline JPEG -> (width, height, pixel_sum) where
    pixel_sum is the int64 sum of the decoded RGB (or grayscale)
    samples over the WxH crop. Raises NotImplementedError for
    progressive / non-baseline frames and ValueError for malformed
    input (the parse-error contract callers catch): truncation
    surfaces inside _BitReader._fill / struct.unpack_from as
    IndexError/struct.error, normalized here."""
    try:
        return _decode_jpeg(buf)
    except (IndexError, struct.error) as ex:
        raise ValueError(f"truncated or corrupt JPEG: {ex}") from ex


def _decode_jpeg(buf: bytes):
    if buf[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG")
    qtabs = {}
    dc_tabs = {}
    ac_tabs = {}
    dri = 0
    frame = None
    i = 2
    n = len(buf)
    while i < n:
        if buf[i] != 0xFF:
            raise ValueError("bad marker sync")
        m = buf[i + 1]
        if m == 0xFF:  # fill byte
            i += 1
            continue
        if m == 0xD9:  # EOI
            break
        if m == 0x01 or 0xD0 <= m <= 0xD7:
            i += 2
            continue
        (seg,) = struct.unpack_from(">H", buf, i + 2)
        body = buf[i + 4:i + 2 + seg]
        if m in _NON_BASELINE_SOF:
            raise NotImplementedError(
                f"non-baseline JPEG frame (SOF marker 0x{m:02X}); "
                "only baseline sequential (SOF0/SOF1) is decoded natively")
        if m == 0xDB:  # DQT — possibly several tables per segment
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 15
                j += 1
                if pq:
                    vals = np.frombuffer(body, dtype=">u2", count=64, offset=j)
                    j += 128
                else:
                    vals = np.frombuffer(body, dtype=np.uint8, count=64, offset=j)
                    j += 64
                tab = np.zeros(64, dtype=np.int64)
                tab[ZIGZAG] = vals.astype(np.int64)
                qtabs[tq] = tab
        elif m == 0xC4:  # DHT
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 15
                bits = list(body[j + 1:j + 17])
                cnt = sum(bits)
                vals = list(body[j + 17:j + 17 + cnt])
                (dc_tabs if tc == 0 else ac_tabs)[th] = _decode_table(bits, vals)
                j += 17 + cnt
        elif m in (0xC0, 0xC1):  # SOF0 / SOF1
            prec, h, w, nc = body[0], *struct.unpack_from(">HH", body, 1), body[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit precision supported")
            comps = []
            for c in range(nc):
                cid, samp, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 15, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif m == 0xDD:  # DRI
            (dri,) = struct.unpack_from(">H", body, 0)
        elif m == 0xDA:  # SOS — entropy-coded data follows the header
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            if ns != len(frame["comps"]):
                raise NotImplementedError(
                    "non-interleaved multi-scan baseline JPEG not supported")
            sel = {}
            for c in range(ns):
                cs, tabs = body[1 + 2 * c], body[2 + 2 * c]
                sel[cs] = (tabs >> 4, tabs & 15)
            return _decode_scan(buf, i + 2 + seg, frame, sel,
                                qtabs, dc_tabs, ac_tabs, dri)
        i += 2 + seg
    raise ValueError("no scan data found")


def _decode_scan(buf, pos, frame, sel, qtabs, dc_tabs, ac_tabs, dri):
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        if hmax % c["h"] or vmax % c["v"]:
            raise NotImplementedError("non-integer sampling ratio")
        c["plane"] = np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8))
        c["dct"], c["act"] = sel[c["id"]]
        c["q"] = qtabs[c["tq"]]
    rdr = _BitReader(buf, pos)
    preds = {c["id"]: 0 for c in comps}
    nrst = 0
    mcu_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu_i and mcu_i % dri == 0:
                rdr.restart(nrst)
                nrst = (nrst + 1) & 7
                preds = {c["id"]: 0 for c in comps}
            for c in comps:
                dct = dc_tabs[c["dct"]]
                act = ac_tabs[c["act"]]
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        coefs = np.zeros(64, dtype=np.int64)
                        s = rdr.huff(dct)
                        preds[c["id"]] += _extend(rdr.read(s), s)
                        coefs[0] = preds[c["id"]]
                        k = 1
                        while k < 64:
                            rs = rdr.huff(act)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r != 15:
                                    break  # EOB
                                k += 16
                                continue
                            k += r
                            if k > 63:
                                raise ValueError("AC index overrun")
                            coefs[ZIGZAG[k]] = _extend(rdr.read(s), s)
                            k += 1
                        block = _idct2((coefs * c["q"]).astype(float)
                                       .reshape(8, 8)) + 128.0
                        by = (my * c["v"] + v) * 8
                        bx = (mx * c["h"] + hh) * 8
                        c["plane"][by:by + 8, bx:bx + 8] = block
            mcu_i += 1
    planes = []
    for c in comps:
        p = np.repeat(np.repeat(c["plane"], vmax // c["v"], axis=0),
                      hmax // c["h"], axis=1)[:h, :w]
        planes.append(p)
    if len(planes) == 1:
        out = np.clip(np.round(planes[0]), 0, 255)
        return int(w), int(h), int(out.sum(dtype=np.int64))
    if len(planes) != 3:
        raise NotImplementedError(f"{len(planes)}-component JPEG not supported")
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    total = 0
    for ch in (r, g, b):
        total += int(np.clip(np.round(ch), 0, 255).sum(dtype=np.int64))
    return int(w), int(h), total


# ---------------------------------------------------------------- encoder

def _dc_value(bx: int, by: int, seed: int) -> int:
    """The fixture's per-block luma constant — mirrored in the SQL oracle."""
    return (seed + 17 * bx + 29 * by) % 256


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, v: int, n: int):
        self.cur = (self.cur << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.cur >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.cur &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _dht_segment(tc, th, bits, vals):
    body = bytes([tc << 4 | th]) + bytes(bits) + bytes(vals)
    return b"\xFF\xC4" + struct.pack(">H", len(body) + 2) + body


def encode_dc_jpeg(width: int, height: int, seed: int = 0) -> bytes:
    """DC-only baseline 4:2:0 JPEG fixture. Luma 8x8 block (bx, by) is
    the constant (seed + 17*bx + 29*by) % 256 (quantizer DC step 8 ->
    quantized DC = v - 128 exactly, so decode reproduces v exactly);
    chroma is constant 128 (zero offsets through YCbCr->RGB). Decoded
    pixel_sum = 3 * sum over blocks of min(8, w-8bx)*min(8, h-8by)*v."""
    qy = np.full(64, 16, dtype=np.int64)
    qy[0] = 8
    dqt_body = b"\x00" + bytes(int(qy[z]) for z in ZIGZAG) \
        + b"\x01" + bytes(int(qy[z]) for z in ZIGZAG)
    out = bytearray(b"\xFF\xD8")
    out += b"\xFF\xDB" + struct.pack(">H", len(dqt_body) + 2) + dqt_body
    sof = struct.pack(">BHHB", 8, height, width, 3) \
        + bytes([1, 0x22, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    out += b"\xFF\xC0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, *K3_DC_LUMA)
    out += _dht_segment(1, 0, *K3_AC_LUMA)
    out += _dht_segment(0, 1, *K3_DC_CHROMA)
    out += _dht_segment(1, 1, *K3_AC_CHROMA)
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += b"\xFF\xDA" + struct.pack(">H", len(sos) + 2) + sos

    dc_y = _encode_table(*K3_DC_LUMA)
    ac_y = _encode_table(*K3_AC_LUMA)
    dc_c = _encode_table(*K3_DC_CHROMA)
    ac_c = _encode_table(*K3_AC_CHROMA)
    wtr = _BitWriter()

    def put_dc(diff, tab):
        s = int(diff).bit_length() if diff >= 0 else int(-diff).bit_length()
        ln, code = tab[s]
        wtr.write(code, ln)
        if s:
            wtr.write(diff if diff >= 0 else diff + (1 << s) - 1, s)

    mcux = -(-width // 16)
    mcuy = -(-height // 16)
    pred_y = 0
    for my in range(mcuy):
        for mx in range(mcux):
            for v in range(2):
                for hh in range(2):
                    val = _dc_value(2 * mx + hh, 2 * my + v, seed) - 128
                    put_dc(val - pred_y, dc_y)
                    pred_y = val
                    ln, code = ac_y[0x00]  # EOB
                    wtr.write(code, ln)
            for _ in range(2):  # Cb then Cr: constant 128 -> DC diff 0
                put_dc(0, dc_c)
                ln, code = ac_c[0x00]
                wtr.write(code, ln)
    wtr.flush()
    out += wtr.out
    out += b"\xFF\xD9"
    return bytes(out)


def dc_fixture_pixel_sum(width: int, height: int, seed: int) -> int:
    """Closed form the SQL oracle mirrors (pure integers, no decode)."""
    total = 0
    for bx in range(-(-width // 8)):
        for by in range(-(-height // 8)):
            total += (min(8, width - 8 * bx) * min(8, height - 8 * by)
                      * _dc_value(bx, by, seed))
    return 3 * total
