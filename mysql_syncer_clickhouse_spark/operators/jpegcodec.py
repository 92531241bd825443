"""Baseline JPEG (ITU T.81 sequential DCT, Huffman) encoder + decoder
in pure Python/numpy -- no codec library. The LAST common image format
whose pixels were environment-limited: with this module every format
the reference's multimodal corpus carries (BMP/NetPBM raw, GIF LZW,
PNG deflate, JPEG DCT) decodes for real in this repo.

Scope (the honest contract):
- encoder: 8-bit, 3-component YCbCr 4:4:4, Annex K quantization
  tables scaled by a quality factor, Annex K standard Huffman tables,
  byte stuffing -- a valid interchange-format baseline JPEG any
  decoder can read;
- decoder: baseline sequential (SOF0), 8-bit, 1 or 3 components,
  sampling factors 1 or 2 (2x2/2x1/1x1 -- covers 4:4:4, 4:2:2,
  4:2:0), restart markers, multi-DHT/DQT segments; progressive
  (SOF2), arithmetic coding, and 12-bit return None and the caller
  degrades to the header-only metadata path.

JPEG is lossy BY DESIGN (quantization), so unlike GIF/PNG the decode
is checked against tolerance bounds (mean abs error vs the encoder's
input) and pHash stability, not bit equality -- and the driver's
exact-sum oracle keeps to the lossless formats.

Everything hot is numpy: the 2-D DCT/IDCT are two 8x8 matmuls per
block against a precomputed orthonormal DCT matrix, dequantization is
vectorized, and Huffman decoding walks a flat (code -> symbol) table
per bit-length (canonical Huffman, so first-code arithmetic gives
O(1) per length). Per-image work, Arrow-batched by the multimodal
operators that call it.
"""

from __future__ import annotations

import struct

# ITU T.81 Annex K.1 -- luminance/chrominance quantization tables
K_LUMA_Q = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
K_CHROMA_Q = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.3 standard Huffman specs: (bits[1..16], huffval)
K_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
             list(range(12)))
K_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
               list(range(12)))
K_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31,
     0x41, 0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32,
     0x81, 0x91, 0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52,
     0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
     0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28, 0x29, 0x2A,
     0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
     0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57,
     0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
     0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x83,
     0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93, 0x94,
     0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8,
     0xD9, 0xDA, 0xE1, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8,
     0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA])
K_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06,
     0x12, 0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81,
     0x08, 0x14, 0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33,
     0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
     0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
     0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56,
     0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
     0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A,
     0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92,
     0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
     0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6,
     0xD7, 0xD8, 0xD9, 0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7,
     0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA])


def _dct_mat():
    import numpy as np
    n = 8
    a = np.zeros((n, n))
    for k in range(n):
        for i in range(n):
            a[k, i] = ((1 / n) ** 0.5 if k == 0 else (2 / n) ** 0.5) \
                * __import__("math").cos((2 * i + 1) * k
                                         * __import__("math").pi / (2 * n))
    return a


def _scaled_q(base, quality: int):
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return [max(1, min(255, (v * s + 50) // 100)) for v in base]


def _huff_encode_table(bits, vals):
    """symbol -> (code, length) per the canonical construction."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_table(bits, vals):
    """per-length (first_code, first_index) + vals: canonical Huffman
    decode in O(1) per length step."""
    first_code = [0] * 17
    first_idx = [0] * 17
    code = 0
    k = 0
    for ln in range(1, 17):
        first_code[ln] = code
        first_idx[ln] = k
        code += bits[ln - 1]
        k += bits[ln - 1]
        code <<= 1
    counts = list(bits)
    return first_code, first_idx, counts, list(vals)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)      # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # 1-fill per spec


def _category(v: int) -> int:
    return 0 if v == 0 else abs(v).bit_length()


def _mag_bits(v: int, cat: int) -> int:
    return v if v >= 0 else v + (1 << cat) - 1


def encode_baseline_jpeg(rgb, quality: int = 90,
                         subsample: bool = False,
                         restart_interval: int = 0) -> bytes:
    """rgb: ndarray[h, w, 3] uint8 -> baseline JFIF bytes.
    subsample=True emits 4:2:0 (Y at 2x2 sampling, chroma averaged
    over 2x2 pixel blocks); restart_interval=N writes a DRI segment
    and RSTn markers every N MCUs with predictor resets -- both exist
    to exercise the decoder's full MCU/restart machinery."""
    import numpy as np

    h, w = rgb.shape[:2]
    x = rgb.astype(np.float64)
    y = 0.299 * x[:, :, 0] + 0.587 * x[:, :, 1] + 0.114 * x[:, :, 2]
    cb = -0.168736 * x[:, :, 0] - 0.331264 * x[:, :, 1] \
        + 0.5 * x[:, :, 2] + 128.0
    cr = 0.5 * x[:, :, 0] - 0.418688 * x[:, :, 1] \
        - 0.081312 * x[:, :, 2] + 128.0
    qy = np.array(_scaled_q(K_LUMA_Q, quality), dtype=np.float64) \
        .reshape(8, 8)
    qc = np.array(_scaled_q(K_CHROMA_Q, quality), dtype=np.float64) \
        .reshape(8, 8)
    A = _dct_mat()

    def pad_to(p, ph, pw):
        pad = np.empty((ph, pw))
        hh, ww = p.shape
        pad[:hh, :ww] = p
        pad[hh:, :ww] = p[hh - 1:hh, :]
        pad[:, ww:] = pad[:, ww - 1:ww]
        return pad - 128.0

    if subsample:
        eh, ew = -(-h // 2) * 2, -(-w // 2) * 2
        cbp = pad_to(cb, eh, ew) + 128.0
        crp = pad_to(cr, eh, ew) + 128.0
        cb2 = cbp.reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3))
        cr2 = crp.reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3))
        comps = [(y, 2, 2, qy, 0), (cb2, 1, 1, qc, 1),
                 (cr2, 1, 1, qc, 1)]
    else:
        comps = [(y, 1, 1, qy, 0), (cb, 1, 1, qc, 1),
                 (cr, 1, 1, qc, 1)]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = [(pad_to(p, mcuy * cv * 8, mcux * ch * 8), ch, cv, q, t)
              for p, ch, cv, q, t in comps]

    dc_t = (_huff_encode_table(*K_DC_LUMA),
            _huff_encode_table(*K_DC_CHROMA))
    ac_t = (_huff_encode_table(*K_AC_LUMA),
            _huff_encode_table(*K_AC_CHROMA))
    bw = _BitWriter()
    pred = [0, 0, 0]

    def put_block(plane, by, bx, q, t, ci):
        blk = plane[by:by + 8, bx:bx + 8]
        coef = A @ blk @ A.T
        quant = np.rint(coef / q).astype(np.int64)
        zz = quant.reshape(64)[ZIGZAG]
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        cat = _category(diff)
        code, ln = dc_t[t][cat]
        bw.put(code, ln)
        if cat:
            bw.put(_mag_bits(diff, cat), cat)
        run = 0
        last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
        for i in range(1, 64):
            v = int(zz[i])
            if i > last_nz:
                code, ln = ac_t[t][0x00]             # EOB
                bw.put(code, ln)
                break
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_t[t][0xF0]             # ZRL
                bw.put(code, ln)
                run -= 16
            cat = _category(v)
            code, ln = ac_t[t][(run << 4) | cat]
            bw.put(code, ln)
            bw.put(_mag_bits(v, cat), cat)
            run = 0

    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu \
                    and n_mcu % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + ((n_mcu
                                 // restart_interval - 1) % 8)])
                pred[:] = [0, 0, 0]
            n_mcu += 1
            for ci, (plane, ch, cv, q, t) in enumerate(planes):
                for vy in range(cv):
                    for vx in range(ch):
                        put_block(plane, (my * cv + vy) * 8,
                                  (mx * ch + vx) * 8, q, t, ci)
    bw.flush()

    def seg(marker, body):
        return marker + struct.pack(">H", len(body) + 2) + body

    def dqt(tid, q):
        zz = q.reshape(64)[ZIGZAG].astype(np.int64)
        return seg(b"\xff\xdb", bytes([tid]) + bytes(int(v) for v in zz))

    def dht(cls, tid, bits, vals):
        return seg(b"\xff\xc4", bytes([(cls << 4) | tid])
                   + bytes(bits) + bytes(vals))

    hv_y = (comps[0][1] << 4) | comps[0][2]
    sof = seg(b"\xff\xc0", struct.pack(">BHHB", 8, h, w, 3)
              + bytes([1, hv_y, 0]) + bytes([2, 0x11, 1])
              + bytes([3, 0x11, 1]))
    sos = seg(b"\xff\xda", bytes([3, 1, 0x00, 2, 0x11, 3, 0x11,
                                  0, 63, 0]))
    dri = seg(b"\xff\xdd", struct.pack(">H", restart_interval)) \
        if restart_interval else b""
    return (b"\xff\xd8" + dqt(0, qy) + dqt(1, qc)
            + dht(0, 0, *K_DC_LUMA) + dht(1, 0, *K_AC_LUMA)
            + dht(0, 1, *K_DC_CHROMA) + dht(1, 1, *K_AC_CHROMA)
            + dri + sof + sos + bytes(bw.out) + b"\xff\xd9")


class _BitReader:
    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0
        self.acc = 0
        self.n = 0
        self.fake = 0      # pad bits appended after real data ran out

    def _fill(self):
        while self.n <= 24:
            if self.pos >= len(self.d):
                self.acc = (self.acc << 8) | 0xFF   # pad past end
                self.n += 8
                self.fake += 8
                continue
            b = self.d[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.d[self.pos] if self.pos < len(self.d) else 0
                if nxt == 0x00:
                    self.pos += 1               # stuffed byte
                else:
                    # a marker: the scan was pre-split on restarts, so
                    # anything else means end-of-segment -- pad (pos
                    # stays on the marker, so every later fill pads
                    # too: pad bits are always the stream's tail)
                    self.pos -= 1
                    self.acc = (self.acc << 8) | 0xFF
                    self.n += 8
                    self.fake += 8
                    continue
            self.acc = (self.acc << 8) | b
            self.n += 8

    def overrun(self) -> bool:
        """True when decode CONSUMED pad bits, i.e. real data ran out
        mid-scan (pads are terminal, so consumed-fake <=> fake > the
        unconsumed remainder). A valid stream's final-MCU peek may
        PREFETCH pads without consuming them -- that stays False."""
        return self.fake > self.n

    def peek16(self) -> int:
        self._fill()
        return (self.acc >> (self.n - 16)) & 0xFFFF

    def skip(self, k: int):
        self.n -= k
        self.acc &= (1 << self.n) - 1

    def get(self, k: int) -> int:
        if k == 0:
            return 0
        self._fill()
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.skip(k)
        return v


def _huff_read(br: _BitReader, table) -> int:
    first_code, first_idx, counts, vals = table
    code = 0
    v16 = br.peek16()
    for ln in range(1, 17):
        code = v16 >> (16 - ln)
        # BOTH bounds: without the lower one a corrupt/truncated code
        # below first_code[ln] would index vals[] with a negative
        # offset and decode garbage instead of raising
        if counts[ln - 1] and 0 <= code - first_code[ln] < counts[ln - 1]:
            br.skip(ln)
            return vals[first_idx[ln] + code - first_code[ln]]
    raise ValueError("bad Huffman code")


def _extend(v: int, cat: int) -> int:
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def decode_baseline_jpeg(payload: bytes):
    """baseline JPEG bytes -> (w, h, ndarray[h, w, 3] uint8) or None
    (non-baseline / unsupported layout / corrupt)."""
    import numpy as np

    try:
        if payload[:2] != b"\xff\xd8":
            return None
        pos = 2
        qt = {}
        huff = {}
        comps = None
        w = h = 0
        ri = 0
        scan_comps = None
        scan_start = None
        while pos + 4 <= len(payload):
            if payload[pos] != 0xFF:
                return None
            # spec-legal 0xFF fill bytes may precede any marker
            while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
                pos += 1
            m = payload[pos + 1]
            if m == 0xD9:
                break
            if m == 0x01 or 0xD0 <= m <= 0xD7:   # standalone markers
                pos += 2
                continue
            ln = struct.unpack(">H", payload[pos + 2:pos + 4])[0]
            body = payload[pos + 4:pos + 2 + ln]
            pos += 2 + ln
            if m == 0xDB:
                i = 0
                while i < len(body):
                    pq, tq = body[i] >> 4, body[i] & 0x0F
                    if pq != 0:
                        return None          # 16-bit tables: skip
                    tab = np.zeros(64, dtype=np.float64)
                    for k in range(64):
                        tab[ZIGZAG[k]] = body[i + 1 + k]
                    qt[tq] = tab.reshape(8, 8)
                    i += 65
            elif m == 0xC4:
                i = 0
                while i < len(body):
                    cls, tid = body[i] >> 4, body[i] & 0x0F
                    bits = list(body[i + 1:i + 17])
                    nv = sum(bits)
                    vals = list(body[i + 17:i + 17 + nv])
                    huff[(cls, tid)] = _huff_decode_table(bits, vals)
                    i += 17 + nv
            elif m == 0xC0 or m == 0xC1:
                depth, h, w, nc = struct.unpack(">BHHB", body[:6])
                if depth != 8 or nc not in (1, 3):
                    return None
                comps = []
                for c in range(nc):
                    cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                    comps.append({"id": cid, "h": hv >> 4,
                                  "v": hv & 0x0F, "tq": tq})
                if any(c["h"] not in (1, 2) or c["v"] not in (1, 2)
                       for c in comps):
                    return None
            elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                       0xCB, 0xCD, 0xCE, 0xCF):
                return None                  # non-baseline SOF
            elif m == 0xDD:
                ri = struct.unpack(">H", body[:2])[0]
            elif m == 0xDA:
                ns = body[0]
                scan_comps = []
                for c in range(ns):
                    cid, tt = body[1 + 2 * c], body[2 + 2 * c]
                    scan_comps.append((cid, tt >> 4, tt & 0x0F))
                scan_start = pos
                break
        if comps is None or scan_start is None:
            return None

        hmax = max(c["h"] for c in comps)
        vmax = max(c["v"] for c in comps)
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        A = _dct_mat()
        planes = []
        for c in comps:
            planes.append(np.zeros((mcuy * c["v"] * 8,
                                    mcux * c["h"] * 8)))
        order = {cid: i for i, (cid, _, _) in enumerate(scan_comps)}
        # pre-split the entropy stream on restart markers: each
        # segment decodes with a fresh bit reader and reset DC
        # predictors -- no mid-stream marker handling (stuffed 0xFF is
        # always followed by 0x00, so a 0xFF D0..D7 pair IS a marker)
        data = payload[scan_start:]
        segs = []
        cur = i2 = 0
        while i2 + 1 < len(data):
            if data[i2] == 0xFF and 0xD0 <= data[i2 + 1] <= 0xD7:
                segs.append(data[cur:i2])
                cur = i2 = i2 + 2
            elif data[i2] == 0xFF and data[i2 + 1] == 0xD9:
                break
            else:
                i2 += 1
        segs.append(data[cur:])
        seg_idx = 0
        br = _BitReader(segs[0])
        pred = [0] * len(comps)
        n_mcu = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if ri and n_mcu and n_mcu % ri == 0:
                    seg_idx += 1
                    if seg_idx >= len(segs):
                        return None
                    br = _BitReader(segs[seg_idx])
                    pred = [0] * len(comps)
                n_mcu += 1
                if True:
                    for ci, c in enumerate(comps):
                        _, td, ta = scan_comps[order[c["id"]]]
                        for vy in range(c["v"]):
                            for vx in range(c["h"]):
                                zz = np.zeros(64, dtype=np.float64)
                                s = _huff_read(br, huff[(0, td)])
                                diff = _extend(br.get(s), s) if s else 0
                                pred[ci] += diff
                                zz[0] = pred[ci]
                                k = 1
                                while k < 64:
                                    rs = _huff_read(br, huff[(1, ta)])
                                    r, ssz = rs >> 4, rs & 0x0F
                                    if ssz == 0:
                                        if r == 15:
                                            k += 16
                                            continue
                                        break            # EOB
                                    k += r
                                    if k > 63:
                                        break
                                    zz[k] = _extend(br.get(ssz), ssz)
                                    k += 1
                                blk = np.zeros(64)
                                blk[ZIGZAG] = zz
                                blk = blk.reshape(8, 8) \
                                    * qt[c["tq"]]
                                pix = A.T @ blk @ A + 128.0
                                py = (my * c["v"] + vy) * 8
                                px_ = (mx * c["h"] + vx) * 8
                                planes[ci][py:py + 8,
                                           px_:px_ + 8] = pix
                if br.overrun():
                    return None      # truncated scan: data ran out
        out = []
        for ci, c in enumerate(comps):
            p = planes[ci]
            p = np.repeat(p, hmax // c["h"], axis=1)
            p = np.repeat(p, vmax // c["v"], axis=0)
            out.append(p[:h, :w])
        if len(out) == 1:
            yv = np.clip(out[0], 0, 255)
            rgb = np.repeat(yv[:, :, None], 3, axis=2)
        else:
            yv, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
            r = yv + 1.402 * cr
            g = yv - 0.344136 * cb - 0.714136 * cr
            b = yv + 1.772 * cb
            rgb = np.clip(np.stack([r, g, b], axis=2), 0, 255)
        return w, h, np.rint(rgb).astype(np.uint8)
    except (IndexError, ValueError, KeyError, struct.error):
        return None
