"""FLAC (subset) encoder + decoder in pure Python -- the LOSSLESS
compressed-audio path, exact by construction (unlike the G.711/ADPCM
bounds): decode(encode(samples)) == samples bit-for-bit, so FLAC
sample statistics can be driver-checked with an exact SQL oracle the
same way the lossless image formats are.

Subset contract (documented, per the public FLAC format spec):
- encoder: mono, 16-bit, fixed-blocksize frames, FIXED predictors
  (order chosen 0..2 per block by residual magnitude), one Rice
  partition per subframe, correct CRC-8 (header) and CRC-16 (frame);
- decoder: mono/stereo-independent channels, 8/16-bit, subframe types
  CONSTANT, VERBATIM, and FIXED orders 0..4, any Rice partition
  order, escaped (unencoded) partitions; LPC subframes and
  inter-channel decorrelation return None (callers degrade to the
  header/metadata path).

Bit-level I/O is the whole trick; everything else is integer
arithmetic. Per-item work, Arrow-batched by the multimodal callers.
"""

from __future__ import annotations

import struct

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 \
                else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


class _BW:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, v: int, bits: int):
        self.acc = (self.acc << bits) | (v & ((1 << bits) - 1))
        self.n += bits
        while self.n >= 8:
            self.out.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def unary(self, q: int):
        while q >= 32:
            self.put(0, 32)
            q -= 32
        self.put(1, q + 1)

    def align(self):
        if self.n:
            self.put(0, 8 - self.n)


class _BR:
    def __init__(self, data: bytes, pos: int = 0):
        self.d = data
        self.byte = pos
        self.bit = 0

    def get(self, bits: int) -> int:
        v = 0
        for _ in range(bits):
            if self.byte >= len(self.d):
                raise ValueError("flac: out of data")
            v = (v << 1) | ((self.d[self.byte] >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v

    def unary(self) -> int:
        q = 0
        while self.get(1) == 0:
            q += 1
        return q

    def align(self):
        if self.bit:
            self.bit = 0
            self.byte += 1


def _rice_encode(bw: _BW, residuals, param: int):
    for r in residuals:
        # zigzag fold: non-negatives to even, negatives to odd
        z = (r << 1) if r >= 0 else ((-r) << 1) - 1
        bw.unary(z >> param)
        if param:
            bw.put(z & ((1 << param) - 1), param)


def _rice_decode(br: _BR, n: int, param: int):
    out = []
    for _ in range(n):
        q = br.unary()
        z = (q << param) | (br.get(param) if param else 0)
        out.append((z >> 1) if not z & 1 else -((z + 1) >> 1))
    return out


def _utf8_number(n: int) -> bytes:
    """FLAC's UTF-8-style frame-number coding."""
    if n < 0x80:
        return bytes([n])
    out = []
    bits = n.bit_length()
    nbytes = 2
    while bits > (7 - nbytes) + 6 * (nbytes - 1) and nbytes < 7:
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (n >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _read_utf8_number(br: _BR) -> int:
    b0 = br.get(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    n = b0 & (mask - 1)
    for _ in range(nbytes - 1):
        n = (n << 6) | (br.get(8) & 0x3F)
    return n


_BLOCKSIZE = 4096


def encode_flac(samples, sample_rate: int = 8000) -> bytes:
    """Mono int16 samples -> FLAC bytes (subset encoder)."""
    samples = [int(s) for s in samples]
    n_total = len(samples)
    streaminfo = bytearray(34)
    struct.pack_into(">HH", streaminfo, 0, _BLOCKSIZE, _BLOCKSIZE)
    # min/max framesize left 0 (unknown, allowed); bytes 10..17 pack
    # rate(20) | channels-1(3) | bits-1(5) | total-samples(36)
    streaminfo[10] = (sample_rate >> 12) & 0xFF
    streaminfo[11] = (sample_rate >> 4) & 0xFF
    streaminfo[12] = ((sample_rate & 0xF) << 4) | (0 << 1) \
        | ((16 - 1) >> 4)
    streaminfo[13] = (((16 - 1) & 0xF) << 4) | ((n_total >> 32) & 0xF)
    struct.pack_into(">I", streaminfo, 14, n_total & 0xFFFFFFFF)
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(streaminfo).to_bytes(3, "big") \
        + bytes(streaminfo)

    frame_no = 0
    pos = 0
    while pos < n_total:
        block = samples[pos:pos + _BLOCKSIZE]
        pos += _BLOCKSIZE
        n = len(block)
        # frame header (fixed-blocksize stream, frame number coded)
        hdr = _BW()
        hdr.put(0x3FFE, 14)
        hdr.put(0, 1)                    # reserved
        hdr.put(0, 1)                    # fixed blocksize
        hdr.put(0b0111, 4)               # blocksize: 16 bits at end
        hdr.put(0b0000, 4)               # rate: from STREAMINFO
        hdr.put(0, 4)                    # mono
        hdr.put(0b100, 3)                # 16 bits/sample
        hdr.put(0, 1)                    # reserved
        head = bytes(hdr.out) + _utf8_number(frame_no) \
            + struct.pack(">H", n - 1)
        head += bytes([_crc8(head)])
        bw = _BW()
        for b in head:
            bw.put(b, 8)
        # choose the FIXED order with the smallest residual magnitude
        best_order, best_res, best_cost = 0, block, None
        for order, coefs in list(_FIXED_COEFS.items())[:3]:
            if n <= order:
                continue
            res = [block[i] - sum(c * block[i - j - 1]
                                  for j, c in enumerate(coefs))
                   for i in range(order, n)]
            cost = sum(abs(r) for r in res)
            if best_cost is None or cost < best_cost:
                best_order, best_res, best_cost = order, res, cost
        order = best_order
        # subframe header: 0 + 001000|order + 0 (no wasted bits)
        bw.put(0, 1)
        bw.put(0b001000 | order, 6)
        bw.put(0, 1)
        for w in block[:order]:          # warmup, raw 16-bit
            bw.put(w & 0xFFFF, 16)
        # residual: method 0 (4-bit Rice), partition order 0
        mean = (sum(abs(r) for r in best_res) // max(len(best_res), 1)) \
            or 1
        param = min(max(mean.bit_length(), 1), 14)
        bw.put(0, 2)                     # Rice method 0
        bw.put(0, 4)                     # partition order 0
        bw.put(param, 4)
        _rice_encode(bw, best_res, param)
        bw.align()
        frame = bytes(bw.out)
        out += frame + struct.pack(">H", _crc16(frame))
        frame_no += 1
    return bytes(out)


def decode_flac(payload: bytes):
    """FLAC bytes -> (sample_rate, channels, list[int] samples) for
    the supported subset, or None. Multi-channel returns interleaved
    independent channels; LPC/decorrelated frames return None."""
    try:
        if payload[:4] != b"fLaC":
            return None
        pos = 4
        rate = None
        channels = bits = None
        n_total = 0
        while pos + 4 <= len(payload):
            hdr = payload[pos]
            ln = int.from_bytes(payload[pos + 1:pos + 4], "big")
            body = payload[pos + 4:pos + 4 + ln]
            pos += 4 + ln
            if hdr & 0x7F == 0:          # STREAMINFO
                rate = (body[10] << 12) | (body[11] << 4) \
                    | (body[12] >> 4)
                channels = ((body[12] >> 1) & 0x07) + 1
                bits = (((body[12] & 1) << 4) | (body[13] >> 4)) + 1
                n_total = ((body[13] & 0xF) << 32) \
                    | int.from_bytes(body[14:18], "big")
            if hdr & 0x80:               # last metadata block
                break
        if rate is None or bits not in (8, 16) or channels < 1:
            return None
        out = []
        while pos + 2 < len(payload) \
                and (n_total == 0 or len(out) < n_total * channels):
            frame_start = pos
            br = _BR(payload, pos)
            if br.get(14) != 0x3FFE:
                # total-samples 0 = "unknown" (streaming encoder):
                # frames simply run out at end of data
                if n_total == 0 and out:
                    break
                return None
            br.get(2)                    # reserved + blocking strategy
            bs_code = br.get(4)
            rate_code = br.get(4)        # 0/1-B: STREAMINFO or inline;
            ch_code = br.get(4)          # C-E: value at end of header
            br.get(3)                    # sample-size code
            br.get(1)
            _read_utf8_number(br)
            if bs_code == 0b0110:
                n = br.get(8) + 1
            elif bs_code == 0b0111:
                n = br.get(16) + 1
            elif 2 <= bs_code <= 5:
                n = 576 << (bs_code - 2)
            elif bs_code >= 8:
                n = 256 << (bs_code - 8)
            else:
                return None
            # end-of-header sample-rate bytes for codes 0xC-0xE (8-bit
            # kHz / 16-bit Hz / 16-bit daHz): must be CONSUMED even
            # though the decode rate comes from STREAMINFO -- skipping
            # them desyncs the bitstream for spec-valid externally
            # encoded files at uncommon rates. 0xF is invalid.
            if rate_code == 0xF:
                return None
            if rate_code == 0xC:
                br.get(8)
            elif rate_code in (0xD, 0xE):
                br.get(16)
            br.get(8)                    # header CRC
            if ch_code > 7:
                return None              # decorrelated stereo: skip
            chans = []
            for _c in range(channels):
                br.get(1)
                st = br.get(6)
                wasted = 0
                if br.get(1):
                    wasted = br.unary() + 1
                eff = bits - wasted
                if st == 0:              # CONSTANT
                    v = br.get(eff)
                    if v >= 1 << (eff - 1):
                        v -= 1 << eff
                    ch = [v] * n
                elif st == 1:            # VERBATIM
                    ch = []
                    for _ in range(n):
                        v = br.get(eff)
                        if v >= 1 << (eff - 1):
                            v -= 1 << eff
                        ch.append(v)
                elif 8 <= st <= 12:      # FIXED order 0..4
                    order = st - 8
                    warm = []
                    for _ in range(order):
                        v = br.get(eff)
                        if v >= 1 << (eff - 1):
                            v -= 1 << eff
                        warm.append(v)
                    method = br.get(2)
                    if method > 1:
                        return None
                    pbits = 4 if method == 0 else 5
                    esc = (1 << pbits) - 1
                    porder = br.get(4)
                    res = []
                    nparts = 1 << porder
                    for p in range(nparts):
                        cnt = (n >> porder) - (order if p == 0 else 0)
                        param = br.get(pbits)
                        if param == esc:
                            rb = br.get(5)
                            part = []
                            for _ in range(cnt):
                                v = br.get(rb) if rb else 0
                                if rb and v >= 1 << (rb - 1):
                                    v -= 1 << rb
                                part.append(v)
                            res += part
                        else:
                            res += _rice_decode(br, cnt, param)
                    coefs = _FIXED_COEFS[order]
                    ch = list(warm)
                    for r in res:
                        pred = sum(c * ch[len(ch) - j - 1]
                                   for j, c in enumerate(coefs))
                        ch.append(r + pred)
                else:
                    return None          # LPC: out of subset
                if wasted:
                    ch = [v << wasted for v in ch]
                chans.append(ch)
            br.align()
            # verify the frame CRC-16 (over header + subframes): a
            # corrupt or desynced frame returns the documented None
            # instead of silently wrong sample statistics
            if br.byte + 2 > len(payload) \
                    or _crc16(payload[frame_start:br.byte]) \
                    != int.from_bytes(payload[br.byte:br.byte + 2],
                                      "big"):
                return None
            pos = br.byte + 2            # frame CRC16
            if channels == 1:
                out += chans[0]
            else:
                for i in range(n):
                    for c in range(channels):
                        out.append(chans[c][i])
        return rate, channels, out
    except (IndexError, ValueError, struct.error):
        return None


def flac_streaminfo(payload: bytes):
    """(sample_rate, channels, bits, n_samples) from the STREAMINFO
    block, or None if not FLAC -- the metadata-only twin of
    decode_flac (same walk, no frame decode)."""
    try:
        if payload[:4] != b"fLaC":
            return None
        pos = 4
        while pos + 4 <= len(payload):
            hdr = payload[pos]
            ln = int.from_bytes(payload[pos + 1:pos + 4], "big")
            body = payload[pos + 4:pos + 4 + ln]
            if hdr & 0x7F == 0 and len(body) >= 18:
                rate = (body[10] << 12) | (body[11] << 4) \
                    | (body[12] >> 4)
                channels = ((body[12] >> 1) & 0x07) + 1
                bits = (((body[12] & 1) << 4) | (body[13] >> 4)) + 1
                n_total = ((body[13] & 0xF) << 32) \
                    | int.from_bytes(body[14:18], "big")
                return rate, channels, bits, n_total
            if hdr & 0x80:
                break
            pos += 4 + ln
        return None
    except (IndexError, ValueError):
        return None
