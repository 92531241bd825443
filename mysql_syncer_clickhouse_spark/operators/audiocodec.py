"""Compressed-audio sample codecs in pure Python/numpy -- no codec
library: G.711 mu-law and A-law (the 8-bit companded telephony
formats) and IMA ADPCM (DVI4, the 4-bit predictive format), each as
an encode/decode pair. With these, `decode_audio_samples` covers the
compressed WAV format tags (7, 6, 0x11) alongside 16-bit PCM -- the
"compressed-audio samples need a codec" gap closes for every format a
WAV container commonly carries. (MP3's synthesis filterbank remains
the one genuinely-out-of-scope audio path.)

All three are table/loop codecs: mu/A-law decode is one numpy take()
over a precomputed 256-entry table (encode is per-sample segment
arithmetic, fixture-side only); ADPCM decode is an inherently
sequential per-block loop (each sample depends on the previous
predictor state), bounded by block size -- the per-item contract of
every multimodal decoder here.
"""

from __future__ import annotations

_BIAS = 0x84
_CLIP = 32635


def mulaw_encode(x: int) -> int:
    """int16 sample -> 8-bit G.711 mu-law code."""
    sign = 0x80 if x < 0 else 0
    x = min(abs(x), _CLIP) + _BIAS
    e = x.bit_length() - 8          # segment 0..7 (x >= 0x84 => >= 8 bits)
    e = max(e, 0)
    m = (x >> (e + 3)) & 0x0F
    return ~(sign | (e << 4) | m) & 0xFF


def mulaw_decode(c: int) -> int:
    c = ~c & 0xFF
    sign = c & 0x80
    e = (c >> 4) & 0x07
    m = c & 0x0F
    x = (((m << 3) + _BIAS) << e) - _BIAS
    return -x if sign else x


def alaw_encode(x: int) -> int:
    """int16 sample -> 8-bit G.711 A-law code."""
    sign = 0x80 if x >= 0 else 0
    x = min(abs(x), 32767)
    if x < 256:
        code = x >> 4
    else:
        e = x.bit_length() - 8      # segment e covers [2^(e+7), 2^(e+8))
        code = (e << 4) | ((x >> (e + 3)) & 0x0F)
    return (sign | code) ^ 0x55


def alaw_decode(c: int) -> int:
    c ^= 0x55
    sign = c & 0x80
    e = (c >> 4) & 0x07
    m = c & 0x0F
    x = (m << 4) + 8 if e == 0 else ((m << 4) + 0x108) << (e - 1)
    return x if sign else -x


def mulaw_table():
    """256-entry decode table (numpy take() per clip)."""
    return [mulaw_decode(c) for c in range(256)]


def alaw_table():
    return [alaw_decode(c) for c in range(256)]


IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8]
IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767]


def _ima_step_nibble(diff: int, step: int) -> tuple[int, int]:
    """(nibble magnitude bits, reconstructed diff) for one sample."""
    n = 0
    d = step >> 3
    if diff >= step:
        n |= 4
        diff -= step
        d += step
    if diff >= step >> 1:
        n |= 2
        diff -= step >> 1
        d += step >> 1
    if diff >= step >> 2:
        n |= 1
        d += step >> 2
    return n, d


def ima_adpcm_encode(samples, block_samples: int = 505) -> bytes:
    """Mono int16 samples -> IMA ADPCM blocks (4-byte header: initial
    predictor + step index, then 4-bit nibbles LSB-first). 505 samples
    per standard 256-byte block (1 header sample + 504 nibbles)."""
    out = bytearray()
    idx = 0
    pos = 0
    samples = list(samples)
    while pos < len(samples):
        block = samples[pos:pos + block_samples]
        pos += block_samples
        pred = int(block[0])
        out += pred.to_bytes(2, "little", signed=True)
        out += bytes([idx, 0])
        nibbles = []
        for s in block[1:]:
            step = IMA_STEPS[idx]
            diff = int(s) - pred
            sign = 8 if diff < 0 else 0
            n, d = _ima_step_nibble(abs(diff), step)
            pred = pred - d if sign else pred + d
            pred = max(-32768, min(32767, pred))
            n |= sign
            idx = max(0, min(88, idx + IMA_INDEX[n]))
            nibbles.append(n)
        if len(nibbles) % 2:
            nibbles.append(0)
        for i in range(0, len(nibbles), 2):
            out.append(nibbles[i] | (nibbles[i + 1] << 4))
    return bytes(out)


def ima_adpcm_decode(data: bytes, block_samples: int = 505,
                     total_samples: int | None = None):
    """IMA ADPCM blocks -> list[int] int16 samples (mono). A final
    partial block pads its nibble stream to a whole byte, so the true
    sample count is NOT recoverable from the bytes alone -- pass
    `total_samples` (the WAV `fact` chunk value, which
    make_wav_adpcm writes) to trim the decode exactly; without it the
    final block may carry one trailing pad sample."""
    block_bytes = 4 + (block_samples - 1 + 1) // 2
    out = []
    pos = 0
    while pos + 4 <= len(data):
        pred = int.from_bytes(data[pos:pos + 2], "little", signed=True)
        idx = max(0, min(88, data[pos + 2]))
        out.append(pred)
        body = data[pos + 4:pos + block_bytes]
        pos += block_bytes
        for b in body:
            for n in (b & 0x0F, b >> 4):
                step = IMA_STEPS[idx]
                d = step >> 3
                if n & 4:
                    d += step
                if n & 2:
                    d += step >> 1
                if n & 1:
                    d += step >> 2
                pred = pred - d if n & 8 else pred + d
                pred = max(-32768, min(32767, pred))
                idx = max(0, min(88, idx + IMA_INDEX[n]))
                out.append(pred)
    if total_samples is not None:
        out = out[:total_samples]
    return out
