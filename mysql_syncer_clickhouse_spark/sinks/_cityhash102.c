/* CityHash v1.0.2, 128-bit -- compiled twin of cityhash102.py.
 *
 * Same public algorithm (Google cityhash-1.0.2, MIT; the exact version
 * ClickHouse vendors as CityHash_v1_0_2 and frames every compressed
 * native-protocol block with).  This file exists because the
 * spec-faithful pure-Python implementation tops out at ~3.6 MB/s/core,
 * which would cap the native sink's compressed write path; compiled it
 * runs at memory-bandwidth-ish GB/s.  cityhash102.py loads this via
 * ctypes when a C compiler is available and CROSS-VALIDATES it against
 * the pure-Python reference at load time (and exhaustively in
 * tests/test_clickhouse_native_sink.py); on any mismatch or compile
 * failure it silently falls back to pure Python, so correctness never
 * depends on this file.
 *
 * Little-endian host assumed (x86_64 / aarch64) -- the loader verifies
 * via the cross-validation probe, which would fail on a BE host and
 * trigger the fallback.
 */
#include <stdint.h>
#include <stddef.h>
#include <string.h>

static inline uint64_t fetch64(const uint8_t *p) {
    uint64_t v; memcpy(&v, p, 8); return v;
}
static inline uint32_t fetch32(const uint8_t *p) {
    uint32_t v; memcpy(&v, p, 4); return v;
}
/* rot(v, 0) must be identity; shifts by 64 are UB in C */
static inline uint64_t rot(uint64_t v, int s) {
    return s == 0 ? v : (v >> s) | (v << (64 - s));
}
/* callers guarantee 1 <= s <= 63 */
static inline uint64_t rot1(uint64_t v, int s) {
    return (v >> s) | (v << (64 - s));
}
static inline uint64_t shift_mix(uint64_t v) { return v ^ (v >> 47); }

static const uint64_t K0 = 0xC3A5C85C97CB3127ULL;
static const uint64_t K1 = 0xB492B66FBE98F273ULL;
static const uint64_t K2 = 0x9AE16A3B2F90404FULL;
static const uint64_t K3 = 0xC949D7C7509E6557ULL;
static const uint64_t KMUL = 0x9DDFEA08EB382D69ULL;

static uint64_t hashlen16(uint64_t lo, uint64_t hi) {
    uint64_t a = (lo ^ hi) * KMUL;
    a ^= a >> 47;
    uint64_t b = (hi ^ a) * KMUL;
    b ^= b >> 47;
    return b * KMUL;
}

static uint64_t hashlen0to16(const uint8_t *s, size_t len) {
    if (len > 8) {
        uint64_t a = fetch64(s), b = fetch64(s + len - 8);
        return hashlen16(a, rot1(b + len, (int)len)) ^ b;
    }
    if (len >= 4) {
        uint64_t a = fetch32(s);
        return hashlen16(len + (a << 3), fetch32(s + len - 4));
    }
    if (len > 0) {
        uint8_t a = s[0], b = s[len >> 1], c = s[len - 1];
        uint32_t y = (uint32_t)a + ((uint32_t)b << 8);
        uint32_t z = (uint32_t)len + ((uint32_t)c << 2);
        return shift_mix((uint64_t)y * K2 ^ (uint64_t)z * K3) * K2;
    }
    return K2;
}

static void weak32_seeds(uint64_t w, uint64_t x, uint64_t y, uint64_t z,
                         uint64_t a, uint64_t b, uint64_t *out) {
    a += w;
    b = rot(b + a + z, 21);
    uint64_t c = a;
    a += x;
    a += y;
    b += rot(a, 44);
    out[0] = a + z;
    out[1] = b + c;
}

static void weak32(const uint8_t *s, uint64_t a, uint64_t b, uint64_t *out) {
    weak32_seeds(fetch64(s), fetch64(s + 8), fetch64(s + 16),
                 fetch64(s + 24), a, b, out);
}

static void city_murmur(const uint8_t *s, size_t len,
                        uint64_t seed_lo, uint64_t seed_hi, uint64_t *out) {
    uint64_t a = seed_lo, b = seed_hi, c, d;
    long ell = (long)len - 16;
    if (ell <= 0) {
        a = shift_mix(a * K1) * K1;
        c = b * K1 + hashlen0to16(s, len);
        d = shift_mix(a + (len >= 8 ? fetch64(s) : c));
    } else {
        c = hashlen16(fetch64(s + len - 8) + K1, a);
        d = hashlen16(b + len, c + fetch64(s + len - 16));
        a += d;
        do {
            a ^= shift_mix(fetch64(s) * K1) * K1;
            a *= K1;
            b ^= a;
            c ^= shift_mix(fetch64(s + 8) * K1) * K1;
            c *= K1;
            d ^= c;
            s += 16;
            ell -= 16;
        } while (ell > 0);
    }
    a = hashlen16(a, c);
    b = hashlen16(d, b);
    out[0] = a ^ b;
    out[1] = hashlen16(b, a);
}

static void city128_with_seed(const uint8_t *s, size_t len,
                              uint64_t seed_lo, uint64_t seed_hi,
                              uint64_t *out) {
    if (len < 128) {
        city_murmur(s, len, seed_lo, seed_hi, out);
        return;
    }
    uint64_t x = seed_lo, y = seed_hi, z = len * K1;
    uint64_t v0 = rot(y ^ K1, 49) * K1 + fetch64(s);
    uint64_t v1 = rot(v0, 42) * K1 + fetch64(s + 8);
    uint64_t w0 = rot(y + z, 35) * K1 + x;
    uint64_t w1 = rot(x + fetch64(s + 88), 53) * K1;
    uint64_t t[2];
    const uint8_t *p = s;
    do {
        for (int j = 0; j < 2; j++) {
            x = rot(x + y + v0 + fetch64(p + 16), 37) * K1;
            y = rot(y + v1 + fetch64(p + 48), 42) * K1;
            x ^= w1;
            y ^= v0;
            z = rot(z ^ w0, 33);
            weak32(p, v1 * K1, x + w0, t);
            v0 = t[0]; v1 = t[1];
            weak32(p + 32, z + w1, y, t);
            w0 = t[0]; w1 = t[1];
            uint64_t tmp = z; z = x; x = tmp;
            p += 64;
        }
        len -= 128;
    } while (len >= 128);
    /* 0 <= len < 128: up to 4 chunks of 32 bytes taken from the END */
    y += rot(w0, 37) * K0 + z;
    x += rot(v0 + z, 49) * K0;
    size_t tail_done = 0;
    while (tail_done < len) {
        tail_done += 32;
        y = rot(y - x, 42) * K0 + v1;
        w0 += fetch64(p + len - tail_done + 16);
        x = rot(x, 49) * K0 + w0;
        w0 += v0;
        weak32(p + len - tail_done, v0, v1, t);
        v0 = t[0]; v1 = t[1];
    }
    x = hashlen16(x, v0);
    y = hashlen16(y, w0);
    out[0] = hashlen16(x + v1, w1) + y;
    out[1] = hashlen16(x + w1, y + v1);
}

/* ---- CityHash64 (same 1.0.2 source) -- what ClickHouse's SQL
 * cityHash64() computes for a single String argument, which is what
 * the sync-verify checksum pushes down to the server.  The k3-based
 * HashLen17to32 and the xor-seeded long loop are the 1.0.x variants
 * (CityHash 1.1 removed k3 and reworked both); correctness against a
 * real server is the gated interop test, and the checker's default
 * mode hashes both sides in Spark so this path is only exercised when
 * the user asks for server-side pushdown. */

static uint64_t hashlen17to32(const uint8_t *s, size_t len) {
    uint64_t a = fetch64(s) * K1;
    uint64_t b = fetch64(s + 8);
    uint64_t c = fetch64(s + len - 8) * K2;
    uint64_t d = fetch64(s + len - 16) * K0;
    return hashlen16(rot(a - b, 43) + rot(c, 30) + d,
                     a + rot(b ^ K3, 20) - c + len);
}

static uint64_t hashlen33to64(const uint8_t *s, size_t len) {
    uint64_t z = fetch64(s + 24);
    uint64_t a = fetch64(s) + (len + fetch64(s + len - 16)) * K0;
    uint64_t b = rot(a + z, 52);
    uint64_t c = rot(a, 37);
    a += fetch64(s + 8);
    c += rot(a, 7);
    a += fetch64(s + 16);
    uint64_t vf = a + z;
    uint64_t vs = b + rot(a, 31) + c;
    a = fetch64(s + 16) + fetch64(s + len - 32);
    z = fetch64(s + len - 8);
    b = rot(a + z, 52);
    c = rot(a, 37);
    a += fetch64(s + len - 24);
    c += rot(a, 7);
    a += fetch64(s + len - 16);
    uint64_t wf = a + z;
    uint64_t ws = b + rot(a, 31) + c;
    uint64_t r = shift_mix((vf + ws) * K2 + (wf + vs) * K0);
    return shift_mix(r * K0 + vs) * K2;
}

uint64_t msc_cityhash102_64(const uint8_t *s, size_t len) {
    if (len <= 32) {
        if (len <= 16) return hashlen0to16(s, len);
        return hashlen17to32(s, len);
    }
    if (len <= 64) return hashlen33to64(s, len);
    uint64_t x = fetch64(s);
    uint64_t y = fetch64(s + len - 16) ^ K1;
    uint64_t z = fetch64(s + len - 56) ^ K0;
    uint64_t v[2], w[2];
    weak32(s + len - 64, (uint64_t)len, y, v);
    weak32(s + len - 32, (uint64_t)len * K1, K0, w);
    z += shift_mix(v[1]) * K1;
    x = rot(z + x, 39) * K1;
    y = rot(y, 33) * K1;
    len = (len - 1) & ~(size_t)63;
    uint64_t t[2];
    do {
        x = rot(x + y + v[0] + fetch64(s + 16), 37) * K1;
        y = rot(y + v[1] + fetch64(s + 48), 42) * K1;
        x ^= w[1];
        y ^= v[0];
        z = rot(z ^ w[0], 33);
        weak32(s, v[1] * K1, x + w[0], t);
        v[0] = t[0]; v[1] = t[1];
        weak32(s + 32, z + w[1], y, t);
        w[0] = t[0]; w[1] = t[1];
        uint64_t tmp = z; z = x; x = tmp;
        s += 64;
        len -= 64;
    } while (len != 0);
    return hashlen16(hashlen16(v[0], w[0]) + shift_mix(y) * K1 + z,
                     hashlen16(v[1], w[1]) + x);
}

/* Batch API for the Arrow path: hash n strings packed into one buffer
 * with n+1 offsets -- one ctypes call per pandas batch instead of one
 * per row. */
void msc_cityhash102_64_batch(const uint8_t *buf, const int64_t *offsets,
                              int64_t n, uint64_t *out) {
    for (int64_t i = 0; i < n; i++)
        out[i] = msc_cityhash102_64(buf + offsets[i],
                                    (size_t)(offsets[i + 1] - offsets[i]));
}

/* out[0] = low u64, out[1] = high u64 -- CityHash128(s, len) */
void msc_cityhash102_128(const uint8_t *s, size_t len, uint64_t *out) {
    if (len >= 16) {
        city128_with_seed(s + 16, len - 16, fetch64(s) ^ K3,
                          fetch64(s + 8), out);
        return;
    }
    if (len >= 8) {
        city128_with_seed(NULL, 0, fetch64(s) ^ (len * K0),
                          fetch64(s + len - 8) ^ K1, out);
        return;
    }
    city128_with_seed(s, len, K0, K1, out);
}

void msc_cityhash102_128_seed(const uint8_t *s, size_t len,
                              uint64_t seed_lo, uint64_t seed_hi,
                              uint64_t *out) {
    city128_with_seed(s, len, seed_lo, seed_hi, out);
}
