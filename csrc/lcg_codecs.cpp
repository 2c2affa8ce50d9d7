// llamacog native codecs: multithreaded block-quant decode (and Q8_0 encode).
//
// Role of the reference's native dequant hot loops (ggml-quants.c
// dequantize_row_*, multithreaded via llama-quant.cpp:468-497): the Python
// loader calls this through ctypes for large tensors; semantics are defined
// by the GGUF wire format (block layouts ggml-common.h:167-418) and verified
// bit-exact against the numpy reference decoders in tests/test_native.py.
//
// Build: make -C csrc   (produces liblcg_codecs.so)

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

float f16_to_f32(uint16_t h) {
    uint32_t sign = (uint32_t)(h >> 15) << 31;
    uint32_t exp = (h >> 10) & 0x1F;
    uint32_t man = h & 0x3FF;
    uint32_t f;
    if (exp == 0) {
        if (man == 0) {
            f = sign;
        } else {
            exp = 127 - 15 + 1;
            while (!(man & 0x400)) { man <<= 1; exp--; }
            man &= 0x3FF;
            f = sign | (exp << 23) | (man << 13);
        }
    } else if (exp == 0x1F) {
        f = sign | 0x7F800000u | (man << 13);
    } else {
        f = sign | ((exp - 15 + 127) << 23) | (man << 13);
    }
    float out;
    std::memcpy(&out, &f, 4);
    return out;
}

inline uint16_t read_u16(const uint8_t * p) {
    uint16_t v;
    std::memcpy(&v, p, 2);
    return v;
}

uint16_t f32_to_f16(float f) {  // round-to-nearest-even, IEEE half
    uint32_t x;
    std::memcpy(&x, &f, 4);
    uint32_t sign = (x >> 16) & 0x8000;
    uint32_t mant = x & 0x7FFFFF;
    int32_t exp = (int32_t)((x >> 23) & 0xFF);
    if (exp == 0xFF) return (uint16_t)(sign | 0x7C00 | (mant ? 0x200 : 0));
    exp = exp - 127 + 15;
    if (exp >= 0x1F) return (uint16_t)(sign | 0x7C00);
    if (exp <= 0) {
        if (exp < -10) return (uint16_t)sign;
        mant |= 0x800000;
        uint32_t shift = (uint32_t)(14 - exp);
        uint32_t half = 1u << (shift - 1);
        uint32_t rem = mant & ((1u << shift) - 1);
        uint32_t r = mant >> shift;
        if (rem > half || (rem == half && (r & 1))) r += 1;
        return (uint16_t)(sign | r);
    }
    uint32_t rem = mant & 0x1FFF;
    uint32_t r = (uint32_t)(sign | ((uint32_t)exp << 10) | (mant >> 13));
    if (rem > 0x1000 || (rem == 0x1000 && (r & 1))) r += 1;
    return (uint16_t)r;
}

// ---- per-block decoders (one block -> block_size floats) -------------------

void dec_f16(const uint8_t * b, float * y) {  // "block" = 32 halves
    for (int i = 0; i < 32; ++i) y[i] = f16_to_f32(read_u16(b + 2 * i));
}

void dec_bf16(const uint8_t * b, float * y) {
    for (int i = 0; i < 32; ++i) {
        uint32_t u = (uint32_t)read_u16(b + 2 * i) << 16;
        std::memcpy(&y[i], &u, 4);
    }
}

void dec_q4_0(const uint8_t * b, float * y) {
    const float d = f16_to_f32(read_u16(b));
    for (int j = 0; j < 16; ++j) {
        y[j]      = d * (float)((b[2 + j] & 0xF) - 8);
        y[j + 16] = d * (float)((b[2 + j] >> 4) - 8);
    }
}

void dec_q4_1(const uint8_t * b, float * y) {
    const float d = f16_to_f32(read_u16(b));
    const float m = f16_to_f32(read_u16(b + 2));
    for (int j = 0; j < 16; ++j) {
        y[j]      = d * (float)(b[4 + j] & 0xF) + m;
        y[j + 16] = d * (float)(b[4 + j] >> 4) + m;
    }
}

void dec_q5_0(const uint8_t * b, float * y) {
    const float d = f16_to_f32(read_u16(b));
    uint32_t qh;
    std::memcpy(&qh, b + 2, 4);
    for (int j = 0; j < 16; ++j) {
        int lo = (b[6 + j] & 0xF) | (((qh >> j) & 1) << 4);
        int hi = (b[6 + j] >> 4) | (((qh >> (j + 16)) & 1) << 4);
        y[j]      = d * (float)(lo - 16);
        y[j + 16] = d * (float)(hi - 16);
    }
}

void dec_q5_1(const uint8_t * b, float * y) {
    const float d = f16_to_f32(read_u16(b));
    const float m = f16_to_f32(read_u16(b + 2));
    uint32_t qh;
    std::memcpy(&qh, b + 4, 4);
    for (int j = 0; j < 16; ++j) {
        int lo = (b[8 + j] & 0xF) | (((qh >> j) & 1) << 4);
        int hi = (b[8 + j] >> 4) | (((qh >> (j + 16)) & 1) << 4);
        y[j]      = d * (float)lo + m;
        y[j + 16] = d * (float)hi + m;
    }
}

void dec_q8_0(const uint8_t * b, float * y) {
    const float d = f16_to_f32(read_u16(b));
    const int8_t * q = (const int8_t *)(b + 2);
    for (int j = 0; j < 32; ++j) y[j] = d * (float)q[j];
}

void dec_q2_K(const uint8_t * b, float * y) {
    const uint8_t * sc = b;            // 16 scale bytes
    const uint8_t * qs = b + 16;       // 64 bytes of 2-bit
    const float d = f16_to_f32(read_u16(b + 80));
    const float dmin = f16_to_f32(read_u16(b + 82));
    int is = 0;
    for (int chunk = 0; chunk < 2; ++chunk) {
        const uint8_t * q = qs + chunk * 32;
        for (int shift = 0; shift < 8; shift += 2) {
            // two 16-element halves per 32-element group
            for (int half = 0; half < 2; ++half) {
                const uint8_t s = sc[is++];
                const float dl = d * (float)(s & 0xF);
                const float ml = dmin * (float)(s >> 4);
                for (int l = 0; l < 16; ++l) {
                    int e = chunk * 128 + (shift / 2) * 32 + half * 16 + l;
                    y[e] = dl * (float)((q[half * 16 + l] >> shift) & 3) - ml;
                }
            }
        }
    }
}

void dec_q3_K(const uint8_t * b, float * y) {
    const uint8_t * hm = b;            // 32 bytes high-bit plane
    const uint8_t * qs = b + 32;       // 64 bytes of 2-bit
    const uint8_t * scb = b + 96;      // 12 bytes packed 6-bit scales
    const float d = f16_to_f32(read_u16(b + 108));
    // unpack 16 6-bit scales (layout per dequantize_row_q3_K kmask trick)
    int8_t scales[16];
    {
        uint32_t aux[4];
        std::memcpy(aux, scb, 12);
        const uint32_t kmask1 = 0x03030303, kmask2 = 0x0f0f0f0f;
        uint32_t tmp = aux[2];
        uint32_t out[4];
        out[0] = (aux[0] & kmask2) | (((tmp >> 0) & kmask1) << 4);
        out[1] = (aux[1] & kmask2) | (((tmp >> 2) & kmask1) << 4);
        out[2] = ((aux[0] >> 4) & kmask2) | (((tmp >> 4) & kmask1) << 4);
        out[3] = ((aux[1] >> 4) & kmask2) | (((tmp >> 6) & kmask1) << 4);
        std::memcpy(scales, out, 16);
    }
    // traversal per dequantize_row_q3_K: the hmask bit index m keeps
    // growing across both 128-element chunks (8 bits = 4 shifts x 2 chunks)
    int is = 0;
    uint8_t m = 1;
    float * out = y;
    for (int chunk = 0; chunk < 2; ++chunk) {
        const uint8_t * q = qs + chunk * 32;
        for (int shift = 0; shift < 8; shift += 2) {
            for (int half = 0; half < 2; ++half) {
                const float dl = d * (float)(scales[is++] - 32);
                for (int l = 0; l < 16; ++l) {
                    int idx = half * 16 + l;
                    int v = (q[idx] >> shift) & 3;
                    int sub = (hm[idx] & m) ? 0 : 4;
                    *out++ = dl * (float)(v - sub);
                }
            }
            m <<= 1;
        }
    }
}

void k4_scale_min(const uint8_t * scb, int j, float d, float dmin, float * dl, float * ml) {
    uint8_t sc, mn;
    if (j < 4) {
        sc = scb[j] & 63;
        mn = scb[j + 4] & 63;
    } else {
        sc = (scb[j + 4] & 0xF) | ((scb[j - 4] >> 6) << 4);
        mn = (scb[j + 4] >> 4) | ((scb[j] >> 6) << 4);
    }
    *dl = d * (float)sc;
    *ml = dmin * (float)mn;
}

void dec_q4_K(const uint8_t * b, float * y) {
    const float d = f16_to_f32(read_u16(b));
    const float dmin = f16_to_f32(read_u16(b + 2));
    const uint8_t * scb = b + 4;
    const uint8_t * qs = b + 16;
    for (int g = 0; g < 4; ++g) {         // 4 chunks of 64
        float d1, m1, d2, m2;
        k4_scale_min(scb, 2 * g, d, dmin, &d1, &m1);
        k4_scale_min(scb, 2 * g + 1, d, dmin, &d2, &m2);
        const uint8_t * q = qs + 32 * g;
        for (int l = 0; l < 32; ++l) {
            y[64 * g + l]      = d1 * (float)(q[l] & 0xF) - m1;
            y[64 * g + 32 + l] = d2 * (float)(q[l] >> 4) - m2;
        }
    }
}

void dec_q5_K(const uint8_t * b, float * y) {
    const float d = f16_to_f32(read_u16(b));
    const float dmin = f16_to_f32(read_u16(b + 2));
    const uint8_t * scb = b + 4;
    const uint8_t * qh = b + 16;
    const uint8_t * qs = b + 48;
    uint8_t u1 = 1, u2 = 2;
    for (int g = 0; g < 4; ++g) {
        float d1, m1, d2, m2;
        k4_scale_min(scb, 2 * g, d, dmin, &d1, &m1);
        k4_scale_min(scb, 2 * g + 1, d, dmin, &d2, &m2);
        const uint8_t * q = qs + 32 * g;
        for (int l = 0; l < 32; ++l) {
            int lo = (q[l] & 0xF) + ((qh[l] & u1) ? 16 : 0);
            int hi = (q[l] >> 4) + ((qh[l] & u2) ? 16 : 0);
            y[64 * g + l]      = d1 * (float)lo - m1;
            y[64 * g + 32 + l] = d2 * (float)hi - m2;
        }
        u1 <<= 2;
        u2 <<= 2;
    }
}

void dec_q6_K(const uint8_t * b, float * y) {
    const uint8_t * ql = b;
    const uint8_t * qh = b + 128;
    const int8_t * sc = (const int8_t *)(b + 192);
    const float d = f16_to_f32(read_u16(b + 208));
    for (int chunk = 0; chunk < 2; ++chunk) {
        const uint8_t * l = ql + chunk * 64;
        const uint8_t * h = qh + chunk * 32;
        const int8_t * s = sc + chunk * 8;
        float * out = y + chunk * 128;
        for (int i = 0; i < 32; ++i) {
            int q1 = (int)(l[i] & 0xF)       | (((h[i] >> 0) & 3) << 4);
            int q2 = (int)(l[i + 32] & 0xF)  | (((h[i] >> 2) & 3) << 4);
            int q3 = (int)(l[i] >> 4)        | (((h[i] >> 4) & 3) << 4);
            int q4 = (int)(l[i + 32] >> 4)   | (((h[i] >> 6) & 3) << 4);
            out[i]      = d * (float)s[i / 16]     * (float)(q1 - 32);
            out[i + 32] = d * (float)s[2 + i / 16] * (float)(q2 - 32);
            out[i + 64] = d * (float)s[4 + i / 16] * (float)(q3 - 32);
            out[i + 96] = d * (float)s[6 + i / 16] * (float)(q4 - 32);
        }
    }
}

const float kvalues_iq4nl[16] = {-127, -104, -83, -65, -49, -35, -22, -10,
                                 1, 13, 25, 38, 53, 69, 89, 113};

void dec_iq4_nl(const uint8_t * b, float * y) {
    const float d = f16_to_f32(read_u16(b));
    for (int j = 0; j < 16; ++j) {
        y[j]      = d * kvalues_iq4nl[b[2 + j] & 0xF];
        y[j + 16] = d * kvalues_iq4nl[b[2 + j] >> 4];
    }
}

void dec_iq4_xs(const uint8_t * b, float * y) {
    const float d = f16_to_f32(read_u16(b));
    const uint16_t scales_h = read_u16(b + 2);
    const uint8_t * scales_l = b + 4;
    const uint8_t * qs = b + 8;
    for (int ib = 0; ib < 8; ++ib) {
        int ls = ((scales_l[ib / 2] >> (4 * (ib % 2))) & 0xF)
               | (((scales_h >> (2 * ib)) & 3) << 4);
        const float dl = d * (float)(ls - 32);
        const uint8_t * q = qs + 16 * ib;
        for (int j = 0; j < 16; ++j) {
            y[32 * ib + j]      = dl * kvalues_iq4nl[q[j] & 0xF];
            y[32 * ib + 16 + j] = dl * kvalues_iq4nl[q[j] >> 4];
        }
    }
}

struct Codec {
    int block_size;
    int type_size;
    void (*fn)(const uint8_t *, float *);
};

// indexed by ggml_type enum value (ggml.h:352-391)
Codec codec_for(int t) {
    switch (t) {
        case 1:  return {32, 64, dec_f16};     // F16 (synthetic 32-elem blocks)
        case 2:  return {32, 18, dec_q4_0};
        case 3:  return {32, 20, dec_q4_1};
        case 6:  return {32, 22, dec_q5_0};
        case 7:  return {32, 24, dec_q5_1};
        case 8:  return {32, 34, dec_q8_0};
        case 10: return {256, 84, dec_q2_K};
        case 11: return {256, 110, dec_q3_K};
        case 12: return {256, 144, dec_q4_K};
        case 13: return {256, 176, dec_q5_K};
        case 14: return {256, 210, dec_q6_K};
        case 20: return {32, 18, dec_iq4_nl};
        case 23: return {256, 136, dec_iq4_xs};
        case 30: return {32, 64, dec_bf16};    // BF16
        default: return {0, 0, nullptr};
    }
}

}  // namespace

extern "C" {

// returns 0 on success, -1 for unsupported type / bad n / short buffer.
// data_len is the payload byte length: the C side re-checks that all
// nb blocks fit before spawning decode threads (a mismatched n must fail
// cleanly here, like the numpy path, not read past the buffer).
int lcg_dequantize(int ggml_type, const uint8_t * data, int64_t data_len,
                   float * out, int64_t n, int nthreads) {
    Codec c = codec_for(ggml_type);
    if (!c.fn || n % c.block_size) return -1;
    const int64_t nb = n / c.block_size;
    if (data_len >= 0 && nb * (int64_t)c.type_size > data_len) return -1;
    if (nthreads < 1) nthreads = 1;
    if (nthreads > (int)nb) nthreads = (int)(nb > 0 ? nb : 1);
    std::atomic<int64_t> next(0);
    const int64_t chunk = 64;
    auto worker = [&]() {
        for (;;) {
            int64_t i0 = next.fetch_add(chunk);
            if (i0 >= nb) break;
            int64_t i1 = i0 + chunk < nb ? i0 + chunk : nb;
            for (int64_t i = i0; i < i1; ++i) {
                c.fn(data + i * c.type_size, out + i * c.block_size);
            }
        }
    };
    if (nthreads == 1) {
        worker();
    } else {
        std::vector<std::thread> ts;
        for (int i = 0; i < nthreads; ++i) ts.emplace_back(worker);
        for (auto & t : ts) t.join();
    }
    return 0;
}

// Q8_0 row encode (activation quantization path; quantize_row_q8_0 semantics)
int lcg_quantize_q8_0(const float * x, uint8_t * out, int64_t n, int nthreads) {
    if (n % 32) return -1;
    const int64_t nb = n / 32;
    std::atomic<int64_t> next(0);
    if (nthreads < 1) nthreads = 1;
    auto worker = [&]() {
        for (;;) {
            int64_t i = next.fetch_add(1);
            if (i >= nb) break;
            const float * xs = x + i * 32;
            uint8_t * b = out + i * 34;
            float amax = 0.f;
            for (int j = 0; j < 32; ++j) {
                float a = std::fabs(xs[j]);
                if (a > amax) amax = a;
            }
            const float d = amax / 127.f;
            const float id = d ? 1.f / d : 0.f;
            uint16_t h = f32_to_f16(d);
            std::memcpy(b, &h, 2);
            int8_t * q = (int8_t *)(b + 2);
            // quantize with the UNROUNDED inverse scale, exactly like
            // quantize_row_q8_0_ref (ggml-quants.c)
            for (int j = 0; j < 32; ++j) {
                float v = xs[j] * id;
                q[j] = (int8_t)std::lroundf(v);
            }
        }
    };
    if (nthreads == 1) {
        worker();
    } else {
        std::vector<std::thread> ts;
        for (int i = 0; i < nthreads; ++i) ts.emplace_back(worker);
        for (auto & t : ts) t.join();
    }
    return 0;
}

}  // extern "C"
