// rwkv_native: native runtime layer for rwkv_tpu.
//
// TPU-native equivalent of the reference's C++ IO/loading/quantization core
// (rwkv_file_format.inc, rwkv_model_loading.inc, rwkv_quantize.inc): the
// compute path is XLA's job, but file parsing, block-quant (de)coding and
// streaming quantization are host-side and benefit from mmap + threads.
//
// Exposed as a plain C ABI consumed from Python via ctypes
// (rwkv_tpu/formats/native_loader.py). No Python.h dependency.
//
// Quant semantics are bit-exact with ggml's reference quantizers (same
// rounding rules as rwkv_tpu/formats/quant.py, which is validated against the
// committed Q5 fixtures byte-for-byte).

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <functional>
#include <string>
#include <vector>
#include <thread>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#define RN_API extern "C" __attribute__((visibility("default")))

namespace {

constexpr uint32_t kMagic = 0x67676d66;
constexpr int QK = 32;

// ---- fp16 <-> fp32 (IEEE, round-to-nearest-even) ----
static inline float f16_to_f32(uint16_t h) {
    uint32_t sign = (uint32_t)(h & 0x8000u) << 16;
    uint32_t exp = (h >> 10) & 0x1f;
    uint32_t man = h & 0x3ffu;
    uint32_t bits;
    if (exp == 0) {
        if (man == 0) {
            bits = sign;
        } else {  // subnormal
            exp = 127 - 15 + 1;
            while (!(man & 0x400u)) { man <<= 1; exp--; }
            man &= 0x3ffu;
            bits = sign | (exp << 23) | (man << 13);
        }
    } else if (exp == 0x1f) {
        bits = sign | 0x7f800000u | (man << 13);
    } else {
        bits = sign | ((exp - 15 + 127) << 23) | (man << 13);
    }
    float f;
    std::memcpy(&f, &bits, 4);
    return f;
}

static inline uint16_t f32_to_f16(float f) {
    uint32_t bits;
    std::memcpy(&bits, &f, 4);
    uint32_t sign = (bits >> 16) & 0x8000u;
    int32_t exp = (int32_t)((bits >> 23) & 0xff) - 127 + 15;
    uint32_t man = bits & 0x7fffffu;
    if (((bits >> 23) & 0xff) == 0xff) {  // inf/nan
        return (uint16_t)(sign | 0x7c00u | (man ? 0x200u : 0));
    }
    if (exp >= 0x1f) return (uint16_t)(sign | 0x7c00u);  // overflow -> inf
    if (exp <= 0) {
        if (exp < -10) return (uint16_t)sign;  // underflow -> 0
        man |= 0x800000u;                       // subnormal
        uint32_t shift = (uint32_t)(14 - exp);
        uint32_t half = man >> shift;
        uint32_t rem = man & ((1u << shift) - 1);
        uint32_t halfway = 1u << (shift - 1);
        if (rem > halfway || (rem == halfway && (half & 1))) half++;
        return (uint16_t)(sign | half);
    }
    // normal: round mantissa 23 -> 10 bits, ties to even
    uint32_t half = man >> 13;
    uint32_t rem = man & 0x1fffu;
    uint16_t out = (uint16_t)(sign | ((uint32_t)exp << 10) | half);
    if (rem > 0x1000u || (rem == 0x1000u && (out & 1))) out++;
    return out;
}

// ---- format table (rwkv_type enum order, rwkv_file_format.inc:5-24) ----
// block_elems: elements per block (32 legacy, 256 K-quant super-blocks);
// group: elements per scale group in the qmm codes layout (0 = not quantized)
struct TypeInfo { const char* name; int block_bytes; int block_elems; int group; bool decodable; };
static const TypeInfo kTypes[] = {
    {"FP32", 0, 0, 0, true}, {"FP16", 0, 0, 0, true},
    {"Q4_0", 18, 32, 32, true}, {"Q4_1", 20, 32, 32, true},
    {"Q4_1_O", 0, 0, 0, false}, {"Q4_2", 0, 0, 0, false}, {"Q4_3", 0, 0, 0, false},
    {"Q5_0", 22, 32, 32, true}, {"Q5_1", 24, 32, 32, true}, {"Q8_0", 34, 32, 32, true},
    {"Q8_1", 0, 0, 0, false},
    {"Q2_K", 84, 256, 16, true}, {"Q3_K", 110, 256, 16, true}, {"Q4_K", 144, 256, 32, true},
    {"Q5_K", 176, 256, 32, true}, {"Q6_K", 210, 256, 16, true}, {"Q8_K", 292, 256, 32, true},
};
constexpr int kTypeCount = (int)(sizeof(kTypes) / sizeof(kTypes[0]));

static int64_t tensor_nbytes(uint32_t dtype, int64_t n) {
    if (dtype == 0) return n * 4;
    if (dtype == 1) return n * 2;
    if (dtype < (uint32_t)kTypeCount && kTypes[dtype].block_bytes > 0)
        return (n / kTypes[dtype].block_elems) * kTypes[dtype].block_bytes;
    return -1;
}

struct Tensor {
    std::string name;
    uint32_t dtype;
    uint32_t dims[3];
    uint32_t dim_count;
    const uint8_t* data;
    int64_t nbytes;
    int64_t n_elements;
};

struct Model {
    int fd = -1;
    const uint8_t* map = nullptr;
    size_t map_size = 0;
    uint32_t header[6];
    std::vector<Tensor> tensors;
    std::string error;
};

static thread_local std::string g_error;

static int n_threads_default() {
    unsigned n = std::thread::hardware_concurrency();
    return n ? (int)n : 4;
}

static void parallel_for(int64_t n, int threads, const std::function<void(int64_t, int64_t)>& fn) {
    if (threads <= 1 || n < 4) { fn(0, n); return; }
    std::vector<std::thread> pool;
    int64_t per = (n + threads - 1) / threads;
    for (int t = 0; t < threads; t++) {
        int64_t lo = t * per, hi = std::min(n, lo + per);
        if (lo >= hi) break;
        pool.emplace_back([=, &fn] { fn(lo, hi); });
    }
    for (auto& th : pool) th.join();
}

// ---- dequant (row-major stream of blocks) ----
static void dequant_blocks(uint32_t dtype, const uint8_t* src, float* dst, int64_t n_blocks) {
    switch (dtype) {
        case 2:  // Q4_0: fp16 d, 16B nibbles, value (q-8)*d
            for (int64_t b = 0; b < n_blocks; b++) {
                const uint8_t* p = src + b * 18;
                float d = f16_to_f32(*(const uint16_t*)p);
                float* o = dst + b * QK;
                for (int j = 0; j < 16; j++) {
                    o[j] = (float)((int)(p[2 + j] & 0xF) - 8) * d;
                    o[j + 16] = (float)((int)(p[2 + j] >> 4) - 8) * d;
                }
            }
            break;
        case 3:  // Q4_1: d, m
            for (int64_t b = 0; b < n_blocks; b++) {
                const uint8_t* p = src + b * 20;
                float d = f16_to_f32(*(const uint16_t*)p);
                float m = f16_to_f32(*(const uint16_t*)(p + 2));
                float* o = dst + b * QK;
                for (int j = 0; j < 16; j++) {
                    o[j] = (float)(p[4 + j] & 0xF) * d + m;
                    o[j + 16] = (float)(p[4 + j] >> 4) * d + m;
                }
            }
            break;
        case 7:  // Q5_0
            for (int64_t b = 0; b < n_blocks; b++) {
                const uint8_t* p = src + b * 22;
                float d = f16_to_f32(*(const uint16_t*)p);
                uint32_t qh; std::memcpy(&qh, p + 2, 4);
                float* o = dst + b * QK;
                for (int j = 0; j < 16; j++) {
                    int lo = (p[6 + j] & 0xF) | (int)(((qh >> j) & 1) << 4);
                    int hi = (p[6 + j] >> 4) | (int)(((qh >> (j + 16)) & 1) << 4);
                    o[j] = (float)(lo - 16) * d;
                    o[j + 16] = (float)(hi - 16) * d;
                }
            }
            break;
        case 8:  // Q5_1
            for (int64_t b = 0; b < n_blocks; b++) {
                const uint8_t* p = src + b * 24;
                float d = f16_to_f32(*(const uint16_t*)p);
                float m = f16_to_f32(*(const uint16_t*)(p + 2));
                uint32_t qh; std::memcpy(&qh, p + 4, 4);
                float* o = dst + b * QK;
                for (int j = 0; j < 16; j++) {
                    int lo = (p[8 + j] & 0xF) | (int)(((qh >> j) & 1) << 4);
                    int hi = (p[8 + j] >> 4) | (int)(((qh >> (j + 16)) & 1) << 4);
                    o[j] = (float)lo * d + m;
                    o[j + 16] = (float)hi * d + m;
                }
            }
            break;
        case 9:  // Q8_0
            for (int64_t b = 0; b < n_blocks; b++) {
                const uint8_t* p = src + b * 34;
                float d = f16_to_f32(*(const uint16_t*)p);
                const int8_t* q = (const int8_t*)(p + 2);
                float* o = dst + b * QK;
                for (int j = 0; j < QK; j++) o[j] = (float)q[j] * d;
            }
            break;
    }
}

// ---- K-quant super-block decode (ggml k-quant public formats) ----
static inline void get_scale_min_k4(int j, const uint8_t* s, uint8_t* sc, uint8_t* mn) {
    if (j < 4) {
        *sc = s[j] & 63;
        *mn = s[j + 4] & 63;
    } else {
        *sc = (uint8_t)((s[j + 4] & 0xF) | ((s[j - 4] >> 6) << 4));
        *mn = (uint8_t)((s[j + 4] >> 4) | ((s[j] >> 6) << 4));
    }
}

// per super-block: effective scale/min per sub-group -> (q, d_eff, m_eff)
// m_eff follows the q*d + m convention (mins enter negated)
static void kquant_decode_sb(uint32_t dtype, const uint8_t* p, int8_t* q,
                             float* d_eff, float* m_eff) {
    switch (dtype) {
        case 11: {  // Q2_K: scales[16], qs[64], d, dmin — 16 groups of 16
            const uint8_t* sc = p;
            const uint8_t* qs = p + 16;
            float d = f16_to_f32(*(const uint16_t*)(p + 80));
            float dmin = f16_to_f32(*(const uint16_t*)(p + 82));
            for (int g = 0; g < 16; g++) {
                d_eff[g] = d * (float)(sc[g] & 0xF);
                m_eff[g] = -dmin * (float)(sc[g] >> 4);
            }
            for (int c = 0; c < 2; c++)           // 128-element chunks
                for (int s = 0; s < 4; s++)       // 2-bit shifts
                    for (int j = 0; j < 32; j++)
                        q[c * 128 + s * 32 + j] = (int8_t)((qs[c * 32 + j] >> (2 * s)) & 3);
            break;
        }
        case 12: {  // Q3_K: hmask[32], qs[64], scales[12] 6-bit, d — 16x16
            const uint8_t* hm = p;
            const uint8_t* qs = p + 32;
            const uint8_t* sp = p + 96;
            float d = f16_to_f32(*(const uint16_t*)(p + 108));
            for (int j = 0; j < 16; j++) {
                uint8_t lo = j < 8 ? (sp[j] & 0xF) : (sp[j - 8] >> 4);
                uint8_t hi = (sp[8 + (j % 4)] >> (2 * (j / 4))) & 3;
                d_eff[j] = d * (float)((int)(lo | (hi << 4)) - 32);
                m_eff[j] = 0.0f;
            }
            for (int c = 0; c < 2; c++)
                for (int s = 0; s < 4; s++)
                    for (int j = 0; j < 32; j++) {
                        int e = c * 128 + s * 32 + j;     // element index
                        int v = (qs[c * 32 + j] >> (2 * s)) & 3;
                        int high = (hm[e % 32] >> (e / 32)) & 1;
                        q[e] = (int8_t)(v - (high ? 0 : 4));
                    }
            break;
        }
        case 13: {  // Q4_K: d, dmin, scales[12], qs[128] — 8 groups of 32
            float d = f16_to_f32(*(const uint16_t*)p);
            float dmin = f16_to_f32(*(const uint16_t*)(p + 2));
            const uint8_t* sp = p + 4;
            const uint8_t* qs = p + 16;
            for (int g = 0; g < 8; g++) {
                uint8_t sc, mn;
                get_scale_min_k4(g, sp, &sc, &mn);
                d_eff[g] = d * (float)sc;
                m_eff[g] = -dmin * (float)mn;
            }
            for (int c = 0; c < 4; c++)           // 64-element chunks
                for (int j = 0; j < 32; j++) {
                    q[c * 64 + j] = (int8_t)(qs[c * 32 + j] & 0xF);
                    q[c * 64 + 32 + j] = (int8_t)(qs[c * 32 + j] >> 4);
                }
            break;
        }
        case 14: {  // Q5_K: d, dmin, scales[12], qh[32], qs[128] — 8x32
            float d = f16_to_f32(*(const uint16_t*)p);
            float dmin = f16_to_f32(*(const uint16_t*)(p + 2));
            const uint8_t* sp = p + 4;
            const uint8_t* qh = p + 16;
            const uint8_t* qs = p + 48;
            for (int g = 0; g < 8; g++) {
                uint8_t sc, mn;
                get_scale_min_k4(g, sp, &sc, &mn);
                d_eff[g] = d * (float)sc;
                m_eff[g] = -dmin * (float)mn;
            }
            for (int c = 0; c < 4; c++) {
                uint8_t m1 = (uint8_t)(1u << (2 * c)), m2 = (uint8_t)(2u << (2 * c));
                for (int j = 0; j < 32; j++) {
                    q[c * 64 + j] = (int8_t)((qs[c * 32 + j] & 0xF) | ((qh[j] & m1) ? 16 : 0));
                    q[c * 64 + 32 + j] = (int8_t)((qs[c * 32 + j] >> 4) | ((qh[j] & m2) ? 16 : 0));
                }
            }
            break;
        }
        case 15: {  // Q6_K: ql[128], qh[64], int8 scales[16], d — 16x16
            const uint8_t* ql = p;
            const uint8_t* qh = p + 128;
            const int8_t* sc = (const int8_t*)(p + 192);
            float d = f16_to_f32(*(const uint16_t*)(p + 208));
            for (int g = 0; g < 16; g++) {
                d_eff[g] = d * (float)sc[g];
                m_eff[g] = 0.0f;
            }
            for (int c = 0; c < 2; c++) {         // 128-element chunks
                const uint8_t* qlc = ql + c * 64;
                const uint8_t* qhc = qh + c * 32;
                int8_t* qc = q + c * 128;
                for (int j = 0; j < 32; j++) {
                    qc[j] = (int8_t)(((qlc[j] & 0xF) | (((qhc[j] >> 0) & 3) << 4)) - 32);
                    qc[j + 32] = (int8_t)(((qlc[j + 32] & 0xF) | (((qhc[j] >> 2) & 3) << 4)) - 32);
                    qc[j + 64] = (int8_t)(((qlc[j] >> 4) | (((qhc[j] >> 4) & 3) << 4)) - 32);
                    qc[j + 96] = (int8_t)(((qlc[j + 32] >> 4) | (((qhc[j] >> 6) & 3) << 4)) - 32);
                }
            }
            break;
        }
        case 16: {  // Q8_K: f32 d, int8 qs[256], i16 bsums[16] — 8 groups of 32
            float d;
            std::memcpy(&d, p, 4);
            std::memcpy(q, p + 4, 256);
            for (int g = 0; g < 8; g++) { d_eff[g] = d; m_eff[g] = 0.0f; }
            break;
        }
    }
}

static void dequant_kquant(uint32_t dtype, const uint8_t* src, float* dst, int64_t n_sb) {
    int bb = kTypes[dtype].block_bytes;
    int group = kTypes[dtype].group;
    int n_groups = 256 / group;
    for (int64_t b = 0; b < n_sb; b++) {
        int8_t q[256];
        float d_eff[16], m_eff[16];
        kquant_decode_sb(dtype, src + b * bb, q, d_eff, m_eff);
        float* o = dst + b * 256;
        for (int g = 0; g < n_groups; g++)
            for (int j = 0; j < group; j++)
                o[g * group + j] = (float)q[g * group + j] * d_eff[g] + m_eff[g];
    }
}

static bool kquant_has_min(uint32_t dtype) {
    return dtype == 11 || dtype == 13 || dtype == 14;  // Q2_K, Q4_K, Q5_K
}

// decode to qmm layout: int8 codes + f32 scale (+ f32 min)
static void decode_codes_blocks(uint32_t dtype, const uint8_t* src, int8_t* q_out,
                                float* d_out, float* m_out, int64_t n_blocks) {
    for (int64_t b = 0; b < n_blocks; b++) {
        int8_t* o = q_out + b * QK;
        switch (dtype) {
            case 2: {
                const uint8_t* p = src + b * 18;
                d_out[b] = f16_to_f32(*(const uint16_t*)p);
                for (int j = 0; j < 16; j++) {
                    o[j] = (int8_t)((p[2 + j] & 0xF) - 8);
                    o[j + 16] = (int8_t)((p[2 + j] >> 4) - 8);
                }
                break;
            }
            case 3: {
                const uint8_t* p = src + b * 20;
                d_out[b] = f16_to_f32(*(const uint16_t*)p);
                m_out[b] = f16_to_f32(*(const uint16_t*)(p + 2));
                for (int j = 0; j < 16; j++) {
                    o[j] = (int8_t)(p[4 + j] & 0xF);
                    o[j + 16] = (int8_t)(p[4 + j] >> 4);
                }
                break;
            }
            case 7: {
                const uint8_t* p = src + b * 22;
                d_out[b] = f16_to_f32(*(const uint16_t*)p);
                uint32_t qh; std::memcpy(&qh, p + 2, 4);
                for (int j = 0; j < 16; j++) {
                    o[j] = (int8_t)(((p[6 + j] & 0xF) | (int)(((qh >> j) & 1) << 4)) - 16);
                    o[j + 16] = (int8_t)(((p[6 + j] >> 4) | (int)(((qh >> (j + 16)) & 1) << 4)) - 16);
                }
                break;
            }
            case 8: {
                const uint8_t* p = src + b * 24;
                d_out[b] = f16_to_f32(*(const uint16_t*)p);
                m_out[b] = f16_to_f32(*(const uint16_t*)(p + 2));
                uint32_t qh; std::memcpy(&qh, p + 4, 4);
                for (int j = 0; j < 16; j++) {
                    o[j] = (int8_t)((p[8 + j] & 0xF) | (int)(((qh >> j) & 1) << 4));
                    o[j + 16] = (int8_t)((p[8 + j] >> 4) | (int)(((qh >> (j + 16)) & 1) << 4));
                }
                break;
            }
            case 9: {
                const uint8_t* p = src + b * 34;
                d_out[b] = f16_to_f32(*(const uint16_t*)p);
                std::memcpy(o, p + 2, QK);
                break;
            }
        }
    }
}

// ---- encoders (bit-exact with ggml reference quantizers) ----
static void quant_block_q4_0(const float* x, uint8_t* out) {
    float amax = 0.f, smax = 0.f;
    for (int j = 0; j < QK; j++) { float v = x[j]; if (amax < std::fabs(v)) { amax = std::fabs(v); smax = v; } }
    float d = smax / -8.0f;
    float id = d != 0.f ? 1.0f / d : 0.0f;
    *(uint16_t*)out = f32_to_f16(d);
    for (int j = 0; j < 16; j++) {
        int lo = (int)(int8_t)(x[j] * id + 8.5f); if (lo > 15) lo = 15; if (lo < 0) lo = 0;
        int hi = (int)(int8_t)(x[j + 16] * id + 8.5f); if (hi > 15) hi = 15; if (hi < 0) hi = 0;
        out[2 + j] = (uint8_t)(lo | (hi << 4));
    }
}

static void quant_block_q4_1(const float* x, uint8_t* out) {
    float mn = x[0], mx = x[0];
    for (int j = 1; j < QK; j++) { mn = std::min(mn, x[j]); mx = std::max(mx, x[j]); }
    float d = (mx - mn) / 15.0f;
    float id = d != 0.f ? 1.0f / d : 0.0f;
    *(uint16_t*)out = f32_to_f16(d);
    *(uint16_t*)(out + 2) = f32_to_f16(mn);
    for (int j = 0; j < 16; j++) {
        int lo = (int)(int8_t)((x[j] - mn) * id + 0.5f); if (lo > 15) lo = 15; if (lo < 0) lo = 0;
        int hi = (int)(int8_t)((x[j + 16] - mn) * id + 0.5f); if (hi > 15) hi = 15; if (hi < 0) hi = 0;
        out[4 + j] = (uint8_t)(lo | (hi << 4));
    }
}

static void quant_block_q5_0(const float* x, uint8_t* out) {
    float amax = 0.f, smax = 0.f;
    for (int j = 0; j < QK; j++) { float v = x[j]; if (amax < std::fabs(v)) { amax = std::fabs(v); smax = v; } }
    float d = smax / -16.0f;
    float id = d != 0.f ? 1.0f / d : 0.0f;
    *(uint16_t*)out = f32_to_f16(d);
    uint32_t qh = 0;
    for (int j = 0; j < 16; j++) {
        int lo = (int)(int8_t)(x[j] * id + 16.5f); if (lo > 31) lo = 31; if (lo < 0) lo = 0;
        int hi = (int)(int8_t)(x[j + 16] * id + 16.5f); if (hi > 31) hi = 31; if (hi < 0) hi = 0;
        out[6 + j] = (uint8_t)((lo & 0xF) | ((hi & 0xF) << 4));
        qh |= ((uint32_t)(lo >> 4)) << j;
        qh |= ((uint32_t)(hi >> 4)) << (j + 16);
    }
    std::memcpy(out + 2, &qh, 4);
}

static void quant_block_q5_1(const float* x, uint8_t* out) {
    float mn = x[0], mx = x[0];
    for (int j = 1; j < QK; j++) { mn = std::min(mn, x[j]); mx = std::max(mx, x[j]); }
    float d = (mx - mn) / 31.0f;
    float id = d != 0.f ? 1.0f / d : 0.0f;
    *(uint16_t*)out = f32_to_f16(d);
    *(uint16_t*)(out + 2) = f32_to_f16(mn);
    uint32_t qh = 0;
    for (int j = 0; j < 16; j++) {
        int lo = (int)(int8_t)((x[j] - mn) * id + 0.5f); if (lo > 31) lo = 31; if (lo < 0) lo = 0;
        int hi = (int)(int8_t)((x[j + 16] - mn) * id + 0.5f); if (hi > 31) hi = 31; if (hi < 0) hi = 0;
        out[8 + j] = (uint8_t)((lo & 0xF) | ((hi & 0xF) << 4));
        qh |= ((uint32_t)(lo >> 4)) << j;
        qh |= ((uint32_t)(hi >> 4)) << (j + 16);
    }
    std::memcpy(out + 4, &qh, 4);
}

static void quant_block_q8_0(const float* x, uint8_t* out) {
    float amax = 0.f;
    for (int j = 0; j < QK; j++) amax = std::max(amax, std::fabs(x[j]));
    float d = amax / 127.0f;
    float id = d != 0.f ? 1.0f / d : 0.0f;
    *(uint16_t*)out = f32_to_f16(d);
    int8_t* q = (int8_t*)(out + 2);
    for (int j = 0; j < QK; j++) q[j] = (int8_t)std::roundf(x[j] * id);
}

// ---- K-quant super-block encoders --------------------------------------
// Sequential-C transcription of the same reference quantizer algorithms the
// Python codec vectorizes (formats/kquant.py: make_qkx2_quants /
// make_qx_quants / make_q3_quants grid searches). Summations here run in C
// element order — the ORIGINAL semantics — so byte-agreement with the
// numpy (pairwise-summing) encoder measures the tie-flip rate between the
// two summation orders (tests/test_kquant.py).

static const float KQ_GROUP_MAX_EPS = 1e-15f;

static inline int nearest_int(float x) {
    // round half to even (ggml's 12582912.0f magic; lrintf in default
    // FE_TONEAREST mode is the same function for |x| < 2^22)
    return (int)lrintf(x);
}

static float make_qkx2_quants(int n, int nmax, const float* x, const float* w,
                              uint8_t* L, float* the_min, float rmin,
                              float rdelta, int nstep, bool use_mad) {
    float mn = x[0], mx = x[0];
    float sum_w = w[0], sum_x = w[0] * x[0];
    for (int i = 1; i < n; ++i) {
        if (x[i] < mn) mn = x[i];
        if (x[i] > mx) mx = x[i];
        sum_w += w[i];
        sum_x += w[i] * x[i];
    }
    if (mn > 0.f) mn = 0.f;
    if (mx == mn) {
        for (int i = 0; i < n; ++i) L[i] = 0;
        *the_min = -mn;
        return 0.f;
    }
    uint8_t Laux[32];
    float iscale = (float)nmax / (mx - mn);
    float scale = 1.0f / iscale;
    float best_mad = 0.f;
    for (int i = 0; i < n; ++i) {
        int l = nearest_int(iscale * (x[i] - mn));
        l = l < 0 ? 0 : (l > nmax ? nmax : l);
        L[i] = (uint8_t)l;
        float diff = scale * L[i] + mn - x[i];
        diff = use_mad ? std::fabs(diff) : diff * diff;
        best_mad += w[i] * diff;
    }
    for (int is = 0; is <= nstep; ++is) {
        float isc = (rmin + rdelta * is + (float)nmax) / (mx - mn);
        float sum_l = 0.f, sum_l2 = 0.f, sum_xl = 0.f;
        for (int i = 0; i < n; ++i) {
            int l = nearest_int(isc * (x[i] - mn));
            l = l < 0 ? 0 : (l > nmax ? nmax : l);
            Laux[i] = (uint8_t)l;
            sum_l += w[i] * l;
            sum_l2 += w[i] * (float)l * l;
            sum_xl += w[i] * l * x[i];
        }
        float D = sum_w * sum_l2 - sum_l * sum_l;
        if (D > 0.f) {
            float this_scale = (sum_w * sum_xl - sum_x * sum_l) / D;
            float this_min = (sum_l2 * sum_x - sum_l * sum_xl) / D;
            if (this_min > 0.f) {
                this_min = 0.f;
                this_scale = sum_xl / sum_l2;
            }
            float mad = 0.f;
            for (int i = 0; i < n; ++i) {
                float diff = this_scale * Laux[i] + this_min - x[i];
                diff = use_mad ? std::fabs(diff) : diff * diff;
                mad += w[i] * diff;
            }
            if (mad < best_mad) {
                for (int i = 0; i < n; ++i) L[i] = Laux[i];
                best_mad = mad;
                scale = this_scale;
                mn = this_min;
            }
        }
    }
    *the_min = -mn;
    return scale;
}

static float make_qx_quants(int n, int nmax, const float* x, int8_t* L) {
    // rmse_type 1 (weights = x^2), the only mode the quantizers use
    float mx = 0.f, amax = 0.f;
    for (int i = 0; i < n; ++i) {
        float ax = std::fabs(x[i]);
        if (ax > amax) { amax = ax; mx = x[i]; }
    }
    if (amax < KQ_GROUP_MAX_EPS) {
        for (int i = 0; i < n; ++i) L[i] = 0;
        return 0.f;
    }
    float iscale = -(float)nmax / mx;
    float sumlx = 0.f, suml2 = 0.f;
    for (int i = 0; i < n; ++i) {
        int l = nearest_int(iscale * x[i]);
        l = l < -nmax ? -nmax : (l > nmax - 1 ? nmax - 1 : l);
        L[i] = (int8_t)(l + nmax);
        float w = x[i] * x[i];
        sumlx += w * x[i] * l;
        suml2 += w * (float)l * l;
    }
    float scale = suml2 != 0.f ? sumlx / suml2 : 0.f;
    float best = scale * sumlx;
    for (int is = -9; is <= 9; ++is) {
        if (is == 0) continue;
        float isc = -((float)nmax + 0.1f * is) / mx;
        float slx = 0.f, sl2 = 0.f;
        for (int i = 0; i < n; ++i) {
            int l = nearest_int(isc * x[i]);
            l = l < -nmax ? -nmax : (l > nmax - 1 ? nmax - 1 : l);
            float w = x[i] * x[i];
            slx += w * x[i] * l;
            sl2 += w * (float)l * l;
        }
        if (sl2 > 0.f && slx * slx > best * sl2) {
            for (int i = 0; i < n; ++i) {
                int l = nearest_int(isc * x[i]);
                l = l < -nmax ? -nmax : (l > nmax - 1 ? nmax - 1 : l);
                L[i] = (int8_t)(nmax + l);
            }
            scale = slx / sl2;
            best = scale * slx;
        }
    }
    return scale;
}

static float make_q3_quants(int n, int nmax, const float* x, int8_t* L) {
    // do_rmse = true path (the only mode Q3_K uses)
    float mx = 0.f, amax = 0.f;
    for (int i = 0; i < n; ++i) {
        float ax = std::fabs(x[i]);
        if (ax > amax) { amax = ax; mx = x[i]; }
    }
    if (amax < KQ_GROUP_MAX_EPS) {
        for (int i = 0; i < n; ++i) L[i] = 0;
        return 0.f;
    }
    float iscale = -(float)nmax / mx;
    float sumlx = 0.f, suml2 = 0.f;
    for (int i = 0; i < n; ++i) {
        int l = nearest_int(iscale * x[i]);
        l = l < -nmax ? -nmax : (l > nmax - 1 ? nmax - 1 : l);
        L[i] = (int8_t)l;
        float w = x[i] * x[i];
        sumlx += w * x[i] * l;
        suml2 += w * (float)l * l;
    }
    for (int itry = 0; itry < 5; ++itry) {
        int n_changed = 0;
        for (int i = 0; i < n; ++i) {
            float w = x[i] * x[i];
            float slx = sumlx - w * x[i] * L[i];
            if (slx > 0.f) {
                float sl2 = suml2 - w * (float)L[i] * L[i];
                int new_l = nearest_int(x[i] * sl2 / slx);
                new_l = new_l < -nmax ? -nmax : (new_l > nmax - 1 ? nmax - 1 : new_l);
                if (new_l != L[i]) {
                    slx += w * x[i] * new_l;
                    sl2 += w * (float)new_l * new_l;
                    if (sl2 > 0.f && slx * slx * suml2 > sumlx * sumlx * sl2) {
                        L[i] = (int8_t)new_l;
                        sumlx = slx;
                        suml2 = sl2;
                        ++n_changed;
                    }
                }
            }
        }
        if (!n_changed) break;
    }
    for (int i = 0; i < n; ++i) L[i] = (int8_t)(L[i] + nmax);
    return suml2 != 0.f ? sumlx / suml2 : 0.f;
}

// get_scale_min_k4 packing and its inverse (Q4_K/Q5_K 6-bit scales/mins)
static void pack_scales_k4(const uint8_t* ls, const uint8_t* lm, uint8_t* sc) {
    for (int j = 0; j < 12; ++j) sc[j] = 0;
    for (int j = 0; j < 4; ++j) { sc[j] = ls[j]; sc[j + 4] = lm[j]; }
    for (int j = 4; j < 8; ++j) {
        sc[j + 4] = (uint8_t)((ls[j] & 0xF) | ((lm[j] & 0xF) << 4));
        sc[j - 4] |= (uint8_t)((ls[j] >> 4) << 6);
        sc[j] |= (uint8_t)((lm[j] >> 4) << 6);
    }
}

static void unpack_scale_min_k4(int j, const uint8_t* q, uint8_t* d, uint8_t* m) {
    if (j < 4) {
        *d = q[j] & 63;
        *m = q[j + 4] & 63;
    } else {
        *d = (uint8_t)((q[j + 4] & 0xF) | ((q[j - 4] >> 6) << 4));
        *m = (uint8_t)((q[j + 4] >> 4) | ((q[j] >> 6) << 4));
    }
}

static void quant_sb_q4_k(const float* x, uint8_t* out) {
    uint8_t L[256];
    float scales[8], mins[8], weights[32];
    for (int j = 0; j < 8; ++j) {
        float sum2 = 0.f;
        for (int l = 0; l < 32; ++l) sum2 += x[32 * j + l] * x[32 * j + l];
        float av_x = std::sqrt(sum2 / 32.f);
        for (int l = 0; l < 32; ++l) weights[l] = av_x + std::fabs(x[32 * j + l]);
        scales[j] = make_qkx2_quants(32, 15, x + 32 * j, weights, L + 32 * j,
                                     &mins[j], -1.f, 0.1f, 20, false);
    }
    float max_scale = 0.f, max_min = 0.f;
    for (int j = 0; j < 8; ++j) {
        if (scales[j] > max_scale) max_scale = scales[j];
        if (mins[j] > max_min) max_min = mins[j];
    }
    float inv_scale = max_scale > 0.f ? 63.f / max_scale : 0.f;
    float inv_min = max_min > 0.f ? 63.f / max_min : 0.f;
    uint8_t ls[8], lm[8];
    for (int j = 0; j < 8; ++j) {
        int s = nearest_int(inv_scale * scales[j]); ls[j] = (uint8_t)(s > 63 ? 63 : s);
        int m = nearest_int(inv_min * mins[j]); lm[j] = (uint8_t)(m > 63 ? 63 : m);
    }
    uint16_t d16 = f32_to_f16(max_scale / 63.f);
    uint16_t dmin16 = f32_to_f16(max_min / 63.f);
    std::memcpy(out, &d16, 2);
    std::memcpy(out + 2, &dmin16, 2);
    pack_scales_k4(ls, lm, out + 4);
    // re-quantize against the fp16-rounded effective scales
    for (int j = 0; j < 8; ++j) {
        uint8_t sc, mn;
        unpack_scale_min_k4(j, out + 4, &sc, &mn);
        float d_eff = f16_to_f32(d16) * sc;
        if (d_eff == 0.f) continue;          // keep grid L
        float m_eff = f16_to_f32(dmin16) * mn;
        for (int l = 0; l < 32; ++l) {
            int li = nearest_int((x[32 * j + l] + m_eff) / d_eff);
            li = li < 0 ? 0 : (li > 15 ? 15 : li);
            L[32 * j + l] = (uint8_t)li;
        }
    }
    uint8_t* qs = out + 16;
    for (int c = 0; c < 4; ++c)
        for (int l = 0; l < 32; ++l)
            qs[32 * c + l] = (uint8_t)(L[64 * c + l] | (L[64 * c + 32 + l] << 4));
}

static void quant_sb_q5_k(const float* x, uint8_t* out) {
    uint8_t L[256];
    float scales[8], mins[8], weights[32];
    for (int j = 0; j < 8; ++j) {
        float sum2 = 0.f;
        for (int l = 0; l < 32; ++l) sum2 += x[32 * j + l] * x[32 * j + l];
        float av_x = std::sqrt(sum2 / 32.f);
        for (int l = 0; l < 32; ++l) weights[l] = av_x + std::fabs(x[32 * j + l]);
        scales[j] = make_qkx2_quants(32, 31, x + 32 * j, weights, L + 32 * j,
                                     &mins[j], -0.5f, 0.1f, 15, false);
    }
    float max_scale = 0.f, max_min = 0.f;
    for (int j = 0; j < 8; ++j) {
        if (scales[j] > max_scale) max_scale = scales[j];
        if (mins[j] > max_min) max_min = mins[j];
    }
    float inv_scale = max_scale > 0.f ? 63.f / max_scale : 0.f;
    float inv_min = max_min > 0.f ? 63.f / max_min : 0.f;
    uint8_t ls[8], lm[8];
    for (int j = 0; j < 8; ++j) {
        int s = nearest_int(inv_scale * scales[j]); ls[j] = (uint8_t)(s > 63 ? 63 : s);
        int m = nearest_int(inv_min * mins[j]); lm[j] = (uint8_t)(m > 63 ? 63 : m);
    }
    uint16_t d16 = f32_to_f16(max_scale / 63.f);
    uint16_t dmin16 = f32_to_f16(max_min / 63.f);
    std::memcpy(out, &d16, 2);
    std::memcpy(out + 2, &dmin16, 2);
    pack_scales_k4(ls, lm, out + 4);
    for (int j = 0; j < 8; ++j) {
        uint8_t sc, mn;
        unpack_scale_min_k4(j, out + 4, &sc, &mn);
        float d_eff = f16_to_f32(d16) * sc;
        if (d_eff == 0.f) continue;
        float m_eff = f16_to_f32(dmin16) * mn;
        for (int l = 0; l < 32; ++l) {
            int li = nearest_int((x[32 * j + l] + m_eff) / d_eff);
            li = li < 0 ? 0 : (li > 31 ? 31 : li);
            L[32 * j + l] = (uint8_t)li;
        }
    }
    uint8_t* qh = out + 16;
    uint8_t* qs = out + 48;
    std::memset(qh, 0, 32);
    for (int c = 0; c < 4; ++c)
        for (int l = 0; l < 32; ++l) {
            uint8_t lo = L[64 * c + l], hi = L[64 * c + 32 + l];
            qs[32 * c + l] = (uint8_t)((lo & 0xF) | ((hi & 0xF) << 4));
            qh[l] |= (uint8_t)(((lo >> 4) & 1) << (2 * c));
            qh[l] |= (uint8_t)(((hi >> 4) & 1) << (2 * c + 1));
        }
}

static void quant_sb_q6_k(const float* x, uint8_t* out) {
    int8_t L[256];
    float scales[16];
    for (int j = 0; j < 16; ++j)
        scales[j] = make_qx_quants(16, 32, x + 16 * j, L + 16 * j);
    float max_scale = 0.f, max_abs = 0.f;
    for (int j = 0; j < 16; ++j) {
        float a = std::fabs(scales[j]);
        if (a > max_abs) { max_abs = a; max_scale = scales[j]; }
    }
    if (max_abs < KQ_GROUP_MAX_EPS) {
        std::memset(out, 0, 210);
        return;
    }
    float iscale = -128.f / max_scale;
    uint16_t d16 = f32_to_f16(1.0f / iscale);
    int8_t* q_scales = (int8_t*)(out + 192);
    for (int j = 0; j < 16; ++j) {
        int s = nearest_int(iscale * scales[j]);
        q_scales[j] = (int8_t)(s > 127 ? 127 : s);
    }
    std::memcpy(out + 208, &d16, 2);
    for (int j = 0; j < 16; ++j) {
        float d_eff = f16_to_f32(d16) * q_scales[j];
        if (d_eff == 0.f) continue;          // keep grid L (already biased below)
        for (int l = 0; l < 16; ++l) {
            int li = nearest_int(x[16 * j + l] / d_eff);
            li = li < -32 ? -32 : (li > 31 ? 31 : li);
            L[16 * j + l] = (int8_t)(li + 32);
        }
    }
    uint8_t* ql = out;
    uint8_t* qh = out + 128;
    for (int c = 0; c < 2; ++c) {
        const uint8_t* Lc = (const uint8_t*)L + 128 * c;
        for (int l = 0; l < 32; ++l) {
            ql[64 * c + l] = (uint8_t)((Lc[l] & 0xF) | ((Lc[64 + l] & 0xF) << 4));
            ql[64 * c + 32 + l] = (uint8_t)((Lc[32 + l] & 0xF) | ((Lc[96 + l] & 0xF) << 4));
            qh[32 * c + l] = (uint8_t)((Lc[l] >> 4) | ((Lc[32 + l] >> 4) << 2) |
                                       ((Lc[64 + l] >> 4) << 4) | ((Lc[96 + l] >> 4) << 6));
        }
    }
}

static void quant_sb_q2_k(const float* x, uint8_t* out) {
    uint8_t L[256];
    float scales[16], mins[16], weights[16];
    for (int j = 0; j < 16; ++j) {
        for (int l = 0; l < 16; ++l) weights[l] = std::fabs(x[16 * j + l]);
        scales[j] = make_qkx2_quants(16, 3, x + 16 * j, weights, L + 16 * j,
                                     &mins[j], -0.5f, 0.1f, 15, true);
    }
    float max_scale = 0.f, max_min = 0.f;
    for (int j = 0; j < 16; ++j) {
        if (scales[j] > max_scale) max_scale = scales[j];
        if (mins[j] > max_min) max_min = mins[j];
    }
    uint8_t* sc_q = out;
    std::memset(sc_q, 0, 16);
    uint16_t d16 = 0, dmin16 = 0;
    if (max_scale > 0.f) {
        float isc = 15.f / max_scale;
        for (int j = 0; j < 16; ++j) sc_q[j] = (uint8_t)nearest_int(isc * scales[j]);
        d16 = f32_to_f16(max_scale / 15.f);
    }
    if (max_min > 0.f) {
        float imn = 15.f / max_min;
        for (int j = 0; j < 16; ++j)
            sc_q[j] |= (uint8_t)(nearest_int(imn * mins[j]) << 4);
        dmin16 = f32_to_f16(max_min / 15.f);
    }
    std::memcpy(out + 80, &d16, 2);
    std::memcpy(out + 82, &dmin16, 2);
    for (int j = 0; j < 16; ++j) {
        float d_eff = f16_to_f32(d16) * (sc_q[j] & 0xF);
        if (d_eff == 0.f) continue;
        float m_eff = f16_to_f32(dmin16) * (sc_q[j] >> 4);
        for (int l = 0; l < 16; ++l) {
            int li = nearest_int((x[16 * j + l] + m_eff) / d_eff);
            li = li < 0 ? 0 : (li > 3 ? 3 : li);
            L[16 * j + l] = (uint8_t)li;
        }
    }
    uint8_t* qs = out + 16;
    for (int c = 0; c < 2; ++c)
        for (int l = 0; l < 32; ++l)
            qs[32 * c + l] = (uint8_t)(L[128 * c + l] | (L[128 * c + 32 + l] << 2) |
                                       (L[128 * c + 64 + l] << 4) | (L[128 * c + 96 + l] << 6));
}

static void quant_sb_q3_k(const float* x, uint8_t* out) {
    int8_t L[256];
    float scales[16];
    for (int j = 0; j < 16; ++j)
        scales[j] = make_q3_quants(16, 4, x + 16 * j, L + 16 * j);
    float max_scale = 0.f, max_abs = 0.f;
    for (int j = 0; j < 16; ++j) {
        float a = std::fabs(scales[j]);
        if (a > max_abs) { max_abs = a; max_scale = scales[j]; }
    }
    uint8_t* packed = out + 96;
    std::memset(packed, 0, 12);
    uint16_t d16 = 0;
    if (max_scale != 0.f) {
        float iscale = -32.f / max_scale;
        uint8_t ls[16];
        for (int j = 0; j < 16; ++j) {
            int s = nearest_int(iscale * scales[j]);
            s = s < -32 ? -32 : (s > 31 ? 31 : s);
            ls[j] = (uint8_t)(s + 32);
        }
        for (int j = 0; j < 8; ++j) packed[j] = ls[j] & 0xF;
        for (int j = 8; j < 16; ++j) packed[j - 8] |= (uint8_t)((ls[j] & 0xF) << 4);
        for (int j = 0; j < 16; ++j)
            packed[8 + j % 4] |= (uint8_t)((ls[j] >> 4) << (2 * (j / 4)));
        d16 = f32_to_f16(1.0f / iscale);
    }
    std::memcpy(out + 108, &d16, 2);
    for (int j = 0; j < 16; ++j) {
        int sc;
        if (j < 8) sc = packed[j] & 0xF;
        else sc = packed[j - 8] >> 4;
        sc = (sc | (((packed[8 + j % 4] >> (2 * (j / 4))) & 3) << 4)) - 32;
        float d_eff = f16_to_f32(d16) * sc;
        if (d_eff == 0.f) continue;          // keep grid codes (already +4)
        for (int l = 0; l < 16; ++l) {
            int li = nearest_int(x[16 * j + l] / d_eff);
            li = li < -4 ? -4 : (li > 3 ? 3 : li);
            L[16 * j + l] = (int8_t)(li + 4);
        }
    }
    uint8_t* hmask = out;
    std::memset(hmask, 0, 32);
    for (int i = 0; i < 256; ++i) {
        if (L[i] > 3) {
            hmask[i % 32] |= (uint8_t)(1 << (i / 32));
            L[i] = (int8_t)(L[i] - 4);
        }
    }
    uint8_t* qs = out + 32;
    for (int c = 0; c < 2; ++c)
        for (int l = 0; l < 32; ++l)
            qs[32 * c + l] = (uint8_t)(L[128 * c + l] | (L[128 * c + 32 + l] << 2) |
                                       (L[128 * c + 64 + l] << 4) | (L[128 * c + 96 + l] << 6));
}

static void quant_sb_q8_k(const float* x, uint8_t* out) {
    float mx = 0.f, amax = 0.f;
    for (int i = 0; i < 256; ++i) {
        float ax = std::fabs(x[i]);
        if (ax > amax) { amax = ax; mx = x[i]; }
    }
    if (amax == 0.f) {
        std::memset(out, 0, 292);
        return;
    }
    float iscale = -128.f / mx;
    int8_t* q = (int8_t*)(out + 4);
    for (int i = 0; i < 256; ++i) {
        int v = nearest_int(iscale * x[i]);
        q[i] = (int8_t)(v > 127 ? 127 : v);
    }
    int16_t* bsums = (int16_t*)(out + 260);
    for (int j = 0; j < 16; ++j) {
        int s = 0;
        for (int l = 0; l < 16; ++l) s += q[16 * j + l];
        bsums[j] = (int16_t)s;
    }
    float d = 1.0f / iscale;
    std::memcpy(out, &d, 4);
}

static void quant_rows(uint32_t dtype, const float* x, uint8_t* out, int64_t n_blocks, int threads) {
    void (*fn)(const float*, uint8_t*) = nullptr;
    int bb = kTypes[dtype].block_bytes;
    int be = kTypes[dtype].block_elems;
    switch (dtype) {
        case 2: fn = quant_block_q4_0; break;
        case 3: fn = quant_block_q4_1; break;
        case 7: fn = quant_block_q5_0; break;
        case 8: fn = quant_block_q5_1; break;
        case 9: fn = quant_block_q8_0; break;
        case 11: fn = quant_sb_q2_k; break;
        case 12: fn = quant_sb_q3_k; break;
        case 13: fn = quant_sb_q4_k; break;
        case 14: fn = quant_sb_q5_k; break;
        case 15: fn = quant_sb_q6_k; break;
        case 16: fn = quant_sb_q8_k; break;
        default: return;
    }
    parallel_for(n_blocks, threads, [&](int64_t lo, int64_t hi) {
        for (int64_t b = lo; b < hi; b++) fn(x + b * be, out + b * bb);
    });
}

}  // namespace

// ============================ C API ============================

RN_API const char* rn_last_error() { return g_error.c_str(); }

RN_API void* rn_open(const char* path) {
    Model* m = new Model();
    m->fd = open(path, O_RDONLY);
    if (m->fd < 0) { g_error = std::string("open failed: ") + path; delete m; return nullptr; }
    struct stat st;
    if (fstat(m->fd, &st) != 0) { g_error = "fstat failed"; close(m->fd); delete m; return nullptr; }
    m->map_size = (size_t)st.st_size;
    m->map = (const uint8_t*)mmap(nullptr, m->map_size, PROT_READ, MAP_PRIVATE, m->fd, 0);
    if (m->map == MAP_FAILED) { g_error = "mmap failed"; close(m->fd); delete m; return nullptr; }
    if (m->map_size < 24) { g_error = "truncated header"; munmap((void*)m->map, m->map_size); close(m->fd); delete m; return nullptr; }
    std::memcpy(m->header, m->map, 24);
    if (m->header[0] != kMagic) { g_error = "bad magic"; munmap((void*)m->map, m->map_size); close(m->fd); delete m; return nullptr; }
    if (m->header[1] < 100 || m->header[1] > 101) { g_error = "unsupported file version"; munmap((void*)m->map, m->map_size); close(m->fd); delete m; return nullptr; }

    size_t off = 24;
    while (off < m->map_size) {
        if (off + 12 > m->map_size) { g_error = "truncated tensor header"; break; }
        uint32_t hd[3];
        std::memcpy(hd, m->map + off, 12);
        off += 12;
        uint32_t dim_count = hd[0], key_len = hd[1], dtype = hd[2];
        if (dim_count < 1 || dim_count > 3 || dtype >= (uint32_t)kTypeCount || !kTypes[dtype].decodable) {
            g_error = "invalid tensor header"; break;
        }
        Tensor t;
        t.dtype = dtype;
        t.dim_count = dim_count;
        t.dims[0] = t.dims[1] = t.dims[2] = 1;
        if (off + 4 * dim_count + key_len > m->map_size) { g_error = "truncated tensor dims"; break; }
        std::memcpy(t.dims, m->map + off, 4 * dim_count);
        off += 4 * dim_count;
        t.name.assign((const char*)(m->map + off), key_len);
        off += key_len;
        t.n_elements = (int64_t)t.dims[0] * t.dims[1] * t.dims[2];
        t.nbytes = tensor_nbytes(dtype, t.n_elements);
        if (t.nbytes < 0 || off + (size_t)t.nbytes > m->map_size) { g_error = "truncated tensor data"; break; }
        t.data = m->map + off;
        off += (size_t)t.nbytes;
        m->tensors.push_back(std::move(t));
    }
    if (off != m->map_size) {
        munmap((void*)m->map, m->map_size); close(m->fd); delete m; return nullptr;
    }
    return m;
}

RN_API void rn_close(void* h) {
    Model* m = (Model*)h;
    if (!m) return;
    if (m->map) munmap((void*)m->map, m->map_size);
    if (m->fd >= 0) close(m->fd);
    delete m;
}

RN_API void rn_header(void* h, uint32_t* out6) { std::memcpy(out6, ((Model*)h)->header, 24); }
RN_API int64_t rn_tensor_count(void* h) { return (int64_t)((Model*)h)->tensors.size(); }
RN_API const char* rn_tensor_name(void* h, int64_t i) { return ((Model*)h)->tensors[(size_t)i].name.c_str(); }
RN_API uint32_t rn_tensor_dtype(void* h, int64_t i) { return ((Model*)h)->tensors[(size_t)i].dtype; }
RN_API uint32_t rn_tensor_dim_count(void* h, int64_t i) { return ((Model*)h)->tensors[(size_t)i].dim_count; }
RN_API void rn_tensor_dims(void* h, int64_t i, uint32_t* out3) { std::memcpy(out3, ((Model*)h)->tensors[(size_t)i].dims, 12); }
RN_API int64_t rn_tensor_nbytes(void* h, int64_t i) { return ((Model*)h)->tensors[(size_t)i].nbytes; }
RN_API int64_t rn_tensor_elements(void* h, int64_t i) { return ((Model*)h)->tensors[(size_t)i].n_elements; }
RN_API const void* rn_tensor_raw(void* h, int64_t i) { return ((Model*)h)->tensors[(size_t)i].data; }

// Dequantize tensor i to float32 (row-major), multithreaded.
RN_API int rn_tensor_f32(void* h, int64_t i, float* out, int threads) {
    Model* m = (Model*)h;
    const Tensor& t = m->tensors[(size_t)i];
    if (threads <= 0) threads = n_threads_default();
    if (t.dtype == 0) {
        std::memcpy(out, t.data, (size_t)t.n_elements * 4);
        return 0;
    }
    if (t.dtype == 1) {
        const uint16_t* src = (const uint16_t*)t.data;
        parallel_for(t.n_elements, threads, [&](int64_t lo, int64_t hi) {
            for (int64_t j = lo; j < hi; j++) out[j] = f16_to_f32(src[j]);
        });
        return 0;
    }
    int bb = kTypes[t.dtype].block_bytes;
    int be = kTypes[t.dtype].block_elems;
    int64_t n_blocks = t.n_elements / be;
    if (be == 256) {
        parallel_for(n_blocks, threads, [&](int64_t lo, int64_t hi) {
            dequant_kquant(t.dtype, t.data + lo * bb, out + lo * 256, hi - lo);
        });
        return 0;
    }
    parallel_for(n_blocks, threads, [&](int64_t lo, int64_t hi) {
        dequant_blocks(t.dtype, t.data + lo * bb, out + lo * QK, hi - lo);
    });
    return 0;
}

// Decode quantized tensor i to (int8 codes, f32 scales, f32 mins) qmm layout.
RN_API int rn_tensor_codes(void* h, int64_t i, int8_t* q, float* d, float* mn, int threads) {
    Model* m = (Model*)h;
    const Tensor& t = m->tensors[(size_t)i];
    if (t.dtype < 2) { g_error = "not a quantized tensor"; return -1; }
    if (threads <= 0) threads = n_threads_default();
    int bb = kTypes[t.dtype].block_bytes;
    int be = kTypes[t.dtype].block_elems;
    if (be == 256) {
        int group = kTypes[t.dtype].group;
        int n_groups = 256 / group;
        int64_t n_sb = t.n_elements / 256;
        bool with_min = kquant_has_min(t.dtype);
        if (with_min && !mn) { g_error = "format needs a mins buffer"; return -1; }
        parallel_for(n_sb, threads, [&](int64_t lo, int64_t hi) {
            float m_tmp[16];
            for (int64_t b = lo; b < hi; b++) {
                kquant_decode_sb(t.dtype, t.data + b * bb, q + b * 256,
                                 d + b * n_groups, mn ? mn + b * n_groups : m_tmp);
            }
        });
        return 0;
    }
    int64_t n_blocks = t.n_elements / QK;
    parallel_for(n_blocks, threads, [&](int64_t lo, int64_t hi) {
        decode_codes_blocks(t.dtype, t.data + lo * bb, q + lo * QK, d + lo,
                            mn ? mn + lo : nullptr, hi - lo);
    });
    return 0;
}

// Quantize an f32 buffer into `fmt` blocks (bit-exact with ggml).
RN_API int64_t rn_quantize(const float* x, int64_t n, uint32_t dtype, uint8_t* out, int threads) {
    if (dtype >= (uint32_t)kTypeCount || kTypes[dtype].block_bytes == 0) { g_error = "bad quant dtype"; return -1; }
    int be = kTypes[dtype].block_elems;
    if (n % be) { g_error = "element count not divisible by block size"; return -1; }
    if (threads <= 0) threads = n_threads_default();
    quant_rows(dtype, x, out, n / be, threads);
    return (n / be) * kTypes[dtype].block_bytes;
}

RN_API int rn_block_bytes(uint32_t dtype) {
    return dtype < (uint32_t)kTypeCount ? kTypes[dtype].block_bytes : -1;
}

// Elements per scale group in the rn_tensor_codes layout (32 legacy,
// 32 for Q4_K/Q5_K/Q8_K, 16 for Q2_K/Q3_K/Q6_K).
RN_API int rn_group_size(uint32_t dtype) {
    return dtype < (uint32_t)kTypeCount ? kTypes[dtype].group : -1;
}
