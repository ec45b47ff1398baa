// Native GGUF → QTensor repack kernels.
//
// The Python loader repacks GGUF block formats (reference layouts:
// /root/reference/cpp/ggml/src/ggml-common.h) into booster-tpu's planar
// device format: split-half nibble-packed int4 (byte j = elem j | elem
// (j + K/2) << 4) or int8, plus f32 group scales/mins.  For multi-GB
// checkpoints the vectorized-numpy path is allocation-heavy; these C++
// kernels do it in one pass, parallelized over rows.
//
// Exposed via a C ABI consumed with ctypes (booster_tpu/quant/native.py).
// Build: make -C csrc   (produces libbooster_repack.so)

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline float half_to_float(uint16_t h) {
    uint32_t sign = (uint32_t)(h & 0x8000) << 16;
    uint32_t exp = (h >> 10) & 0x1F;
    uint32_t mant = h & 0x3FF;
    uint32_t bits;
    if (exp == 0) {
        if (mant == 0) {
            bits = sign;
        } else {  // subnormal: normalize
            int e = -1;
            do {
                mant <<= 1;
                e++;
            } while (!(mant & 0x400));
            mant &= 0x3FF;
            bits = sign | ((127 - 15 - e) << 23) | (mant << 13);
        }
    } else if (exp == 31) {
        bits = sign | 0x7F800000 | (mant << 13);
    } else {
        bits = sign | ((exp - 15 + 127) << 23) | (mant << 13);
    }
    float out;
    std::memcpy(&out, &bits, sizeof(out));
    return out;
}

inline void get_scale_min_k4(int j, const uint8_t* q, uint8_t* d, uint8_t* m) {
    if (j < 4) {
        *d = q[j] & 63;
        *m = q[j + 4] & 63;
    } else {
        *d = (q[j + 4] & 0xF) | ((q[j - 4] >> 6) << 4);
        *m = (q[j + 4] >> 4) | ((q[j] >> 6) << 4);
    }
}

// pack a row of in_f 4-bit codes (one byte each in tmp) into in_f/2 bytes
inline void pack_split_half(const uint8_t* tmp, uint8_t* out, int64_t in_f) {
    const int64_t half = in_f / 2;
    for (int64_t j = 0; j < half; ++j) {
        out[j] = (uint8_t)(tmp[j] | (tmp[j + half] << 4));
    }
}

template <class F>
void parallel_rows(int64_t rows, int n_threads, F fn) {
    if (n_threads <= 1) {
        fn((int64_t)0, rows);
        return;
    }
    std::vector<std::thread> ts;
    int64_t per = (rows + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
        int64_t lo = t * per;
        int64_t hi = lo + per < rows ? lo + per : rows;
        if (lo >= hi) break;
        ts.emplace_back([=] { fn(lo, hi); });
    }
    for (auto& th : ts) th.join();
}

}  // namespace

extern "C" {

// Q4_0: 18-byte blocks of 32.  Outputs: qw [rows, in_f/2] (codes 0..15,
// zero-point 8 handled by the caller), scales [rows, in_f/32].
int bt_repack_q4_0(const uint8_t* raw, int64_t rows, int64_t in_f,
                   uint8_t* qw, float* scales, int n_threads) {
    const int64_t bpr = in_f / 32;  // blocks per row
    parallel_rows(rows, n_threads, [=](int64_t lo, int64_t hi) {
        std::vector<uint8_t> tmp(in_f);
        for (int64_t r = lo; r < hi; ++r) {
            const uint8_t* row = raw + r * bpr * 18;
            for (int64_t b = 0; b < bpr; ++b) {
                const uint8_t* blk = row + b * 18;
                uint16_t d16;
                std::memcpy(&d16, blk, 2);
                scales[r * bpr + b] = half_to_float(d16);
                const uint8_t* qs = blk + 2;
                uint8_t* t = tmp.data() + b * 32;
                for (int j = 0; j < 16; ++j) {
                    t[j] = qs[j] & 0xF;
                    t[j + 16] = qs[j] >> 4;
                }
            }
            pack_split_half(tmp.data(), qw + r * (in_f / 2), in_f);
        }
    });
    return 0;
}

// Q8_0: 34-byte blocks of 32.  Outputs: qw int8 [rows, in_f], scales
// [rows, in_f/32].
int bt_repack_q8_0(const uint8_t* raw, int64_t rows, int64_t in_f,
                   int8_t* qw, float* scales, int n_threads) {
    const int64_t bpr = in_f / 32;
    parallel_rows(rows, n_threads, [=](int64_t lo, int64_t hi) {
        for (int64_t r = lo; r < hi; ++r) {
            const uint8_t* row = raw + r * bpr * 34;
            for (int64_t b = 0; b < bpr; ++b) {
                const uint8_t* blk = row + b * 34;
                uint16_t d16;
                std::memcpy(&d16, blk, 2);
                scales[r * bpr + b] = half_to_float(d16);
                std::memcpy(qw + r * in_f + b * 32, blk + 2, 32);
            }
        }
    });
    return 0;
}

// Q4_K: 144-byte super-blocks of 256.  Outputs: qw [rows, in_f/2] nibble
// codes, scales/mins f32 [rows, in_f/32].
int bt_repack_q4_k(const uint8_t* raw, int64_t rows, int64_t in_f,
                   uint8_t* qw, float* scales, float* mins, int n_threads) {
    const int64_t bpr = in_f / 256;
    const int64_t gpr = in_f / 32;  // scale groups per row
    parallel_rows(rows, n_threads, [=](int64_t lo, int64_t hi) {
        std::vector<uint8_t> tmp(in_f);
        for (int64_t r = lo; r < hi; ++r) {
            const uint8_t* row = raw + r * bpr * 144;
            for (int64_t b = 0; b < bpr; ++b) {
                const uint8_t* blk = row + b * 144;
                uint16_t d16, m16;
                std::memcpy(&d16, blk, 2);
                std::memcpy(&m16, blk + 2, 2);
                float d = half_to_float(d16);
                float dmin = half_to_float(m16);
                const uint8_t* sc = blk + 4;
                const uint8_t* qs = blk + 16;
                uint8_t* t = tmp.data() + b * 256;
                for (int j = 0; j < 4; ++j) {  // 4 chunks of 64
                    uint8_t s1, m1, s2, m2;
                    get_scale_min_k4(2 * j, sc, &s1, &m1);
                    get_scale_min_k4(2 * j + 1, sc, &s2, &m2);
                    int64_t g = r * gpr + b * 8 + 2 * j;
                    scales[g] = d * s1;
                    mins[g] = dmin * m1;
                    scales[g + 1] = d * s2;
                    mins[g + 1] = dmin * m2;
                    const uint8_t* q = qs + 32 * j;
                    for (int l = 0; l < 32; ++l) {
                        t[64 * j + l] = q[l] & 0xF;
                        t[64 * j + 32 + l] = q[l] >> 4;
                    }
                }
            }
            pack_split_half(tmp.data(), qw + r * (in_f / 2), in_f);
        }
    });
    return 0;
}

// Q6_K: 210-byte super-blocks of 256.  Outputs: qw int8 [rows, in_f]
// (values q-32), scales f32 [rows, in_f/16].
int bt_repack_q6_k(const uint8_t* raw, int64_t rows, int64_t in_f,
                   int8_t* qw, float* scales, int n_threads) {
    const int64_t bpr = in_f / 256;
    const int64_t gpr = in_f / 16;
    parallel_rows(rows, n_threads, [=](int64_t lo, int64_t hi) {
        for (int64_t r = lo; r < hi; ++r) {
            const uint8_t* row = raw + r * bpr * 210;
            for (int64_t b = 0; b < bpr; ++b) {
                const uint8_t* blk = row + b * 210;
                const uint8_t* ql = blk;
                const uint8_t* qh = blk + 128;
                const int8_t* sc = (const int8_t*)(blk + 192);
                uint16_t d16;
                std::memcpy(&d16, blk + 208, 2);
                float d = half_to_float(d16);
                int8_t* out = qw + r * in_f + b * 256;
                for (int h = 0; h < 2; ++h) {  // two 128-element halves
                    const uint8_t* qlh = ql + 64 * h;
                    const uint8_t* qhh = qh + 32 * h;
                    const int8_t* sch = sc + 8 * h;
                    int8_t* o = out + 128 * h;
                    for (int l = 0; l < 32; ++l) {
                        o[l] = (int8_t)(((qlh[l] & 0xF) | (((qhh[l] >> 0) & 3) << 4)) - 32);
                        o[l + 32] = (int8_t)(((qlh[l + 32] & 0xF) | (((qhh[l] >> 2) & 3) << 4)) - 32);
                        o[l + 64] = (int8_t)(((qlh[l] >> 4) | (((qhh[l] >> 4) & 3) << 4)) - 32);
                        o[l + 96] = (int8_t)(((qlh[l + 32] >> 4) | (((qhh[l] >> 6) & 3) << 4)) - 32);
                    }
                    int64_t g = r * gpr + b * 16 + 8 * h;
                    for (int s = 0; s < 8; ++s) scales[g + s] = d * sch[s];
                }
            }
        }
    });
    return 0;
}

// Q5_K: 176-byte super-blocks of 256.  Outputs: qw int8 [rows, in_f]
// (codes 0..31), scales/mins f32 [rows, in_f/32].
int bt_repack_q5_k(const uint8_t* raw, int64_t rows, int64_t in_f,
                   int8_t* qw, float* scales, float* mins, int n_threads) {
    const int64_t bpr = in_f / 256;
    const int64_t gpr = in_f / 32;
    parallel_rows(rows, n_threads, [=](int64_t lo, int64_t hi) {
        for (int64_t r = lo; r < hi; ++r) {
            const uint8_t* row = raw + r * bpr * 176;
            for (int64_t b = 0; b < bpr; ++b) {
                const uint8_t* blk = row + b * 176;
                uint16_t d16, m16;
                std::memcpy(&d16, blk, 2);
                std::memcpy(&m16, blk + 2, 2);
                float d = half_to_float(d16);
                float dmin = half_to_float(m16);
                const uint8_t* sc = blk + 4;
                const uint8_t* qh = blk + 16;
                const uint8_t* qs = blk + 48;
                int8_t* out = qw + r * in_f + b * 256;
                for (int j = 0; j < 4; ++j) {
                    uint8_t s1, m1, s2, m2;
                    get_scale_min_k4(2 * j, sc, &s1, &m1);
                    get_scale_min_k4(2 * j + 1, sc, &s2, &m2);
                    int64_t g = r * gpr + b * 8 + 2 * j;
                    scales[g] = d * s1;
                    mins[g] = dmin * m1;
                    scales[g + 1] = d * s2;
                    mins[g + 1] = dmin * m2;
                    uint8_t u1 = 1 << (2 * j), u2 = 2 << (2 * j);
                    const uint8_t* q = qs + 32 * j;
                    for (int l = 0; l < 32; ++l) {
                        out[64 * j + l] = (int8_t)((q[l] & 0xF) + ((qh[l] & u1) ? 16 : 0));
                        out[64 * j + 32 + l] = (int8_t)((q[l] >> 4) + ((qh[l] & u2) ? 16 : 0));
                    }
                }
            }
        }
    });
    return 0;
}

}  // extern "C"
