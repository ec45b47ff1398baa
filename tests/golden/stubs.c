#include <stdio.h>
#include <stdlib.h>
#include <stdint.h>
void ggml_abort(const char* file, int line, const char* fmt, ...) { exit(9); }
// fp16 conversion table used by GGML_FP16_TO_FP32 fallback
float ggml_table_f32_f16[1 << 16];
__attribute__((constructor)) static void init_table(void) {
    for (uint32_t h = 0; h < (1u << 16); ++h) {
        uint32_t sign = (h & 0x8000u) << 16;
        uint32_t exp = (h >> 10) & 0x1F, mant = h & 0x3FF, bits;
        if (exp == 0) {
            if (mant == 0) bits = sign;
            else { int e = -1; do { mant <<= 1; e++; } while (!(mant & 0x400));
                   mant &= 0x3FF; bits = sign | ((127u - 15 - e) << 23) | (mant << 13); }
        } else if (exp == 31) bits = sign | 0x7F800000u | (mant << 13);
        else bits = sign | ((exp - 15 + 127u) << 23) | (mant << 13);
        float f; __builtin_memcpy(&f, &bits, 4);
        ggml_table_f32_f16[h] = f;
    }
}
// minimal stand-ins for ggml core symbols referenced by unused quantize paths
size_t ggml_row_size(int type, int64_t ne) {
    if (type == 2) return (ne / 32) * 18;  // GGML_TYPE_Q4_0 (imatrix harness)
    exit(8);
}
size_t ggml_type_size(int type) { exit(8); }
int64_t ggml_blck_size(int type) { exit(8); }
const char* ggml_type_name(int type) { return "?"; }
