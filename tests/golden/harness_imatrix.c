// golden imatrix-quantization harness: reads (nrow, n_per_row) then f32 src
// and f32 quant_weights on stdin; writes quantize_q4_0 output bytes.
// Links the reference ggml-quants.c.
#include <stdio.h>
#include <stdlib.h>
#include "ggml.h"
#include "ggml-quants.h"

int main(void) {
    long nrow, nper;
    if (scanf("%ld %ld", &nrow, &nper) != 2) return 1;
    fgetc(stdin);
    float* src = malloc(nrow * nper * sizeof(float));
    float* qw = malloc(nper * sizeof(float));
    fread(src, sizeof(float), nrow * nper, stdin);
    fread(qw, sizeof(float), nper, stdin);
    long row_size = (nper / 32) * 18;  // block_q4_0: fp16 d + 16 bytes
    unsigned char* dst = malloc(nrow * row_size);
    quantize_q4_0(src, dst, nrow, nper, qw);
    fwrite(dst, 1, nrow * row_size, stdout);
    return 0;
}
