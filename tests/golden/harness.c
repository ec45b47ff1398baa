// golden dequantization harness: reads (type_id, n_bytes, raw) on stdin,
// writes dequantized f32 on stdout. Links the reference ggml-quants.c.
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "ggml.h"
#include "ggml-quants.h"

int main(void) {
    int type_id; long nbytes; long nelem;
    if (scanf("%d %ld %ld", &type_id, &nbytes, &nelem) != 3) return 1;
    fgetc(stdin);  // consume exactly the newline (scanf "\n" would eat
                   // whitespace-valued bytes of the binary payload)
    unsigned char* buf = malloc(nbytes);
    fread(buf, 1, nbytes, stdin);
    float* out = malloc(nelem * sizeof(float));
    switch (type_id) {
        case 2: dequantize_row_q4_0((void*)buf, out, nelem); break;
        case 3: dequantize_row_q4_1((void*)buf, out, nelem); break;
        case 6: dequantize_row_q5_0((void*)buf, out, nelem); break;
        case 7: dequantize_row_q5_1((void*)buf, out, nelem); break;
        case 8: dequantize_row_q8_0((void*)buf, out, nelem); break;
        case 10: dequantize_row_q2_K((void*)buf, out, nelem); break;
        case 11: dequantize_row_q3_K((void*)buf, out, nelem); break;
        case 12: dequantize_row_q4_K((void*)buf, out, nelem); break;
        case 13: dequantize_row_q5_K((void*)buf, out, nelem); break;
        case 14: dequantize_row_q6_K((void*)buf, out, nelem); break;
        case 16: dequantize_row_iq2_xxs((void*)buf, out, nelem); break;
        case 17: dequantize_row_iq2_xs((void*)buf, out, nelem); break;
        case 18: dequantize_row_iq3_xxs((void*)buf, out, nelem); break;
        case 19: dequantize_row_iq1_s((void*)buf, out, nelem); break;
        case 20: dequantize_row_iq4_nl((void*)buf, out, nelem); break;
        case 21: dequantize_row_iq3_s((void*)buf, out, nelem); break;
        case 22: dequantize_row_iq2_s((void*)buf, out, nelem); break;
        case 23: dequantize_row_iq4_xs((void*)buf, out, nelem); break;
        case 29: dequantize_row_iq1_m((void*)buf, out, nelem); break;
        default: return 2;
    }
    fwrite(out, sizeof(float), nelem, stdout);
    return 0;
}
