// minimal shims so ggml-quants.c links standalone as a test oracle
#include <stdio.h>
#include <stdlib.h>
#include <stdint.h>
#include <math.h>
float ggml_table_f32_f16[65536];
__attribute__((constructor)) static void init_table(void) {
    for (int i = 0; i < 65536; ++i) {
        uint16_t h = (uint16_t)i;
        uint32_t sign = (uint32_t)(h >> 15) << 31;
        uint32_t exp  = (h >> 10) & 0x1F;
        uint32_t man  = h & 0x3FF;
        uint32_t f;
        if (exp == 0) {
            if (man == 0) { f = sign; }
            else {
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
        union { uint32_t u; float fl; } u = { f };
        ggml_table_f32_f16[i] = u.fl;
    }
}
void ggml_abort(const char * file, int line, const char * fmt, ...) {
    fprintf(stderr, "ggml_abort %s:%d\n", file, line); abort();
}
const char * ggml_type_name(int t) { return "?"; }
// only used in asserts/validation paths we don't hit
int64_t ggml_row_size(int t, int64_t n) { return 0; }
int64_t ggml_type_size(int t) { return 0; }
