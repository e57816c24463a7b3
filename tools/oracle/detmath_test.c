/* Dump detmath sinf/cosf/expf bits for cross-implementation testing.
 * usage: detmath_test <in.bin> <out.bin>
 *   in:  u32 n, n * f32 x
 *   out: n * { f32 sinf(x), f32 cosf(x), f32 expf(x) }
 */
#include <stdio.h>
#include <stdint.h>

float sinf(float);
float cosf(float);
float expf(float);

int main(int argc, char **argv) {
    if (argc < 3) return 64;
    FILE *fi = fopen(argv[1], "rb");
    FILE *fo = fopen(argv[2], "wb");
    if (!fi || !fo) return 1;
    uint32_t n;
    if (fread(&n, 4, 1, fi) != 1) return 1;
    for (uint32_t i = 0; i < n; i++) {
        float x, y[3];
        if (fread(&x, 4, 1, fi) != 1) return 1;
        y[0] = sinf(x);
        y[1] = cosf(x);
        y[2] = expf(x);
        fwrite(y, 4, 3, fo);
    }
    fclose(fi);
    fclose(fo);
    return 0;
}
