/* Deterministic f32 sin/cos/exp - C twin of pwnfps_tpu/core/detmath.py.
 *
 * Same constants (bit patterns), same f32 op order.  MUST be compiled
 * WITHOUT fast-math and WITHOUT fp contraction:
 *     gcc -O2 -fno-fast-math -ffp-contract=off -c detmath.c
 * Linked before -lm these definitions override libm's sinf/cosf/expf in
 * the pinned oracle build, making the compiled reference and the TPU
 * renderer share one transcendental implementation (the last source of
 * pixel divergence).
 */

#include <stdint.h>
#include <math.h>

static inline float u2f(uint32_t u) {
    union { uint32_t u; float f; } v;
    v.u = u;
    return v.f;
}

#define PIO2_HI  u2f(0x3FC90000u)
#define PIO2_MID u2f(0x39FDA000u)
#define PIO2_LO  u2f(0x33A22169u)
#define TWO_OVER_PI u2f(0x3F22F983u)

#define S1 (-1.6666667163e-01f)
#define S2 (8.3333337680e-03f)
#define S3 (-1.9841270114e-04f)
#define S4 (2.7557314297e-06f)
#define C1 (4.1666667908e-02f)
#define C2 (-1.3888889225e-03f)
#define C3 (2.4801587642e-05f)
#define C4 (-2.7557314297e-07f)

#define INV_LN2 u2f(0x3FB8AA3Bu)
#define LN2_HI  u2f(0x3F317000u)
#define LN2_LO  u2f(0x3805F000u)
#define LN2_LO2 u2f(0x325F473Eu)
#define E3 (0.16666667163581848f)
#define E4 (0.041666667908430099f)
#define E5 (0.0083333337679505348f)

static void reduce_pio2(float x, float *r_out, int32_t *n_out) {
    float j = floorf(x * TWO_OVER_PI + 0.5f);
    float r = x - j * PIO2_HI;
    r = r - j * PIO2_MID;
    r = r - j * PIO2_LO;
    *r_out = r;
    *n_out = ((int32_t)j) & 3;
}

static float kernel_sin(float r, float r2) {
    float p = S3 + r2 * S4;
    p = S2 + r2 * p;
    p = S1 + r2 * p;
    return r + (r * r2) * p;
}

static float kernel_cos(float r, float r2) {
    float p = C3 + r2 * C4;
    p = C2 + r2 * p;
    p = C1 + r2 * p;
    return (1.0f - r2 * 0.5f) + (r2 * r2) * p;
}

float sinf(float x) {
    float r;
    int32_t n;
    reduce_pio2(x, &r, &n);
    float r2 = r * r;
    float ks = kernel_sin(r, r2);
    float kc = kernel_cos(r, r2);
    switch (n) {
        case 0: return ks;
        case 1: return kc;
        case 2: return -ks;
        default: return -kc;
    }
}

float cosf(float x) {
    float r;
    int32_t n;
    reduce_pio2(x, &r, &n);
    float r2 = r * r;
    float ks = kernel_sin(r, r2);
    float kc = kernel_cos(r, r2);
    switch (n) {
        case 0: return kc;
        case 1: return -ks;
        case 2: return -kc;
        default: return ks;
    }
}

float expf(float x) {
    float k = floorf(x * INV_LN2 + 0.5f);
    float r = x - k * LN2_HI;
    r = r - k * LN2_LO;
    r = r - k * LN2_LO2;
    float p = E4 + r * E5;
    p = E3 + r * p;
    p = 0.5f + r * p;
    p = 1.0f + r * p;
    p = 1.0f + r * p;
    int32_t e = (int32_t)k + 127;
    if (e < 0) e = 0;
    if (e > 254) e = 254;
    float scale = u2f(((uint32_t)e) << 23);
    float out = p * scale;
    /* deterministic flush at the normal boundary (see detmath.py) */
    if (e <= 1) out = 0.0f;
    return out;
}
