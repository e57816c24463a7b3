/* Headless parity oracle for the pwnfps reference engine.
 *
 * This file is original harness code; it compiles the *unmodified*
 * reference headers straight out of /root/reference (passed via -I) into a
 * windowless renderer used as the golden-image source for parity tests.
 * Nothing from the reference is copied into this repository.
 *
 * Modes:
 *   tables <out.bin>
 *       Extract this CPU's rsqrtps/rcpps behaviour as lookup tables and
 *       verify the (block granularity, power-of-two scaling) structure the
 *       TPU emulation relies on.
 *   rng <seed-hex> <n>
 *       Print n randfu()/randfs() draws as hex bit patterns (captures any
 *       -ffast-math codegen effect on util.h:8-16).
 *   render <level.txt> <state.bin> <out.bin>
 *       state.bin: u32 w, u32 h, u32 nframes, then per frame:
 *         f32 sec, f32 cam[16] (basis rows x,y,z then pos), u32 nsph,
 *         nsph * { f32 r, refl, px, py, pz, cb, cg, cr }
 *       out.bin per frame: u32 sbuf[w*h] (BGRA), f32 zbuf[w*h]
 *   ray <level.txt> <in.bin> <out.bin>
 *       in.bin: u32 n, then n * { f32 from[4], f32 dir[4], u32 seed,
 *         f32 sec, u32 nsph, nsph * {8 f32 as above} }
 *       out.bin: n * { f32 col[4], f32 dist }
 */

#include <string.h>
#include <stdlib.h>
#include <stdint.h>
#include <stdio.h>
#include <errno.h>
#include <assert.h>
#include <math.h>
#include <sys/types.h>

#include <mmintrin.h>
#include <xmmintrin.h>
#include <emmintrin.h>

/* minimal stand-in so screen.h's (unused) screen_upscale compiles */
typedef struct SDL_Surface_stub {
    int pitch;
    void *pixels;
} SDL_Surface;

#include "defs.h"

int rwidth = DEF_RWIDTH;
int rheight = DEF_RHEIGHT;
int rscale = DEF_SCALE;

SDL_Surface *screen = NULL;
uint32_t *sbuf = NULL;
uint32_t *tsbuf = NULL;
float *zbuf = NULL;
level *lvroot = NULL;

#include "util.h"
#include "trace.h"
#ifdef ORACLE_NO_BLUR
#undef POSTPROC_BLUR
#endif
#include "screen.h"
#include "level.h"

/* ---------------------------------------------------------------- tables */

static uint32_t f2u(float f) { union { float f; uint32_t u; } v; v.f = f; return v.u; }
static float u2f(uint32_t u) { union { float f; uint32_t u; } v; v.u = u; return v.f; }

static float do_rsqrt(float x) { return _mm_cvtss_f32(_mm_rsqrt_ps(_mm_set1_ps(x))); }
static float do_rcp(float x)   { return _mm_cvtss_f32(_mm_rcp_ps(_mm_set1_ps(x))); }

static int mode_tables(const char *path)
{
    /* rsqrt table: inputs [1,4) = exponents 127,128; index = parity*4096 +
     * top-12 mantissa bits.  rcp table: inputs [1,2); index = top-12 bits. */
    enum { BLOCK = 11 };             /* assumed constant-output block: 2^11 */
    static uint32_t rsq[8192], rcp_[4096];
    int i, p, ok_block = 1, ok_scale = 1;

    for (p = 0; p < 2; p++)
        for (i = 0; i < 4096; i++) {
            uint32_t bits = ((uint32_t)(127 + p) << 23) | ((uint32_t)i << BLOCK);
            rsq[p * 4096 + i] = f2u(do_rsqrt(u2f(bits)));
        }
    for (i = 0; i < 4096; i++) {
        uint32_t bits = ((uint32_t)127 << 23) | ((uint32_t)i << BLOCK);
        rcp_[i] = f2u(do_rcp(u2f(bits)));
    }

    /* verify block-constant outputs on random low bits */
    srand(12345);
    for (i = 0; i < 200000; i++) {
        uint32_t m = ((uint32_t)rand() << 16) ^ (uint32_t)rand();
        uint32_t lo = m & ((1u << BLOCK) - 1);
        uint32_t hi = (m >> BLOCK) & 0xFFF;
        int par = m & 1;
        uint32_t base = ((uint32_t)(127 + par) << 23) | (hi << BLOCK);
        if (f2u(do_rsqrt(u2f(base | lo))) != rsq[par * 4096 + hi]) ok_block = 0;
        base = ((uint32_t)127 << 23) | (hi << BLOCK);
        if (f2u(do_rcp(u2f(base | lo))) != rcp_[hi]) ok_block = 0;
    }
    /* verify power-of-two scaling across the exponent range */
    for (i = 0; i < 200000; i++) {
        uint32_t m = ((uint32_t)rand() << 16) ^ (uint32_t)rand();
        int e = 40 + (int)(m % 176);            /* exponents 40..215 */
        uint32_t mant = (m >> 8) & 0x7FFFFF;
        uint32_t bits = ((uint32_t)e << 23) | mant;
        float x = u2f(bits);
        int k2 = (e - 127) >> 1;                 /* x = 4^k2 * y, y in [1,4) */
        int par = (e - 127) - 2 * k2;
        uint32_t ybits = ((uint32_t)(127 + par) << 23) | mant;
        float want = u2f(rsq[par * 4096 + (mant >> BLOCK)]);
        want = want * u2f((uint32_t)(127 - k2) << 23);
        if (f2u(do_rsqrt(x)) != f2u(want)) ok_scale = 0;
        int k1 = e - 127;
        float wantr = u2f(rcp_[mant >> BLOCK]) * u2f((uint32_t)(127 - k1) << 23);
        if (f2u(do_rcp(x)) != f2u(wantr)) ok_scale = 0;
    }

    FILE *fp = fopen(path, "wb");
    if (!fp) { perror("tables"); return 1; }
    uint32_t hdr[4] = { 0x52535154u /* 'TQSR' */, BLOCK,
                        (uint32_t)ok_block, (uint32_t)ok_scale };
    fwrite(hdr, 4, 4, fp);
    fwrite(rsq, 4, 8192, fp);
    fwrite(rcp_, 4, 4096, fp);
    fclose(fp);
    printf("tables: block_ok=%d scale_ok=%d\n", ok_block, ok_scale);
    return (ok_block && ok_scale) ? 0 : 2;
}

/* ---------------------------------------------------------------- approx */

static int mode_approx(const char *inp, const char *outp)
{
    /* in: u32 n, n*f32; out: n * { f32 rsqrt(x), f32 rcp(x) } */
    FILE *fi = fopen(inp, "rb");
    FILE *fo = fopen(outp, "wb");
    if (!fi || !fo) { perror("approx io"); return 1; }
    uint32_t n, i;
    if (fread(&n, 4, 1, fi) != 1) return 1;
    for (i = 0; i < n; i++) {
        float x, y[2];
        if (fread(&x, 4, 1, fi) != 1) return 1;
        y[0] = do_rsqrt(x);
        y[1] = do_rcp(x);
        fwrite(y, 4, 2, fo);
    }
    fclose(fi); fclose(fo);
    return 0;
}

/* ------------------------------------------------------------------- rng */

static int mode_rng(const char *seedhex, const char *ns)
{
    uint32_t seed = (uint32_t)strtoul(seedhex, NULL, 16);
    int n = atoi(ns), i;
    uint32_t s1 = seed, s2 = seed;
    for (i = 0; i < n; i++) {
        float fu = randfu(&s1);
        float fs = randfs(&s2);
        printf("%08x %08x %08x %08x\n", s1, f2u(fu), s2, f2u(fs));
    }
    return 0;
}

/* ------------------------------------------------------- shared helpers  */

static int load_spheres(FILE *fp, level *lv)
{
    uint32_t nsph, j;
    if (fread(&nsph, 4, 1, fp) != 1) return -1;
    lv->objs_num = nsph;
    for (j = 0; j < nsph; j++) {
        float v[8];
        if (fread(v, 4, 8, fp) != 8) return -1;
        part *pt = &lv->objs[j];
        pt->typ = P_SPHERE;
        pt->sph.r = v[0];
        pt->sph.refl = v[1];
        pt->sph.pos.m = _mm_setr_ps(v[2], v[3], v[4], 1.0f);
        pt->sph.col.m = _mm_setr_ps(v[5], v[6], v[7], 0.0f);
    }
    return (int)nsph;
}

/* ---------------------------------------------------------------- render */

static int mode_render(const char *lvl, const char *statep, const char *outp)
{
    FILE *fs = fopen(statep, "rb");
    FILE *fo = fopen(outp, "wb");
    if (!fs || !fo) { perror("render io"); return 1; }

    uint32_t w, h, nframes, f;
    if (fread(&w, 4, 1, fs) + fread(&h, 4, 1, fs) + fread(&nframes, 4, 1, fs) != 3)
        return 1;
    rwidth = (int)w;
    rheight = (int)h;
    sbuf = aligned_alloc(16, sizeof(uint32_t) * w * h);
    tsbuf = aligned_alloc(16, sizeof(uint32_t) * w * h);
    zbuf = aligned_alloc(16, sizeof(float) * w * h);

    lvroot = level_load(lvl);
    if (!lvroot) return 1;

    for (f = 0; f < nframes; f++) {
        float camv[16];
        mat4 cam;
        int i;
        if (fread(&sec_current, 4, 1, fs) != 1) return 1;
        if (fread(camv, 4, 16, fs) != 16) return 1;
        for (i = 0; i < 4; i++)
            cam.a[i].m = _mm_setr_ps(camv[i*4], camv[i*4+1], camv[i*4+2], camv[i*4+3]);
        if (load_spheres(fs, lvroot) < 0) return 1;

        level_prepare_render(lvroot);
        memset(zbuf, 0, sizeof(float) * w * h);   /* defined sky depth */
        trace_screen_centred(lvroot, 0, 0, rwidth, rheight, &cam);

        fwrite(sbuf, 4, w * h, fo);
        fwrite(zbuf, 4, w * h, fo);
    }
    fclose(fs);
    fclose(fo);
    return 0;
}

/* ------------------------------------------------------------------- ray */

static int mode_ray(const char *lvl, const char *inp, const char *outp)
{
    FILE *fi = fopen(inp, "rb");
    FILE *fo = fopen(outp, "wb");
    if (!fi || !fo) { perror("ray io"); return 1; }

    lvroot = level_load(lvl);
    if (!lvroot) return 1;

    uint32_t n, i;
    if (fread(&n, 4, 1, fi) != 1) return 1;
    for (i = 0; i < n; i++) {
        float fv[4], rv[4];
        uint32_t seed;
        vec4 from, ray;
        if (fread(fv, 4, 4, fi) != 4) return 1;
        if (fread(rv, 4, 4, fi) != 4) return 1;
        if (fread(&seed, 4, 1, fi) != 1) return 1;
        if (fread(&sec_current, 4, 1, fi) != 1) return 1;
        if (load_spheres(fi, lvroot) < 0) return 1;
        level_prepare_render(lvroot);

        from.m = _mm_setr_ps(fv[0], fv[1], fv[2], fv[3]);
        ray.m = _mm_setr_ps(rv[0], rv[1], rv[2], rv[3]);
        float dist = 0.0f;
        vec4 col;
        col.m = trace_ray(0, &seed, lvroot, &dist, &from, &ray,
                          _mm_setr_ps(1.0f, 1.0f, 1.0f, 1.0f));
        fwrite(col.a, 4, 4, fo);
        fwrite(&dist, 4, 1, fo);
    }
    fclose(fi);
    fclose(fo);
    return 0;
}

int main(int argc, char *argv[])
{
    if (argc >= 3 && !strcmp(argv[1], "tables")) return mode_tables(argv[2]);
    if (argc >= 4 && !strcmp(argv[1], "approx")) return mode_approx(argv[2], argv[3]);
    if (argc >= 4 && !strcmp(argv[1], "rng")) return mode_rng(argv[2], argv[3]);
    if (argc >= 5 && !strcmp(argv[1], "render")) return mode_render(argv[2], argv[3], argv[4]);
    if (argc >= 5 && !strcmp(argv[1], "ray")) return mode_ray(argv[2], argv[3], argv[4]);
    fprintf(stderr, "usage: %s tables|rng|render|ray ...\n", argv[0]);
    return 64;
}
