// pwnfps-tpu native host runtime: presentation + per-frame scene prep.
//
// The reference does this work in C on the host every frame:
//   * screen_upscale: nearest-neighbour integer upscale of the 32-bit
//     framebuffer into the window surface (/root/reference/screen.h:126-149)
//   * SDL_Flip: present (main.c:109)
//   * level_prepare_render: clear + rebuild the per-cell sphere buckets
//     from the object pool (/root/reference/level.h:64-81)
//
// Here the same host-side responsibilities are native C++ driven from
// Python over ctypes: BGRA->RGB conversion, integer upscale, zero-copy
// PPM/uncompressed-PNG export of DMA'd framebuffers, and the bucket +
// membership-mask rebuild that feeds the device tables.  Everything is
// plain C ABI for ctypes.

#include <cstdint>
#include <cstdio>
#include <cstring>

extern "C" {

// BGRA (uint32 LE) -> packed RGB bytes, with optional integer upscale.
void fb_to_rgb_upscaled(const uint32_t* fb, int h, int w, int scale,
                        uint8_t* out /* [h*scale][w*scale][3] */) {
    const int W = w * scale;
    for (int y = 0; y < h; y++) {
        uint8_t* row0 = out + (size_t)y * scale * W * 3;
        uint8_t* p = row0;
        for (int x = 0; x < w; x++) {
            uint32_t v = fb[(size_t)y * w + x];
            uint8_t r = (uint8_t)(v >> 16), g = (uint8_t)(v >> 8),
                    b = (uint8_t)v;
            for (int sx = 0; sx < scale; sx++) {
                *p++ = r; *p++ = g; *p++ = b;
            }
        }
        for (int sy = 1; sy < scale; sy++)
            memcpy(row0 + (size_t)sy * W * 3, row0, (size_t)W * 3);
    }
}

// Write a binary PPM (P6). Returns 0 on success.
int write_ppm(const char* path, const uint8_t* rgb, int h, int w) {
    FILE* f = fopen(path, "wb");
    if (!f) return 1;
    fprintf(f, "P6\n%d %d\n255\n", w, h);
    size_t n = (size_t)h * w * 3;
    int ok = fwrite(rgb, 1, n, f) == n;
    fclose(f);
    return ok ? 0 : 2;
}

// ---- per-frame scene prep (level_prepare_render, level.h:64-81) --------
//
// Rebuilds the per-cell bucket lists + 15-bit membership masks from the
// live object pool.  Insertion order is object-index order (the tracer's
// closest-hit tie-breaking depends on it).  Returns the number of live
// spheres, or -1 on bucket overflow / out-of-grid bbox (the reference
// would corrupt memory here; we fail loudly).
int prepare_render(const int8_t* typ, const float* r, const float* px,
                   const float* py, const float* pz, int64_t objs_num,
                   int k_bucket,
                   int32_t* buckets /* [64*64*k_bucket], filled -1 */,
                   int32_t* counts /* [64*64] */,
                   int32_t* masks /* [64*64] */) {
    memset(counts, 0, 64 * 64 * sizeof(int32_t));
    memset(masks, 0, 64 * 64 * sizeof(int32_t));
    for (int64_t i = 0; i < 64 * 64 * (int64_t)k_bucket; i++)
        buckets[i] = -1;
    int live = 0;
    for (int64_t i = 0; i < objs_num; i++) {
        if (typ[i] == 1 /* T_FREE */) continue;
        if (typ[i] != 2 /* T_SPHERE */) return -1;
        live++;
        // C truncation semantics for the bbox (level.h:27-31)
        int cx1 = (int)(px[i] - r[i]), cz1 = (int)(pz[i] - r[i]);
        int cx2 = (int)(px[i] + r[i]), cz2 = (int)(pz[i] + r[i]);
        if (cx1 < 0 || cz1 < 0 || cx2 >= 64 || cz2 >= 64) return -1;
        for (int cz = cz1; cz <= cz2; cz++)
            for (int cx = cx1; cx <= cx2; cx++) {
                int cell = cz * 64 + cx;
                int k = counts[cell]++;
                if (k >= k_bucket) return -1;
                buckets[(size_t)cell * k_bucket + k] = (int32_t)i;
                if (i < 31) masks[cell] |= (1 << i);
            }
    }
    return live;
}

}  // extern "C"
