"""Depth-of-field post-process (reference screen.h:69-123).

Per scanline, per pixel: 4 jittered taps at offsets proportional to
(z - 1.0), averaged with `_mm_avg_epu8` semantics ((a+b+1)>>1 per byte).
The jitter consumes the row LCG serially (32 draws per 4-pixel group,
tap-major); we jump the generator analytically per (pixel, tap) so the
whole pass is one gather + SWAR average on device.

Quirks reproduced: the last `width % 4` pixels are not blurred; tap
coordinates are truncated toward zero then clamped to the frame.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from ..core import lcg

F32 = jnp.float32
U32 = jnp.uint32


@lru_cache(maxsize=8)
def _draw_tables(width: int):
    """Static per-width draw-index jump coefficients.

    Pixel x (in group g = x//4, lane j = x%4), tap i consumes draws
    d = 32g + (4i + j)*2 (x offset) and d+1 (y offset)."""
    x = np.arange(width)
    g, j = x // 4, x % 4
    i = np.arange(4)
    d = 32 * g[:, None] + (4 * i[None, :] + j[:, None]) * 2  # [w,4]
    ak, ck = lcg.jump_coeffs(int(d.max()) + 2)
    return (ak[d], ck[d]), (ak[d + 1], ck[d + 1])


def _avg_epu8(a, b):
    """(a+b+1)>>1 per byte, SWAR on uint32."""
    return (a | b) - (((a ^ b) >> np.uint32(1)) & np.uint32(0x7F7F7F7F))


def dof_blur_band(fb_pad, zbuf, y0, fh: int):
    """One DoF pass on a row band (screen.h:69-123, band form).

    The sharded analogue of the reference splitting the blur's scanline
    rows across OpenMP threads (screen.h:77-78): each device blurs the
    rows it owns after a halo exchange, instead of replicating the
    frame.

    fb_pad: [hb + 2*H, w] uint32 — the band's rows with H halo rows
    above and below.  Halo rows that fall outside the frame are never
    tapped (tap rows clamp to [0, fh-1] and the caller guarantees the
    real tap reach fits the halo), so their contents are irrelevant.
    zbuf: [hb, w] f32 for the band's own rows.  y0: global
    (camera-local) row index of the band's first row.  fh: the camera
    frame height (sets fstr and the tap-row clamp — NOT this array's
    padded height).

    Returns the blurred band [hb, w], bit-identical to rows
    [y0, y0+hb) of dof_blur(frame, zframe): same LCG jump tables, same
    float expression order, same truncate/clamp/SWAR average.
    """
    hb, w = zbuf.shape
    H = (fb_pad.shape[0] - hb) // 2
    (akx, ckx), (aky, cky) = _draw_tables(w)
    akx, ckx = jnp.asarray(akx), jnp.asarray(ckx)
    aky, cky = jnp.asarray(aky), jnp.asarray(cky)

    fstr = F32(0.002) * F32(float(fh))
    ys = jnp.asarray(y0, jnp.int32) + jnp.arange(hb, dtype=jnp.int32)
    s0 = lcg.blur_row_seed(ys.astype(U32))
    s1, _ = lcg.randi(s0)

    def randfs_from_state(v):
        f = (v % np.uint32(3759)).astype(F32) * lcg.INV_MOD_F
        return f * F32(2.0) - F32(1.0)

    xs = jnp.arange(w, dtype=jnp.int32)
    xf = xs.astype(F32)
    yf = ys.astype(F32)

    tsbuf = fb_pad.reshape(-1)
    z = zbuf - F32(1.0)
    idxs = []
    for i in range(4):
        stx = lcg.jump(s1[:, None], akx[None, :, i], ckx[None, :, i])
        sty = lcg.jump(s1[:, None], aky[None, :, i], cky[None, :, i])
        rx = randfs_from_state(stx)
        ry = randfs_from_state(sty)
        tx = xf[None, :] + (rx * fstr) * z
        ty = yf[:, None] + (ry * fstr) * z
        txi = jnp.clip(tx.astype(jnp.int32), 0, w - 1)
        tyi = jnp.clip(ty.astype(jnp.int32), 0, fh - 1)
        # local row in the padded band; real-row taps are always in
        # range (|tyi - y| <= H for them), padded rows' garbage taps
        # are clipped by the gather and their outputs discarded
        r = tyi - jnp.asarray(y0, jnp.int32) + H
        idxs.append(r * w + txi)
    taps = jnp.take(tsbuf, jnp.stack(idxs), mode="clip")
    acc = _avg_epu8(_avg_epu8(taps[0], taps[1]),
                    _avg_epu8(taps[2], taps[3]))
    keep = xs[None, :] < 4 * (w // 4)
    return jnp.where(keep, acc, fb_pad[H:H + hb])


def dof_blur(fb, zbuf, passes: int = 1):
    """fb: [h,w] uint32 BGRA, zbuf: [h,w] f32 -> blurred fb."""
    h, w = fb.shape
    (akx, ckx), (aky, cky) = _draw_tables(w)
    akx, ckx = jnp.asarray(akx), jnp.asarray(ckx)
    aky, cky = jnp.asarray(aky), jnp.asarray(cky)

    fstr = F32(0.002) * F32(float(h))  # 0.002f * dimy (screen.h:86)
    y_rows = jnp.arange(h, dtype=U32)
    s0 = lcg.blur_row_seed(y_rows)          # full uint32 initial
    s1, _ = lcg.randi(s0)                   # 31-bit base state [h]

    def randfs_from_state(v):
        f = (v % np.uint32(3759)).astype(F32) * lcg.INV_MOD_F
        return f * F32(2.0) - F32(1.0)

    xs = jnp.arange(w, dtype=jnp.int32)
    xf = xs.astype(F32)                     # (float)(cx + j)
    ys = jnp.arange(h, dtype=jnp.int32)
    yf = ys.astype(F32)

    for _ in range(passes):
        tsbuf = fb.reshape(-1)
        z = zbuf - F32(1.0)                           # [h,w]
        idxs = []
        for i in range(4):
            stx = lcg.jump(s1[:, None], akx[None, :, i], ckx[None, :, i])
            sty = lcg.jump(s1[:, None], aky[None, :, i], cky[None, :, i])
            rx = randfs_from_state(stx)
            ry = randfs_from_state(sty)
            tx = xf[None, :] + (rx * fstr) * z
            ty = yf[:, None] + (ry * fstr) * z
            txi = jnp.clip(tx.astype(jnp.int32), 0, w - 1)
            tyi = jnp.clip(ty.astype(jnp.int32), 0, h - 1)
            idxs.append(tyi * w + txi)
        # one batched gather: XLA's per-gather overhead dominates, four
        # separate [h,w] gathers cost ~3x one [4,h,w] gather (measured)
        taps = jnp.take(tsbuf, jnp.stack(idxs), mode="clip")
        acc = _avg_epu8(_avg_epu8(taps[0], taps[1]),
                        _avg_epu8(taps[2], taps[3]))
        # last width%4 pixels are untouched (screen.h:88-91)
        wlim = 4 * (w // 4)
        keep = xs[None, :] < wlim
        fb = jnp.where(keep, acc, fb)
    return fb
