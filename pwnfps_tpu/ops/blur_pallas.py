"""DoF blur as a Pallas halo kernel (reference screen.h:69-123).

The XLA formulation in ops/blur.py pays ~60ms at 1080p for one big
random gather ([4,h,w] indices into the 2M-pixel frame).  But the tap
offsets are trunc(r * 0.002*h * (z-1)) with |r| <= 1, so for game-scale
depth they stay within a few pixels of the source.  This kernel keeps
the whole framebuffer in VMEM and resolves each tap by scanning the
2*R+8 candidate rows around each output tile with hardware per-lane
gathers against two +-16-lane rolled windows (see _blur_kernel) —
O(R) vector ops instead of a random HBM gather.

Exactness: bit-identical to ops/blur.py (same LCG jump tables, same
float expression order, same truncation/clamp/SWAR-average).  A frame
whose max |z-1| would push any tap beyond the R-row halo falls back to
the XLA path via lax.cond, so `dof_blur_auto` is exact for every input.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import lcg
from .blur import _avg_epu8, _draw_tables, dof_blur

F32 = jnp.float32
I32 = jnp.int32
R = 16          # halo rows/cols: exact while fstr*|z-1| stays < R
BR = 8          # output rows per grid step
# dynamic row banding: scan only [rmin, rmax] of each live halo group
# via a dynamic-trip fori + uniform sublane gather, instead of all 8
# rows.  Off by default pending an on-chip win (the candidate rows
# outside the true tap band are ~40% of the static scan).
BAND = os.environ.get("PWNFPS_BLUR_BAND", "0") == "1"


def _srl(x, n):
    return jax.lax.shift_right_logical(x, np.int32(n))


def _avg_i32(a, b):
    """_mm_avg_epu8 on int32 SWAR (bit-identical to blur._avg_epu8)."""
    return (a | b) - (_srl(a ^ b, 1) & np.int32(0x7F7F7F7F))


def _blur_kernel(h, w, hp, wp, fstr, fh, zb_ref, tab_ref, g0, g1, g2,
                 g3, g4, out_ref, a0, a1, a2, a3):
    """One grid step blurs BR output rows.  The candidate source rows
    [y0-R, y0+BR+R) arrive as five 8-row aligned block views g0..g4
    (BlockSpec index maps i-2..i+2, clipped at the frame edges), so
    block fetches stay static.  Each tap is resolved by scanning the
    5x8 candidate rows with per-lane gathers keyed on (row, chunk)
    against two +-16-lane rolled windows of each row (2 keyed gathers
    per (row, tap); see the window derivation at the key setup).

    The row-band gate is ONE pl.when per halo group wrapping the whole
    width (tap accumulators live in the a0..a3 VMEM scratch): the
    earlier shape - a lax.cond per (group, lane-chunk), 5 x wp/128
    scalar branches per block - spent more time branch-serializing
    than gathering (10k branches per 1080p frame, measured ~2ms)."""
    nc = wp // 128
    nblk = hp // BR
    pid = pl.program_id(0)
    y0 = pid * BR
    # fh < h stacks multiple camera frames vertically (fh | BR, so a
    # block never spans two cameras): row seeds and tap-row clamps use
    # the camera-local band, exactly as per-frame blurs would
    base = (y0 // np.int32(fh)) * np.int32(fh)
    ys = y0 + jax.lax.broadcasted_iota(I32, (BR, wp), 0)
    yl = ys - base
    xs = jax.lax.broadcasted_iota(I32, (BR, wp), 1)
    # row LCG base state: blur_row_seed + one randi (screen.h:82,100)
    s0 = yl * yl + np.int32(415135)
    s1 = (s0 * np.int32(25739) + np.int32(4)) & np.int32(0x7FFFFFFF)
    xf = xs.astype(F32)
    # tap rows are computed in CAMERA-LOCAL floats: adding the global
    # base before the sum would round differently near integer
    # boundaries than the reference's per-frame arithmetic
    yf = yl.astype(F32)
    z = zb_ref[...] - F32(1.0)
    # Two-window column resolve: tap x offsets reach < 16 lanes
    # (|fstr*(z-1)| < R-0.5 or the caller fell back), so an output
    # chunk's taps span < 160 lanes - coverable by TWO 128-lane windows
    # anchored at the chunk, against rolled copies of each halo row:
    #   window A = rows rolled +16:  RA[l] = row[(l-16) mod wp], whose
    #     chunk c covers source lanes [c*128-16, c*128+112)
    #   window B = rows rolled -16:  RB[l] = row[(l+16) mod wp], whose
    #     chunk c covers source lanes [c*128+16, c*128+144)
    # Every tap of an output pixel in chunk c lands in A's or B's
    # chunk-c window; the (row, chunk) key carries the tap's WINDOW
    # chunk id, so a tap in the other window self-excludes (its id is
    # c+-1), and a tap in both windows resolves to the same source
    # pixel twice (idempotent).  2 keyed gathers per (row, tap)
    # instead of the previous 3-neighbour-chunk scan's 3.
    keys_a, keys_b, los_a, los_b = [], [], [], []
    tymins, tymaxs = [], []
    for i in range(4):
        stx = (s1 * tab_ref[i:i + 1, :]
               + tab_ref[4 + i:5 + i, :]) & np.int32(0x7FFFFFFF)
        sty = (s1 * tab_ref[8 + i:9 + i, :]
               + tab_ref[12 + i:13 + i, :]) & np.int32(0x7FFFFFFF)
        rx = (stx % np.int32(3759)).astype(F32) * lcg.INV_MOD_F \
            * F32(2.0) - F32(1.0)
        ry = (sty % np.int32(3759)).astype(F32) * lcg.INV_MOD_F \
            * F32(2.0) - F32(1.0)
        tx = xf + (rx * F32(fstr)) * z
        ty = yf + (ry * F32(fstr)) * z
        txi = jnp.clip(tx.astype(I32), 0, w - 1)
        tyi = jnp.clip(ty.astype(I32), 0, fh - 1) + base
        la = txi + np.int32(16)
        la = jnp.where(la >= np.int32(wp), la - np.int32(wp), la)
        lb = txi - np.int32(16)
        lb = jnp.where(lb < 0, lb + np.int32(wp), lb)
        # joint (row, lane-chunk) key; 32 > any chunk count we see
        keys_a.append(tyi * np.int32(32) + _srl(la, 7))
        keys_b.append(tyi * np.int32(32) + _srl(lb, 7))
        los_a.append(la & np.int32(127))
        los_b.append(lb & np.int32(127))
        tymins.append(tyi.min())
        tymaxs.append(tyi.max())
    # tap row band of the block: taps reach +-fstr*(z-1) rows (a few,
    # typically), so most of the 5 halo groups can skip whole chunks
    rmin = jnp.min(jnp.stack(tymins))
    rmax = jnp.max(jnp.stack(tymaxs))

    grps = (g0, g1, g2, g3, g4)
    gbase = [jnp.clip(pid - 2 + g, 0, nblk - 1) * np.int32(BR)
             for g in range(5)]
    scr = (a0, a1, a2, a3)
    for t in range(4):
        scr[t][...] = jnp.zeros((BR, wp), I32)

    def make_scan(g):
        def scan():
            grp = grps[g][...]
            ra = jnp.concatenate([grp[:, wp - 16:], grp[:, :wp - 16]],
                                 axis=1)
            rb = jnp.concatenate([grp[:, 16:], grp[:, :16]], axis=1)
            if BAND:
                glo = jnp.maximum(rmin - gbase[g], 0)
                ghi = jnp.minimum(rmax - gbase[g], BR - 1)
            for c in range(nc):
                sl = slice(c * 128, (c + 1) * 128)
                ka_t = [k[:, sl] for k in keys_a]
                kb_t = [k[:, sl] for k in keys_b]
                la_t = [lo[:, sl] for lo in los_a]
                lb_t = [lo[:, sl] for lo in los_b]
                acc = [scr[t][:, sl] for t in range(4)]
                rega = ra[:, sl]
                regb = rb[:, sl]

                def taps(cha, chb, key, acc):
                    out = list(acc)
                    for t in range(4):
                        cand = jnp.take_along_axis(cha, la_t[t],
                                                   axis=1)
                        out[t] = jnp.where(ka_t[t] == key, cand,
                                           out[t])
                        cand = jnp.take_along_axis(chb, lb_t[t],
                                                   axis=1)
                        out[t] = jnp.where(kb_t[t] == key, cand,
                                           out[t])
                    return out

                if BAND:
                    def rbody(r8, acc4):
                        ridx = jnp.full((BR, 128), r8, I32)
                        cha = jnp.take_along_axis(rega, ridx, axis=0)
                        chb = jnp.take_along_axis(regb, ridx, axis=0)
                        key = (gbase[g] + r8) * np.int32(32) \
                            + np.int32(c)
                        return tuple(taps(cha, chb, key, list(acc4)))
                    acc = list(jax.lax.fori_loop(glo, ghi + 1, rbody,
                                                 tuple(acc)))
                else:
                    for r8 in range(BR):
                        cha = jnp.broadcast_to(rega[r8:r8 + 1, :],
                                               (BR, 128))
                        chb = jnp.broadcast_to(regb[r8:r8 + 1, :],
                                               (BR, 128))
                        key = (gbase[g] + np.int32(r8)) * np.int32(32) \
                            + np.int32(c)
                        acc = taps(cha, chb, key, acc)
                for t in range(4):
                    scr[t][:, sl] = acc[t]
        return scan

    for g in range(5):
        overlap = (gbase[g] <= rmax) & (gbase[g] + (BR - 1) >= rmin)
        pl.when(overlap)(make_scan(g))
    out_ref[...] = _avg_i32(_avg_i32(a0[...], a1[...]),
                            _avg_i32(a2[...], a3[...]))


@partial(jax.jit, static_argnames=("passes", "frame_h"))
def dof_blur_auto(fb, zbuf, passes: int = 1, frame_h: int | None = None):
    """Exact DoF blur, Pallas halo kernel when depth permits.

    fb: [h,w] uint32 BGRA, zbuf: [h,w] f32 -> blurred fb (bit-identical
    to blur.dof_blur for every input).  frame_h < h treats the input as
    h/frame_h camera frames stacked vertically and blurs each within
    its own row band (bit-identical to blurring them separately)."""
    h, w = fb.shape
    fh = h if frame_h is None else frame_h
    if h % fh or fh % BR:
        raise ValueError(f"frame_h={fh} must divide h={h} and be a "
                         f"multiple of {BR}")
    hp = -(-h // BR) * BR
    wp = -(-w // 128) * 128
    fstr = float(np.float32(0.002) * np.float32(float(fh)))
    (akx, ckx), (aky, cky) = _draw_tables(w)

    def pack(t):  # [w,4] uint32 -> 4 rows of [wp] int32
        t = t.astype(np.int32)
        return np.pad(t, ((0, wp - w), (0, 0))).T

    tab = jnp.asarray(np.concatenate(
        [pack(akx), pack(ckx), pack(aky), pack(cky)], axis=0))  # [16,wp]

    zbp = jnp.pad(zbuf, ((0, hp - h), (0, wp - w)), constant_values=1.0)
    xs = jnp.arange(w, dtype=jnp.int32)
    keep = xs[None, :] < 4 * (w // 4)   # last w%4 pixels untouched

    nblk = hp // BR
    kern = partial(_blur_kernel, h, w, hp, wp, fstr, fh)
    fb_specs = [
        pl.BlockSpec((BR, wp),
                     lambda i, g=g: (jnp.clip(i - 2 + g, 0, nblk - 1), 0))
        for g in range(5)
    ]
    call = pl.pallas_call(
        kern,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((BR, wp), lambda i: (i, 0)),     # zbuf rows
            pl.BlockSpec((16, wp), lambda i: (0, 0)),     # jump tables
        ] + fb_specs,                                     # halo row groups
        out_specs=pl.BlockSpec((BR, wp), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((hp, wp), I32),
        scratch_shapes=[pltpu.VMEM((BR, wp), jnp.int32)] * 4,
    )

    def pallas_passes(f):
        for _ in range(passes):
            fi = jax.lax.bitcast_convert_type(f, I32)
            fip = jnp.pad(fi, ((0, hp - h), (0, wp - w)))
            o = call(zbp, tab, fip, fip, fip, fip, fip)[:h, :w]
            f = jnp.where(keep, jax.lax.bitcast_convert_type(o, f.dtype),
                          f)
        return f

    # any tap beyond the halo? fall back to the exact XLA gather path
    # (vmapped per camera frame when batched)
    if fh == h:
        def fallback(f):
            return dof_blur(f, zbuf, passes)
    else:
        def fallback(f):
            f3 = f.reshape(h // fh, fh, w)
            z3 = zbuf.reshape(h // fh, fh, w)
            out = jax.vmap(lambda a, b: dof_blur(a, b, passes))(f3, z3)
            return out.reshape(h, w)

    zmax = jnp.max(jnp.abs(zbuf - F32(1.0)))
    ok = zmax * F32(fstr) < F32(R - 0.5)
    return jax.lax.cond(ok, pallas_passes, fallback, fb)
