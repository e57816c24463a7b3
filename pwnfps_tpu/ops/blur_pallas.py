"""DoF blur as a Pallas halo kernel (reference screen.h:69-123).

The XLA formulation in ops/blur.py pays ~60ms at 1080p for one big
random gather ([4,h,w] indices into the 2M-pixel frame).  But the tap
offsets are trunc(r * 0.002*h * (z-1)) with |r| <= 1, so for game-scale
depth they stay within a few pixels of the source.  This kernel keeps
8-row halo groups around each output block in VMEM and resolves each
tap by scanning the candidate rows with hardware per-lane gathers
against rolled column windows (see _blur_kernel) — O(rows in the tap
band) vector ops instead of a random HBM gather.  Groups outside the
block's tap-row band skip via one pl.when each.  Two compiled
variants, picked per frame by the max tap reach (see G_NEAR/G_WIDE):
shallow frames pay exactly the 5-group 2-window near scan, deeper
frames a 12-group scan whose outer column windows fire only for
blocks that need them.

Exactness: bit-identical to ops/blur.py (same LCG jump tables, same
float expression order, same truncation/clamp/SWAR-average).  The
structure reaches fstr*|z-1| < RR-0.5 rows/lanes (33 depth units at
720p, 22 at 1080p; the portal-chain stress scene's 21.5-unit
sightlines previously fell back to a ~25 ms XLA gather per 720p
frame).  Frames beyond that fall back to the XLA path via lax.cond,
so `dof_blur_auto` is exact for every input.

(A dynamic row-band variant — fori over [rmin, rmax] with dynamic ref
slices, and earlier the PWNFPS_BLUR_BAND uniform-gather banding — was
built and measured 47 ms/720p-frame on an all-far synthetic vs ~4 ms
for this static-group structure: Mosaic executes dynamic-trip row
loops far slower than unrolled static scans.  Deleted; this note is
the record.)
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
from .blur import _draw_tables, dof_blur

F32 = jnp.float32
I32 = jnp.int32
BR = 8          # output rows per grid step
# Two compiled variants, picked per frame by max tap reach (fstr*zmax):
#   near: 5 8-row halo groups (rows +-16), one +-16-lane window pair -
#         reach < 15.5; the default-level 1080p bench path (its max
#         reach is ~15.03, so the wide structure's 7 extra group DMAs
#         + gates would cost ~1.9ms/frame for nothing - measured)
#   wide: 13 groups (rows y0-48 .. y0+55: +-48 from EVERY output row,
#         the +1 group covering taps from the block's last row), a
#         second +-48-lane window pair gated per block - reach < 47.5
#         (33 depth units at 720p, 22 at 1080p; covers the
#         portal-chain stress scene's 21.5)
G_NEAR, G_WIDE = 5, 13
RR = ((G_WIDE - 1) // 2) * BR   # wide tap reach (rows and lanes)


def _srl(x, n):
    return jax.lax.shift_right_logical(x, np.int32(n))


def _avg_i32(a, b):
    """_mm_avg_epu8 on int32 SWAR (bit-identical to blur._avg_epu8)."""
    return (a | b) - (_srl(a ^ b, 1) & np.int32(0x7F7F7F7F))


def _blur_kernel(h, w, hp, wp, fstr, fh, G, pairs, hofs, nloc, dyn, ring,
                 v2, zb_ref, tab_ref, *refs):
    """One grid step blurs BR output rows.  The candidate source rows
    arrive as G 8-row aligned block views (BlockSpec index maps
    i-G/2..i+G/2-1, clipped at the frame edges), so block fetches stay
    static.  Each tap is resolved by scanning the fired groups' 8 rows
    with per-lane gathers keyed on (row, window chunk) against rolled
    column windows of each row:

      window roll r covers source lanes [c*128 - r, c*128 - r + 128)
      of output chunk c.  The inner pair (rolls +16/-16) covers source
      offsets within [-16, 144) of the chunk base — every tap when
      fstr*|z-1| < 15.5 (the near kernel's whole reach).  The wide
      kernel's outer pair (rolls +48/-48) extends coverage to
      [-48, 176), i.e. per-pixel offsets up to +-48 lanes; it fires
      only when the block's measured column offsets leave the inner
      pair's range.  A tap's key carries its
      (row, window-chunk id): a tap outside a window self-excludes
      (its id differs), and a tap covered by two overlapping windows
      resolves to the same source pixel twice (idempotent select).

    The row-band gate is ONE pl.when per (group, window pair) wrapping
    the whole width (tap accumulators live in VMEM scratch): an
    earlier shape — a lax.cond per (group, lane-chunk), 5 x wp/128
    scalar branches per block — spent more time branch-serializing
    than gathering (10k branches per 1080p frame, measured ~2ms).

    Band mode (hofs is not None): the inputs are per-camera ROW BANDS
    stacked vertically — fb arrives as [cl*(nloc+2*hofs), wp] padded
    bands (hofs halo rows above and below each camera's nloc own
    rows), zbuf/out as [cl*nloc, wp], and refs is prefixed by an SMEM
    (1,1) scalar: the camera-local row index of the band's first own
    row (the same for every stacked camera).  Seeds, tap clamps and
    group row labels all use camera-local rows, so the output is
    bit-identical to the same rows of the full-frame kernel; halo rows
    outside the frame are never tapped (tap rows clamp to [0, fh-1])
    so their zero-fill content is irrelevant.

    v2 (PWNFPS_BLUR_V2) reshapes the scan's bookkeeping without moving
    a single tap: (a) each tap's two window keys merge into ONE
    key/lane-offset plane pair selected by which rolled window covers
    the tap (a tap covered by both windows reads the same source pixel
    from either, so the pick is value-identical), cutting the inner
    loop from 6 to 5 vector ops per (row, chunk, tap); (b) the
    per-tap .min()/.max() row/column reductions fold into elementwise
    min/max trees with ONE cross-lane reduction each (2 instead of 10
    per block near, 4 instead of 18 wide) - the span-fetch ablation
    priced cross-lane reductions at ~0.2us each on this chip.  Both
    gates and outputs are bit-identical to v1 by construction."""
    band = hofs is not None
    if band:
        y0_ref = refs[0]
        refs = refs[1:]
    if dyn:
        # explicit-DMA mode: fb arrives ONCE as an HBM/ANY ref; halo
        # groups are copied into VMEM scratch only when their row band
        # fires, instead of the BlockSpec prefetching all G groups
        # unconditionally (the measured ~2us/group "never-firing DMA"
        # tax that forced the per-frame near/wide split)
        fb_hbm = refs[0]
        out_ref = refs[1]
        scr = refs[2:6]
        grps = refs[6:6 + G]
        sems = refs[6 + G]
    elif ring:
        # ring mode (PWNFPS_BLUR_RING): ONE fetched block per grid
        # step instead of G overlapping halo-group fetches.  The grid
        # runs G//2 extra steps; step j fetches frame block
        # clip(j, 0, nblk-1) into slot j%G of a VMEM ring that
        # PERSISTS across grid steps, and computes output block
        # i = j - G//2 from the ring (warm-up steps j < G//2 write a
        # throwaway block 0 that step G//2 overwrites - out index maps
        # repeat, sequential grid order makes the last write win).
        # Group g of block i needs frame block clip(i - G//2 + g) =
        # clip(j - (G-1) + g), fetched at step s = max(j-(G-1)+g, 0)
        # (bf(s) = clip(s) equals it at both edges), which still sits
        # in slot s % G because only steps s+G > j evict it.  Same
        # taps, keys and values as the BlockSpec variant - bit-exact;
        # only the data movement changes (G DMAs/block -> 1).
        in_ref = refs[0]
        out_ref = refs[1]
        ringbuf = refs[2]
        scr = refs[3:7]
    else:
        grps = refs[:G]
        out_ref = refs[G]
        scr = refs[G + 1:G + 5]
    nc = wp // 128
    pid = pl.program_id(0)
    if ring:
        jstep = pid
        pid = jnp.maximum(jstep - np.int32(G // 2), 0)
        ringbuf[pl.ds((jstep % np.int32(G)) * np.int32(BR), BR), :] = \
            in_ref[...]
    if band:
        nblk_loc = nloc // BR
        npadblk = nblk_loc + 2 * (hofs // BR)
        blo = pid % np.int32(nblk_loc)     # block within this camera
        y0c = y0_ref[0, 0]                 # band start (camera-local)
        y0 = y0c + blo * np.int32(BR)      # block start (camera-local)
        base = np.int32(0)
        yl = y0 + jax.lax.broadcasted_iota(I32, (BR, wp), 0)
    else:
        nblk = hp // BR
        y0 = pid * BR
        # fh < h stacks multiple camera frames vertically (fh | BR, so
        # a block never spans two cameras): row seeds and tap-row
        # clamps use the camera-local band, as per-frame blurs would
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
    cbase = xs & np.int32(~127)     # each lane's own 128-chunk base
    # per-window keys and in-window lane offsets per tap: a window
    # rolled by r holds source lane (txi) at lane txi+r, so its lane
    # offset is (txi+r) & 127 and its key chunk id (txi+r) >> 7
    keys = [[], []]     # [pair][tap] -> (key_a, key_b) planes
    los = [[], []]      # [pair][tap] -> (lo_a, lo_b) planes
    ubs = [[], []]      # v2: [pair][tap] -> use-window-b plane
    tymins, tymaxs = [], []
    cmins, cmaxs = [], []
    tylo = tyhi = clo = chi = None      # v2 elementwise trees
    oc = _srl(xs, 7)    # own 128-chunk id (v2 window pick)
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
        for p, roll in (((0, 16), (1, 48)) if pairs == 2
                        else ((0, 16),)):
            la = txi + np.int32(roll)
            la = jnp.where(la >= np.int32(wp), la - np.int32(wp), la)
            lb = txi - np.int32(roll)
            lb = jnp.where(lb < 0, lb + np.int32(wp), lb)
            # joint (row, lane-chunk) key; 32 > any chunk count we see
            ka = tyi * np.int32(32) + _srl(la, 7)
            kb = tyi * np.int32(32) + _srl(lb, 7)
            if v2:
                # merged window: window a covers the tap iff its
                # rolled position stays in the lane's own chunk; taps
                # both windows cover read the same source pixel from
                # either, so the pick is value-identical
                ub = _srl(la, 7) != oc
                keys[p].append(jnp.where(ub, kb, ka))
                los[p].append(jnp.where(ub, lb, la) & np.int32(127))
                ubs[p].append(ub)
            else:
                keys[p].append((ka, kb))
                los[p].append((la & np.int32(127), lb & np.int32(127)))
        if v2:
            tylo = tyi if tylo is None else jnp.minimum(tylo, tyi)
            tyhi = tyi if tyhi is None else jnp.maximum(tyhi, tyi)
            if pairs == 2:
                mrel = txi - cbase
                clo = mrel if clo is None else jnp.minimum(clo, mrel)
                chi = mrel if chi is None else jnp.maximum(chi, mrel)
        else:
            tymins.append(tyi.min())
            tymaxs.append(tyi.max())
            mrel = txi - cbase
            cmins.append(mrel.min())
            cmaxs.append(mrel.max())
    # tap row band of the block: taps reach +-fstr*(z-1) rows (a few,
    # typically), so most of the G halo groups skip entirely
    if v2:
        rmin, rmax = tylo.min(), tyhi.max()
    else:
        rmin = jnp.min(jnp.stack(tymins))
        rmax = jnp.max(jnp.stack(tymaxs))
    if pairs == 2:
        # inner window pair covers source offsets [-16, 144) of each
        # chunk base; blocks whose taps stay inside never run the outer
        if v2:
            cmin, cmax = clo.min(), chi.max()
        else:
            cmin = jnp.min(jnp.stack(cmins))
            cmax = jnp.max(jnp.stack(cmaxs))
        outer_cols = (cmin < np.int32(-16)) | (cmax >= np.int32(144))

    if band:
        # camera-local row label of each fetched halo group (must
        # match the fetch index map in dof_blur_band_pallas; edge
        # clipping duplicates boundary groups — same key, idempotent)
        hb8 = hofs // BR
        gbase = [(jnp.clip(blo + hb8 - G // 2 + g, 0, npadblk - 1)
                  - np.int32(hb8)) * np.int32(BR) + y0c
                 for g in range(G)]
    else:
        gbase = [jnp.clip(pid - G // 2 + g, 0, nblk - 1) * np.int32(BR)
                 for g in range(G)]
    overlaps = [(gbase[g] <= rmax) & (gbase[g] + (BR - 1) >= rmin)
                for g in range(G)]
    if dyn:
        # start every fired group's copy before the first scan waits,
        # so the copies run concurrently; start/wait pair under the
        # same predicate
        for g in range(G):
            def start(g=g):
                pltpu.make_async_copy(
                    fb_hbm.at[pl.ds(gbase[g], BR), :],
                    grps[g], sems.at[g]).start()
            pl.when(overlaps[g])(start)
    for t in range(4):
        scr[t][...] = jnp.zeros((BR, wp), I32)

    def make_scan(g, p, roll, wait=False):
        def scan():
            if wait:
                pltpu.make_async_copy(
                    fb_hbm.at[pl.ds(gbase[g], BR), :],
                    grps[g], sems.at[g]).wait()
            if ring:
                slot = jnp.maximum(jstep - np.int32(G - 1) + np.int32(g),
                                   0) % np.int32(G)
                grp = ringbuf[pl.ds(slot * np.int32(BR), BR), :]
            else:
                grp = grps[g][...]
            ra = jnp.concatenate(
                [grp[:, wp - roll:], grp[:, :wp - roll]], axis=1)
            rb = jnp.concatenate(
                [grp[:, roll:], grp[:, :roll]], axis=1)
            for c in range(nc):
                sl = slice(c * 128, (c + 1) * 128)
                if v2:
                    mk_t = [k[:, sl] for k in keys[p]]
                    ml_t = [lo[:, sl] for lo in los[p]]
                    ub_t = [u[:, sl] for u in ubs[p]]
                else:
                    ka_t = [k[0][:, sl] for k in keys[p]]
                    kb_t = [k[1][:, sl] for k in keys[p]]
                    la_t = [lo[0][:, sl] for lo in los[p]]
                    lb_t = [lo[1][:, sl] for lo in los[p]]
                acc = [scr[t][:, sl] for t in range(4)]
                rega = ra[:, sl]
                regb = rb[:, sl]
                for r8 in range(BR):
                    cha = jnp.broadcast_to(rega[r8:r8 + 1, :],
                                           (BR, 128))
                    chb = jnp.broadcast_to(regb[r8:r8 + 1, :],
                                           (BR, 128))
                    key = (gbase[g] + np.int32(r8)) * np.int32(32) \
                        + np.int32(c)
                    for t in range(4):
                        if v2:
                            cand = jnp.where(
                                ub_t[t],
                                jnp.take_along_axis(chb, ml_t[t],
                                                    axis=1),
                                jnp.take_along_axis(cha, ml_t[t],
                                                    axis=1))
                            acc[t] = jnp.where(mk_t[t] == key, cand,
                                               acc[t])
                        else:
                            cand = jnp.take_along_axis(cha, la_t[t],
                                                       axis=1)
                            acc[t] = jnp.where(ka_t[t] == key, cand,
                                               acc[t])
                            cand = jnp.take_along_axis(chb, lb_t[t],
                                                       axis=1)
                            acc[t] = jnp.where(kb_t[t] == key, cand,
                                               acc[t])
                for t in range(4):
                    scr[t][:, sl] = acc[t]
        return scan

    for g in range(G):
        # inner-window scan runs whenever the group fires, so the DMA
        # wait lives there; the outer scan's gate is a subset of it
        pl.when(overlaps[g])(make_scan(g, 0, 16, wait=dyn))
        if pairs == 2:
            pl.when(overlaps[g] & outer_cols)(make_scan(g, 1, 48))
    out_ref[...] = _avg_i32(_avg_i32(scr[0][...], scr[1][...]),
                            _avg_i32(scr[2][...], scr[3][...]))


def _tap_tables(w: int, wp: int):
    """LCG jump tables as one [16, wp] i32 array (kernel input)."""
    (akx, ckx), (aky, cky) = _draw_tables(w)

    def pack(t):  # [w,4] uint32 -> 4 rows of [wp] int32
        t = t.astype(np.int32)
        return np.pad(t, ((0, wp - w), (0, 0))).T

    return jnp.asarray(np.concatenate(
        [pack(akx), pack(ckx), pack(aky), pack(cky)], axis=0))


def _v2_env(v2):
    # None = per-variant default (near: v1, wide: v2 — the chip A/B's
    # winner on each side: r4 queue F measured v2 -2.0 ms on the
    # stress wide variant and neutral-within-jitter on the flagship
    # near variant, docs/PERFORMANCE.md "Blur scan v2").  Env forces
    # both variants for A/Bs.
    if v2 is None:
        e = os.environ.get("PWNFPS_BLUR_V2", "")
        if e == "":
            return None
        return e not in ("0",)
    return bool(v2)


def dof_blur_band_pallas(fb_pad, zb, y0, fh: int, wide: bool,
                         v2: bool | None = None):
    """Band DoF blur - thin env-resolving wrapper over the jitted body.

    Resolves the PWNFPS_BLUR_V2 A/B env knob OUTSIDE jit so the value
    lands in the jit cache key: reading it at trace time froze the
    first call's env into every later cache hit, making a flipped env
    silently reuse the stale compiled variant (r4 advisor finding).
    NB a caller already inside jit (the mesh render paths) still
    captures the env at ITS trace time - flip the env before building
    the outer jitted computation.  See _dof_blur_band for semantics."""
    return _dof_blur_band(fb_pad, zb, y0, fh, wide, _v2_env(v2))


@partial(jax.jit, static_argnames=("fh", "wide", "v2"))
def _dof_blur_band(fb_pad, zb, y0, fh: int, wide: bool,
                   v2: bool | None = None):
    """Band DoF blur, Pallas halo kernel — ONE pass.

    The multi-chip blur body (parallel.sharding._dof_blur_mesh): each
    device blurs only the frame rows it owns, reading neighbour rows
    from an exchanged halo instead of a replicated frame — the sharded
    analogue of the reference blurring scanline rows across OpenMP
    threads (screen.h:77-78).

    fb_pad: [cl, hb+2H, w] uint32 — per-camera row bands with H halo
    rows above and below (H, hb multiples of 8).  The caller
    guarantees the frame's tap reach fits: reach < 47.5 <= H, or the
    halo spans the whole frame.  zb: [cl, hb, w] f32 (own rows only).
    y0: scalar i32, camera-local row index of the band's first own
    row.  fh: the camera frame height.  wide: static near/wide
    variant choice — the caller's global reach decision, same bounds
    as dof_blur_auto.

    Returns [cl, hb, w] uint32, bit-identical to rows [y0, y0+hb) of
    dof_blur_auto / blur.dof_blur on the full frame."""
    cl, hbH, w = fb_pad.shape
    hb = zb.shape[1]
    H = (hbH - hb) // 2
    if hb % BR or H % BR:
        raise ValueError(f"band rows ({hb}) and halo ({H}) must be "
                         f"multiples of {BR}")
    G, pairs = (G_WIDE, 2) if wide else (G_NEAR, 1)
    wp = -(-w // 128) * 128
    fstr = float(np.float32(0.002) * np.float32(float(fh)))
    tab = _tap_tables(w, wp)
    fbs = jax.lax.bitcast_convert_type(fb_pad, I32).reshape(cl * hbH, w)
    fbs = jnp.pad(fbs, ((0, 0), (0, wp - w)))
    zbs = jnp.pad(zb.reshape(cl * hb, w), ((0, 0), (0, wp - w)),
                  constant_values=1.0)
    y0a = jnp.asarray(y0, I32).reshape(1, 1)
    nblk_loc = hb // BR
    npadblk = hbH // BR
    hb8 = H // BR
    _v2 = v2      # env already resolved by the wrapper
    kern = partial(_blur_kernel, 0, w, 0, wp, fstr, fh, G, pairs, H, hb,
                   False, False, _v2 if _v2 is not None else wide)
    # group g of local block b fetches this camera's padded block
    # b + H/8 - G/2 + g (clipped to the camera's own padded region);
    # must mirror the gbase labels in _blur_kernel's band branch
    fb_specs = [
        pl.BlockSpec(
            (BR, wp),
            lambda i, g=g: ((i // nblk_loc) * npadblk
                            + jnp.clip(i % nblk_loc + hb8 - G // 2 + g,
                                       0, npadblk - 1), 0))
        for g in range(G)
    ]
    call = pl.pallas_call(
        kern,
        grid=(cl * nblk_loc,),
        in_specs=[
            pl.BlockSpec((BR, wp), lambda i: (i, 0)),   # zbuf rows
            pl.BlockSpec((16, wp), lambda i: (0, 0)),   # jump tables
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),      # band row0
        ] + fb_specs,
        out_specs=pl.BlockSpec((BR, wp), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((cl * hb, wp), I32),
        scratch_shapes=[pltpu.VMEM((BR, wp), jnp.int32)] * 4,
    )
    o = call(zbs, tab, y0a, *([fbs] * G))[:, :w]
    o = jax.lax.bitcast_convert_type(o, jnp.uint32)
    if w % 4:                           # last w%4 pixels untouched
        xs = jnp.arange(w, dtype=jnp.int32)
        keep = xs[None, :] < 4 * (w // 4)
        ctr = fb_pad[:, H:H + hb, :].reshape(cl * hb, w)
        o = jnp.where(keep, o, ctr)
    return o.reshape(cl, hb, w)


def dof_blur_auto(fb, zbuf, passes: int = 1, frame_h: int | None = None,
                  dma: str | None = None, v2: bool | None = None,
                  ring: bool | None = None):
    """Exact DoF blur - thin env-resolving wrapper over the jitted body.

    Resolves the PWNFPS_BLUR_DMA / PWNFPS_BLUR_V2 / PWNFPS_BLUR_RING
    A/B env knobs OUTSIDE jit so their values land in the jit cache
    key (r4 advisor finding: trace-time reads froze the first call's
    env into every later cache hit).  A caller already inside jit
    (render_frame) still captures the env at ITS trace time - flip the
    env before building the outer jitted computation.  See
    _dof_blur_auto for semantics."""
    if dma is None:
        dma = os.environ.get("PWNFPS_BLUR_DMA", "0")
    if ring is None:
        ring = os.environ.get("PWNFPS_BLUR_RING", "0") not in ("0", "")
    return _dof_blur_auto(fb, zbuf, passes, frame_h, dma, _v2_env(v2),
                          bool(ring))


@partial(jax.jit, static_argnames=("passes", "frame_h", "dma", "v2",
                                   "ring"))
def _dof_blur_auto(fb, zbuf, passes: int = 1, frame_h: int | None = None,
                   dma: str | None = None, v2: bool | None = None,
                   ring: bool | None = None):
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
    tab = _tap_tables(w, wp)

    zbp = jnp.pad(zbuf, ((0, hp - h), (0, wp - w)), constant_values=1.0)
    if w % 4:                           # last w%4 pixels untouched
        xs = jnp.arange(w, dtype=jnp.int32)
        keep = xs[None, :] < 4 * (w // 4)

    nblk = hp // BR

    _v2 = v2      # env already resolved by the wrapper

    def build_call(G, pairs, dyn=False, ring=False):
        use_v2 = _v2 if _v2 is not None else (pairs == 2)
        kern = partial(_blur_kernel, h, w, hp, wp, fstr, fh, G, pairs,
                       None, None, dyn, ring, use_v2)
        gh = G // 2
        if dyn:
            # fb passed ONCE, staying in HBM; halo groups DMA'd into
            # VMEM scratch only when their row band fires
            fb_specs = [pl.BlockSpec(memory_space=pl.ANY)]
            scratch = ([pltpu.VMEM((BR, wp), jnp.int32)] * (4 + G)
                       + [pltpu.SemaphoreType.DMA((G,))])
        elif ring:
            # one NEW frame block per grid step, kept in a VMEM ring
            # that persists across steps (see _blur_kernel ring notes);
            # the grid runs G//2 warm-up steps whose output writes
            # step G//2 overwrites
            fb_specs = [
                pl.BlockSpec((BR, wp),
                             lambda j: (jnp.clip(j, 0, nblk - 1), 0))
            ]
            scratch = ([pltpu.VMEM((G * BR, wp), jnp.int32)]
                       + [pltpu.VMEM((BR, wp), jnp.int32)] * 4)
        else:
            fb_specs = [
                pl.BlockSpec((BR, wp),
                             lambda i, g=g, G=G: (
                                 jnp.clip(i - G // 2 + g, 0, nblk - 1),
                                 0))
                for g in range(G)
            ]
            scratch = [pltpu.VMEM((BR, wp), jnp.int32)] * 4
        if ring:
            def omap(j):
                return (jnp.maximum(j - gh, 0), 0)
        else:
            def omap(i):
                return (i, 0)
        call = pl.pallas_call(
            kern,
            grid=(nblk + gh,) if ring else (nblk,),
            in_specs=[
                pl.BlockSpec((BR, wp), omap),               # zbuf rows
                pl.BlockSpec((16, wp), lambda i: (0, 0)),   # jump tables
            ] + fb_specs,                                   # halo groups
            out_specs=pl.BlockSpec((BR, wp), omap),
            out_shape=jax.ShapeDtypeStruct((hp, wp), I32),
            scratch_shapes=scratch,
        )

        def passes_fn(f):
            for _ in range(passes):
                fi = jax.lax.bitcast_convert_type(f, I32)
                fip = jnp.pad(fi, ((0, hp - h), (0, wp - w)))
                fbs = (fip,) if (dyn or ring) else (fip,) * G
                o = call(zbp, tab, *fbs)[:h, :w]
                o = jax.lax.bitcast_convert_type(o, f.dtype)
                f = jnp.where(keep, o, f) if w % 4 else o
            return f
        return passes_fn

    # dma: "wide"/"1" = explicit-DMA wide variant, "all" = both
    # variants, "0" = BlockSpec prefetch (A/B knob).  ring:
    # single-fetch VMEM ring instead of G halo-group BlockSpecs; dma
    # takes precedence where both are set.  The PWNFPS_BLUR_* env
    # forms are resolved by the dof_blur_auto wrapper.
    _dma = "0" if dma is None else dma
    _ring = bool(ring)
    near_dyn = _dma == "all"
    wide_dyn = _dma in ("1", "wide", "all")
    near_passes = build_call(G_NEAR, 1, dyn=near_dyn,
                             ring=_ring and not near_dyn)
    wide_passes = build_call(G_WIDE, 2, dyn=wide_dyn,
                             ring=_ring and not wide_dyn)

    # any tap beyond even the wide halo? fall back to the exact XLA
    # gather path (vmapped per camera frame when batched)
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
    reach = zmax * F32(fstr)
    near_ok = reach < F32((G_NEAR // 2) * BR - 0.5)
    wide_ok = reach < F32(RR - 0.5)
    return jax.lax.cond(
        near_ok, near_passes,
        lambda f: jax.lax.cond(wide_ok, wide_passes, fallback, f), fb)
