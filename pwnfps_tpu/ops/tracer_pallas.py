"""Mosaic (Pallas) backend for the shared wavefront tracer.

One grid program traces a tile of 8x128 = 1024 rays through all bounce
waves entirely in VMEM/registers - no HBM traffic per DDA step, per-tile
all-done early exit, and cell lookups via the VPU's hardware dynamic
gathers:

  * the packed per-cell channel word (ops/worlddev.py) lives as 32
    broadcast chunks of 128 lanes; a lookup is 32 take_along_axis ops +
    selects (measured: gathers pipeline to ~the cost of one);
  * sphere buckets become a per-cell 15-bit membership *mask* plane -
    bucket insertion order equals sphere index order in the reference
    (level.h:64-81), so a static index-ordered sphere loop masked by the
    cell's bits reproduces trace.h:252-296 test order exactly;
  * sphere SoA values are read as scalars (static unroll), no gathers;
  * the LCG runs in int32 (identical bit patterns; Mosaic lacks
    uint32->f32 casts).

Both modes run in-kernel: fast (hardware rsqrt/rcp/div/sqrt/
transcendentals) and parity (SSE-table rsqrt/rcp via chunked gathers,
integer-exact div/sqrt, the pinned libm) - so the Mosaic kernel itself
is bit-exact against the pinned CPU reference.  Differentially tested
against the jnp backend in tests/test_pallas.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import detmath
from ..core.approx import BLOCK as APPROX_BLOCK
from ..core.config import RenderConfig
from ..core.ieee import div_rn, sqrt_rn
from . import worlddev as W
from .tracer_core import (CellFields, Env, Math, SegState,
                          cell_index, decode_portal_word,
                          flat_cell_index, flat_cell_index_lw,
                          make_sphere_all,
                          make_sphere_rel, make_sphere_view,
                          trace_wave_env,
                          xcls_compress)
from .vec import C4, V3, dot_sse, normalise_sse

F32 = jnp.float32
I32 = jnp.int32

import os as _os

# rays per grid program; 8192 measured fastest at 1080p on v5e (bigger
# tiles amortize per-program overhead; 32768 exceeds scoped VMEM).
# Parity mode carries 3MB of extra exact-math tables per tile-row set,
# so it caps the tile at 2048 rays to stay inside scoped VMEM.
TILE = int(_os.environ.get("PWNFPS_PALLAS_TILE", "8192"))
PARITY_TILE = min(TILE, 2048)
NSPH_MAX = 16          # sphere capacity (matches the reference scene's
                       # 14 + headroom); the bound row sits past it
SPH_ROWS = 24          # sph table rows: 16 spheres + bound, sublane-8
                       # aligned (the bound no longer costs a slot)


def _rows(parity: bool) -> int:
    return (PARITY_TILE if parity else TILE) // 128


class PallasTables(NamedTuple):
    word: jnp.ndarray    # [WC,128] i32 full channel word, unreplicated
                         # ([1,128] zeros when the slot path replaces
                         # its only consumer, the portal fetch)
    cword: jnp.ndarray   # [CC*ROWS,128] i32: compact byte/cell (4/i32)
    ptab: jnp.ndarray    # [P*pslots/128,128] i32 dense portal records
                         # (worlddev.portal_slot_tables; [1,128] zeros
                         # when the slot path is off)
    mask: jnp.ndarray    # [WC*ROWS,128] i32: sphere membership bits
                         # (parity mode only; [1,128] zeros in fast)
    sph: jnp.ndarray     # [SPH_ROWS, 8] f32: x,y,z,r,refl,cb,cg,cr
    spht: jnp.ndarray    # [8,128] f32 transposed: row=channel
                         # (x,y,z,refl,cb,cg,cr), lane=sphere index -
                         # the fast path's per-lane winner gather
    rsqrt: jnp.ndarray   # [64*ROWS,128] i32: SSE rsqrtps result bits
    rcp: jnp.ndarray     # [32*ROWS,128] i32: SSE rcpps result bits


def _wchunks(lh: int) -> int:
    return lh // 2          # 64*lh cells / 128 lanes


def _pack4(cfg, has_clear: bool) -> bool:
    """4 cells per i32 in the compact table whenever the empty-space
    skip can never engage (parity mode, cfg.space_skip off, or a level
    with no clearance): the run bits are compiled out of the step body
    then, so the 7-bit entry (cls|xcls2|has_sph) suffices and the
    per-step chunked fetch scans HALF the chunks.  Entry values are
    identical bits (runs read as 0 to the consumers that never run)."""
    return cfg.parity or not cfg.space_skip or not has_clear


def _cchunks(lh: int, pack4: bool = False, lw: int = 64) -> int:
    # lw*lh cells / (2 or 4) per i32 / 128 lanes, rounded up (the
    # table pads to whole chunks with 0 == miss words)
    words = lw * lh // (4 if pack4 else 2)
    return -(-words // 128)


def _use_slot(pslots: int, pack4: bool) -> bool:
    """Portal fetch via the dense slot table?  Needs the slot id in
    the compact entry's run bits (pack2 only - the 7-bit pack4 entry
    has no room) and a capacity-sized table (pslots > 0)."""
    return pslots > 0 and not pack4


def build_tables(world: W.WorldDev, meta: W.WorldMeta,
                 rows: int, parity: bool,
                 pack4: bool = False, lw: int = 64) -> PallasTables:
    """Per-frame device tables for the kernel (cheap jnp ops).

    Cell tables cover only the first meta.lh grid rows: rows beyond hold
    uniform pad whose compact byte is 0 — exactly what a chunked-gather
    miss returns — so trimming cuts gather chunks and VMEM 64/lh-fold
    without changing any fetched value.

    Paged worlds (meta.n_pages > 1) store cell tables UNREPLICATED
    ([chunks, 128], one row per chunk): the per-sublane replication
    that makes single-page gathers one take per chunk would cost
    n_pages x ROWS x table bytes of VMEM; the paged fetch instead
    broadcasts each chunk row on the fly (_chunked_gather_paged)."""
    ROWS = rows
    paged = meta.n_pages > 1
    ncell = 64 * meta.lh * meta.n_pages

    def bcast_chunks(flat):   # [P*4096] -> [wchunks*ROWS,128] (or flat)
        ch = flat[:ncell].reshape(-1, 128)
        if paged:
            return ch
        return jnp.repeat(ch, ROWS, axis=0)

    def plain_chunks(flat):   # [P*4096] -> [chunks,128], unreplicated
        return flat[:ncell].reshape(-1, 128)

    # compact common-path entry: cls(4) | xcls2(2) | has_sph(1), plus
    # runx(4) | runz(4) unless pack4 (skip compiled out) - 2 cells per
    # int32, or 4 7-bit entries per int32 when pack4 halves the scan.
    # lw < 64 (single page): re-stride to lw columns - the trimmed-out
    # columns hold pad byte 0, which flat_cell_index_lw's pushed-past-
    # the-table indices reproduce as gather misses (bit-exact)
    if lw < 64 and not paged and not parity:
        def restride(flat):
            return flat[:4096].reshape(64, 64)[:meta.lh, :lw] \
                .reshape(-1)
        w = restride(world.word)
        ncell_c = lw * meta.lh    # compact table only; the full
        # word/mask tables keep the 64-stride ncell layout
    else:
        lw = 64
        restride = None
        w = world.word[:ncell]
        ncell_c = ncell
    cls = W.w_cls(w)
    not_p = cls != W.PORTAL
    use_slot = _use_slot(meta.pslots, pack4)
    cent = (cls | (xcls_compress(W.w_xcls(w)) << 4)
            | (jnp.where(W.w_nsph(w) > 0, 1, 0) << 6))
    if not pack4:
        cent = (cent
                | (jnp.where(not_p, W.w_runx(w), 0) << 7)
                | (jnp.where(not_p, W.w_runz(w), 0) << 11))
    if use_slot:
        # portal cells: dense slot id in the (zero) run bits, keyed
        # into ptab - the full word table leaves VMEM entirely
        slot, ptab_flat = W.portal_slot_tables(world.word,
                                               meta.n_pages,
                                               meta.pslots)
        slot = (restride(slot) if restride is not None
                else slot[:ncell_c])
        cent = cent | jnp.where(not_p, 0, slot << 7)
        ptab = ptab_flat.reshape(-1, 128)
    else:
        ptab = jnp.zeros((1, 128), jnp.int32)
    if paged:
        # portal cells of a paged world repurpose the nsph bits as the
        # target page, so their has_sph compact bit must stay clear
        cent = jnp.where(cls == W.PORTAL, cent & ~jnp.int32(1 << 6),
                         cent)
    if pack4:
        cb = cent.reshape(ncell_c // 4, 4)
        cword = (cb[:, 0] | (cb[:, 1] << 8) | (cb[:, 2] << 16)
                 | (cb[:, 3] << 24))
    else:
        cb = cent.reshape(ncell_c // 2, 2)
        cword = cb[:, 0] | (cb[:, 1] << 16)
    nw = _cchunks(meta.lh, pack4, lw) * 128 * meta.n_pages
    if cword.shape[0] < nw:   # pad to whole chunks (0 == miss word)
        cword = jnp.pad(cword, (0, nw - cword.shape[0]))
    cword_b = cword.reshape(-1, 128)
    if not paged:
        cword_b = jnp.repeat(cword_b, ROWS, axis=0)

    if parity:
        # sphere-bucket membership bit-plane: only the cell-driven
        # parity scan reads it (the fast path hoists all candidates)
        K = world.buckets.shape[0] // (4096 * meta.n_pages)
        b = world.buckets.reshape(4096 * meta.n_pages, K)[:ncell]
        mask = jnp.zeros(ncell, jnp.int32)
        for k in range(K):
            si = b[:, k]
            mask = mask | jnp.where(si >= 0,
                                    jnp.int32(1) << jnp.clip(si, 0, 30),
                                    0)
        mask = bcast_chunks(mask)
    else:
        mask = jnp.zeros((1, 128), jnp.int32)
    ns = world.sph_pos.shape[0]
    sph = jnp.zeros((SPH_ROWS, 8), jnp.float32)
    take = min(ns, NSPH_MAX)
    sph = sph.at[:take, 0:3].set(world.sph_pos[:take])
    sph = sph.at[:take, 3].set(world.sph_r[:take])
    sph = sph.at[:take, 4].set(world.sph_refl[:take])
    sph = sph.at[:take, 5:8].set(world.sph_col[:take])
    if meta.n_spheres > 0:
        # row NSPH_MAX (past the sphere slots): bounding sphere of all
        # scene spheres (centre + radius), the fast hoist-skip gate
        c = world.sph_pos[:meta.n_spheres]
        lo = c.min(axis=0)
        hi = c.max(axis=0)
        ctr = (lo + hi) * jnp.float32(0.5)
        rad = (jnp.sqrt(((c - ctr[None, :]) ** 2).sum(axis=1)).max()
               + world.sph_r[:meta.n_spheres].max())
        sph = sph.at[NSPH_MAX, 0:3].set(ctr)
        sph = sph.at[NSPH_MAX, 3].set(rad)
    # winner-record gather table (pos3/refl/col3 as per-lane gather
    # rows); BOTH modes read it in seg_out_view's rematerialization
    spht = jnp.zeros((8, 128), jnp.float32)
    if take > 0:
        for ch, col in enumerate((0, 1, 2, 4, 5, 6, 7)):
            spht = spht.at[ch, :take].set(sph[:take, col])
    def bcast_u32(flat, chunks):
        # parity-only exact-math tables; fast mode ships [1,128] zeros
        # so they cost no VMEM there
        if not parity:
            return jnp.zeros((1, 128), jnp.int32)
        return jnp.repeat(
            jax.lax.bitcast_convert_type(flat, jnp.int32)
            .reshape(chunks, 128), ROWS, axis=0)

    # the full word table only feeds the rare, cond-gated portal fetch:
    # keep it unreplicated ([chunks,128]) and broadcast on the fly -
    # ROWS x smaller VMEM for one extra op per chunk on portal steps.
    # With the slot path its consumer is gone: ship [1,128] zeros.
    word = (jnp.zeros((1, 128), jnp.int32) if use_slot
            else plain_chunks(world.word))
    return PallasTables(word=word, cword=cword_b, ptab=ptab,
                        mask=mask, sph=sph, spht=spht,
                        rsqrt=bcast_u32(world.rsqrt_tab, 64),
                        rcp=bcast_u32(world.rcp_tab, 32))


def _chunked_gather(tab_ref, idx, rows, chunks=32):
    """tab_ref: chunk-broadcast table rows; idx in [0, 128*chunks)."""
    lo = idx & 127
    hi = idx >> 7
    out = jnp.zeros_like(idx)
    for c in range(chunks):
        g = jnp.take_along_axis(tab_ref[rows * c:rows * (c + 1), :], lo,
                                axis=1)
        out = jnp.where(hi == c, g, out)
    return out


def _chunked_gather_paged(tab_ref, idx, chunks):
    """Unreplicated table ([chunks,128]): broadcast each chunk row on
    the fly.  One extra op per chunk vs _chunked_gather, but the VMEM
    footprint stays page-count-scalable."""
    lo = idx & 127
    hi = idx >> 7
    out = jnp.zeros_like(idx)
    for c in range(chunks):
        row = jnp.broadcast_to(tab_ref[c:c + 1, :], idx.shape)
        g = jnp.take_along_axis(row, lo, axis=1)
        out = jnp.where(hi == c, g, out)
    return out


_PAGE_UNIFORM = _os.environ.get("PWNFPS_PAGE_UNIFORM", "1") != "0"


def _compact_fetch(cword_ref, cx, cz, rows, chunks, page=None,
                   n_pages=1, pack4=False, move=None, span_k=0,
                   is_ref=True, lw=64) -> CellFields:
    """Common-path fields from the packed cell table: one chunked
    gather + sub-word extract (2 16-bit entries per i32, or 4 8-bit
    entries when pack4 - see _pack4).  Cells beyond the table (grid
    rows >= meta.lh) miss every chunk and read 0 == the pad entry.

    Mover-window mode (move is not None and span_k > 0, single-page
    worlds): `move` marks the lanes that consume the fetched word this
    step (tracer_core gates every f_next consumer behind it).  Their
    chunk indices span <= span_k chunks on ~87% of flagship tile-steps
    (tools/fetch_span.py: P(span<=2)=87.1%, and 17.6% of tile-steps
    have no movers at all), so one tile-uniform cond picks between a
    span_k-chunk scan at a dynamic base (the chip-proven scan_one
    sublane-slice pattern) and the full static scan.  Bit-exact: a
    covered mover reads the same word either way; an uncovered
    non-mover reads 0, which no consumer sees.  OOB movers clamp to
    cell 0 (flat_cell_index), which the masked min includes, so the
    window always covers them.

    Paged worlds: tiles are 64x128-PIXEL blocks, so their rays cross
    portals (the only page changes) nearly together - measured 100%
    of live maze-bench tile-steps have every lane on one page
    (tools/page_uniform.py).  The fetch therefore scans only that
    page's `chunks` table rows, selected dynamically via the same
    uniform-index take_along_axis rows the blur's banding uses, with
    a tile-mixed fallback cond scanning all pages (bit-identical: the
    same words reach the same lanes either way)."""
    if n_pages > 1:
        idx_l = flat_cell_index(cx, cz, None)       # page-local
        widx_l = idx_l >> 2 if pack4 else idx_l >> 1
        pmin = jnp.min(page)
        pmax = jnp.max(page)

        def scan_one(_):
            lo = widx_l & 127
            hi = widx_l >> 7
            base = pmin * chunks

            def scan_from(first, n):
                # dynamic sublane ref slices (Mosaic-supported; the
                # earlier uniform-index take_along_axis over the whole
                # table hit the gather lowering's shape assert on chip)
                out = jnp.zeros_like(widx_l)
                for c in range(n):
                    row = cword_ref[pl.ds(base + first + c, 1), :]
                    g = jnp.take_along_axis(
                        jnp.broadcast_to(row, widx_l.shape), lo, axis=1)
                    out = jnp.where(hi == first + c, g, out)
                return out

            if move is None or span_k <= 0 or chunks <= span_k:
                return scan_from(0, chunks)
            # mover-window refinement (see the single-page branch
            # below): movers' page-local chunk ids usually span <=
            # span_k of the page's `chunks` rows
            BIG = jnp.int32(1 << 20)
            hmn = jnp.min(jnp.where(move, hi, BIG))
            hmx = jnp.max(jnp.where(move, hi, -BIG))
            wfirst = jnp.clip(hmn, 0, chunks - span_k)
            return jax.lax.cond(
                hmx - hmn < span_k,
                lambda _: scan_from(wfirst, span_k),
                lambda _: scan_from(0, chunks), 0)

        def scan_all(_):
            idx = flat_cell_index(cx, cz, page)
            widx = idx >> 2 if pack4 else idx >> 1
            return _chunked_gather_paged(cword_ref, widx,
                                         chunks * n_pages)

        if _PAGE_UNIFORM:
            word = jax.lax.cond(pmin == pmax, scan_one, scan_all, 0)
        else:
            word = scan_all(0)
        idx = idx_l
    else:
        idx = flat_cell_index_lw(cx, cz, lw)
        widx = idx >> 2 if pack4 else idx >> 1
        if move is not None and span_k == -1:
            # ABLATION: pay the two per-step cross-lane reductions +
            # the cond but always take the full scan - isolates the
            # Mosaic reduction/cond overhead that made the window
            # fetch a net loss (perf_probe --spanfetch -1)
            hi = widx >> 7
            BIG = jnp.int32(1 << 20)
            hmn = jnp.min(jnp.where(move, hi, BIG))
            hmx = jnp.max(jnp.where(move, hi, -BIG))
            word = jax.lax.cond(
                hmx - hmn < jnp.int32(-(1 << 19)),
                lambda _: jnp.zeros_like(widx),
                lambda _: _chunked_gather(cword_ref, widx, rows,
                                          chunks=chunks), 0)
        elif move is None or span_k <= 0 or chunks <= span_k:
            word = _chunked_gather(cword_ref, widx, rows, chunks=chunks)
        else:
            hi = widx >> 7
            BIG = jnp.int32(1 << 20)
            hmn = jnp.min(jnp.where(move, hi, BIG))
            hmx = jnp.max(jnp.where(move, hi, -BIG))
            # no movers: hmx-hmn < 0 <= span_k takes the window branch
            # with a garbage base - sound, nothing consumes the result
            base = jnp.clip(hmn, 0, chunks - span_k)
            lo = widx & 127

            def scan_window(_):
                out = jnp.zeros_like(widx)
                for c in range(span_k):
                    if is_ref:
                        row = cword_ref[pl.ds((base + c) * rows, 1), :]
                    else:   # jnp-array stand-in (tools/op_census.py)
                        row = jax.lax.dynamic_slice_in_dim(
                            cword_ref, (base + c) * rows, 1)
                    g = jnp.take_along_axis(
                        jnp.broadcast_to(row, widx.shape), lo, axis=1)
                    out = jnp.where(hi == base + c, g, out)
                return out

            def scan_full(_):
                return _chunked_gather(cword_ref, widx, rows,
                                       chunks=chunks)

            word = jax.lax.cond(hmx - hmn < span_k, scan_window,
                                scan_full, 0)
    if pack4:
        ent = (word >> ((idx & 3) * 8)) & 0x7F
    else:
        ent = (word >> ((idx & 1) * 16)) & 0x7FFF
    return CellFields(ent=ent)


def _pack_bgra_i32(col: C4):
    """col_ftoint (util.h:48-59 semantics) on int32 lanes - bit-equal
    to tracer_core.col_ftoint's uint32 result, Mosaic-friendly."""
    def one(c, shift):
        v = c * F32(255.0)
        r = jax.lax.round(v, jax.lax.RoundingMethod.TO_NEAREST_EVEN)
        bad = (v >= F32(2147483648.0)) | jnp.isnan(v)
        b = jnp.clip(r, 0.0, 255.0).astype(jnp.int32)
        b = jnp.where(bad, 0, b)
        return b << shift

    return one(col.b, 0) | one(col.g, 8) | one(col.r, 16) | one(col.a,
                                                                24)


def _randfs_i32(s):
    """Reference LCG on int32 lanes (bit-identical to the uint32 form)."""
    s = (s * 25739 + 4) & 0x7FFFFFFF
    f = (s % 3759).astype(F32) * np.float32(1.0 / 3759.0)
    return s, f * F32(2.0) - F32(1.0)


def _parity_math(rsqrt_ref, rcp_ref, rows) -> Math:
    """Bit-exact math bundle inside the kernel: SSE-table rsqrt/rcp via
    chunked hardware gathers, integer-exact div/sqrt, the pinned libm
    (all built from ops Mosaic supports: int alu, bitcast, fori)."""
    def _emu(tab_ref, chunks, idx):
        return _chunked_gather(tab_ref, idx, rows, chunks=chunks)

    def rsq(x):
        bits = jax.lax.bitcast_convert_type(x, jnp.int32)
        e = (bits >> 23) & 0xFF
        m = bits & 0x7FFFFF
        d = e - 127
        k = d >> 1
        ppar = d - 2 * k
        idx = ppar * 4096 + (m >> APPROX_BLOCK)
        y = jax.lax.bitcast_convert_type(_emu(rsqrt_ref, 64, idx),
                                         jnp.float32)
        scale = jax.lax.bitcast_convert_type((127 - k) << 23, jnp.float32)
        return y * scale

    def rcp(x):
        bits = jax.lax.bitcast_convert_type(x, jnp.int32)
        e = (bits >> 23) & 0xFF
        m = bits & 0x7FFFFF
        k = e - 127
        idx = m >> APPROX_BLOCK
        y = jax.lax.bitcast_convert_type(_emu(rcp_ref, 32, idx),
                                         jnp.float32)
        scale = jax.lax.bitcast_convert_type((127 - k) << 23, jnp.float32)
        return y * scale

    return Math(rsq=rsq, rcp=rcp,
                div=lambda a, b: div_rn(a, b, jnp),
                sqrt=lambda x: sqrt_rn(x, jnp),
                sin=lambda x: detmath.sin_det(x, jnp),
                cos=lambda x: detmath.cos_det(x, jnp),
                exp=lambda x: detmath.exp_det(x, jnp))


def _fast_math() -> Math:
    return Math(rsq=jax.lax.rsqrt, rcp=lambda x: 1.0 / x,
                div=lambda a, b: a / b, sqrt=jnp.sqrt,
                sin=jnp.sin, cos=jnp.cos, exp=jnp.exp)


def _sphere_pass_pallas(mask_ref, sph_ref, n_spheres: int, math: Math,
                        rows: int, wchunks: int, n_pages: int = 1):
    """Two-phase form of trace.h:252-296: a cheap candidate loop keeps
    only the winning sphere's parameters (last strictly-closer update,
    preserving the reference's insertion-order tie-break), then one
    shared shading computes position/normal/colour from the winner's
    exact inputs -- bit-identical to shading inside the loop, ~3x
    fewer vector ops and (in parity mode) 14x fewer table-gather
    rsqrt calls per gated step."""
    def run(s: SegState, inb, f: CellFields):
        cidx = cell_index(s)
        if n_pages > 1:
            m = _chunked_gather_paged(mask_ref, cidx,
                                      wchunks * n_pages)
        else:
            m = _chunked_gather(mask_ref, cidx, rows,
                                chunks=wchunks)
        aux_dist = s.aux_dist
        zero = jnp.zeros_like(s.pos.x)
        new = zero > F32(1.0)           # any update this step, per lane
        w_sd = zero                     # winner's raw sph_dist
        w_pos = V3(zero, zero, zero)    # winner's centre
        w_idx = jnp.zeros_like(s.aux_idx)
        for si in range(n_spheres):
            hit_slot = ((m >> si) & 1) > 0
            valid = (s.active != 0) & inb & hit_slot
            spos = V3(sph_ref[si, 0] + zero, sph_ref[si, 1] + zero,
                      sph_ref[si, 2] + zero)
            sr = sph_ref[si, 3]
            # lane-shaped: Mosaic bitcasts (used by the exact-math div)
            # only accept vectors
            rad2 = (sr * sr) + zero
            rel = spos - s.pos
            dist2 = dot_sse(rel, rel)
            dot = dot_sse(rel, s.ray)
            calcrad2 = dist2 - dot * dot
            safe_rad2 = jnp.maximum(rad2, F32(1e-30))
            sph_dist = math.sqrt(dist2) - math.sqrt(jnp.maximum(
                F32(1.0) - math.div(calcrad2, safe_rad2), F32(0.0)))
            upd = (valid & (dot > 0.0) & (calcrad2 < rad2)
                   & ((aux_dist == F32(-1.0))
                      | (sph_dist + s.cdist < aux_dist)))
            aux_dist = jnp.where(upd, sph_dist + s.cdist, aux_dist)
            new = new | upd
            w_sd = jnp.where(upd, sph_dist, w_sd)
            w_pos = spos.where(upd, w_pos)
            w_idx = jnp.where(upd, si, w_idx)
        # shared shading of the winner (same float ops as in-loop);
        # the normal/colour rematerialize in seg_out_view
        apos = s.pos + w_sd * s.ray
        anorm = normalise_sse(apos - w_pos, math.rsq)
        diff = jnp.maximum(-dot_sse(s.ray, anorm), 0.0)
        diff = F32(0.2) + F32(0.8) * diff
        return (aux_dist,
                apos.where(new, s.aux_apos),
                jnp.where(new, w_idx, s.aux_idx),
                jnp.where(new, diff, s.aux_diff))

    return run


def _kernel(cfg: RenderConfig, n_spheres: int, lh: int, lw: int,
            has_clear: bool,
            n_pages: int, sphere_page: int, pack: bool, pslots: int,
            sph_slack: float,
            word_ref, cword_ref, ptab_ref, mask_ref, sph_ref, spht_ref,
            rsqrt_ref, rcp_ref, sec_ref, page0_ref,
            fx, fy, fz, rx, ry, rz, seed_ref, *outs):
    rows = _rows(cfg.parity)
    paged = n_pages > 1
    pack4 = _pack4(cfg, has_clear)
    use_slot = _use_slot(pslots, pack4)

    def fetch(cx, cz, page, move=None) -> CellFields:
        return _compact_fetch(cword_ref, cx, cz, rows,
                              _cchunks(lh, pack4, lw), page, n_pages,
                              pack4, move=move, span_k=cfg.span_fetch,
                              lw=lw)

    if use_slot:
        def fetch_portal(s_):
            # dense record keyed by the entry's slot id: a 1-2 chunk
            # gather instead of scanning the full word table; field
            # values identical bits (worlddev.portal_slot_tables)
            idx = s_.fields.pslot
            if paged:
                idx = idx + s_.page * pslots
            chunks = n_pages * pslots // 128
            if chunks == 1:
                # idx <= 127 by capacity: one gather, no chunk scan
                row = jnp.broadcast_to(ptab_ref[0:1, :], idx.shape)
                r = jnp.take_along_axis(row, idx, axis=1)
            else:
                r = _chunked_gather_paged(ptab_ref, idx, chunks)
            out = (r & 3, (r >> 2) & 3,
                   ((r >> 4) & 0x7F) - 64, ((r >> 11) & 0x7F) - 64)
            return out + ((r >> 18) & 0xF,) if paged else out
    else:
        def fetch_portal(s_):
            # the word table is unreplicated (build_tables): broadcast
            # each chunk row on the fly - portal-cond-gated, rare
            w = _chunked_gather_paged(word_ref, cell_index(s_),
                                      _wchunks(lh) * n_pages)
            if paged:
                return decode_portal_word(w) + (W.w_dpage(w),)
            return decode_portal_word(w)

    math = _parity_math(rsqrt_ref, rcp_ref, rows) if cfg.parity \
        else _fast_math()
    # cell-driven bucket scan: parity mode only (the fast path covers
    # every lane with hoisted candidates, re-derived on line changes)
    sphere_pass = (_sphere_pass_pallas(mask_ref, sph_ref, n_spheres,
                                       math, rows, _wchunks(lh),
                                       n_pages)
                   if cfg.parity and n_spheres > 0 else None)

    def gather_sphere(idx):
        def ch(row):
            t = jnp.broadcast_to(spht_ref[row:row + 1, :],
                                 idx.shape)
            return jnp.take_along_axis(t, idx, axis=1)

        return (V3(ch(0), ch(1), ch(2)), ch(3),
                (ch(4), ch(5), ch(6)))

    if cfg.parity:
        sphere_all = None
    else:
        def get_sphere(si):
            return (V3(sph_ref[si, 0], sph_ref[si, 1], sph_ref[si, 2]),
                    sph_ref[si, 3], sph_ref[si, 4],
                    tuple(sph_ref[si, 5 + c] for c in range(3)))

        def get_bound():
            return (V3(sph_ref[NSPH_MAX, 0], sph_ref[NSPH_MAX, 1],
                       sph_ref[NSPH_MAX, 2]), sph_ref[NSPH_MAX, 3])

        sphere_all = (make_sphere_all(
            n_spheres, get_sphere, math, get_bound,
            sphere_page=sphere_page if paged else None,
            gather_sphere=gather_sphere, slack=sph_slack)
            if n_spheres > 0 else None)
    sphere_view = (make_sphere_view(gather_sphere, math)
                   if (sphere_all is not None or sphere_pass is not None)
                   else None)
    sphere_rel = (make_sphere_rel(
        get_bound, sphere_page=sphere_page if paged else None,
        slack=sph_slack)
        if sphere_all is not None else None)
    env = Env(math=math, fetch=fetch, fetch_portal=fetch_portal,
              sphere_pass=sphere_pass, randfs=_randfs_i32,
              sphere_all=sphere_all, sphere_view=sphere_view,
              sphere_rel=sphere_rel,
              skip_ok=has_clear, paged=paged, n_pages=n_pages)

    ifrom = V3(fx[:], fy[:], fz[:])
    iray = V3(rx[:], ry[:], rz[:])
    page = (jnp.full_like(seed_ref[:], page0_ref[0, 0]) if paged
            else None)
    col, dist = trace_wave_env(env, cfg, ifrom, iray, seed_ref[:],
                               sec_ref[0, 0], page)
    if pack:
        ofb, od = outs
        ofb[:] = _pack_bgra_i32(col)
        od[:] = dist
    else:
        ob, og, orr, oa, od = outs
        ob[:] = col.b
        og[:] = col.g
        orr[:] = col.r
        oa[:] = col.a
        od[:] = dist


@functools.partial(jax.jit,
                   static_argnames=("cfg", "n_spheres", "n_rays", "lh",
                                    "lw", "has_clear", "n_pages",
                                    "sphere_page", "pack", "pslots",
                                    "sph_slack", "frame_hw"))
def _trace_pallas(tables: PallasTables, cfg: RenderConfig,
                  n_spheres: int, n_rays: int, lh: int, lw: int,
                  has_clear: bool,
                  n_pages: int, sphere_page: int, pack: bool,
                  pslots: int, sph_slack: float,
                  fx, fy, fz, rx, ry, rz, seeds, sec, page0,
                  frame_hw=None):
    tile = PARITY_TILE if cfg.parity else TILE
    ROWS = tile // 128
    paged = n_pages > 1
    if frame_hw is not None:
        # 2D frame layout: inputs are ROW-MAJOR [h*w] pixels; each grid
        # step's BlockSpec addresses its (ROWS, 128) pixel rectangle of
        # the padded (hp, wp) frame directly, and outputs land row-major
        # the same way.  Kills the block-major tile/untile relayouts the
        # flat path pays in XLA (7 inputs + 2 outputs per frame), and is
        # the layout under which a row-band-sharded mesh untiles locally.
        # Per-tile blocks (and the grid order) are identical to the flat
        # path's _tile_rays blocks, so the outputs are bit-equal.
        h, w = frame_hw
        assert n_rays == h * w and not cfg.parity
        hp = -(-h // ROWS) * ROWS
        wp = -(-w // 128) * 128
        nbx = wp // 128
        tiles = (hp // ROWS) * nbx

        def pad(a, fill):
            return jnp.pad(a.reshape(h, w),
                           ((0, hp - h), (0, wp - w)),
                           constant_values=fill)

        tile_spec = pl.BlockSpec(
            (ROWS, 128), lambda i: (i // nbx, i % nbx),
            memory_space=pltpu.VMEM)
        oshape = (hp, wp)
    else:
        n_pad = -(-n_rays // tile) * tile
        tiles = n_pad // tile

        def pad(a, fill):
            return jnp.pad(a, (0, n_pad - n_rays),
                           constant_values=fill).reshape(tiles * ROWS,
                                                         128)

        tile_spec = pl.BlockSpec((ROWS, 128), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
        oshape = (tiles * ROWS, 128)

    fx, fy, fz = pad(fx, 1.0), pad(fy, 0.5), pad(fz, 1.0)
    rx, ry, rz = pad(rx, 0.5), pad(ry, -0.5), pad(rz, 0.5)
    if seeds.dtype != jnp.int32:
        seeds = jax.lax.bitcast_convert_type(seeds, jnp.int32)
    seeds = pad(seeds, 1)
    sec2 = jnp.asarray(sec, jnp.float32).reshape(1, 1)
    page2 = jnp.asarray(page0, jnp.int32).reshape(1, 1)
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((1, 1), lambda i: (0, 0),
                        memory_space=pltpu.SMEM)
    wrep = 1 if paged else ROWS    # paged cell tables are unreplicated
    mask_shape = ((_wchunks(lh) * n_pages * wrep, 128) if cfg.parity
                  else (1, 128))
    use_slot = _use_slot(pslots, _pack4(cfg, has_clear))
    word_shape = ((1, 128) if use_slot
                  else (_wchunks(lh) * n_pages, 128))
    ptab_shape = ((n_pages * pslots // 128, 128) if use_slot
                  else (1, 128))
    grid_spec = pl.GridSpec(
        grid=(tiles,),
        in_specs=[full(word_shape),
                  full((_cchunks(lh, _pack4(cfg, has_clear), lw)
                        * n_pages * wrep, 128)),
                  full(ptab_shape),
                  full(mask_shape),
                  full((SPH_ROWS, 8)), full((8, 128)),
                  full((64 * ROWS, 128) if cfg.parity else (1, 128)),
                  full((32 * ROWS, 128) if cfg.parity else (1, 128)),
                  smem, smem,
                  tile_spec, tile_spec, tile_spec,
                  tile_spec, tile_spec, tile_spec, tile_spec],
        out_specs=[tile_spec] * (2 if pack else 5),
    )
    f32s = jax.ShapeDtypeStruct(oshape, jnp.float32)
    i32s = jax.ShapeDtypeStruct(oshape, jnp.int32)
    outs = [i32s, f32s] if pack else [f32s] * 5
    kern = functools.partial(_kernel, cfg, n_spheres, lh, lw,
                             has_clear,
                             n_pages, sphere_page, pack, pslots,
                             sph_slack)
    res = pl.pallas_call(
        kern, out_shape=outs, grid_spec=grid_spec,
    )(tables.word, tables.cword, tables.ptab, tables.mask, tables.sph,
      tables.spht, tables.rsqrt, tables.rcp, sec2, page2,
      fx, fy, fz, rx, ry, rz, seeds)

    if frame_hw is not None:
        def unpad(a):
            return a[:frame_hw[0], :frame_hw[1]]
    else:
        def unpad(a):
            return a.reshape(-1)[:n_rays]

    if pack:
        ofb, od = res
        fb = jax.lax.bitcast_convert_type(unpad(ofb), jnp.uint32)
        return fb, unpad(od)
    ob, og, orr, oa, od = res
    return (C4(unpad(ob), unpad(og), unpad(orr), unpad(oa)), unpad(od))


def trace_wave_pallas(world: W.WorldDev, meta: W.WorldMeta,
                      cfg: RenderConfig, ifrom: V3, iray: V3, seed, sec,
                      page0=0, pack=False, frame_hw=None):
    """Drop-in trace_wave with the Mosaic kernel backend.  All rays
    start in page `page0` (paged worlds).  pack=True quantizes to BGRA8
    IN-KERNEL (bit-equal to tracer_core.col_ftoint) and returns
    (fb uint32 [n], dist) instead of (C4, dist) - one XLA pass and
    three framebuffer-sized HBM writes fewer.

    frame_hw=(h, w) (fast mode + pack only): the flat inputs are
    row-major frame pixels; the kernel's BlockSpecs address (64, 128)
    pixel rectangles of the padded frame directly and the outputs come
    back as [h, w] arrays - no host-side tile/untile relayouts.
    Bit-equal to the flat path (same blocks, same grid order)."""
    assert meta.n_spheres <= NSPH_MAX, (
        f"pallas path supports <= {NSPH_MAX} spheres, got "
        f"{meta.n_spheres}")
    lw = meta.lw if not cfg.parity and meta.n_pages == 1 else 64
    tables = build_tables(world, meta, _rows(cfg.parity), cfg.parity,
                          pack4=_pack4(cfg, meta.has_clear), lw=lw)
    n = ifrom.x.shape[0]
    return _trace_pallas(tables, cfg, meta.n_spheres, n, meta.lh, lw,
                         meta.has_clear, meta.n_pages, meta.sphere_page,
                         pack, meta.pslots, meta.sph_slack,
                         ifrom.x, ifrom.y, ifrom.z,
                         iray.x, iray.y, iray.z, seed, sec, page0,
                         frame_hw=frame_hw)
