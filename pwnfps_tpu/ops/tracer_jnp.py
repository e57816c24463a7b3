"""XLA backend for the shared wavefront tracer (ops/tracer_core.py).

Plain jnp ops over [N] arrays; gathers via jnp.take.  This is the
reference/parity path (bit-compatible with ops/tracer_ref.py wherever
XLA's f32 primitives are IEEE); ops/tracer_pallas.py is the fast path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import detmath, lcg
from ..core.approx import rcp_emu, rsqrt_emu
from ..core.config import RenderConfig
from ..core.ieee import div_rn, sqrt_rn
from . import worlddev as W
from .tracer_core import (CellFields, Env, Math, SegState,  # noqa: F401
                          cell_index, col_ftoint, decode_portal_word,
                          decode_word, flat_cell_index, make_sphere_all,
                          make_sphere_rel, make_sphere_view,
                          trace_wave_env)
from .vec import C4, V3, dot_sse, normalise_sse

F32 = jnp.float32
I32 = jnp.int32


def make_math(world: W.WorldDev, parity: bool) -> Math:
    if parity:
        return Math(
            rsq=lambda x: rsqrt_emu(x, world.rsqrt_tab, jnp),
            rcp=lambda x: rcp_emu(x, world.rcp_tab, jnp),
            div=lambda a, b: div_rn(a, b, jnp),
            sqrt=lambda x: sqrt_rn(x, jnp),
            sin=lambda x: detmath.sin_det(x, jnp),
            cos=lambda x: detmath.cos_det(x, jnp),
            exp=lambda x: detmath.exp_det(x, jnp),
        )
    return Math(rsq=jax.lax.rsqrt, rcp=lambda x: 1.0 / x,
                div=lambda a, b: a / b, sqrt=jnp.sqrt,
                sin=jnp.sin, cos=jnp.cos, exp=jnp.exp)


def _sphere_pass(world: W.WorldDev, meta: W.WorldMeta, math: Math):
    """Bucket-slot scan preserving reference test order (trace.h:252-296)."""
    K = world.buckets.shape[0] // (4096 * meta.n_pages)
    ns = world.sph_pos.shape[0]

    def run(s: SegState, inb, f: CellFields):
        # two-phase form (see _sphere_pass_pallas): the slot loop keeps
        # only the winner's ordering state (last strictly-closer update,
        # reference insertion-order tie-break), then one shared shading
        # derives apos/diff from the winner's exact inputs -- the
        # normal/colour themselves rematerialize once per segment in
        # seg_out_view (bit-identical: same inputs, same expressions)
        aux_dist = s.aux_dist
        cidx = cell_index(s)
        zero = jnp.zeros_like(s.pos.x)
        new = zero > F32(1.0)
        w_sd = zero
        w_idx = jnp.zeros_like(s.aux_idx)
        for k in range(meta.k_bucket):
            si = jnp.take(world.buckets, cidx * K + k, mode="clip")
            valid = (s.active != 0) & inb & (k < f.nsph) & (si >= 0)
            siC = jnp.clip(si, 0, ns - 1)
            spos = V3(jnp.take(world.sph_pos[:, 0], siC, mode="clip"),
                      jnp.take(world.sph_pos[:, 1], siC, mode="clip"),
                      jnp.take(world.sph_pos[:, 2], siC, mode="clip"))
            sr = jnp.take(world.sph_r, siC, mode="clip")
            rad2 = sr * sr
            rel = spos - s.pos
            dist2 = dot_sse(rel, rel)
            dot = dot_sse(rel, s.ray)
            calcrad2 = dist2 - dot * dot
            sph_dist = math.sqrt(dist2) - math.sqrt(jnp.maximum(
                F32(1.0) - math.div(
                    calcrad2, jnp.where(rad2 > 0, rad2, F32(1.0))),
                F32(0.0)))
            upd = (valid & (dot > 0.0) & (calcrad2 < rad2)
                   & ((aux_dist == F32(-1.0))
                      | (sph_dist + s.cdist < aux_dist)))
            aux_dist = jnp.where(upd, sph_dist + s.cdist, aux_dist)
            new = new | upd
            w_sd = jnp.where(upd, sph_dist, w_sd)
            w_idx = jnp.where(upd, siC, w_idx)
        w_pos = V3(*(jnp.take(world.sph_pos[:, c], w_idx, mode="clip")
                     for c in range(3)))
        apos = s.pos + w_sd * s.ray
        anorm = normalise_sse(apos - w_pos, math.rsq)
        diff = jnp.maximum(-dot_sse(s.ray, anorm), 0.0)
        diff = F32(0.2) + F32(0.8) * diff
        return (aux_dist,
                apos.where(new, s.aux_apos),
                jnp.where(new, w_idx, s.aux_idx),
                jnp.where(new, diff, s.aux_diff))

    return run


def make_env(world: W.WorldDev, meta: W.WorldMeta,
             cfg: RenderConfig) -> Env:
    math = make_math(world, cfg.parity)

    paged = meta.n_pages > 1
    if meta.n_spheres > 1023:
        # the packed event-cond word and while-carry word give aux_idx
        # 10 bits (tracer_core.portal_calc / _pack_carry); the pallas
        # backend caps at 16 spheres anyway (NSPH_MAX)
        raise ValueError(
            f"n_spheres={meta.n_spheres} exceeds the 1023-sphere "
            "aux_idx packing bound")

    # per-cell packed entry, precomputed ONCE (decode_word is
    # elementwise): per-step fetch = one gather, no repacking.  Portal
    # cells additionally carry their dense slot id in the run bits
    # (zero there otherwise; see CellFields.pslot / worlddev
    # portal_slot_tables), pointing into the compact record table that
    # replaces the full-word gather in fetch_portal.
    ent_tab = decode_word(world.word).ent
    if meta.pslots:
        slot, ptab = W.portal_slot_tables(world.word, meta.n_pages,
                                          meta.pslots)
        is_p = (world.word & 0xF) == W.PORTAL
        ent_tab = ent_tab | jnp.where(is_p, slot << 7, 0)

    def fetch(cx, cz, page, move=None) -> CellFields:
        # move (the consuming-lane mask) is a pallas-backend fetch
        # hint; the XLA gather reads the whole table uniformly
        idx = flat_cell_index(cx, cz, page if paged else None)
        return CellFields(ent=jnp.take(ent_tab, idx, mode="clip"))

    if meta.pslots:
        def fetch_portal(s_):
            idx = s_.fields.pslot
            if paged:
                idx = idx + s_.page * meta.pslots
            r = jnp.take(ptab, idx, mode="clip")
            out = (r & 3, (r >> 2) & 3,
                   ((r >> 4) & 0x7F) - 64, ((r >> 11) & 0x7F) - 64)
            return out + ((r >> 18) & 0xF,) if paged else out
    else:
        def fetch_portal(s_):
            w = jnp.take(world.word, cell_index(s_), mode="clip")
            out = decode_portal_word(w)
            return out + (W.w_dpage(w),) if paged else out

    # cell-driven bucket scan: parity mode only.  The fast path covers
    # every lane with hoisted candidates (re-derived on line-change
    # events), so it carries no per-cell sphere machinery at all.
    sphere_pass = (_sphere_pass(world, meta, math)
                   if cfg.parity and meta.k_bucket > 0 else None)

    ns_total = world.sph_pos.shape[0]

    def gather_sphere(idx):
        iC = jnp.clip(idx, 0, ns_total - 1)
        return (V3(*(jnp.take(world.sph_pos[:, c], iC, mode="clip")
                     for c in range(3))),
                jnp.take(world.sph_refl, iC, mode="clip"),
                tuple(jnp.take(world.sph_col[:, c], iC, mode="clip")
                      for c in range(3)))

    if cfg.parity:
        sphere_all = None
    else:
        # fast: hoist sphere candidates out of the DDA loop (see
        # tracer_core.make_sphere_all for the equivalence argument)
        def get_sphere(si):
            return (V3(world.sph_pos[si, 0], world.sph_pos[si, 1],
                       world.sph_pos[si, 2]),
                    world.sph_r[si], world.sph_refl[si],
                    tuple(world.sph_col[si, c] for c in range(3)))

        def get_bound():
            c = world.sph_pos[:meta.n_spheres]
            lo = c.min(axis=0)
            hi = c.max(axis=0)
            ctr = (lo + hi) * F32(0.5)
            rad = (jnp.sqrt(((c - ctr[None, :]) ** 2).sum(axis=1)).max()
                   + world.sph_r[:meta.n_spheres].max())
            return V3(ctr[0], ctr[1], ctr[2]), rad

        sphere_all = (make_sphere_all(
            meta.n_spheres, get_sphere, math, get_bound,
            sphere_page=meta.sphere_page if paged else None,
            gather_sphere=gather_sphere, slack=meta.sph_slack)
            if meta.n_spheres > 0 else None)
    sphere_view = (make_sphere_view(gather_sphere, math)
                   if (sphere_all is not None or sphere_pass is not None)
                   else None)
    sphere_rel = (make_sphere_rel(
        get_bound, sphere_page=meta.sphere_page if paged else None,
        slack=meta.sph_slack)
        if sphere_all is not None else None)
    return Env(math=math, fetch=fetch, fetch_portal=fetch_portal,
               sphere_pass=sphere_pass,
               randfs=lambda s: lcg.randfs(s, jnp),
               sphere_all=sphere_all, sphere_view=sphere_view,
               sphere_rel=sphere_rel,
               skip_ok=meta.has_clear, paged=paged,
               n_pages=meta.n_pages)


def trace_wave(world: W.WorldDev, meta: W.WorldMeta, cfg: RenderConfig,
               ifrom: V3, iray: V3, seed, sec, page=None):
    """Full multi-bounce trace. Returns (col: C4 of [N], dist [N])."""
    env = make_env(world, meta, cfg)
    return trace_wave_env(env, cfg, ifrom, iray, seed, sec, page)
