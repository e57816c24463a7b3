"""Shared wavefront-tracer semantics (backend-independent).

The reference marches each pixel's ray recursively on one CPU core
(/root/reference/trace.h:186-679).  Here ALL rays advance together as
masked SoA state; this module holds the *semantics* - DDA stepping, cell
branches, portal rotation, fog, shading, bounce - written against an
abstract `Env` so two backends share one source of truth:

  * tracer_jnp: plain XLA ops ([N] arrays, jnp.take gathers) - the
    reference/parity path;
  * tracer_pallas: a Mosaic kernel ([8,128] registers, chunked
    hardware take_along_axis gathers, per-tile early exit) - the
    performance path.

Every mask/order quirk is cited to the reference; see SURVEY.md section 7.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import (COL_CEIL, COL_FLOOR, COL_MAGENTA, COL_WALL,
                           EPSILON, FXP, FZP, FXN, FZN, FYP, FYN,
                           RenderConfig)
from . import worlddev as W
from .vec import C4, V3, dot_sse, normalise_sse

F32 = jnp.float32
I32 = jnp.int32

# terminal kinds
T_NONE, T_WALL, T_SPHERE, T_SKY = 0, 1, 2, 3
# wall colour ids
C_CEIL, C_FLOOR, C_WALL, C_MAGENTA = 0, 1, 2, 3

PAL = np.array([COL_CEIL, COL_FLOOR, COL_WALL, COL_MAGENTA], np.float32)


class Math(NamedTuple):
    """Float-semantics bundle: parity mode plugs bit-exact emulations
    (core.approx tables, core.ieee division/sqrt, core.detmath pinned
    libm); fast mode plugs the hardware ops."""

    rsq: Any
    rcp: Any
    div: Any
    sqrt: Any
    sin: Any
    cos: Any
    exp: Any


class CellFields(NamedTuple):
    """The current cell's channels, packed in ONE carried i32 plane.

    Bit layout (the pallas compact-word entry, shared verbatim):
      0-3  cls            4-5  xcls2 ({0: other, 1: tall-like, 2: lower},
                               the 2-high wall check, trace.h:404-440)
      6    has_sph        7-10 runx (empty-space skip)
      11-14 runz          15-19 nsph bucket count (jnp backend only;
                               the pallas parity scan uses its bucket
                               bit-plane instead)
    Carrying the packed entry instead of six decoded planes trades ~4
    shift/and ops per step for 5 fewer loop-carried planes and one
    where() instead of six at the post-step select.  The flat cell
    index is NOT carried: the rare consumers (portal fetch, parity
    bucket scan) recompute it from (cx, cz, page) inside their cond.
    Portal fields live behind Env.fetch_portal (rare, fetched lazily).
    """

    ent: jnp.ndarray

    @property
    def cls(self):
        return self.ent & 0xF

    @property
    def xcls2(self):
        return (self.ent >> 4) & 3

    @property
    def has_sph(self):
        return (self.ent >> 6) & 1

    @property
    def runx(self):
        return (self.ent >> 7) & 0xF

    @property
    def runz(self):
        return (self.ent >> 11) & 0xF

    @property
    def nsph(self):
        return (self.ent >> 15) & 0x1F

    @property
    def pslot(self):
        """Dense per-page portal-slot id, riding the run bits (7-14,
        zero on non-portal cells in both backends - worlddev
        portal_slot_tables).  Meaningful only on portal cells; runx/
        runz of a portal-cell lane read slot bits instead of runs,
        which is sound because portal lanes never take the stepping
        path that consumes them (goes/cont exclude cls == PORTAL)."""
        return (self.ent >> 7) & 0xFF


class Env(NamedTuple):
    """Backend services for the shared tracer semantics."""

    math: Math
    # fn(cx, cz, page) -> CellFields (OOB clamps to cell 0 of the
    # lane's page; page is None in single-page worlds)
    fetch: Any
    # fn(state) -> (pkind, prot, pdcx, pdcz[, dpage when paged]) of the
    # lane's current cell; backends fetch via the dense slot table
    # (fields.pslot) or the full word table (cell_index), bit-identical
    fetch_portal: Any
    sphere_pass: Any   # fn(state, inb, fields) -> aux 4-tuple (or None)
    randfs: Any        # fn(seed) -> (seed, f32 value)
    # fast mode only: fn(state, mask) -> aux 6-tuple testing EVERY
    # sphere against the lane's current ray line (no bucket gating),
    # hoisted out of the DDA loop at segment start (make_sphere_all).
    sphere_all: Any = None
    # fn(state) -> (aux_refl, aux_pos, aux_norm, aux_col): winner
    # rematerialization for SegOut (make_sphere_view); None when the
    # scene has no spheres.
    sphere_view: Any = None
    # fast mode only: fn(px, pz, vx, vz, page) -> bool plane, the XZ
    # line-vs-bounding-circle relevance of a PROSPECTIVE line
    # (make_sphere_rel).  Lets portal traversal decide INLINE whether
    # the post-portal line can see any sphere, instead of always
    # marking the lane dirty and firing the refresh cond next step.
    sphere_rel: Any = None
    # static: may the empty-space skip engage?  False when the level's
    # clearance field is all-zero (tight maze), stripping the skip ops
    # from the step body at trace time.
    skip_ok: bool = True
    # static: multi-page world atlas (SegState.page lanes live, portal
    # traversal may switch pages).  False strips every page op.
    paged: bool = False
    # static page count (paged worlds): pages pack into the carry word
    # when they fit its 14 spare bits (see _pack_carry), else the page
    # plane is carried separately.
    n_pages: int = 1


def xcls_compress(xcls):
    return jnp.where((xcls == W.TALL) | (xcls == W.TALLFOG), 1,
                     jnp.where(xcls == W.LOWER, 2, 0))


def decode_word(w) -> CellFields:
    """Pack the full world word into the carried compact entry (the
    same bit layout the pallas cword table stores, + the bucket count
    in bits 15-19 for the jnp parity scan)."""
    cls = W.w_cls(w)
    # portal cells keep their biased pdcx/pdcz in the run bits
    not_p = cls != W.PORTAL
    nsph = W.w_nsph(w)
    ent = (cls | (xcls_compress(W.w_xcls(w)) << 4)
           | (jnp.where(nsph > 0, 1, 0) << 6)
           | (jnp.where(not_p, W.w_runx(w), 0) << 7)
           | (jnp.where(not_p, W.w_runz(w), 0) << 11)
           | (nsph << 15))
    return CellFields(ent=ent)


def decode_portal_word(w):
    return (W.w_pkind(w), W.w_prot(w), W.w_pdcx(w), W.w_pdcz(w))


def flat_cell_index(cx, cz, page=None) -> jnp.ndarray:
    """THE clamped flat-index formula (OOB lanes read cell 0 of their
    page).  Single source: both backends' fetches and the rare-cond
    recompute (cell_index) must stay bit-identical, so they all call
    this."""
    inb = (cx >= 0) & (cx < 64) & (cz >= 0) & (cz < 64)
    idx = jnp.where(inb, cz * 64 + cx, 0)
    if page is not None:
        idx = idx + page * 4096
    return idx


def flat_cell_index_lw(cx, cz, lw: int) -> jnp.ndarray:
    """flat_cell_index for a WIDTH-TRIMMED cell table (stride lw < 64,
    single page).  Sound only when every column >= lw is '.'-pad
    (worlddev derives meta.lw that way): in-bounds lanes with
    cx >= lw are pushed past any <= 64*64-cell table (+(cx&~(lw-1))<<6
    >= 2048 >= lw*lh), so the chunked gather misses and returns 0 ==
    the pad byte those cells hold in the 64-stride table.  OOB lanes
    still read cell 0 of the page, same as flat_cell_index."""
    if lw >= 64:
        return flat_cell_index(cx, cz, None)
    inb = (cx >= 0) & (cx < 64) & (cz >= 0) & (cz < 64)
    return jnp.where(inb, cz * lw + cx + ((cx & ~(lw - 1)) << 6), 0)


def cell_index(s) -> jnp.ndarray:
    """Flat index of the lane's current cell, recomputed inside the
    rare conds that need it instead of being loop-carried."""
    return flat_cell_index(s.cx, s.cz, s.page)


class SegState(NamedTuple):
    pos: V3
    ray: V3
    iavel: V3
    wdist: V3
    fields: CellFields        # packed entry of the current cell (1 plane)
    gx: jnp.ndarray
    gy: jnp.ndarray
    gz: jnp.ndarray
    cx: jnp.ndarray
    cz: jnp.ndarray
    page: Any                 # i32 page per lane, or None (single-page)
    cdist: jnp.ndarray
    fog: jnp.ndarray
    ldir: jnp.ndarray
    active: jnp.ndarray
    aux_dist: jnp.ndarray
    # hoisted-candidate AABB entry distance: no aux check may fire
    # before it, and a line-change event drops candidates whose entry
    # is still ahead.  -1 = entered (cell-registered or fired gate).
    aux_t0: jnp.ndarray
    sph_dirty: jnp.ndarray    # lane left its hoisted line (i32 flag)
    # compact pending-candidate record: hit position + winner's sphere
    # index + diffuse factor (computed at registration, where the
    # registration-time ray lives).  The winner's reflectance, normal
    # and colour are REMATERIALIZED from these in seg_out_view - once
    # per segment instead of carrying refl+norm+colour (8 planes)
    # through every step's refresh-cond yield (bit-identical: same
    # inputs, same expressions; see make_sphere_view).
    aux_apos: V3
    aux_idx: jnp.ndarray      # i32 winner sphere index
    aux_diff: jnp.ndarray     # f32 diffuse shading factor
    # terminal kind | wall-colour-id << 2.  The OTHER terminal outputs
    # live in the carried arrays themselves: a dying lane's final
    # pos/ray/cdist/fog/ldir are written into pos/ray/cdist/fog/ldir
    # by the merged select trees (the lane is frozen afterwards, so
    # nothing overwrites them) - ten fewer loop-carried planes and one
    # select chain fewer per output field than separate t* arrays.
    tmeta: jnp.ndarray
    tstep: jnp.ndarray        # step index at termination (profiling)


class SegOut(NamedTuple):
    tkind: jnp.ndarray
    tldir: jnp.ndarray
    tcolid: jnp.ndarray
    tfog: jnp.ndarray
    tdist: jnp.ndarray
    tpos: V3
    tray: V3
    tpage: Any                # terminal page (None when single-page)
    tstep: jnp.ndarray
    aux_refl: jnp.ndarray
    aux_pos: V3
    aux_norm: V3
    aux_col: C4


def _sel_fields(m, a: CellFields, b: CellFields) -> CellFields:
    return CellFields(ent=jnp.where(m, a.ent, b.ent))


# ---- i32 mask calculus --------------------------------------------------
# The r5 probe ladder (benchmarks/results/r5_probe_ladder.json) priced
# Mosaic v5e's vector op classes per step-body plane: i1 mask-to-mask
# logic costs ~14x an f32 fma and ~4.5x the SAME chains on i32 {0,1}
# words (bool128 +2.77 ms vs int128 +0.61 in one session), while
# compares and selects are cheap (cmp64 ~= sel64).  The step body
# therefore keeps its masks as i32 {0,1} planes wherever they enter
# mask logic: f32 compares convert in via _m(), small-int class tests
# use bitset probes ((BITS >> cls) & 1 - no i1 at all), logic runs in
# &, |, ^1 (NEVER ~, which is bitwise not on i32), and select
# predicates convert back via _p() (one cheap compare per mask, CSE'd).
# The {0,1} sets are identical, so every select picks the same lanes
# and rendered frames are bit-identical - guarded by the parity and
# cross-backend suites.
def _m(b):
    """i1 -> i32 {0,1} mask."""
    return jnp.where(b, 1, 0)


def _p(m):
    """i32 {0,1} mask -> select predicate."""
    return m != 0


_FIRE_NONE = 3.0e38     # aux_fire sentinel while no candidate is pending


def make_sphere_all(n_spheres: int, get_sphere, math: Math,
                    get_bound=None, sphere_page=None,
                    gather_sphere=None, slack=0.04):
    """Line-vs-all-spheres candidate pass for the fast path.

    The reference registers a sphere candidate at the first DDA step
    standing in one of its bucket cells (trace.h:252-296), with the
    quirky value  aux = cdist_entry + |centre-pos_entry| - sqrt(1-d2/r2)
    - POSITION-dependent (t + |rel(t)| is nondecreasing along the line,
    so the first test wins all later strictly-closer updates).  Bucket
    cells are exactly the sphere's XZ-AABB cells (level.h:21-39) and DDA
    arrival at a cell is the slab crossing, so the entry position is
    computable in closed form: this pass evaluates the reference formula
    AT THE AABB ENTRY POINT, once per segment, instead of per step.

    Firing: no aux-consuming check may trigger before the ray has
    actually entered the AABB (else spheres would ghost through walls
    standing in front of them), so alongside aux we carry the entry
    distance aux_t0; every `cdist > aux` check in segment_body tests
    max(aux, aux_t0) instead.  Winner across spheres is the one firing
    first (min max(aux, t_entry), ties to min aux), reproducing the
    reference's temporal entered-set evolution.  Residual deviation from
    the cell-driven scan: sub-step timing (entry at exact slab time vs
    the start-of-step test), ~1 DDA step - fast mode only; parity mode
    keeps the exact scan.

    Line-change events (portal rotation, '"'<->'#/&' y-shift, ramp
    crossings) re-run this pass for the affected lanes with merge=True:
    an already-ENTERED pending candidate persists exactly as the
    reference's aux does (it competes as a pre-entered candidate with
    its recorded fire value), un-entered ones were dropped at the event,
    and candidates of the NEW line are derived from the current
    position on - the exact analogue of the reference resuming its
    cell-driven scan in the new frame (trace.h:252-296 after :649).
    This keeps the empty-space skip sound for every lane: no per-cell
    sphere semantics exist anywhere on the fast path.

    get_sphere(si) -> (V3 centre, r, refl, (b, g, r)) scalars;
    get_bound() -> (V3 centre, radius) of a sphere bounding ALL scene
    spheres: tiles whose lanes' lines all miss it skip the full pass
    (one cheap per-lane test + one reduction per segment);
    gather_sphere(idx) -> (V3 centre, refl, (b, g, r)) per-lane gather
    of a sphere record by index (the winner rematerialization)."""
    if gather_sphere is None:
        def gather_sphere(idx):
            zero = jnp.zeros_like(idx).astype(F32)
            pos = V3(zero, zero, zero)
            refl = zero
            col = (zero, zero, zero)
            for si in range(n_spheres):
                c, _, srefl, scol = get_sphere(si)
                m = idx == si
                pos = V3(jnp.where(m, c.x, pos.x),
                         jnp.where(m, c.y, pos.y),
                         jnp.where(m, c.z, pos.z))
                refl = jnp.where(m, srefl, refl)
                col = tuple(jnp.where(m, scol[k], col[k])
                            for k in range(3))
            return pos, refl, col

    def run_full(s: SegState, mask, merge=False):
        # merge=False: fresh segment state (aux_dist == -1 per lane).
        # merge=True (event refresh): a pending ENTERED candidate seeds
        # the scan with its recorded fire value, so it persists unless a
        # new-line candidate fires strictly earlier - the reference's
        # replace-iff-strictly-closer registration rule.
        aux_dist = s.aux_dist
        zero = jnp.zeros_like(s.pos.x)
        if merge:
            pend = aux_dist != F32(-1.0)
            fire = jnp.where(pend, jnp.maximum(aux_dist, s.aux_t0),
                             F32(_FIRE_NONE) + zero)
            best_aux = jnp.where(pend, aux_dist, F32(_FIRE_NONE))
        else:
            fire = zero + F32(_FIRE_NONE)
            best_aux = zero + F32(_FIRE_NONE)
        new = jnp.zeros_like(s.sph_dirty)   # i32 {0,1} (the _m/_p note)
        w_te = zero         # winner's slab entry time (from current pos)
        w_sd = zero         # winner's raw sph_dist
        w_idx = jnp.zeros_like(s.sph_dirty)   # winner's sphere index
        base = _m(mask) & s.active
        if sphere_page is not None:
            # paged world: every sphere lives on one page; candidates
            # only exist for lanes currently in it
            base = base & _m(s.page == sphere_page)
        # loop-invariant lane terms, hoisted out of the sphere loop.
        # ivx_s folds the slab-direction sign into iavel:
        # (b1-p)*iv == (b1-p)*ivx_s for +x rays and
        # (p-b2)*iv == (b2-p)*(-iv) == (b2-p)*ivx_s for -x rays —
        # IEEE negation/operand swap are exact, so tx/tz bits are
        # unchanged while each costs one select fewer per sphere.
        sxp = s.ray.x >= 0.0
        szp = s.ray.z >= 0.0
        ivx_s = jnp.where(sxp, s.iavel.x, -s.iavel.x)
        ivz_s = jnp.where(szp, s.iavel.z, -s.iavel.z)
        # the loop keeps only the winner's ORDERING state plus (te, sd,
        # idx); its position/reflectance/colour are gathered once after
        # the loop (gather_sphere), and its entry point/t0 recomputed
        # from te with the same expressions - 8 fewer vector selects
        # per sphere than carrying the full candidate record.
        for si in range(n_spheres):
            c, sr, srefl, scol = get_sphere(si)
            # bucket AABB: [trunc(x-r), trunc(x+r)+1) etc (level.h:27-31)
            # (scalar math on the scalar unit; only the lane-shaped ops
            # below cost VPU issue slots)
            bx1 = (c.x - sr).astype(I32).astype(F32)
            bx2 = (c.x + sr).astype(I32).astype(F32) + F32(1.0)
            bz1 = (c.z - sr).astype(I32).astype(F32)
            bz2 = (c.z + sr).astype(I32).astype(F32) + F32(1.0)
            # slab entry time along the ray (sign-ordered near faces)
            tx = (jnp.where(sxp, bx1, bx2) - s.pos.x) * ivx_s
            tz = (jnp.where(szp, bz1, bz2) - s.pos.z) * ivz_s
            t_entry = jnp.maximum(jnp.maximum(tx, tz), F32(0.0))
            pent = s.pos + t_entry * s.ray
            rel = V3(c.x - pent.x, c.y - pent.y, c.z - pent.z)
            dist2 = dot_sse(rel, rel)
            dot = dot_sse(rel, s.ray)
            calcrad2 = dist2 - dot * dot
            # scalar sphere terms stay off the VPU (fast mode only:
            # the parity scan lives in _sphere_pass / tracer_jnp).
            # inv_rad2 is a per-sphere SCALAR, so the lane-shaped
            # divide becomes one multiply (VPU divides are multi-cycle
            # - 14 of them were ~5% of the hoist body).  Double
            # rounding perturbs sph_dist by ~1 ulp: fast mode already
            # deviates from the cell-driven scan at sub-step scale,
            # and the parity path never runs this code.
            rad2 = sr * sr
            safe_rad2 = jnp.maximum(rad2, F32(1e-30))
            inv_rad2 = F32(1.0) / safe_rad2
            sph_dist = math.sqrt(dist2) - math.sqrt(jnp.maximum(
                F32(1.0) - calcrad2 * inv_rad2, F32(0.0)))
            te_d = s.cdist + t_entry
            aux_c = sph_dist + te_d
            fire_c = jnp.maximum(aux_c, te_d)
            # mask logic on i32 {0,1} words (the _m/_p calculus): same
            # sets, same selected lanes, bit-identical outputs
            upd = (base & _m(dot > 0.0) & _m(calcrad2 < rad2)
                   & (_m(fire_c < fire)
                      | (_m(fire_c == fire) & _m(aux_c < best_aux))))
            upd_p = _p(upd)
            fire = jnp.where(upd_p, fire_c, fire)
            best_aux = jnp.where(upd_p, aux_c, best_aux)
            new = new | upd
            w_te = jnp.where(upd_p, t_entry, w_te)
            w_sd = jnp.where(upd_p, sph_dist, w_sd)
            w_idx = jnp.where(upd_p, si, w_idx)
        # aux_dist tracked the winning aux_c through the loop; one
        # post-loop select reproduces it (winner ⇒ best_aux, else the
        # incoming value) — n_spheres selects fewer, same bits
        new_p = _p(new)
        aux_dist = jnp.where(new_p, best_aux, aux_dist)
        # only the winner's CENTRE is needed here (normal + diffuse use
        # the registration-time ray, so they derive now); its
        # reflectance/colour gathers happen once per segment in
        # seg_out_view and the unused rows DCE away
        w_pos, _, _ = gather_sphere(w_idx)
        w_t0 = s.cdist + w_te
        w_from = s.pos + w_te * s.ray        # == the winner's pent
        apos = w_from + w_sd * s.ray
        anorm = normalise_sse(apos - w_pos, math.rsq)
        diff = jnp.maximum(-dot_sse(s.ray, anorm), 0.0)
        diff = F32(0.2) + F32(0.8) * diff
        return (aux_dist,
                apos.where(new_p, s.aux_apos),
                jnp.where(new_p, w_idx, s.aux_idx),
                jnp.where(new_p, diff, s.aux_diff),
                jnp.where(new_p, w_t0, s.aux_t0))

    if get_bound is None:
        def run_nobound(s: SegState, mask, merge=False):
            one = jnp.ones_like(s.sph_dirty)
            return run_full(s, mask, merge) + (one * 2,)
        return run_nobound

    def run(s: SegState, mask, merge=False):
        bc, br = get_bound()
        zero = jnp.zeros_like(s.pos.x)
        # brq2: the bound tests below compare the line's perpendicular
        # distance^2 against br^2 with an absolute slack that keeps
        # them SOUND supersets of the per-sphere `upd` registration:
        #  - upd evaluates the reference's calcrad2 = dist2 - dot^2 at
        #    the AABB entry, which differs from the true line
        #    distance^2 by (|ray|^2-1)*par(te)^2; |ray| is unit only
        #    up to the rsqrt-table normalization (and the |comp|>=eps
        #    clamp), and par(te)^2 <= ~6 in a 1-high world, so the
        #    slack is ~1e-2 at |ray|^2 within 2e-3 of 1;
        #  - the homogeneous compares themselves round at the
        #    d2*l-scale (~8 ulps of 2*90^2 ~ 1.6e-2 worst case).
        # Without it, a tile whose live lanes all normalized to
        # |ray|<1 could be gated out while aimed dead-on at a distant
        # sphere (the old t=0 form d2-dt3^2<br^2 erred by
        # (1-|ray|^2)*d2 - unbounded in distance).
        # The slack is 0.04 for game-scale scenes; worlddev
        # _sphere_slack widens it (quadratic in coordinate scale) for
        # scenes outside that envelope at build time so the bound can
        # never silently under-gate (WorldMeta.sph_slack).
        brq2 = br * br + F32(slack)
        # Per-lane relevance bit (sph_dirty bit 1): XZ-PROJECTED line
        # vs the bounding circle - a superset of any 3D line-sphere hit
        # (projection shrinks distances) that is INVARIANT under the
        # y-shift/ramp line changes, so lanes with it clear never need
        # re-derivation after those events (segment_body).  The
        # homogeneous form (d2xz - brq2)*l2 < dtxz^2 is the exact
        # line-circle test for ANY ray scale (both sides quadratic in
        # ray_xz), so it needs no unit-ray assumption.
        rx = bc.x + zero - s.pos.x
        rz = bc.z + zero - s.pos.z
        d2xz = rx * rx + rz * rz
        dtxz = rx * s.ray.x + rz * s.ray.z
        l2 = s.ray.x * s.ray.x + s.ray.z * s.ray.z
        rel = _m((d2xz - brq2) * l2 < dtxz * dtxz)
        if sphere_page is not None:
            rel = rel & _m(s.page == sphere_page)
        rel_bit = (rel << 1).astype(s.sph_dirty.dtype)
        # Whole-tile hoist gate: the DIRECTED 3D test - the undirected
        # XZ form fires on a third of the screen (no y or heading
        # constraint) and would run the full pass almost everywhere.
        # Same homogeneous scale-free forms as rel: the 3D line test
        # is (d2 - brq2)*l3 < dt3^2, and the heading test dot > -br
        # becomes (dt3 > 0) | (dt3^2 < brq2*l3) == dt3 > -brq*|ray|
        # (any candidate sphere has dot_i > 0 at its AABB entry, and
        # |dot_i - dt3| <= |c_i - bc|*|ray| < br*|ray|).
        ry_ = bc.y + zero - s.pos.y
        d2 = d2xz + ry_ * ry_
        dt3 = dtxz + ry_ * s.ray.y
        l3 = l2 + s.ray.y * s.ray.y
        dt3sq = dt3 * dt3
        quick = (rel & (_m(dt3 > 0.0) | _m(dt3sq < brq2 * l3))
                 & _m((d2 - brq2) * l3 < dt3sq))
        anyq = jnp.max(_m(mask) & s.active & quick) > 0
        return jax.lax.cond(
            anyq, lambda op: run_full(op[0], op[1], merge),
            lambda op: (op[0].aux_dist, op[0].aux_apos, op[0].aux_idx,
                        op[0].aux_diff, op[0].aux_t0),
            (s, mask)) + (rel_bit,)

    return run


def make_sphere_rel(get_bound, sphere_page=None, slack=0.04):
    """Relevance of a PROSPECTIVE ray line: can the XZ-projected line
    from (px, pz) along (vx, vz) hit the scene's bounding circle?

    Exactly the expressions of make_sphere_all.run's per-lane rel bit,
    evaluated at the post-portal position/ray — the refresh one step
    later would compute the identical value from the identical inputs
    (the portal branch writes px_f/vx_r into the carried pos/ray), so
    deciding it inline at portal time is bit-exact.  When it is False,
    the refresh is provably a no-op (any 3D line-sphere hit implies an
    XZ bound-circle hit — projection shrinks distances — so run_full
    registers nothing and returns rel_bit 0): skipping it saves the
    refresh-cond fire on every portal traversal whose landing line
    cannot see a sphere."""
    def rel(px, pz, vx, vz, page=None):
        bc, br = get_bound()
        zero = jnp.zeros_like(px)
        brq2 = br * br + F32(slack)   # same slack as run's rel bit
        rx = bc.x + zero - px
        rz = bc.z + zero - pz
        d2xz = rx * rx + rz * rz
        dtxz = rx * vx + rz * vz
        l2 = vx * vx + vz * vz
        r = (d2xz - brq2) * l2 < dtxz * dtxz
        if sphere_page is not None:
            r = r & (page == sphere_page)
        return r

    return rel


def make_sphere_view(gather_sphere, math: Math):
    """SegOut aux rematerialization from the compact carried record.

    Bit-identical to the values the registration passes used to carry:
    the normal is normalise(apos - centre) and the colour diff * base
    colour with diff captured at registration - same inputs, same
    expression order (make_sphere_all / the cell-driven scans).  Lanes
    with no registered candidate get the untouched init defaults; their
    values are only ever consumed behind a tkind == T_SPHERE select."""
    def view(s: SegState):
        valid = s.aux_dist != F32(-1.0)
        w_pos, w_refl, w_col = gather_sphere(s.aux_idx)
        anorm = normalise_sse(s.aux_apos - w_pos, math.rsq)
        zero = jnp.zeros_like(s.aux_diff)
        one = jnp.ones_like(zero)
        refl = jnp.where(valid, w_refl, F32(0.25))
        norm = anorm.where(valid, V3(zero, zero, zero))
        col = C4(jnp.where(valid, s.aux_diff * w_col[0], one),
                 jnp.where(valid, s.aux_diff * w_col[1], one),
                 jnp.where(valid, s.aux_diff * w_col[2], one),
                 jnp.where(valid, zero, one))
        return refl, s.aux_apos, norm, col

    return view


def _apply_aux(s: SegState, aux) -> SegState:
    """aux: 4-tuple from the cell-driven pass (aux_t0/sph_dirty kept) or
    6-tuple from the hoisted pass (aux_t0 + the relevance bit)."""
    s = s._replace(aux_dist=aux[0], aux_apos=aux[1], aux_idx=aux[2],
                   aux_diff=aux[3])
    if len(aux) > 4:
        s = s._replace(aux_t0=aux[4], sph_dirty=aux[5])
    return s


def _init_march(ifrom: V3, iray: V3, env: Env, page):
    """The per-segment marching state (trace_ray's prologue,
    trace.h:212-246): normalized+clamped ray, cell coords, step signs,
    iavel and the initial crossing clocks, plus the start cell fetch.
    Shared verbatim between init_segment and the fused bounce restart
    so both derive bit-identical values."""
    math = env.math
    ray = normalise_sse(iray, math.rsq)
    eps = F32(EPSILON)

    def clamp(c):
        return jnp.where((c > -eps) & (c < eps),
                         jnp.where(c < 0.0, -eps, eps), c)

    ray = V3(clamp(ray.x), clamp(ray.y), clamp(ray.z))
    cx = ifrom.x.astype(I32)
    cz = ifrom.z.astype(I32)
    gx = jnp.where(iray.x < 0.0, -1, 1).astype(I32)
    gy = jnp.where(iray.y < 0.0, -1, 1).astype(I32)
    gz = jnp.where(iray.z < 0.0, -1, 1).astype(I32)
    iavel = V3(math.rcp(jnp.abs(ray.x)), math.rcp(jnp.abs(ray.y)),
               math.rcp(jnp.abs(ray.z)))
    wd = V3(ifrom.x - cx.astype(F32), ifrom.y, ifrom.z - cz.astype(F32))

    def flip(w, c):
        return jnp.where(c >= 0.0, F32(1.0) - w, w)

    wdist = V3(flip(wd.x, ray.x) * iavel.x, flip(wd.y, ray.y) * iavel.y,
               flip(wd.z, ray.z) * iavel.z)
    fields = env.fetch(cx, cz, page if env.paged else None)
    return ray, cx, cz, gx, gy, gz, iavel, wdist, fields


def init_segment(ifrom: V3, iray: V3, active, env: Env,
                 page=None) -> SegState:
    if env.paged and page is None:
        page = jnp.zeros_like(ifrom.x).astype(I32)
    (ray, cx, cz, gx, gy, gz, iavel, wdist,
     fields) = _init_march(ifrom, iray, env, page)
    z1 = jnp.zeros_like(ifrom.x)
    z3 = V3(z1, z1, z1)
    zi = jnp.zeros_like(cx)
    return SegState(
        pos=ifrom, ray=ray, iavel=iavel, wdist=wdist,
        fields=fields,
        gx=gx, gy=gy, gz=gz,
        cx=cx, cz=cz, page=page if env.paged else None,
        cdist=z1, fog=z1, ldir=zi + FYN,
        active=active.astype(I32),
        aux_dist=z1 - F32(1.0), aux_t0=z1 - F32(1.0), sph_dirty=zi,
        aux_apos=z3, aux_idx=zi, aux_diff=z1,
        tmeta=zi, tstep=zi)


def _terminate(s: SegState, mask, kind, dist=None) -> SegState:
    """Kill `mask` lanes with terminal kind `kind`; their carried
    state (pos/ray/fog/ldir) already holds the terminal values (it is
    frozen from here on).  `dist` overrides cdist (sphere hits record
    aux_dist, trace.h:668-673)."""
    m = mask & (s.active != 0)
    return s._replace(
        tmeta=jnp.where(m, kind, s.tmeta),
        cdist=jnp.where(m, dist, s.cdist) if dist is not None
        else s.cdist,
        active=jnp.where(m, 0, s.active))


def compute_flags(s: SegState, env: Env) -> jnp.ndarray:
    """Packed tile-uniform gates: bit0 any-active (the while cond),
    bit1 any rare EVENT lane (sphere-scan trigger, portal cell, or
    ramp cell).  Evaluated on the post-step state, so the next step's
    branches need no reductions.

    The event kinds share one bit because no consumer ever splits
    them: segment_body's single merged cond runs all bodies (each is
    per-lane masked, so cross-firing computes values no lane consumes).
    Ramps joined the union because their per-step math (tilt + the
    wy_ramp DIVIDE) only feeds lanes standing on a ramp cell, and
    measured fire rates on the default level say ramps raise the union
    by just ~1% (dirty 23%, portal 21%, ramp 4%, union 35.5 -> 36.6%
    of live tile-steps over 3 camera rotations; docs/PERFORMANCE.md).
    With every set bit implying the active bit, v ∈ {0, 1, 3} and ONE
    cross-lane max IS the bitwise or — the second reduction the old
    bit0-2 encoding needed is gone."""
    act = s.active                   # i32 {0,1} by construction
    f = s.fields
    cls = f.cls
    # event cells (portal or ramp) as one i32 bitset probe (_m/_p note)
    evbits = ((1 << W.PORTAL)
              | ((1 << (W.RAMP_CR + 1)) - (1 << W.RAMP_GT)))
    ev = act & ((jnp.int32(evbits) >> cls) & 1)
    if env.sphere_all is not None:
        # fast mode: some lane's hoisted candidates need re-deriving
        # after a line-change event (portal/y-shift/ramp)
        ev = ev | (act & (s.sph_dirty & 1))
    elif env.sphere_pass is not None:
        # parity mode: some lane stands in a bucketed cell
        inb = (_m(s.cx >= 0) & _m(s.cx < 64)
               & _m(s.cz >= 0) & _m(s.cz < 64))
        ev = ev | (act & inb & f.has_sph)
    v = act | (ev << 1)
    return jnp.max(v)


def segment_body(s: SegState, env: Env, cfg: RenderConfig,
                 flags) -> SegState:
    """One DDA step for every active ray (trace.h:250-675).

    `flags` is compute_flags of the incoming state: the tile-uniform
    branch predicates, prepacked so the body issues no reductions."""
    f = s.fields          # fetched when the ray last moved (one gather/step)
    cls = f.cls

    if cfg.probe == "fire1":
        # probe: force the merged event cond to fire every step.
        # Bit-exact by the merged-cond contract (both bodies are pure
        # and per-lane masked - firing computes values no lane
        # consumes); prices the fire branch at rate 1.0 vs the level's
        # natural rate.  See RenderConfig.probe.
        flags = flags | 2

    # ---- merged rare-event branch: sphere refresh + portal targets --------
    # Both bodies are pure functions of the PRE-step state and fully
    # per-lane-masked, so one tile-uniform cond covers them: firing the
    # portal body on a sphere-only step (or vice versa) computes values
    # no lane consumes (pgo masks on active portal lanes; the sphere
    # pass masks on dirty/bucketed lanes) - bit-identical outputs, one
    # scalar branch per step instead of two.  The cond yields ONLY the
    # aux fields + the portal targets - with the 9 small-int outputs
    # packed into two words (portal_calc) that is 15 yielded planes,
    # was 23: Mosaic materializes every yielded lane, so returning the
    # whole SegState here costs more than the event math it skips.
    def portal_calc(s_):
        if env.paged:
            pkind, prot, pdcx, pdcz, dpage = env.fetch_portal(s_)
        else:
            pkind, prot, pdcx, pdcz = env.fetch_portal(s_)
            dpage = s_.cx  # placeholder, unused
        cxp = s_.cx + pdcx
        czp = s_.cz + pdcz
        px_t = s_.pos.x + pdcx.astype(F32)
        pz_t = s_.pos.z + pdcz.astype(F32)
        rot = prot
        ldir_p = (s_.ldir - rot) & 3
        cxh = cxp.astype(F32) + F32(0.5)
        czh = czp.astype(F32) + F32(0.5)
        trx, trz = px_t, pz_t
        tvx, tvz = s_.ray.x, s_.ray.z
        twx, twz = s_.wdist.x, s_.wdist.z
        tix, tiz = s_.iavel.x, s_.iavel.z
        r1, r2, r3 = rot == 1, rot == 2, rot == 3
        px_r = jnp.where(r1, cxh + (trz - czh),
                         jnp.where(r2, cxh * F32(2.0) - px_t,
                                   jnp.where(r3, cxh - (trz - czh),
                                             px_t)))
        pz_r = jnp.where(r1, czh - (trx - cxh),
                         jnp.where(r2, czh * F32(2.0) - pz_t,
                                   jnp.where(r3, czh + (trx - cxh),
                                             pz_t)))
        vx_r = jnp.where(r1, tvz, jnp.where(r2, -tvx,
                                            jnp.where(r3, -tvz, tvx)))
        vz_r = jnp.where(r1, -tvx, jnp.where(r2, -tvz,
                                             jnp.where(r3, tvx, tvz)))
        gx_r = jnp.where(r1, s_.gz, jnp.where(r2, -s_.gx,
                                              jnp.where(r3, -s_.gz,
                                                        s_.gx)))
        gz_r = jnp.where(r1, -s_.gx, jnp.where(r2, -s_.gz,
                                               jnp.where(r3, s_.gx,
                                                         s_.gz)))
        swap = r1 | r3
        wx_r = jnp.where(swap, twz, twx)
        wz_r = jnp.where(swap, twx, twz)
        ix_r = jnp.where(swap, tiz, tix)
        iz_r = jnp.where(swap, tix, tiz)
        # advance one cell along the rotated ldir (default case is FXP)
        step_dx = jnp.where(ldir_p == FZP, 0,
                            jnp.where(ldir_p == FXN, -1,
                                      jnp.where(ldir_p == FZN, 0, 1)))
        step_dz = jnp.where(ldir_p == FZP, 1,
                            jnp.where(ldir_p == FZN, -1, 0))
        # the 7 small-int targets pack into two words (the cond
        # materializes every yielded lane, so fewer yield planes is a
        # direct per-step win): pw bits 0-1 pkind, 2-3 ldir_p, 4/5 the
        # gx_r/gz_r sign bits (values are ±1), 18-21 dpage (paged
        # worlds, <= 16 pages - worlddev build assert); spare bits
        # 6-17 carry the sphere branch's dirty+idx and bit 22 its
        # post-portal relevance (see the cond lambdas).  ccf holds
        # cx_f/cz_f as 2x16-bit (same range bound as _pack_carry).
        # All lossless, so bit-exact.
        pw = (pkind | (ldir_p << 2)
              | (jnp.where(gx_r < 0, 1, 0) << 4)
              | (jnp.where(gz_r < 0, 1, 0) << 5))
        if env.paged:
            pw = pw | (dpage << 18)
        cxf = cxp + step_dx
        czf = czp + step_dz
        return (pw, (cxf & 0xFFFF) | (czf << 16),
                px_r + step_dx.astype(F32), pz_r + step_dz.astype(F32),
                vx_r, vz_r, wx_r, wz_r, ix_r, iz_r)

    def ramp_calc(s_):
        # ramp tilt + tilted-ray wdist.y (trace.h:450-457): only lanes
        # standing on a ramp cell consume these, and ramp cells fire
        # the event bit (compute_flags), so the tilt chain and the
        # wy_ramp DIVIDE leave the unconditional step body.  Same
        # expressions as before the move - bit-exact.
        cls_ = s_.fields.cls
        ray_ = s_.ray
        coef_x = jnp.where(cls_ == W.RAMP_GT, F32(-0.5),
                           jnp.where(cls_ == W.RAMP_LT, F32(0.5),
                                     F32(0.0)))
        coef_z = jnp.where(cls_ == W.RAMP_CM, F32(-0.5),
                           jnp.where(cls_ == W.RAMP_CR, F32(0.5),
                                     F32(0.0)))
        rampx = (cls_ == W.RAMP_GT) | (cls_ == W.RAMP_LT)
        rampc = (cls_ >= W.RAMP_GT) & (cls_ <= W.RAMP_CR)
        tilt_ = jnp.where(rampx, coef_x * ray_.x, coef_z * ray_.z)
        ry2 = jnp.where(rampc, ray_.y + tilt_, ray_.y)
        ay2 = jnp.where(ry2 < 0.0, -ry2, ry2)
        wyr = jnp.where(ry2 >= 0.0, F32(1.0) - s_.pos.y, s_.pos.y) \
            * env.math.div(jnp.ones_like(ay2), ay2)
        return (tilt_, wyr)

    def ev_calc(s_):
        return portal_calc(s_) + ramp_calc(s_)

    def ev_skip(s_):
        zi = jnp.zeros_like(s_.cx)
        zf = jnp.zeros_like(s_.pos.x)
        return (zi, zi, zf, zf, zf, zf, zf, zf, zf, zf, zf, zf)

    if env.sphere_all is not None:
        # fast path: hoisted candidates (run_segment) cover lanes still
        # on their last-derived line; lanes that left it (sph_dirty bit
        # 0, set on portal/y-shift/ramp events) re-derive candidates on
        # the new line here, merging with any still-pending ENTERED
        # candidate (reference aux persistence across such events).
        refresh = (s.sph_dirty & 1) != 0

        def fire(op):
            a6 = env.sphere_all(op[0], op[1], merge=True)
            p = ev_calc(op[0])
            # sphere outputs ride pw's spare bits: 6-7 dirty, 8-17 idx
            w = p[0] | (a6[5] << 6) | (a6[2] << 8)
            if env.sphere_rel is not None:
                # post-portal line relevance, bit 22: the portal
                # branch consumes it below to set the landing lane's
                # sph_dirty to 3 (re-derive next step) or 0 (the
                # refresh would be a no-op - don't fire it).  p[2..5]
                # are the landing pos/ray the refresh would read.
                dp = ((p[0] >> 18) & 0xF) if env.paged else None
                nr = env.sphere_rel(p[2], p[3], p[4], p[5], dp)
                w = w | (jnp.where(nr, 1, 0) << 22)
            return (a6[0], a6[1], a6[3], a6[4], w) + p[1:]

        out = jax.lax.cond(
            (flags & 2) > 0, fire,
            lambda op: (op[0].aux_dist, op[0].aux_apos,
                        op[0].aux_diff, op[0].aux_t0,
                        (op[0].sph_dirty << 6) | (op[0].aux_idx << 8))
            + ev_skip(op[0])[1:],
            (s, refresh))
        w = out[4]
        pout = out[4:]
        s = s._replace(aux_dist=out[0], aux_apos=out[1],
                       aux_idx=(w >> 8) & 0x3FF,
                       aux_diff=out[2], aux_t0=out[3],
                       sph_dirty=jnp.where(refresh, (w >> 6) & 3,
                                           s.sph_dirty))
    elif env.sphere_pass is not None:
        # cell-driven bucket scan (parity path): runs when some active
        # ray stands in a bucketed cell (or a portal fires - harmless,
        # the per-lane valid mask registers nothing then).
        inb = (s.cx >= 0) & (s.cx < 64) & (s.cz >= 0) & (s.cz < 64)

        def fire_p(op):
            a4 = env.sphere_pass(*op)
            p = ev_calc(op[0])
            return (a4[0], a4[1], a4[3], p[0] | (a4[2] << 8)) + p[1:]

        out = jax.lax.cond(
            (flags & 2) > 0, fire_p,
            lambda op: (op[0].aux_dist, op[0].aux_apos,
                        op[0].aux_diff, op[0].aux_idx << 8)
            + ev_skip(op[0])[1:],
            (s, inb, f))
        w = out[3]
        pout = out[3:]
        s = s._replace(aux_dist=out[0], aux_apos=out[1],
                       aux_idx=(w >> 8) & 0x3FF, aux_diff=out[2])
    else:
        pout = jax.lax.cond((flags & 2) > 0, ev_calc, ev_skip, s)

    # class predicates as i32 bitset probes - 2 i32 ops each instead of
    # eq/or chains whose i1 or planes are the expensive class (see the
    # _m/_p mask-calculus note above)
    def clsbit(bits, c=cls):
        return (jnp.int32(bits) >> c) & 1
    is_floorish = clsbit((1 << W.FLOOR) | (1 << W.FOG) | (1 << W.LOWER))
    is_tall = clsbit((1 << W.TALL) | (1 << W.TALLFOG))
    is_ramp = clsbit((1 << (W.RAMP_CR + 1)) - (1 << W.RAMP_GT))
    is_portal = clsbit(1 << W.PORTAL)
    is_wall = clsbit(1 << W.WALL)
    is_fogc = clsbit((1 << W.FOG) | (1 << W.TALLFOG))
    has_aux = _m(s.aux_dist != F32(-1.0))
    # hoisted spheres gate firing on AABB entry; the cell-driven scan
    # registers only after entry (aux_t0 stays -1 <= aux there)
    fire = (jnp.maximum(s.aux_dist, s.aux_t0)
            if env.sphere_all is not None else s.aux_dist)

    pos, ray, wdist, iavel = s.pos, s.ray, s.wdist, s.iavel
    gx, gy, gz = s.gx, s.gy, s.gz

    # ---- ramp tilt (trace.h:450-457): tilt/wy_ramp come from the
    # merged rare-event cond (ramp_calc - ramp cells fire the event
    # bit, so any step with an active ramp lane has the real values;
    # otherwise they are zeros no lane consumes: every consumer below
    # is is_ramp-masked)
    # tilt is EXACTLY +-0 for every non-ramp lane (ramp_calc's zero
    # coefficients / ev_skip's zeros) and ray.y is never +-0 (clamped
    # to |y| >= eps at init), so the unconditional add is bit-identical
    # to the is_ramp select it replaces: x + (+-0) == x for x != 0
    tilt, wy_ramp = pout[10], pout[11]
    ray_y2 = ray.y + tilt
    ray2 = V3(ray.x, ray_y2, ray.z)

    # ---- empty-space skip (fast mode): a ray may take its next
    # X-crossing up to runx+1 cells out - the swept strip is same-class
    # (uniform fog rate, no transitions; spheres are hoisted) - PROVIDED
    # no Z-crossing intervenes.  kx budgets that with the crossing
    # clocks themselves ((wz-wx)*|ray.x|, |ray| is unit), and the
    # min-axis comparison below stays authoritative: if the effective
    # time still loses to wz, the lane takes a plain Z step and its
    # untouched X clock fires next step (possibly at ~0), so nothing is
    # ever skipped unsoundly.  Y-plane hits inside the strip terminate
    # through the ordinary path.  Symmetric for Z.
    use_skip = cfg.space_skip and not cfg.parity and env.skip_ok
    wx, wy0, wz = wdist.x, wdist.y, wdist.z
    if use_skip:
        ax = jnp.abs(ray.x)
        az = jnp.abs(ray.z)
        jx = jnp.floor((wz - wx) * ax).astype(I32)
        jz = jnp.floor((wx - wz) * az).astype(I32)
        kx = jnp.clip(jnp.minimum(f.runx, jx), 0, 15)
        kz = jnp.clip(jnp.minimum(f.runz, jz), 0, 15)
        wxe = wx + kx.astype(F32) * iavel.x
        wze = wz + kz.astype(F32) * iavel.z
    else:
        wxe, wze = wx, wz

    # ---- per-class effective wdist.y (wy_ramp from the event cond) --------
    wy_tall = jnp.where(gy > 0, wy0 + iavel.y, wy0)
    is_tall_p, is_ramp_p = _p(is_tall), _p(is_ramp)
    wy = jnp.where(is_tall_p, wy_tall,
                   jnp.where(is_ramp_p, wy_ramp, wy0))

    # Terminations are RECORDED as masks while the step proceeds (the
    # active set `a` shrinks in the reference's exact priority order)
    # and written once at the end: one select tree per output field
    # instead of one per termination site - ~half the select ops, same
    # values, bit-identical results.

    # ---- ramps: sphere exit BEFORE stepping (trace.h:463-468) -------------
    a = s.active                       # i32 {0,1} by construction
    sgt = _m(s.cdist > fire)
    m_presph = a & is_ramp & has_aux & sgt
    a = a & (m_presph ^ 1)

    # ---- through: min-axis crossing (trace.h:156-184) ----------------------
    ymin = _m(wy < wxe) & _m(wy < wze)
    xmin = (ymin ^ 1) & _m(wxe < wze)
    zmin = (ymin | xmin) ^ 1
    ymin_p, xmin_p = _p(ymin), _p(xmin)
    t = jnp.where(ymin_p, wy, jnp.where(xmin_p, wxe, wze))
    gsel = jnp.where(is_ramp_p, gy, gx)  # reference: gy as gx on ramps
    ldir_t = jnp.where(
        ymin_p, jnp.where(gy < 0, FYN, FYP),
        jnp.where(xmin_p, jnp.where(gsel < 0, FXN, FXP),
                  jnp.where(gz < 0, FZN, FZP)))
    marchable = is_floorish | is_tall | is_ramp
    # cdist2/pos2/ldir2 are UNGUARDED: every consumer selects behind a
    # mask contained in (active & marchable) - cont2/near/my2/m_wall2,
    # the ft-masked m_sph2/fog2, ramp_go's wy_post - so lanes outside
    # that set never read them and the old `goes` selects were
    # identities on all consumed values (r4 micro-diet; bit-exact)
    cdist2 = s.cdist + t
    pos2 = pos + t * ray2
    ldir2 = ldir_t

    # ---- floor/tall: fog + sphere exit + Y hit (trace.h:302-392) ----------
    ft = a & (is_floorish | is_tall)
    m_sph2 = ft & has_aux & _m(cdist2 > fire)
    extra = jnp.where(_p(is_fogc & _m(s.aux_dist > s.cdist)),
                      s.aux_dist - s.cdist, F32(0.0))
    a = a & (m_sph2 ^ 1)
    ft = a & (is_floorish | is_tall)
    fog2 = jnp.where(_p(ft & is_fogc), s.fog + (cdist2 - s.cdist),
                     s.fog)

    isY2 = (jnp.int32((1 << FYN) | (1 << FYP)) >> ldir2) & 1
    m_yhit = ft & isY2
    a = a & (m_yhit ^ 1)

    # ---- ramp Y hit (trace.h:471-478) --------------------------------------
    ramp_go = a & is_ramp
    m_ryhit = ramp_go & isY2
    a = a & (m_ryhit ^ 1)

    # ---- X/Z continuation: rebase wdist, advance cell ----------------------
    cont = a & marchable
    xstep = cont & xmin
    zstep = cont & zmin
    stepped = xstep | zstep
    xstep_p, zstep_p = _p(xstep), _p(zstep)
    # non-stepping lanes' sub/wn* are never consumed (every consumer
    # selects behind cont2 <= stepped), so the zstep fallback can be
    # wze instead of 0 - one select fewer, same consumed bits
    sub = jnp.where(xstep_p, wxe, wze)
    # the untaken axis keeps its ORIGINAL crossing clock (a skip on one
    # axis must not advance the other's)
    wnx = jnp.where(xstep_p, iavel.x, wx - sub)
    wny = wy - sub
    wnz = jnp.where(zstep_p, iavel.z, wz - sub)
    # tall: restore the ceiling-shift (trace.h:392)
    wny = jnp.where(_p(stepped & is_tall & _m(gy > 0)),
                    wny - iavel.y, wny)
    if use_skip:
        cx2 = s.cx + jnp.where(xstep_p, gx * (1 + kx), 0)
        cz2 = s.cz + jnp.where(zstep_p, gz * (1 + kz), 0)
    else:
        cx2 = s.cx + jnp.where(xstep_p, gx, 0)
        cz2 = s.cz + jnp.where(zstep_p, gz, 0)

    # ramp: recompute ldir from tilted ray, untilt, recompute wdist.y
    ldir3 = jnp.where(
        _p(ramp_go & xstep), jnp.where(ray2.x < 0.0, FXN, FXP),
        jnp.where(_p(ramp_go & zstep),
                  jnp.where(ray2.z < 0.0, FZN, FZP),
                  ldir2))
    rgs_p = _p(ramp_go & stepped)
    ray_y3 = jnp.where(rgs_p, ray_y2 - tilt, ray_y2)
    # non-ramp lanes: ray_y3 == ray_y2 == ray.y bit-exactly (tilt is
    # +-0 there, see ray_y2), so the old is_ramp select was an identity
    ray3 = V3(ray2.x, ray_y3, ray2.z)
    wy_post = jnp.where(ray_y3 >= 0.0, F32(1.0) - pos2.y, pos2.y) \
        * iavel.y
    wny = jnp.where(rgs_p, wy_post, wny)

    # ---- portal traversal targets (trace.h:507-650): computed in the
    # merged rare-event branch above (pout), small ints packed - the
    # unpack here is exact (see portal_calc); when the cond skipped,
    # pw == 0 means pkind == 0, so no lane takes the portal outputs
    (w, ccf, px_f, pz_f, vx_r, vz_r, wx_r, wz_r, ix_r, iz_r) = pout[:10]
    pkind = w & 3
    ldir_p = (w >> 2) & 3
    gx_r = 1 - 2 * ((w >> 4) & 1)
    gz_r = 1 - 2 * ((w >> 5) & 1)
    cx_f = (ccf << 16) >> 16
    cz_f = ccf >> 16
    # pages <= 16 (worlddev build assert), so dpage is bits 18-21 and
    # bit 22 is free for the sphere-relevance bit (fire above)
    page_f = ((w >> 18) & 0xF) if env.paged else None
    pgo = a & is_portal & ((jnp.int32(1 << 1) >> pkind) & 1)
    pgo_p = _p(pgo)

    # ---- the ONE per-step fetch: landing cell of steppers & portal rays --
    # cx2 == s.cx bitwise for non-steppers (the xstep select adds 0),
    # so the old where(stepped, cx2, s.cx) was an identity; same for cz
    tgt_cx = jnp.where(pgo_p, cx_f, cx2)
    tgt_cz = jnp.where(pgo_p, cz_f, cz2)
    tgt_pg = (jnp.where(pgo_p, page_f, s.page) if env.paged else None)
    # move: the lanes that CONSUME f_next this step.  Every consumer
    # below is gated behind stepped (tr1/tr2/chk/revert/m_wall2 and the
    # transition reads of ncls/xc) or pgo (pgo itself; cont2/pgo2 are
    # subsets), so a fetch may return anything for other lanes - the
    # pallas backend's mover-window fetch exploits this
    # (cfg.span_fetch; tools/fetch_span.py sizes it).
    f_next = env.fetch(tgt_cx, tgt_cz, tgt_pg, move=_p(stepped | pgo))
    if cfg.probe == "fetch2x":
        # probe: a SECOND full fetch at a runtime-equal index.  ozi is
        # 0 at runtime but data-opaque, so the duplicate's gathers
        # survive CSE; the opaque select then discards it.  Prices the
        # whole chunked-fetch block.  See RenderConfig.probe.
        opq = s.cdist > F32(-1e30)
        ozi = jnp.where(opq, 0, 1).astype(tgt_cz.dtype)
        f_dup = env.fetch(tgt_cx, tgt_cz + ozi, tgt_pg,
                          move=_p(stepped | pgo))
        f_next = CellFields(ent=jnp.where(opq, f_next.ent, f_dup.ent))

    # ---- transitions (floor<->tall shifts) --------------------------------
    f2 = f_next
    ncls = f2.cls
    n_tall = clsbit((1 << W.TALL) | (1 << W.TALLFOG), ncls)
    n_lower = clsbit(1 << W.LOWER, ncls)

    pos3y = pos2.y
    # '"' -> '#/&' (trace.h:343-351)
    tr1 = stepped & clsbit(1 << W.LOWER) & n_tall
    tr1_p = _p(tr1)
    pos3y = jnp.where(tr1_p, pos3y + F32(1.0), pos3y)
    wny = jnp.where(tr1_p,
                    jnp.where(gy < 0, wny + iavel.y, wny - iavel.y),
                    wny)
    # '#/&' -> '"' (trace.h:395-402)
    tr2 = stepped & is_tall & n_lower
    tr2_p = _p(tr2)
    pos3y = jnp.where(tr2_p, pos3y - F32(1.0), pos3y)
    wny = jnp.where(tr2_p,
                    jnp.where(gy > 0, wny + iavel.y, wny - iavel.y),
                    wny)

    # '#/&': 2-high wall check with behind-cell substitution
    # (trace.h:404-440)
    xc = f2.xcls2
    y_out = _m(pos3y < F32(0.0)) | _m(pos3y > F32(1.0))
    chk = stepped & is_tall & y_out
    revert = chk & ((jnp.int32(1 << 2) >> xc) & 1)      # xc == 2
    revert_p = _p(revert)
    pos3y = jnp.where(revert_p, pos3y + F32(1.0), pos3y)
    wny = jnp.where(revert_p,
                    jnp.where(gy > 0, wny - iavel.y, wny + iavel.y), wny)
    pos3 = V3(pos2.x, pos3y, pos2.z)
    m_wall2 = chk & (((jnp.int32(1 << 1) >> xc) & 1) ^ 1)  # xc != 1
    a = a & (m_wall2 ^ 1)

    # ---- portal cells (trace.h:507-650) + plain wall (trace.h:651-664) ----
    p_bad = a & is_portal & ((jnp.int32(1 << 2) >> pkind) & 1)
    p_wrong = a & is_portal & ((jnp.int32(1 << 3) >> pkind) & 1)
    wall0 = a & is_wall
    sphfire = has_aux & sgt
    nsf = sphfire ^ 1
    m_pbs = p_bad & sphfire
    m_pbw = p_bad & nsf
    m_pws = p_wrong & sphfire
    m_pww = p_wrong & nsf
    m_sphw = wall0 & sphfire
    m_wallm = wall0 & nsf
    a = a & ((p_bad | p_wrong | wall0) ^ 1)

    # ---- merged terminal + survivor writes (values identical to the
    # per-site _terminate calls they replace; see the masks above).
    # Terminal outputs are folded INTO the carried arrays: a dying
    # lane's final pos/ray/fog/ldir/cdist land in the carried planes
    # (frozen afterwards); only kind+colour need their own channel
    # (tmeta).  One select chain per field for both fates.
    sphm = m_presph | m_sph2 | m_pbs | m_pws | m_sphw
    wallT = m_yhit | m_ryhit | m_wall2 | m_pbw | m_pww | m_wallm
    term = sphm | wallT
    near = m_yhit | m_ryhit | m_wall2          # terminals at cdist2
    my2 = m_yhit | m_ryhit
    ldir_ry = jnp.where(ray_y2 < 0.0, FYN, FYP)
    cont2 = a & stepped
    pgo2 = a & pgo
    # select predicates, one cheap compare per mask (the _m/_p note)
    term_p, sphm_p = _p(term), _p(sphm)
    m_yhit_p, m_ryhit_p = _p(m_yhit), _p(m_ryhit)
    my2_p, m_wall2_p = _p(my2), _p(m_wall2)
    cont2_p, pgo2_p = _p(cont2), _p(pgo2)
    cn_p = _p(cont2 | near)
    cw_p = _p(cont2 | m_wall2)
    colid = jnp.where(
        m_yhit_p, jnp.where(gy > 0, C_CEIL, C_FLOOR),
        jnp.where(m_ryhit_p,
                  jnp.where(ray_y2 >= 0.0, C_CEIL, C_FLOOR),
                  jnp.where(_p(m_pww), C_MAGENTA,
                            jnp.where(_p(m_wallm
                                         & clsbit(1 << FYP, s.ldir)),
                                      C_CEIL, C_WALL))))
    new_tmeta = jnp.where(
        term_p, jnp.where(sphm_p, T_SPHERE, T_WALL | (colid << 2)),
        s.tmeta)
    # pos: survivors advance to pos3; near-wall deaths record the hit
    # point (pos3.x/z == pos2.x/z; y differs per case via the shifts)
    new_pos = V3(
        jnp.where(pgo2_p, px_f,
                  jnp.where(cn_p, pos3.x, pos.x)),
        jnp.where(cw_p, pos3.y,
                  jnp.where(my2_p, pos2.y, pos.y)),
        jnp.where(pgo2_p, pz_f,
                  jnp.where(cn_p, pos3.z, pos.z)))
    # ray: only the ramp-tilted terminals (pre-sphere, ramp Y hit)
    # differ from the carried ray, and only in y; ray3.x/z == ray.x/z
    # bitwise (the tilt touches y alone), so the cont2 selects on the
    # x/z components were identities
    new_ray = V3(jnp.where(pgo2_p, vx_r, ray.x),
                 jnp.where(cont2_p, ray3.y,
                           jnp.where(_p(m_presph | m_ryhit), ray_y2,
                                     ray.y)),
                 jnp.where(pgo2_p, vz_r, ray.z))
    new_wd = V3(jnp.where(pgo2_p, wx_r,
                          jnp.where(cont2_p, wnx, wdist.x)),
                jnp.where(cont2_p, wny, wdist.y),
                jnp.where(pgo2_p, wz_r,
                          jnp.where(cont2_p, wnz, wdist.z)))
    new_ia = V3(jnp.where(pgo2_p, ix_r, iavel.x), iavel.y,
                jnp.where(pgo2_p, iz_r, iavel.z))
    new_gx = jnp.where(pgo2_p, gx_r, gx)
    new_gz = jnp.where(pgo2_p, gz_r, gz)
    new_cx = jnp.where(cont2_p, cx2, jnp.where(pgo2_p, cx_f, s.cx))
    new_cz = jnp.where(cont2_p, cz2, jnp.where(pgo2_p, cz_f, s.cz))
    new_cd = jnp.where(cn_p, cdist2,
                       jnp.where(sphm_p, s.aux_dist, s.cdist))
    new_fog = jnp.where(_p(cont2 | m_yhit | m_wall2), fog2,
                        jnp.where(_p(m_sph2), s.fog + extra, s.fog))
    # wall2 lanes are tall (never ramp), so their ldir3 == ldir2
    new_ld = jnp.where(cont2_p, ldir3,
                       jnp.where(pgo2_p, ldir_p,
                                 jnp.where(m_ryhit_p, ldir_ry,
                                           jnp.where(_p(m_yhit
                                                        | m_wall2),
                                                     ldir2, s.ldir))))
    new_f = _sel_fields(_p(cont2 | pgo2), f_next, f)

    # ---- measurement-only calibration pads (see RenderConfig.probe) ----
    if cfg.probe in ("pad64", "pad64d", "sel64", "bool128", "int128",
                     "cmp64"):
        opq = s.cdist > F32(-1e30)
        if cfg.probe == "pad64":
            # 8 independent 8-step mul+add chains = 128 f32 planes of
            # issue load at 8-way chain ILP (the body's natural shape)
            seeds = [pos.x, pos.y, pos.z, ray.x, ray.y, ray.z, wx, wz]
            acc = None
            for u in seeds:
                for _ in range(8):
                    u = u * ray2.x + pos2.z
                acc = u if acc is None else acc + u
            new_fog = jnp.where(opq, new_fog, acc)
        elif cfg.probe == "pad64d":
            # ONE dependent 64-step mul+add chain = the same 128 planes
            # with no ILP: if this costs >> pad64, the body is
            # latency-sensitive, not issue-bound
            u = pos.x
            for _ in range(64):
                u = u * ray2.x + pos2.z
            new_fog = jnp.where(opq, new_fog, u)
        elif cfg.probe == "sel64":
            # 8 independent 8-deep select chains on live masks/values
            # (64 select planes) - select-vs-fma issue cost
            ms = [_p(x) for x in (xstep, zstep, term, pgo2, cont2,
                                  my2, ymin, xmin)]
            vs = [pos.x, pos.y, pos.z, ray.x, ray.y, ray.z, wx, wz]
            acc = None
            for j, v in enumerate(vs):
                u = v
                for m in ms:
                    u = jnp.where(m, u, vs[(j + 1) % 8])
                acc = u if acc is None else acc + u
            new_fog = jnp.where(opq, new_fog, acc)
        elif cfg.probe == "int128":
            # the bool128 chains on i32 {0,1} masks (16 one-off
            # converts, then 128 i32 bitwise planes): measured +0.61
            # ms vs bool128's +2.77 - the verdict that moved the
            # body's mask logic to i32 words (the _m/_p calculus)
            ms = [_m(_p(x)) for x in (xstep, zstep, term, pgo2, cont2,
                                      my2, ymin, xmin)]
            ns = [_m(_p(x)) for x in (is_wall, is_tall, is_ramp,
                                      is_portal, ft, near, sphm,
                                      wallT)]
            acc = None
            for m in ms:
                u = m
                for n in ns:
                    u = u ^ (m & n)
                acc = u if acc is None else acc | u
            new_tmeta = jnp.where(opq, new_tmeta,
                                  jnp.where(acc != 0, 1, 2))
        elif cfg.probe == "cmp64":
            # 64 f32 compare + 64 select pairs; delta minus sel64's
            # prices the compares themselves
            vs = [pos.x, pos.y, pos.z, ray.x, ray.y, ray.z, wx, wz]
            acc = None
            for j, v in enumerate(vs):
                u = v
                for k in range(8):
                    c = u < vs[(j + k + 1) % 8]
                    u = jnp.where(c, u, vs[(j + k) % 8])
                acc = u if acc is None else acc + u
            new_fog = jnp.where(opq, new_fog, acc)
        else:  # bool128: 64 and + 64 xor on live i1 mask planes
            ms = [_p(x) for x in (xstep, zstep, term, pgo2, cont2,
                                  my2, ymin, xmin)]
            ns = [_p(x) for x in (is_wall, is_tall, is_ramp,
                                  is_portal, ft, near, sphm, wallT)]
            acc = None
            for m in ms:
                u = m
                for n in ns:
                    u = u ^ (m & n)
                acc = u if acc is None else acc | u
            new_tmeta = jnp.where(opq, new_tmeta,
                                  jnp.where(acc, 1, 2))

    s = s._replace(pos=new_pos, ray=new_ray, wdist=new_wd, iavel=new_ia,
                   fields=new_f,
                   gx=new_gx, gz=new_gz, cx=new_cx, cz=new_cz,
                   page=(jnp.where(pgo2_p, page_f, s.page)
                         if env.paged else None),
                   cdist=new_cd, fog=new_fog, ldir=new_ld,
                   tmeta=new_tmeta,
                   # pure i32 form of where(term, 0, active): active
                   # is {0,1}, so masking clears exactly term lanes
                   active=s.active & (term ^ 1))

    # hoisted-sphere mode: candidates are a function of the ray LINE, so
    # any event that moves a lane off its line - portal rotation, the
    # '"'<->'#/&' y-shifts (tr1/tr2), or a ramp crossing (pos advanced
    # along the tilted ray) - marks the lane dirty: the NEXT step's
    # refresh cond re-derives its candidates on the new line (see the
    # sphere block at the top of this function), exactly when the
    # reference's next loop-top bucket test would run (trace.h:252
    # after :649).  An already-ENTERED pending candidate persists
    # exactly as the reference's aux does across such events; one whose
    # AABB entry is still ahead was never registered by the reference
    # and is dropped (it belonged to the abandoned line).
    if env.sphere_all is not None:
        # y-shift/ramp events only matter for lanes whose XZ line can
        # see a sphere (relevance bit, shift-invariant); a pending
        # candidate implies the bit, so the drop logic is unaffected
        ev_shift = (stepped & (tr1 | tr2 | ramp_go)
                    & ((s.sph_dirty >> 1) & 1))
        ev = pgo2 | ev_shift
        drop = (ev & _m(s.aux_dist != F32(-1.0))
                & _m(s.cdist < s.aux_t0))
        if env.sphere_rel is not None:
            # portal lanes land on a NEW line: its relevance was
            # computed inline in the event cond (fire, bit 22 of w)
            # with the refresh's own expressions.  Relevant -> 3
            # (bit 0 fires the refresh next step, which recomputes
            # both bits from the same inputs); irrelevant -> 0, the
            # exact state that refresh would have produced (no
            # candidate can register off the bound circle; a pending
            # ENTERED candidate persists either way) - so the refresh
            # cond stops firing for portal traffic that cannot see a
            # sphere.
            dirty_p = ((w >> 22) & 1) * 3
        else:
            dirty_p = s.sph_dirty | 1
        s = s._replace(
            sph_dirty=jnp.where(pgo2_p, dirty_p,
                                jnp.where(_p(ev_shift),
                                          s.sph_dirty | 1,
                                          s.sph_dirty)),
            aux_dist=jnp.where(_p(drop), F32(-1.0), s.aux_dist))

    # ---- end-of-iteration sphere check (trace.h:668-673) ------------------
    # `fire` (the pre-write max(aux_dist, aux_t0)) is still current
    # here: the body changes aux_dist only via `drop` (to -1, and those
    # lanes are excluded by the != -1 test) and never touches aux_t0,
    # so reusing it is bit-identical to recomputing the max.
    end_sph = (s.active & _m(s.aux_dist != F32(-1.0))
               & _m(s.cdist > fire))
    s = _terminate(s, _p(end_sph), T_SPHERE, dist=s.aux_dist)
    return s




def _pack_carry(s: SegState, profile: bool, pack_page: bool):
    """Fold the small-integer SegState planes into two i32 words for
    the while-loop carry (cfg.pack_carry).  Lossless by range — see
    the RenderConfig.pack_carry note — so unpack∘pack is the identity
    and the loop stays bit-exact while carrying 9 (11 with page/tstep)
    fewer (64,128) planes per iteration."""
    def neg(g):  # gx/gy/gz ∈ {-1, +1} -> sign bit
        return jnp.where(g < 0, 1, 0).astype(s.ldir.dtype)
    mw = (neg(s.gx) | (neg(s.gy) << 1) | (neg(s.gz) << 2)
          | (s.ldir << 3) | (s.active << 6) | (s.sph_dirty << 7)
          | (s.aux_idx << 9) | (s.tmeta << 19))
    if pack_page:
        mw = mw | (s.page << 23)
    cc = (s.cx & 0xFFFF) | (s.cz << 16)
    t = (s.pos, s.ray, s.iavel, s.wdist, s.fields.ent, s.cdist, s.fog,
         s.aux_dist, s.aux_t0, s.aux_apos, s.aux_diff, mw, cc)
    if s.page is not None and not pack_page:
        t = t + (s.page,)
    # profile=False: tstep is identically zero until the post-loop sky
    # write — reconstructed in _unpack_carry instead of carried
    return t + ((s.tstep,) if profile else ())


def _unpack_carry(t, paged: bool, profile: bool,
                  pack_page: bool) -> SegState:
    (pos, ray, iavel, wdist, ent, cdist, fog, aux_dist, aux_t0,
     aux_apos, aux_diff, mw, cc) = t[:13]
    rest = list(t[13:])
    if paged:
        page = (mw >> 23) & 15 if pack_page else rest.pop(0)
    else:
        page = None
    return SegState(
        pos=pos, ray=ray, iavel=iavel, wdist=wdist,
        fields=CellFields(ent=ent),
        gx=1 - 2 * (mw & 1), gy=1 - 2 * ((mw >> 1) & 1),
        gz=1 - 2 * ((mw >> 2) & 1),
        cx=(cc << 16) >> 16, cz=cc >> 16,
        page=page,
        cdist=cdist, fog=fog, ldir=(mw >> 3) & 7,
        active=(mw >> 6) & 1,
        aux_dist=aux_dist, aux_t0=aux_t0, sph_dirty=(mw >> 7) & 3,
        aux_apos=aux_apos, aux_idx=(mw >> 9) & 0x3FF,
        aux_diff=aux_diff,
        tmeta=(mw >> 19) & 15,
        tstep=rest.pop(0) if profile else jnp.zeros_like(mw))


def run_segment(env: Env, cfg: RenderConfig, ifrom: V3, iray: V3,
                active, page=None) -> SegOut:
    chunk = max(1, cfg.step_chunk)
    if cfg.maxsteps % chunk != 0:
        # the while cond only checks at chunk boundaries; a non-divisor
        # chunk would let rays march past maxsteps (reference caps at
        # exactly 1000, trace.h:247), flipping sky-vs-hit outcomes.
        raise ValueError(
            f"step_chunk={chunk} must divide maxsteps={cfg.maxsteps}")
    s0 = init_segment(ifrom, iray, active, env, page)
    if env.sphere_all is not None:
        s0 = _apply_aux(s0, env.sphere_all(s0, s0.active != 0))
    fl0 = compute_flags(s0, env)
    pack = cfg.pack_carry
    # page fits the carry word's 4 spare bits (worlddev asserts <= 16
    # pages at build); a hypothetical wider atlas carries it separately
    pack_page = env.paged and env.n_pages <= 16

    def cond(carry):
        step, fl, s = carry
        return (step < cfg.maxsteps) & ((fl & 1) > 0)

    def body(carry):
        step, fl, s = carry
        if pack:
            s = _unpack_carry(s, env.paged, cfg.profile, pack_page)
        for k in range(chunk):
            if cfg.profile:
                prev = s.active
            s = segment_body(s, env, cfg, fl)
            fl = compute_flags(s, env)
            if cfg.profile:
                died = (prev != 0) & (s.active == 0)
                s = s._replace(
                    tstep=jnp.where(died, step + 1 + k, s.tstep))
        if pack:
            s = _pack_carry(s, cfg.profile, pack_page)
        return (step + chunk, fl, s)

    c0 = _pack_carry(s0, cfg.profile, pack_page) if pack else s0
    _, _, s = jax.lax.while_loop(cond, body, (jnp.int32(0), fl0, c0))
    if pack:
        s = _unpack_carry(s, env.paged, cfg.profile, pack_page)
    # still-active rays ran out of steps: sky colour = current ray dir
    # (the carried ray IS the terminal ray, nothing to write)
    left = s.active != 0
    s = s._replace(tmeta=jnp.where(left, T_SKY, s.tmeta),
                   tstep=jnp.where(left, cfg.maxsteps, s.tstep))
    return seg_out_view(s, env)


def seg_out_view(s: SegState, env: Env) -> SegOut:
    """Terminal outputs, read back from the carried (frozen) state.
    The sphere winner's refl/normal/colour rematerialize here (once per
    segment) from the compact carried record via env.sphere_view."""
    if env.sphere_view is not None:
        refl, apos, anorm, acol = env.sphere_view(s)
    else:
        # sphere-free scene: the init defaults (never consumed - no
        # lane can terminate T_SPHERE without a registered candidate)
        zero = jnp.zeros_like(s.aux_diff)
        one = jnp.ones_like(zero)
        refl = zero + F32(0.25)
        apos = V3(zero, zero, zero)
        anorm = V3(zero, zero, zero)
        acol = C4(one, one, one, one)
    return SegOut(tkind=s.tmeta & 3, tldir=s.ldir,
                  tcolid=(s.tmeta >> 2) & 3,
                  tfog=s.fog, tdist=s.cdist, tpos=s.pos, tray=s.ray,
                  tpage=s.page, tstep=s.tstep,
                  aux_refl=refl, aux_pos=apos,
                  aux_norm=anorm, aux_col=acol)


class FusedAcc(NamedTuple):
    """Per-lane bounce bookkeeping of the fused wave loop."""

    wave: jnp.ndarray      # current segment index (0 = primary)
    segsteps: jnp.ndarray  # DDA steps taken in the current segment
    done: jnp.ndarray      # 1 = colour finalized
    seed: jnp.ndarray      # LCG state (advances 5 per shade event)
    icol: C4               # parent base colour fed to the child wave
    acc_a: C4              # composed affine: col = acc_a + acc_b * x
    acc_b: jnp.ndarray     #   (b stays scalar: refl and fog factors)
    col: C4                # finalized colour
    dist0: jnp.ndarray     # primary-wave terminal distance (zbuf)


def compute_flags_fused(s: SegState, acc: FusedAcc,
                        env: Env) -> jnp.ndarray:
    """Fused-loop gates: bit0 any-active, bit1 any EVENT lane
    (sphere refresh, portal or ramp — segment_body's merged-cond
    encoding, see compute_flags), bit3 unprocessed death.  Two exact
    reductions (every v bit implies the active bit, so one max covers
    bits 0-1; bit 3 is independent)."""
    act = s.active != 0
    cls = s.fields.cls
    ev = act & ((cls == W.PORTAL)
                | ((cls >= W.RAMP_GT) & (cls <= W.RAMP_CR)))
    if env.sphere_all is not None:
        ev = ev | (act & ((s.sph_dirty & 1) != 0))
    v = jnp.where(act, 1, 0) | jnp.where(ev, 2, 0)
    unproc = (~act) & (s.tmeta != 0) & (acc.done == 0)
    b3 = jnp.max(jnp.where(unproc, 1, 0))
    return jnp.max(v) | (b3 << 3)


def _process_deaths(s: SegState, acc: FusedAcc, env: Env,
                    cfg: RenderConfig, sec) -> tuple[SegState, FusedAcc]:
    """Shade every unprocessed dead lane; finalize or restart it as its
    own bounce segment - the fused analogue of trace_hit_bounce's
    recursion (trace.h:86-105) plus the unwind blend, carried forward
    as a per-lane affine (col = acc_a + acc_b * child)."""
    unproc = (s.active == 0) & (s.tmeta != 0) & (acc.done == 0)
    out = seg_out_view(s, env)
    depth_ok = acc.wave < cfg.reflect
    base, refl, bounce, mpos, mray, seed2 = shade_and_bounce(
        out, acc.icol, acc.seed, sec, depth_ok, env, water=cfg.water)
    bounce = bounce & unproc
    fin = unproc & ~bounce

    # finalize: col = G(base) with G the composed ancestor affine
    colf = acc.acc_a + acc.acc_b * base
    col = colf.where(fin, acc.col)
    dist0 = jnp.where(unproc & (acc.wave == 0), s.cdist, acc.dist0)

    # bounce: compose this wave's blend into the affine
    # (trace_hit_bounce:90-101: blended = refl*child + (1-refl)*base,
    # then the fog wrap f*blended + (1-f) only when fog != 0)
    a_b, b_b = base * (F32(1.0) - refl), refl
    fogf = env.math.exp(F32(-0.6) * s.fog)
    has_fog = s.fog != F32(0.0)
    a_b = (a_b * fogf + (F32(1.0) - fogf)).where(has_fog, a_b)
    b_b = jnp.where(has_fog, b_b * fogf, b_b)
    new_a = (acc.acc_a + acc.acc_b * a_b).where(bounce, acc.acc_a)
    new_b = jnp.where(bounce, acc.acc_b * b_b, acc.acc_b)

    # restart the lane on its bounce ray (init_segment semantics via
    # the shared _init_march - bit-identical to the unfused wave init)
    (ray_n, cx_n, cz_n, gx_n, gy_n, gz_n, iavel_n, wdist_n,
     f_n) = _init_march(mpos, mray, env, s.page)
    z1 = jnp.zeros_like(s.pos.x)
    zi = jnp.zeros_like(s.cx)
    s = s._replace(
        pos=mpos.where(bounce, s.pos),
        ray=ray_n.where(bounce, s.ray),
        iavel=iavel_n.where(bounce, s.iavel),
        wdist=wdist_n.where(bounce, s.wdist),
        fields=_sel_fields(bounce, f_n, s.fields),
        gx=jnp.where(bounce, gx_n, s.gx),
        gy=jnp.where(bounce, gy_n, s.gy),
        gz=jnp.where(bounce, gz_n, s.gz),
        cx=jnp.where(bounce, cx_n, s.cx),
        cz=jnp.where(bounce, cz_n, s.cz),
        cdist=jnp.where(bounce, z1, s.cdist),
        fog=jnp.where(bounce, z1, s.fog),
        ldir=jnp.where(bounce, FYN, s.ldir),
        active=jnp.where(bounce, 1, s.active),
        aux_dist=jnp.where(bounce, F32(-1.0), s.aux_dist),
        aux_t0=jnp.where(bounce, F32(-1.0), s.aux_t0),
        aux_apos=V3(z1, z1, z1).where(bounce, s.aux_apos),
        aux_idx=jnp.where(bounce, 0, s.aux_idx),
        aux_diff=jnp.where(bounce, z1, s.aux_diff),
        tmeta=jnp.where(unproc, 0, s.tmeta),
        tstep=jnp.where(bounce, zi, s.tstep))
    # derive the new line's sphere candidates NOW (the refresh cond
    # cannot cover the restart: the lane steps this very iteration)
    if env.sphere_all is not None:
        aux = env.sphere_all(s, bounce)
        s = s._replace(
            aux_dist=aux[0], aux_apos=aux[1], aux_idx=aux[2],
            aux_diff=aux[3], aux_t0=aux[4],
            sph_dirty=jnp.where(bounce, aux[5], s.sph_dirty))
    acc = FusedAcc(
        wave=jnp.where(bounce, acc.wave + 1, acc.wave),
        segsteps=jnp.where(bounce, 0, acc.segsteps),
        done=jnp.where(fin, 1, acc.done),
        seed=jnp.where(unproc, seed2, acc.seed),
        icol=base.where(bounce, acc.icol),
        acc_a=new_a, acc_b=new_b, col=col, dist0=dist0)
    return s, acc


def run_fused(env: Env, cfg: RenderConfig, ifrom: V3, iray: V3, seed,
              sec, page=None):
    """Fused multi-bounce trace (fast mode): ONE masked DDA loop in
    which a lane that terminates is shaded and restarted on its bounce
    ray immediately - no cross-wave barrier, so a tile executes
    max_lane(total steps) instead of sum_w(max_lane(steps_w)).  This is
    the wavefront form of the reference's bounded recursion
    (trace.h:86-105) and the "ray compaction between bounces" of the
    north star: divergent lanes never wait for a wave boundary.

    Per-lane marching arithmetic is the same op sequence as the
    unfused wave loop, so geometry (terminal kinds, distances, zbuf)
    is bit-identical to trace_wave_env with fused=False; colours agree
    to ~1 ULP (the unwind blend becomes a forward-composed affine,
    associating reflectance products differently - see
    tests/test_fused.py).  Returns (col: C4, dist)."""
    one = jnp.ones_like(ifrom.x)
    zi = jnp.zeros_like(ifrom.x).astype(I32)
    z1 = jnp.zeros_like(ifrom.x)
    sec = F32(sec)
    s0 = init_segment(ifrom, iray, one > 0.0, env, page)
    if env.sphere_all is not None:
        s0 = _apply_aux(s0, env.sphere_all(s0, s0.active != 0))
    acc0 = FusedAcc(wave=zi, segsteps=zi, done=zi, seed=seed,
                    icol=C4(one, one, one, one),
                    acc_a=C4(z1, z1, z1, z1), acc_b=one,
                    col=C4(z1, z1, z1, z1), dist0=z1)
    fl0 = compute_flags_fused(s0, acc0, env)
    chunk = max(1, cfg.step_chunk)
    # generous hard cap: every wave may march its full step budget
    cap = cfg.maxsteps * cfg.n_waves + 8 * cfg.n_waves

    def cond(carry):
        it, fl, s, acc = carry
        return (it < cap) & ((fl & 9) > 0)

    def body(carry):
        it, fl, s, acc = carry
        for _ in range(chunk):
            s, acc = jax.lax.cond(
                (fl & 8) > 0,
                lambda op: _process_deaths(op[0], op[1], env, cfg, sec),
                lambda op: (op[0], op[1]), (s, acc))
            was = s.active != 0
            s = segment_body(s, env, cfg, fl)
            acc = acc._replace(
                segsteps=jnp.where(was, acc.segsteps + 1,
                                   acc.segsteps))
            # per-segment step budget -> sky (trace.h:247,678)
            over = (s.active != 0) & (acc.segsteps >= cfg.maxsteps)
            s = _terminate(s, over, T_SKY)
            fl = compute_flags_fused(s, acc, env)
        return (it + chunk, fl, s, acc)

    _, fl, s, acc = jax.lax.while_loop(cond, body,
                                       (jnp.int32(0), fl0, s0, acc0))
    # drain any death left unprocessed when the loop exited
    s, acc = jax.lax.cond(
        (fl & 8) > 0,
        lambda op: _process_deaths(op[0], op[1], env, cfg, sec),
        lambda op: (op[0], op[1]), (s, acc))
    return acc.col, acc.dist0


def _palette(colid, chan: int):
    return jnp.where(colid == 0, F32(PAL[0, chan]),
                     jnp.where(colid == 1, F32(PAL[1, chan]),
                               jnp.where(colid == 2, F32(PAL[2, chan]),
                                         F32(PAL[3, chan]))))


def shade_and_bounce(out: SegOut, icol: C4, seed, sec, depth_ok: bool,
                     env: Env, water: bool = True):
    """Wall shading (trace_hit_wall) + bounce prep (trace_hit_bounce).

    water=False is an ABLATION KNOB ONLY (perf_probe --nowater): it
    replaces the animated water normal's 4 transcendentals with a flat
    +y normal to size their cost on chip.  Never a shipping mode."""
    math = env.math
    rx, ry, rz = out.tray.x, out.tray.y, out.tray.z
    d = jnp.where(out.tldir == FYP, ry,
        jnp.where(out.tldir == FZP, rz,
        jnp.where(out.tldir == FXN, -rx,
        jnp.where(out.tldir == FYN, -ry,
        jnp.where(out.tldir == FZN, -rz, rx)))))
    d = jnp.maximum(d, 0.0)
    d = F32(0.9) * d + F32(0.1)
    zero = jnp.zeros_like(d)
    wallcol = C4(_palette(out.tcolid, 0), _palette(out.tcolid, 1),
                 _palette(out.tcolid, 2), zero)
    base_wall = icol * wallcol * d
    is_wall = out.tkind == T_WALL
    is_sph = out.tkind == T_SPHERE
    sky4 = C4(rx, ry, rz, zero)
    base = base_wall.where(is_wall, out.aux_col.where(is_sph, sky4))
    refl = jnp.where(is_wall,
                     jnp.where(out.tldir == FYN, F32(0.7), F32(0.25)),
                     jnp.where(is_sph, out.aux_refl, F32(0.0)))
    bounce = (is_wall | is_sph) & (refl != F32(0.0)) & depth_ok

    # mirror + nudge (trace_hit_bounce:12-75)
    pos = out.tpos
    ray = out.tray
    eps = F32(0.001)
    negx = (out.tldir == FXP) | (out.tldir == FXN)
    negz = (out.tldir == FZP) | (out.tldir == FZN)
    negy = out.tldir == FYP
    mray = V3(jnp.where(is_wall & negx, -rx, rx),
              jnp.where(is_wall & negy, -ry, ry),
              jnp.where(is_wall & negz, -rz, rz))
    nudx = jnp.where(out.tldir == FXP, -eps,
                     jnp.where(out.tldir == FXN, eps, F32(0.0)))
    nudy = jnp.where((out.tldir == FYP) | (out.tldir == FYN), -eps,
                     F32(0.0))
    nudz = jnp.where(out.tldir == FZP, -eps,
                     jnp.where(out.tldir == FZN, eps, F32(0.0)))
    mpos = (pos + V3(nudx, nudy, nudz)).where(is_wall, pos)

    # water floor (FYN): normal from the *nudged* position (trace.h:39-56)
    is_water = is_wall & (out.tldir == FYN)
    pi = F32(np.pi)
    if water:
        ang = (pi * F32(2.0)) * ((math.sin(pi * F32(0.5) * mpos.x)
                                  + math.cos(pi * F32(0.5) * mpos.z))
                                 + sec * F32(1.0))
        wnorm = normalise_sse(
            V3(math.sin(ang), jnp.full_like(ang, 38.0), math.cos(ang)),
            math.rsq)
    else:  # ablation: flat floor normal, no trig (see docstring)
        zero2 = jnp.zeros_like(mpos.x)
        wnorm = V3(zero2, zero2 + F32(1.0), zero2)
    norm = wnorm.where(is_water, out.aux_norm)

    # sphere: back off along the ray from aux_pos (trace.h:58-60)
    mpos = (out.aux_pos - F32(0.001) * ray).where(is_sph, mpos)

    mirror = is_water | is_sph
    rmul = F32(-2.0) * (((F32(0.0) + ray.x * norm.x) + ray.y * norm.y)
                        + ray.z * norm.z)
    mirrored = normalise_sse(rmul * norm + ray, math.rsq)
    mray = mirrored.where(mirror, mray)

    # reflect blur: 5 draws, 2 discarded (trace.h:77-84)
    rb = F32(0.03)
    seed, v = env.randfs(seed)
    mx = mray.x + v * rb
    seed, v = env.randfs(seed)
    my = mray.y + v * rb
    seed, _ = env.randfs(seed)
    seed, v = env.randfs(seed)
    mz = mray.z + v * rb
    seed, _ = env.randfs(seed)
    mray = V3(mx, my, mz)

    return base, refl, bounce, mpos, mray, seed


def trace_wave_env(env: Env, cfg: RenderConfig, ifrom: V3, iray: V3,
                   seed, sec, page=None):
    """Full multi-bounce trace. Returns (col: C4, dist).

    Fast mode uses the fused loop (run_fused, bit-identical results);
    parity mode and profile runs keep the per-wave structure (the
    serial wave boundary is what tstep telemetry measures).

    cfg.samples > 1 (distribution path tracing, BASELINE config #5):
    the PRIMARY wave consumes no RNG, so it is traced ONCE and shared;
    each sample's chain diverges only at the first shade's bounce
    jitter (seed stream base + k*0x9E3779B9, as render_accumulated's
    old per-sample calls used).  The returned colour is the sample
    mean, accumulated with the old path's float ops in order."""
    if cfg.fused and not cfg.parity and not cfg.profile:
        assert cfg.samples == 1, "fused loop is single-sample"
        return run_fused(env, cfg, ifrom, iray, seed, sec, page)
    one = jnp.ones_like(ifrom.x)
    active = one > 0.0
    icol0 = C4(one, one, one, one)
    sec = F32(sec)

    out0 = run_segment(env, cfg, ifrom, iray, active, page)
    dist0 = out0.tdist

    def chain(seed):
        """Shade+bounce waves 1.. from the shared primary SegOut;
        returns the unwind-blended colour (trace_hit_bounce:86-105)."""
        bases, refls, bounces, fogs = [], [], [], []
        out = out0
        icol = icol0
        pg = cur_from = cur_ray = act = None
        for k in range(cfg.n_waves):
            if k > 0:
                out = run_segment(env, cfg, cur_from, cur_ray, act, pg)
            pg = out.tpage   # bounce waves continue in the hit's page
            depth_ok = k < cfg.reflect
            base, refl, bounce, mpos, mray, seed = shade_and_bounce(
                out, icol, seed, sec, depth_ok, env, water=cfg.water)
            bases.append(base)
            refls.append(refl)
            bounces.append(bounce)
            fogs.append(out.tfog)
            icol = base
            cur_from, cur_ray = mpos, mray
            act = bounce
        col = bases[-1]
        for k in range(cfg.n_waves - 2, -1, -1):
            blended = refls[k] * col + (F32(1.0) - refls[k]) * bases[k]
            fogf = env.math.exp(F32(-0.6) * fogs[k])
            fogged = fogf * blended + (F32(1.0) - fogf)
            res = fogged.where(fogs[k] != F32(0.0), blended)
            col = res.where(bounces[k], bases[k])
        return col

    if cfg.samples == 1:
        return chain(seed), dist0
    acc = None
    for smp in range(cfg.samples):
        # Weyl-decorrelated seed stream; uint32 k*C wraps identically
        # under the pallas backend's int32 seeds (two's complement)
        off = (smp * 0x9E3779B9) & 0xFFFFFFFF
        if seed.dtype == jnp.int32 and off >= (1 << 31):
            off -= 1 << 32
        col = chain(seed + seed.dtype.type(off))
        acc = list(col) if acc is None else [a + c
                                             for a, c in zip(acc, col)]
    inv = F32(1.0 / cfg.samples)
    return C4(*(a * inv for a in acc)), dist0


def col_ftoint(col: C4):
    """BGRA8 pack with _mm_cvtps_epi32 + saturating packs semantics
    (util.h:48-59): round-to-nearest-even, <0 -> 0, >255 -> 255, and the
    cvtps overflow-to-INT_MIN -> 0 quirk for v >= 2^31 or NaN."""

    def one(c, shift):
        v = c * F32(255.0)
        r = jax.lax.round(v, jax.lax.RoundingMethod.TO_NEAREST_EVEN)
        bad = (v >= F32(2147483648.0)) | jnp.isnan(v)
        b = jnp.clip(r, 0.0, 255.0).astype(jnp.uint32)
        b = jnp.where(bad, jnp.uint32(0), b)
        return b << np.uint32(shift)

    return one(col.b, 0) | one(col.g, 8) | one(col.r, 16) | one(col.a, 24)
