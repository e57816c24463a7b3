"""Scalar reference tracer - the executable specification.

One ray at a time, in plain numpy float32, reproducing the reference ray
march (/root/reference/trace.h) bit-for-bit on the host:

  * SSE horizontal-add association for dots/normalise (util.h:18-46),
  * table-emulated `_mm_rsqrt_ps` / `_mm_rcp_ps` (core.approx),
  * glibc float transcendentals via ctypes (sinf/cosf/expf),
  * the exact LCG draw order (reflect blur: 5 draws, 2 discarded),
  * every branch quirk: ldir arithmetic, portal rotation temps, ramp
    tilt/untilt, fog bookkeeping, behind-cell substitution, magenta
    wrong-endpoint walls, OOB sky = ray direction.

This module is *deliberately slow* (it exists to debug the batched
tracers and to pin semantics); frame-rate rendering lives in tracer_jnp /
tracer_pallas.  Differentially tested against the compiled reference via
tools/oracle `ray` mode.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

from ..core import lcg
from ..core.approx import SseTables, rsqrt_emu, rcp_emu
from ..core.config import (COL_CEIL, COL_FLOOR, COL_MAGENTA, COL_WALL,
                           EPSILON, REFLECT, REFLECT_BLUR,
                           FXP, FZP, FXN, FZN, FYP, FYN)
from ..world.levelc import LevelData
from ..world.objects import SphereSet

F = np.float32

# glibc float transcendentals (what gcc emits calls to)
_libm = ctypes.CDLL(ctypes.util.find_library("m") or "libm.so.6")
for _n in ("sinf", "cosf", "expf"):
    _f = getattr(_libm, _n)
    _f.restype = ctypes.c_float
    _f.argtypes = [ctypes.c_float]


def sinf(x) -> np.float32:
    return F(_libm.sinf(float(x)))


def cosf(x) -> np.float32:
    return F(_libm.cosf(float(x)))


def expf(x) -> np.float32:
    return F(_libm.expf(float(x)))


def sqrtf(x) -> np.float32:
    return np.sqrt(F(x))  # IEEE-exact on both sides


def vec4(x=0.0, y=0.0, z=0.0, w=0.0) -> np.ndarray:
    return np.array([x, y, z, w], np.float32)


def v_dot(a: np.ndarray, b: np.ndarray) -> np.float32:
    """SSE shuffle-add association: (p0+p2) + (p1+p3) (util.h:18-30)."""
    p = a * b
    return (p[0] + p[2]) + (p[1] + p[3])


_PAL = {
    "ceil": vec4(*COL_CEIL, 0.0),
    "floor": vec4(*COL_FLOOR, 0.0),
    "wall": vec4(*COL_WALL, 0.0),
    "magenta": vec4(*COL_MAGENTA, 0.0),
}


class ScalarWorld:
    """Level + spheres + SSE tables packaged for the scalar tracer."""

    def __init__(self, level: LevelData, spheres: SphereSet,
                 tables: SseTables):
        self.level = level
        self.grid = level.grid
        self.pmap = level.pmap
        self.tables = tables
        self.sph = spheres
        # 4-lane mirrors of the sphere SoA (pos.w = 1, col.w = 0)
        n = spheres.pos.shape[0]
        self.sph_pos4 = np.concatenate(
            [spheres.pos, np.ones((n, 1), np.float32)], axis=1)
        self.sph_col4 = np.concatenate(
            [spheres.col, np.zeros((n, 1), np.float32)], axis=1)

    def get_cell(self, cx: int, cz: int) -> int:
        if cx < 0 or cx >= 64:
            cx = 0
        if cz < 0 or cz >= 64:
            cz = 0
        return int(self.grid[cz, cx])

    def bucket(self, cx: int, cz: int):
        n = int(self.sph.counts[cz, cx])
        return self.sph.buckets[cz, cx, :n]

    def rsqrt(self, x: np.float32) -> np.float32:
        return F(rsqrt_emu(np.asarray(x, np.float32), self.tables.rsqrt))

    def rcp(self, x: np.float32) -> np.float32:
        return F(rcp_emu(np.asarray(x, np.float32), self.tables.rcp))

    def v_normalise(self, v: np.ndarray) -> np.ndarray:
        p = v * v
        s = (p[0] + p[2]) + (p[1] + p[3])
        return v * self.rsqrt(s)


class ScalarTracer:
    def __init__(self, world: ScalarWorld, sec_current: float = 0.0,
                 pinned: bool = False):
        """pinned=True swaps glibc sinf/cosf/expf for the deterministic
        libm (core.detmath) used by the oracle_pinned build."""
        self.w = world
        self.sec = F(sec_current)
        self.seed = np.uint32(0)
        self.dist = F(0.0)
        if pinned:
            from ..core import detmath as _dm
            self._sin = lambda x: F(_dm.sin_det(F(x)))
            self._cos = lambda x: F(_dm.cos_det(F(x)))
            self._exp = lambda x: F(_dm.exp_det(F(x)))
        else:
            self._sin, self._cos, self._exp = sinf, cosf, expf

    # -- public entry --------------------------------------------------------
    def trace(self, ifrom: np.ndarray, iray: np.ndarray, seed,
              icol: np.ndarray | None = None):
        """Returns (col4, dist, seed). Mirrors trace_ray(0, ...)."""
        self.seed = np.uint32(seed)
        self.dist = F(0.0)
        if icol is None:
            icol = vec4(1.0, 1.0, 1.0, 1.0)
        col = self._trace_ray(0, np.asarray(ifrom, np.float32),
                              np.asarray(iray, np.float32), icol)
        return col, self.dist, self.seed

    # -- RNG ----------------------------------------------------------------
    def _randfs(self) -> np.float32:
        self.seed, v = lcg.randfs(self.seed)
        return v

    # -- trace_hit_bounce (trace.h:3-106) ------------------------------------
    def _bounce(self, hitctr, iray, ipos, inorm, ldir, refl, fog, col):
        w = self.w
        if hitctr < 0 or hitctr >= REFLECT or refl == F(0.0):
            return col
        ray = iray.copy()
        pos = ipos.copy()
        if ldir == FXP:
            ray[0] = -ray[0]
            pos[0] = pos[0] - F(0.001)
        elif ldir == FXN:
            ray[0] = -ray[0]
            pos[0] = pos[0] + F(0.001)
        elif ldir == FZP:
            ray[2] = -ray[2]
            pos[2] = pos[2] - F(0.001)
        elif ldir == FZN:
            ray[2] = -ray[2]
            pos[2] = pos[2] + F(0.001)
        elif ldir == FYP:
            ray[1] = -ray[1]
            pos[1] = pos[1] - F(0.001)
        elif ldir == FYN:
            # animated water floor (trace.h:39-56)
            pos[1] = pos[1] - F(0.001)
            pi = F(np.float32(np.pi))
            ang = (pi * F(2.0)) * (
                (self._sin(pi * F(0.5) * pos[0])
                 + self._cos(pi * F(0.5) * pos[2]))
                + self.sec * F(1.0))
            norm = w.v_normalise(vec4(self._sin(ang), 38.0,
                                      self._cos(ang), 0.0))
            rmul = F(-2.0) * (((F(0.0) + ray[0] * norm[0])
                               + ray[1] * norm[1]) + ray[2] * norm[2])
            ray = w.v_normalise(F(rmul) * norm + ray)
        else:
            # sphere: mirror about aux normal (trace.h:58-73)
            pos = pos - F(0.001) * ray
            norm = inorm
            rmul = F(-2.0) * (((F(0.0) + ray[0] * norm[0])
                               + ray[1] * norm[1]) + ray[2] * norm[2])
            ray = w.v_normalise(F(rmul) * norm + ray)

        # reflect blur: 5 draws, draws 3 and 5 discarded (trace.h:77-84)
        rblur = F(REFLECT_BLUR)
        ray[0] = ray[0] + self._randfs() * rblur
        ray[1] = ray[1] + self._randfs() * rblur
        self._randfs()
        ray[2] = ray[2] + self._randfs() * rblur
        self._randfs()

        odist = self.dist
        self.dist = F(0.0)
        bcol = col
        col = self._trace_ray(hitctr + 1, pos, ray, col)
        col = F(refl) * col + (F(1.0) - F(refl)) * bcol
        if fog != F(0.0):
            fogf = self._exp(F(-0.6) * fog)
            col = fogf * col + (F(1.0) - fogf) * np.full(4, 1.0, np.float32)
        self.dist = odist
        return col

    # -- trace_hit_wall (trace.h:108-154) -------------------------------------
    def _hit_wall(self, hitctr, ipos, iray, ldir, icol, fog, col):
        col = icol * col
        if ldir == FYP:
            diffuse = iray[1]
        elif ldir == FZP:
            diffuse = iray[2]
        elif ldir == FXN:
            diffuse = -iray[0]
        elif ldir == FYN:
            diffuse = -iray[1]
        elif ldir == FZN:
            diffuse = -iray[2]
        else:  # default / FXP
            diffuse = iray[0]
        if diffuse < F(0.0):
            diffuse = F(0.0)
        amb = F(0.1)
        diffuse = (F(1.0) - amb) * diffuse + amb
        col = col * F(diffuse)
        return self._bounce(hitctr, iray, ipos, None, ldir,
                            F(0.7) if ldir == FYN else F(0.25), fog, col)

    # -- trace_ray_through (trace.h:156-184) -----------------------------------
    @staticmethod
    def _through(ldir, cdist, wdist, pos, ray, gx, gy, gz):
        if wdist[1] < wdist[0] and wdist[1] < wdist[2]:
            cdist = cdist + wdist[1]
            pos += F(wdist[1]) * ray
            ldir = FYN if gy < 0 else FYP
        elif wdist[0] < wdist[2]:
            cdist = cdist + wdist[0]
            pos += F(wdist[0]) * ray
            ldir = FXN if gx < 0 else FXP
        else:
            cdist = cdist + wdist[2]
            pos += F(wdist[2]) * ray
            ldir = FZN if gz < 0 else FZP
        return ldir, cdist

    # -- trace_ray (trace.h:186-679) --------------------------------------------
    def _trace_ray(self, hitctr, ifrom, iray, icol, log=None):
        w = self.w
        ray = iray.copy()
        pos = ifrom.copy()
        ray = w.v_normalise(ray)

        cx = int(ifrom[0])  # C (int) cast truncates toward zero
        cz = int(ifrom[2])

        eps = F(EPSILON)
        for a in (0, 1, 2):
            if -eps < ray[a] < eps:
                ray[a] = -eps if ray[a] < F(0.0) else eps

        gx = -1 if iray[0] < 0 else 1
        gy = -1 if iray[1] < 0 else 1
        gz = -1 if iray[2] < 0 else 1

        avel = np.abs(ray)
        iavel = vec4()
        for a in (0, 1, 2):
            iavel[a] = w.rcp(avel[a])

        wdist = pos - vec4(float(cx), 0.0, float(cz), 0.0)
        if ray[0] >= F(0.0):
            wdist[0] = F(1.0) - wdist[0]
        if ray[1] >= F(0.0):
            wdist[1] = F(1.0) - wdist[1]
        if ray[2] >= F(0.0):
            wdist[2] = F(1.0) - wdist[2]
        wdist = wdist * iavel

        cell = w.get_cell(cx, cz)

        maxsteps = 1000
        ldir = FYN
        cdist = F(0.0)
        fog = F(0.0)
        fogbeg = F(0.0)
        aux_dist = F(-1.0)
        aux_refl = F(0.25)
        aux_dir = -1
        aux_pos = vec4()
        aux_norm = vec4()
        aux_col = np.full(4, 1.0, np.float32)

        def sphere_bounce(extra_fog=F(0.0)):
            self.dist = aux_dist
            return self._bounce(hitctr, ray, aux_pos, aux_norm, aux_dir,
                                aux_refl, fog + extra_fog, aux_col)

        while maxsteps > 0:
            maxsteps -= 1
            if log is not None:
                log.append(dict(cx=cx, cz=cz, cell=chr(cell),
                                cdist=float(cdist), pos=pos.copy(),
                                ray=ray.copy(), wdist=wdist.copy(),
                                ldir=ldir))

            # per-cell sphere tests (trace.h:252-296)
            if 0 <= cx < 64 and 0 <= cz < 64:
                for si in w.bucket(cx=cx, cz=cz):
                    rad2 = w.sph.r[si] * w.sph.r[si]
                    rel = w.sph_pos4[si] - pos
                    dist2 = v_dot(rel, rel)
                    dot = v_dot(rel, ray)
                    if dot > F(0.0):
                        calcrad2 = dist2 - dot * dot
                        if calcrad2 < rad2:
                            sdist2 = F(1.0) - calcrad2 / rad2
                            sph_dist = sqrtf(dist2) - sqrtf(sdist2)
                            if aux_dist == F(-1.0) or \
                                    sph_dist + cdist < aux_dist:
                                aux_dist = sph_dist + cdist
                                aux_pos = pos + F(sph_dist) * ray
                                aux_norm = w.v_normalise(
                                    aux_pos - w.sph_pos4[si])
                                diff = -v_dot(ray, aux_norm)
                                if diff < F(0.0):
                                    diff = F(0.0)
                                amb = F(0.2)
                                aux_refl = w.sph.refl[si]
                                diff = amb + (F(1.0) - amb) * diff
                                aux_col = F(diff) * w.sph_col4[si]

            this_cell = cell
            ch = chr(this_cell)

            if ch in ';$"':
                # 1-high room (trace.h:302-352)
                if ch == "$":
                    fogbeg = cdist
                ldir, cdist = self._through(ldir, cdist, wdist, pos, ray,
                                            gx, gy, gz)
                if aux_dist != F(-1.0) and cdist > aux_dist:
                    extra = F(0.0)
                    if ch == "$" and aux_dist > fogbeg:
                        extra = aux_dist - fogbeg
                    return sphere_bounce(extra)
                if ch == "$":
                    fog = fog + (cdist - fogbeg)
                if ldir in (FYN, FYP):
                    self.dist = cdist
                    return self._hit_wall(
                        hitctr, pos, ray, ldir, icol, fog,
                        _PAL["ceil"] if gy > 0 else _PAL["floor"])
                elif ldir in (FXN, FXP):
                    wdist = wdist - wdist[0]
                    wdist[0] = iavel[0]
                    cx += gx
                else:
                    wdist = wdist - wdist[2]
                    wdist[2] = iavel[2]
                    cz += gz
                cell = w.get_cell(cx, cz)
                if ch == '"' and cell in (ord("#"), ord("&")):
                    pos[1] = pos[1] + F(1.0)
                    if gy < 0:
                        wdist[1] = wdist[1] + iavel[1]
                    else:
                        wdist[1] = wdist[1] - iavel[1]

            elif ch in "#&":
                # 2-high room (trace.h:354-441)
                if gy > 0:
                    wdist[1] = wdist[1] + iavel[1]
                if ch == "&":
                    fogbeg = cdist
                ldir, cdist = self._through(ldir, cdist, wdist, pos, ray,
                                            gx, gy, gz)
                if aux_dist != F(-1.0) and cdist > aux_dist:
                    extra = F(0.0)
                    if ch == "&" and aux_dist > fogbeg:
                        extra = aux_dist - fogbeg
                    return sphere_bounce(extra)
                if ch == "&":
                    fog = fog + (cdist - fogbeg)
                if ldir in (FYN, FYP):
                    self.dist = cdist
                    return self._hit_wall(
                        hitctr, pos, ray, ldir, icol, fog,
                        _PAL["ceil"] if gy > 0 else _PAL["floor"])
                elif ldir in (FXN, FXP):
                    wdist = wdist - wdist[0]
                    wdist[0] = iavel[0]
                    cx += gx
                else:
                    wdist = wdist - wdist[2]
                    wdist[2] = iavel[2]
                    cz += gz
                if gy > 0:
                    wdist[1] = wdist[1] - iavel[1]
                cell = w.get_cell(cx, cz)
                if cell == ord('"'):
                    pos[1] = pos[1] - F(1.0)
                    if gy > 0:
                        wdist[1] = wdist[1] + iavel[1]
                    else:
                        wdist[1] = wdist[1] - iavel[1]
                xcell = cell
                if ord("A") <= xcell <= ord("Z"):
                    pm = w.pmap[xcell - ord("A")]
                    if pm.x1 == cx and pm.z1 == cz:
                        xcell = pm.c2
                    elif pm.x2 == cx and pm.z2 == cz:
                        xcell = pm.c1
                if pos[1] < F(0.0) or pos[1] > F(1.0):
                    if xcell in (ord("#"), ord("&")):
                        pass
                    elif xcell == ord('"'):
                        # revert adjustments, then wall (trace.h:422-434)
                        pos[1] = pos[1] + F(1.0)
                        if gy > 0:
                            wdist[1] = wdist[1] - iavel[1]
                        else:
                            wdist[1] = wdist[1] + iavel[1]
                        self.dist = cdist
                        return self._hit_wall(hitctr, pos, ray, ldir, icol,
                                              fog, _PAL["wall"])
                    else:
                        self.dist = cdist
                        return self._hit_wall(hitctr, pos, ray, ldir, icol,
                                              fog, _PAL["wall"])

            elif ch in "><,^":
                # ramp (trace.h:443-505)
                rd = F(0.5)
                if ch == ">":
                    ray[1] = ray[1] - rd * ray[0]
                elif ch == "<":
                    ray[1] = ray[1] + rd * ray[0]
                elif ch == ",":
                    ray[1] = ray[1] - rd * ray[2]
                else:
                    ray[1] = ray[1] + rd * ray[2]

                wdist[1] = pos[1]
                if ray[1] >= F(0.0):
                    wdist[1] = F(1.0) - wdist[1]
                wdist[1] = wdist[1] * (
                    F(1.0) / (-ray[1] if ray[1] < F(0.0) else ray[1]))

                if aux_dist != F(-1.0) and cdist > aux_dist:
                    return sphere_bounce()

                # NB: gy passed in the gx slot (reference trace.h:470);
                # masked by the ldir recompute below
                ldir, cdist = self._through(ldir, cdist, wdist, pos, ray,
                                            gy, gy, gz)
                if ldir in (FYN, FYP):
                    self.dist = cdist
                    ldir = FYN if ray[1] < F(0.0) else FYP
                    return self._hit_wall(
                        hitctr, pos, ray, ldir, icol, fog,
                        _PAL["ceil"] if ray[1] >= F(0.0) else _PAL["floor"])
                elif ldir in (FXN, FXP):
                    ldir = FXN if ray[0] < F(0.0) else FXP
                    wdist = wdist - wdist[0]
                    wdist[0] = iavel[0]
                    cx += gx
                else:
                    ldir = FZN if ray[2] < F(0.0) else FZP
                    wdist = wdist - wdist[2]
                    wdist[2] = iavel[2]
                    cz += gz

                if ch == ">":
                    ray[1] = ray[1] + rd * ray[0]
                elif ch == "<":
                    ray[1] = ray[1] - rd * ray[0]
                elif ch == ",":
                    ray[1] = ray[1] + rd * ray[2]
                else:
                    ray[1] = ray[1] - rd * ray[2]

                wdist[1] = pos[1]
                if ray[1] >= F(0.0):
                    wdist[1] = F(1.0) - wdist[1]
                wdist[1] = wdist[1] * iavel[1]
                cell = w.get_cell(cx, cz)

            elif ord("A") <= cell <= ord("Z"):
                # portal traversal (trace.h:507-650)
                pm = w.pmap[cell - ord("A")]
                if pm.x2 == -1:
                    self.dist = cdist
                    if aux_dist != F(-1.0) and cdist > aux_dist:
                        return sphere_bounce()
                    return self._hit_wall(hitctr, pos, ray, ldir, icol,
                                          fog, _PAL["wall"])
                if pm.x1 == cx and pm.z1 == cz:
                    cx, cz = pm.x2, pm.z2
                    pos[0] = pos[0] + F(float(pm.x2 - pm.x1))
                    pos[2] = pos[2] + F(float(pm.z2 - pm.z1))
                    rot = (-pm.rot12) & 3
                elif pm.x2 == cx and pm.z2 == cz:
                    cx, cz = pm.x1, pm.z1
                    pos[0] = pos[0] - F(float(pm.x2 - pm.x1))
                    pos[2] = pos[2] - F(float(pm.z2 - pm.z1))
                    rot = pm.rot12 & 3
                else:
                    self.dist = cdist
                    if aux_dist != F(-1.0) and cdist > aux_dist:
                        return sphere_bounce()
                    return self._hit_wall(hitctr, pos, ray, ldir, icol,
                                          fog, _PAL["magenta"])

                trx, trz = pos[0], pos[2]
                tgx, tgz = gx, gz
                trvzx, trvzz = ray[0], ray[2]
                twdx, twdz = wdist[0], wdist[2]
                tiax, tiaz = iavel[0], iavel[2]

                ldir = (ldir - rot) & 3

                cxh = F(cx) + F(0.5)
                czh = F(cz) + F(0.5)
                if rot == 1:
                    pos[0] = cxh + (trz - czh)
                    pos[2] = czh - (trx - cxh)
                    ray[0] = trvzz
                    ray[2] = -trvzx
                    gx, gz = tgz, -tgx
                    wdist[0], wdist[2] = twdz, twdx
                    iavel[0], iavel[2] = tiaz, tiax
                elif rot == 2:
                    pos[0] = cxh * F(2.0) - pos[0]
                    pos[2] = czh * F(2.0) - pos[2]
                    ray[0] = -trvzx
                    ray[2] = -trvzz
                    gx, gz = -gx, -gz
                elif rot == 3:
                    pos[0] = cxh - (trz - czh)
                    pos[2] = czh + (trx - cxh)
                    ray[0] = -trvzz
                    ray[2] = trvzx
                    gx, gz = -tgz, tgx
                    wdist[0], wdist[2] = twdz, twdx
                    iavel[0], iavel[2] = tiaz, tiax

                if ldir == FZP:
                    cz += 1
                    pos[2] = pos[2] + F(1.0)
                elif ldir == FXN:
                    cx -= 1
                    pos[0] = pos[0] - F(1.0)
                elif ldir == FZN:
                    cz -= 1
                    pos[2] = pos[2] - F(1.0)
                else:  # default / FXP
                    cx += 1
                    pos[0] = pos[0] + F(1.0)
                cell = w.get_cell(cx, cz)

            else:
                # plain wall (trace.h:651-664)
                self.dist = cdist
                if aux_dist != F(-1.0) and cdist > aux_dist:
                    return sphere_bounce()
                return self._hit_wall(
                    hitctr, pos, ray, ldir, icol, fog,
                    _PAL["ceil"] if ldir == FYP else _PAL["wall"])

            if aux_dist != F(-1.0) and cdist > aux_dist:
                return sphere_bounce()

        # OOB after 1000 steps: the ray direction is the colour
        return ray
