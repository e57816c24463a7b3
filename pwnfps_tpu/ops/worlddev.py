"""Device-resident world representation.

The tracer's inner loop needs, per DDA step and per ray, everything about
the current cell.  Instead of the reference's char switch
(/root/reference/trace.h:300), we pre-pack all per-cell channels into ONE
int32 word so a step costs a single gather:

  bits  0..3   cls    cell class (see below)
  bits  4..5   pkind  0 plain / 1 portal endpoint / 2 incomplete / 3 wrong
  bits  6..7   prot   portal quarter-turns to apply
  bits  8..11  xcls   behind-cell class for the 2-high wall check
  bits 12..18  pdcx   portal cell delta x, biased +64
  bits 19..25  pdcz   portal cell delta z, biased +64
  bits 26..29  nsph   per-cell sphere-bucket count (rebuilt per frame)

Classes here refine world.cells with per-ramp-direction ids (the tilt
coefficient is derived from the class in-kernel):
  0 wall, 1 ';', 2 '$', 3 '"', 4 '#', 5 '&',
  6 '>', 7 '<', 8 ',', 9 '^', 10 portal
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import numpy as np

from ..core.approx import SseTables
from ..world.levelc import LevelData
from ..world.objects import SphereSet

# refined class ids
WALL, FLOOR, FOG, LOWER, TALL, TALLFOG = 0, 1, 2, 3, 4, 5
RAMP_GT, RAMP_LT, RAMP_CM, RAMP_CR, PORTAL = 6, 7, 8, 9, 10

_RAMP_IDS = {ord(">"): RAMP_GT, ord("<"): RAMP_LT,
             ord(","): RAMP_CM, ord("^"): RAMP_CR}
_BASE_IDS = {ord(";"): FLOOR, ord("$"): FOG, ord('"'): LOWER,
             ord("#"): TALL, ord("&"): TALLFOG}


def refined_class(c: int) -> int:
    if ord("A") <= c <= ord("Z"):
        return PORTAL
    if c in _RAMP_IDS:
        return _RAMP_IDS[c]
    return _BASE_IDS.get(c, WALL)


class WorldDev(NamedTuple):
    """Pytree of device arrays describing the world for one frame."""

    word: np.ndarray        # [4096] int32 packed channels (incl. counts)
    buckets: np.ndarray     # [4096 * K] int32 sphere indices (-1 pad)
    sph_pos: np.ndarray     # [NS, 3] f32
    sph_r: np.ndarray       # [NS] f32
    sph_refl: np.ndarray    # [NS] f32
    sph_col: np.ndarray     # [NS, 3] f32 (b, g, r)
    rsqrt_tab: np.ndarray   # [8192] uint32
    rcp_tab: np.ndarray     # [4096] uint32


@dataclasses.dataclass(frozen=True)
class WorldMeta:
    """Static (hashable) companion of WorldDev for jit specialization."""

    k_bucket: int          # bucket slots the tracer must scan (0 = none)
    n_spheres: int
    # rows of the 64x64 grid that hold level content or spheres, rounded
    # up to a multiple of 8.  The pallas backend sizes its cell-table
    # gather chunks by this: rows beyond it are uniform pad whose packed
    # compact byte is 0 == the chunked-gather miss value, so trimming is
    # bit-exact (tracer_pallas.build_tables).
    lh: int = 64


def _cls_to_refined(level: LevelData) -> np.ndarray:
    g = level.grid
    out = np.zeros((64, 64), np.int32)
    for z in range(64):
        for x in range(64):
            out[z, x] = refined_class(int(g[z, x]))
    return out


def pack_static_word(level: LevelData) -> np.ndarray:
    """The frame-invariant part of the channel word, [4096] int32."""
    ch = level.channels()
    cls = _cls_to_refined(level)
    # xcls only needs to distinguish tall-like vs lower vs other
    xcls = np.zeros((64, 64), np.int32)
    grid = level.grid
    for z in range(64):
        for x in range(64):
            c = int(grid[z, x])
            xc = c
            if ord("A") <= c <= ord("Z"):
                pm = level.pmap[c - ord("A")]
                if pm.x1 == x and pm.z1 == z:
                    xc = pm.c2
                elif pm.x2 == x and pm.z2 == z:
                    xc = pm.c1
            xcls[z, x] = refined_class(int(xc))
    word = (cls
            | (ch["pkind"] << 4)
            | (ch["prot"] << 6)
            | (xcls << 8)
            | ((ch["pdcx"] + 64) << 12)
            | ((ch["pdcz"] + 64) << 19)).astype(np.int32)
    return word.reshape(-1)


def build_world(level: LevelData, spheres: SphereSet, tables: SseTables,
                static_word: np.ndarray | None = None
                ) -> tuple[WorldDev, WorldMeta]:
    if static_word is None:
        static_word = pack_static_word(level)
    counts = spheres.counts.reshape(-1).astype(np.int32)
    k_needed = int(counts.max()) if counts.size else 0
    word = (static_word | (counts << 26)).astype(np.int32)
    n = int(np.count_nonzero(spheres.r))
    # number of live spheres: rely on r>0 for set entries; fall back to
    # max bucket index + 1 so zero-radius spheres still count
    if spheres.buckets.size:
        n = max(n, int(spheres.buckets.max()) + 1)
    dev = WorldDev(
        word=word,
        buckets=spheres.buckets.reshape(-1).astype(np.int32),
        sph_pos=spheres.pos.astype(np.float32),
        sph_r=spheres.r.astype(np.float32),
        sph_refl=spheres.refl.astype(np.float32),
        sph_col=spheres.col.astype(np.float32),
        rsqrt_tab=tables.rsqrt,
        rcp_tab=tables.rcp,
    )
    # content rows = anything that isn't the '.' pad fill ('.' packs to
    # class WALL with no portal/xcls channels, byte 0 in the compact
    # table, which is exactly the chunked-gather miss value)
    grid_rows = np.nonzero((level.grid != ord(".")).any(axis=1))[0]
    cnt_rows = np.nonzero(counts.reshape(64, 64).any(axis=1))[0]
    last = max(int(grid_rows.max()) if grid_rows.size else 0,
               int(cnt_rows.max()) if cnt_rows.size else 0)
    lh = min(64, -(-(last + 1) // 8) * 8)
    return dev, WorldMeta(k_bucket=k_needed, n_spheres=max(n, 0), lh=lh)


# word decode helpers (work on numpy or jnp int32 arrays)
def w_cls(w):
    return w & 0xF


def w_pkind(w):
    return (w >> 4) & 0x3


def w_prot(w):
    return (w >> 6) & 0x3


def w_xcls(w):
    return (w >> 8) & 0xF


def w_pdcx(w):
    return ((w >> 12) & 0x7F) - 64


def w_pdcz(w):
    return ((w >> 19) & 0x7F) - 64


def w_nsph(w):
    return (w >> 26) & 0xF
