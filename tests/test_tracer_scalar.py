"""Differential test: scalar Python tracer vs the compiled reference.

Bit-exactness is required: colour vec4 and primary distance must match
the C oracle's trace_ray output bit-for-bit for every ray.
"""

import os

import numpy as np
import pytest

from pwnfps_tpu.core.approx import SseTables
from pwnfps_tpu.ops.tracer_ref import ScalarTracer, ScalarWorld
from pwnfps_tpu.utils import oracle
from pwnfps_tpu.world.levelc import load_level
from pwnfps_tpu.world.objects import ObjectPool

pytestmark = pytest.mark.skipif(not oracle.available(),
                                reason="reference checkout unavailable")

REF_LEVEL = "/root/reference/level.txt"
DEMO_LEVEL = os.path.join(
    os.path.dirname(__file__), "..", "assets", "levels", "demo.txt")

# the game.lua ball-creature sphere table (game.lua:1-20)
OPOS = [(0.0, 0.0, 0.0, 0.3, 0.8, 0.8, 0.8, 0.6),
        (0.0, 0.3, 0.0, 0.1, 0.4, 0.4, 0.4, 0.2),
        (0.3, 0.0, 0.0, 0.1, 0.7, 0.7, 1.0, 0.4),
        (0.0, 0.0, 0.3, 0.1, 0.7, 1.0, 0.7, 0.4),
        (-0.3, 0.0, 0.0, 0.1, 1.0, 0.7, 0.7, 0.4),
        (0.0, 0.0, -0.3, 0.1, 0.5, 1.0, 1.0, 0.4)]


def make_spheres(cx=9.5, cy=0.3, cz=5.5):
    pool = ObjectPool()
    for (x, y, z, r, b, g, rr, refl) in OPOS:
        i = pool.obj_new()
        pool.obj_set_sphere(i, r, refl, cx + x, cy + y, cz + z, b, g, rr)
    sph = pool.prepare_render()
    n = len(OPOS)
    sph8 = np.stack([sph.r[:n], sph.refl[:n], sph.pos[:n, 0],
                     sph.pos[:n, 1], sph.pos[:n, 2], sph.col[:n, 0],
                     sph.col[:n, 1], sph.col[:n, 2]], axis=1)
    return sph, sph8


def run_batch(level_path, bases, n, seed0, sphere_at=(9.5, 0.3, 5.5)):
    lv = load_level(level_path)
    sph, sph8 = make_spheres(*sphere_at)
    world = ScalarWorld(lv, sph, SseTables.load())
    rng = np.random.default_rng(seed0)
    rays = []
    for k in range(n):
        base = bases[k % len(bases)]
        frm = np.array([base[0] + rng.uniform(-0.45, 0.45),
                        base[1] + rng.uniform(-0.1, 0.45),
                        base[2] + rng.uniform(-0.45, 0.45), 1.0], np.float32)
        d = rng.normal(size=3)
        d /= np.linalg.norm(d)
        dirv = np.array([d[0], d[1] * 0.6, d[2], 0.0], np.float32)
        rays.append({"from": frm, "dir": dirv,
                     "seed": int(rng.integers(0, 2**32)),
                     "sec": float(np.float32(rng.uniform(0, 20))),
                     "spheres": sph8})
    cols, dists = oracle.trace_rays(level_path, rays)
    bad = []
    for k, r in enumerate(rays):
        tr = ScalarTracer(world, sec_current=np.float32(r["sec"]))
        col, dist, _ = tr.trace(r["from"], r["dir"], r["seed"])
        ok = (np.array_equal(col.view(np.uint32),
                             cols[k].view(np.uint32))
              and np.float32(dist).view(np.uint32)
              == np.float32(dists[k]).view(np.uint32))
        if not ok:
            bad.append((k, r, col, cols[k]))
    assert not bad, f"{len(bad)}/{n} rays mismatch; first: {bad[0]}"


def test_reference_level_spawn_and_creature():
    # spawn room, creature room, fog-adjacent, portal-dense corridor
    bases = [(9.5, 0.5, 4.5), (9.5, 0.5, 5.5), (6.0, 0.5, 7.5),
             (14.0, 0.5, 13.5)]
    run_batch(REF_LEVEL, bases, 96, seed0=7)


def test_reference_level_features():
    # ramp '>' at (12,3); 2-high rooms w/ '"' near (2,7); fog maze
    # bottom-right; aliased portal area near (4,4); T/P/Q/S portal strip
    bases = [(11.5, 0.5, 3.5), (2.5, 0.5, 7.5), (21.5, 0.5, 20.5),
             (6.5, 0.5, 4.5), (4.5, 0.5, 20.5), (13.5, 0.5, 22.5),
             (17.5, 1.5, 8.5)]
    run_batch(REF_LEVEL, bases, 112, seed0=13)


def test_demo_level():
    bases = [(3.5, 0.5, 3.5), (13.5, 0.5, 3.5), (18.5, 0.5, 5.5),
             (2.5, 0.5, 9.5), (7.5, 0.5, 12.5), (13.5, 0.5, 13.5)]
    run_batch(DEMO_LEVEL, bases, 96, seed0=23, sphere_at=(3.5, 0.3, 5.5))


def test_degenerate_rays():
    # axis-aligned rays (epsilon clamping paths), straight up/down,
    # rays starting inside walls and inside portal cells
    lv = load_level(REF_LEVEL)
    sph, sph8 = make_spheres()
    world = ScalarWorld(lv, sph, SseTables.load())
    cases = [
        ((9.5, 0.5, 4.5, 1.0), (1.0, 0.0, 0.0, 0.0)),
        ((9.5, 0.5, 4.5, 1.0), (0.0, 1.0, 0.0, 0.0)),
        ((9.5, 0.5, 4.5, 1.0), (0.0, -1.0, 0.0, 0.0)),
        ((9.5, 0.5, 4.5, 1.0), (0.0, 0.0, -1.0, 0.0)),
        ((9.5, 0.9, 4.5, 1.0), (-1.0, 0.0, 0.0, 0.0)),
        ((0.5, 0.5, 0.5, 1.0), (0.7, 0.1, 0.7, 0.0)),   # inside wall cell
        ((7.5, 0.5, 8.5, 1.0), (0.3, -0.2, 0.9, 0.0)),  # portal cell 'A'
        ((9.5, 0.5, 5.5, 1.0), (0.05, -0.9, 0.02, 0.0)),  # into creature
    ]
    rays = [{"from": np.array(f, np.float32), "dir": np.array(d, np.float32),
             "seed": 1234 + i, "sec": 3.25, "spheres": sph8}
            for i, (f, d) in enumerate(cases)]
    cols, dists = oracle.trace_rays(REF_LEVEL, rays)
    for k, r in enumerate(rays):
        tr = ScalarTracer(world, sec_current=np.float32(3.25))
        col, dist, _ = tr.trace(r["from"], r["dir"], r["seed"])
        assert np.array_equal(col.view(np.uint32), cols[k].view(np.uint32)), k
        assert (np.float32(dist).view(np.uint32)
                == np.float32(dists[k]).view(np.uint32)), k
