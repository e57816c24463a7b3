"""Empty-space-skip + sphere-hoist soundness (fast mode).

Round-2 VERDICT confirmed a bug here: the skip could hop a post-portal
("dirty") lane clean over a sphere's bucket cells, because dirty lanes
relied on the cell-driven bucket scan that only fires when a lane STANDS
in a bucketed cell - spheres seen through portals vanished
(/root/reference/trace.h:252-296 tests buckets at every visited cell).
The fix re-derives hoisted line candidates at every line-change event
(tracer_core.make_sphere_all merge=True + segment_body's refresh cond),
so no per-cell sphere semantics exist on the fast path and the skip is
sound for every lane.  These tests pin that.

Bit-exact skip==noskip is impossible by construction: skipping takes k
crossings in closed form (wx + k*iavel, one multiply) where stepping
accumulates them sequentially into cdist - different f32 rounding
sequences.  The contract tested instead: identical terminal KIND for
every ray (no hit/miss flip), tight numeric agreement, and - against the
reference's own cell-driven scan under identical math - exact terminal
kinds plus near-exact distances.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pwnfps_tpu.core.approx import SseTables
from pwnfps_tpu.core.config import RenderConfig
from pwnfps_tpu.ops import worlddev as W
from pwnfps_tpu.ops.tracer_core import T_SPHERE, run_segment
from pwnfps_tpu.ops.tracer_jnp import _sphere_pass, make_env, trace_wave
from pwnfps_tpu.ops.vec import V3
from pwnfps_tpu.world.levelc import compile_level
from pwnfps_tpu.world.objects import ObjectPool

# A portal ('B', rot12=2) feeding a 13-cell corridor with an r=0.2
# sphere at its middle: the round-2 VERDICT repro.  The corridor's
# same-class runs give the skip kx up to 6, more than enough to hop the
# sphere's single bucket cell at x=7.
LEVEL = b"""................
.;B.............
................
.;;;;;;;;;;;;;B.
................
"""


@pytest.fixture(scope="module")
def setup():
    lv = compile_level(LEVEL)
    pool = ObjectPool()
    i = pool.obj_new()
    pool.obj_set_sphere(i, 0.2, 0.4, 7.5, 0.5, 3.5, 0.8, 0.7, 0.9)
    sph = pool.prepare_render()
    world, meta = W.build_world(lv, sph, SseTables.load())
    assert meta.has_clear, "corridor must provide nonzero runs"
    return jax.tree.map(jnp.asarray, world), meta


def _corridor_rays(n=8):
    rng = np.random.default_rng(0)
    froms = np.tile(np.array([1.3, 0.5, 1.5], np.float32), (n, 1))
    froms[:, 1] += rng.uniform(-0.05, 0.05, n).astype(np.float32)
    froms[:, 2] += rng.uniform(-0.15, 0.15, n).astype(np.float32)
    dirs = np.tile(np.array([1.0, 1e-3, 1e-4], np.float32), (n, 1))
    dirs[:, 1] += rng.uniform(-1e-3, 1e-3, n).astype(np.float32)
    fv = V3(*(jnp.asarray(froms[:, k]) for k in range(3)))
    rv = V3(*(jnp.asarray(dirs[:, k]) for k in range(3)))
    return fv, rv


def _seg(world, meta, cfg, fv, rv):
    env = make_env(world, meta, cfg)
    act = jnp.ones_like(fv.x) > 0
    return run_segment(env, cfg, fv, rv, act)


def test_portal_corridor_sphere_skip(setup):
    """Post-portal lanes must still see the sphere with the skip on."""
    world, meta = setup
    fv, rv = _corridor_rays()
    outs = {}
    for skip in (True, False):
        cfg = RenderConfig(parity=False, space_skip=skip, maxsteps=100,
                           step_chunk=2)
        outs[skip] = _seg(world, meta, cfg, fv, rv)
    tk_s = np.asarray(outs[True].tkind)
    tk_n = np.asarray(outs[False].tkind)
    d_s = np.asarray(outs[True].tdist)
    d_n = np.asarray(outs[False].tdist)
    # the central lanes' lines pass within r of the sphere: they MUST
    # terminate on it (the round-2 bug returned the far wall at ~13.5)
    assert (tk_s == T_SPHERE).sum() >= 5, (tk_s, d_s)
    assert np.array_equal(tk_s, tk_n), (tk_s, tk_n)
    np.testing.assert_allclose(d_s, d_n, rtol=1e-5, atol=1e-5)
    assert (d_s[tk_s == T_SPHERE] < 8.0).all(), d_s


def test_portal_corridor_backends_identical(setup):
    """jnp and pallas fast paths stay bit-identical through the
    portal+skip+refresh path (the cross-backend invariant)."""
    from jax.experimental.pallas import tpu as pltpu

    from pwnfps_tpu.ops.tracer_pallas import trace_wave_pallas

    world, meta = setup
    fv, rv = _corridor_rays()
    seeds = jnp.asarray(np.arange(8, dtype=np.uint32) + 7)
    cfg = RenderConfig(parity=False, space_skip=True, maxsteps=64,
                       step_chunk=2)
    col_j, dist_j = trace_wave(world, meta, cfg, fv, rv, seeds,
                               np.float32(0.3))
    on_tpu = jax.devices()[0].platform != "cpu"
    if on_tpu:
        col_p, dist_p = trace_wave_pallas(world, meta, cfg, fv, rv,
                                          seeds, np.float32(0.3))
    else:
        with pltpu.force_tpu_interpret_mode():
            col_p, dist_p = trace_wave_pallas(world, meta, cfg, fv, rv,
                                              seeds, np.float32(0.3))
    from .fputil import fma_contracts
    cj = np.stack([np.asarray(c) for c in col_j], 1)
    cp = np.stack([np.asarray(c) for c in col_p], 1)
    if not fma_contracts():
        assert np.array_equal(cj.view(np.uint32), cp.view(np.uint32))
        assert np.array_equal(np.asarray(dist_j).view(np.uint32),
                              np.asarray(dist_p).view(np.uint32))
    else:
        np.testing.assert_allclose(cj, cp, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(dist_j),
                                   np.asarray(dist_p), rtol=1e-5,
                                   atol=1e-5)


# Synthetic fuzz level: portals (incl. rot12 != 0), ramps, fog, a 2-high
# room with '"' links (y-shift events), spheres scattered through the
# corridors including right behind portals.
FUZZ_LEVEL = b"""................
.;;;;;;;;;;;;;;.
.;A;;;;;;;;;;A;.
.;;;$$$;;;;;;;;.
.;;;$$$;;B;;;;;.
.;;;$$$;;;;;;;;.
.;;;;;>;;;##\x22#.
.;;B;;;;;;##&#.
.;;;;;,;;;####.
.;;;;;;;;;;;;;.
................
"""

FUZZ_SPHERES = [
    (2.5, 0.4, 2.6, 0.25),     # behind portal 'A' endpoint 1
    (12.2, 0.5, 2.4, 0.2),     # near 'A' endpoint 2
    (6.5, 0.45, 7.5, 0.3),     # open corridor (runs > 0)
    (11.5, 1.4, 7.2, 0.2),     # inside the 2-high room (y-shift zone)
    (5.5, 0.5, 4.5, 0.35),     # fog pocket
    (9.6, 0.4, 4.4, 0.15),     # adjacent to portal 'B'
]


@pytest.fixture(scope="module")
def fuzz_setup():
    lv = compile_level(FUZZ_LEVEL)
    pool = ObjectPool()
    for (x, y, z, r) in FUZZ_SPHERES:
        i = pool.obj_new()
        pool.obj_set_sphere(i, r, 0.4, x, y, z, 0.8, 0.7, 0.9)
    sph = pool.prepare_render()
    world, meta = W.build_world(lv, sph, SseTables.load())
    assert meta.has_clear
    return jax.tree.map(jnp.asarray, world), meta


def _fuzz_rays(n=256, seed0=5):
    rng = np.random.default_rng(seed0)
    bases = [(2.5, 0.5, 2.5), (5.0, 0.5, 4.5), (6.5, 0.5, 6.5),
             (11.5, 0.5, 7.5), (12.5, 0.5, 2.5), (11.5, 1.5, 7.0),
             (1.5, 0.5, 8.5), (8.5, 0.5, 1.5)]
    froms = np.zeros((n, 3), np.float32)
    dirs = np.zeros((n, 3), np.float32)
    for k in range(n):
        b = bases[k % len(bases)]
        froms[k] = [b[0] + rng.uniform(-0.4, 0.4),
                    b[1] + rng.uniform(-0.1, 0.4),
                    b[2] + rng.uniform(-0.4, 0.4)]
        d = rng.normal(size=3)
        d /= np.linalg.norm(d)
        dirs[k] = [d[0], d[1] * 0.6, d[2]]
    fv = V3(*(jnp.asarray(froms[:, i]) for i in range(3)))
    rv = V3(*(jnp.asarray(dirs[:, i]) for i in range(3)))
    return fv, rv


def test_fuzz_skip_vs_noskip(fuzz_setup):
    """Terminal kinds identical, distances tight, over 256 random rays
    through portals/ramps/y-shifts with spheres in the way."""
    world, meta = fuzz_setup
    fv, rv = _fuzz_rays()
    outs = {}
    for skip in (True, False):
        cfg = RenderConfig(parity=False, space_skip=skip, maxsteps=200,
                           step_chunk=2)
        outs[skip] = _seg(world, meta, cfg, fv, rv)
    tk_s = np.asarray(outs[True].tkind)
    tk_n = np.asarray(outs[False].tkind)
    assert np.array_equal(tk_s, tk_n), \
        np.nonzero(tk_s != tk_n)
    np.testing.assert_allclose(np.asarray(outs[True].tdist),
                               np.asarray(outs[False].tdist),
                               rtol=2e-5, atol=2e-5)
    # the corpus must actually exercise sphere hits
    assert (tk_s == T_SPHERE).sum() >= 20, (tk_s == T_SPHERE).sum()


def test_fuzz_hoist_vs_cell_driven(fuzz_setup):
    """The hoist+refresh machinery vs the reference's own cell-driven
    bucket scan under IDENTICAL (fast) math: terminal kinds must agree
    exactly; distances to ~1 ULP-scale tolerance (the hoisted candidate
    evaluates the same formula at the closed-form AABB entry point
    instead of the sequentially-stepped cell entry position)."""
    world, meta = fuzz_setup
    fv, rv = _fuzz_rays(n=256, seed0=11)
    cfg = RenderConfig(parity=False, space_skip=False, maxsteps=200,
                       step_chunk=2)
    env_fast = make_env(world, meta, cfg)
    # reference semantics, fast math: cell-driven scan, no hoisting
    env_cell = env_fast._replace(
        sphere_all=None,
        sphere_pass=_sphere_pass(world, meta, env_fast.math))
    act = jnp.ones_like(fv.x) > 0
    out_h = run_segment(env_fast, cfg, fv, rv, act)
    out_c = run_segment(env_cell, cfg, fv, rv, act)
    tk_h = np.asarray(out_h.tkind)
    tk_c = np.asarray(out_c.tkind)
    assert np.array_equal(tk_h, tk_c), np.nonzero(tk_h != tk_c)
    np.testing.assert_allclose(np.asarray(out_h.tdist),
                               np.asarray(out_c.tdist),
                               rtol=1e-5, atol=1e-5)
    assert (tk_h == T_SPHERE).sum() >= 20
