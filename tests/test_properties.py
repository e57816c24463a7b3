"""Property tests (SURVEY §4.3): invariants that must hold for any
level/ray, independent of the golden-parity suite.

  * DDA termination: every ray terminates within maxsteps and reports a
    finite non-negative distance (trace.h:247-250's bound).
  * Rotation conservation: portal quarter-turns permute/negate ray
    components, so |ray|^2 (summed in dot_sse order) is bit-preserved
    across any number of traversals (trace.h:560-650).
  * Portal round-trip: a player walking A->B and straight back B->A
    returns to the start frame (main.c:293-378).
  * Fog monotonicity: deeper wall hits behind fog blend monotonically
    toward white (exp(-0.6*fog) lerp, trace.h:95-101).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pwnfps_tpu.core.approx import SseTables
from pwnfps_tpu.core.config import RenderConfig
from pwnfps_tpu.host.physics import Keys, PlayerState, step_player
from pwnfps_tpu.ops import worlddev as W
from pwnfps_tpu.ops.tracer_jnp import make_env, trace_wave
from pwnfps_tpu.ops.tracer_core import run_segment, T_NONE
from pwnfps_tpu.ops.vec import V3
from pwnfps_tpu.world.levelc import compile_level, load_level
from pwnfps_tpu.world.objects import ObjectPool
from pwnfps_tpu.world.procgen import make_portal_chain

from .test_tracer_scalar import REF_LEVEL

# straight fog corridor with walls at increasing depth via side pockets
FOG_LEVEL = b"""............
.;$$$$$$$$;.
.;$$$$$$$$;.
............
"""


def _world(lv):
    world, meta = W.build_world(lv, ObjectPool().prepare_render(),
                                SseTables.load())
    return jax.tree.map(jnp.asarray, world), meta


def _rand_rays(lv, n, seed):
    rng = np.random.default_rng(seed)
    free = np.argwhere(np.isin(lv.grid, [ord(";"), ord("$"), ord('"')]))
    frm = np.zeros((n, 3), np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    for k in range(n):
        cz, cx = free[rng.integers(0, len(free))]
        frm[k] = (cx + rng.uniform(0.2, 0.8), rng.uniform(0.2, 0.8),
                  cz + rng.uniform(0.2, 0.8))
    fv = V3(*(jnp.asarray(frm[:, i]) for i in range(3)))
    rv = V3(*(jnp.asarray(d[:, i]) for i in range(3)))
    return fv, rv


@pytest.mark.parametrize("level,seed", [
    ("ref", 5), ("chain", 6),
])
def test_dda_terminates_with_finite_distance(level, seed):
    lv = load_level(REF_LEVEL) if level == "ref" else make_portal_chain(6)
    world, meta = _world(lv)
    cfg = RenderConfig(maxsteps=1000, profile=True)
    env = make_env(world, meta, cfg)
    fv, rv = _rand_rays(lv, 128, seed)
    active = jnp.ones(128, bool)
    out = run_segment(env, cfg, fv, rv, active)
    tstep = np.asarray(out.tstep)
    tdist = np.asarray(out.tdist)
    tkind = np.asarray(out.tkind)
    assert (tstep >= 1).all() and (tstep <= cfg.maxsteps).all()
    assert (tkind != T_NONE).all(), "every ray must resolve to a terminal"
    assert np.isfinite(tdist).all()
    # sphere-quirk aside (none here), distances are non-negative
    assert (tdist >= 0).all()


def test_portal_rotation_conserves_ray_norm():
    """|tray|^2 must be bit-equal to |iray|^2 after any quarter-turn
    sequence: rotations only permute x/z and flip signs, and dot_sse
    sums (x+z)+y whose x+z term commutes."""
    lv = make_portal_chain(8)     # rays cross many rotated portal pairs
    world, meta = _world(lv)
    cfg = RenderConfig(maxsteps=1000)
    env = make_env(world, meta, cfg)
    n = 128
    rng = np.random.default_rng(11)
    # aim along the chain so most rays traverse portals
    frm = np.zeros((n, 3), np.float32)
    d = np.zeros((n, 3), np.float32)
    sx, sz = lv.spawn
    for k in range(n):
        frm[k] = (sx + rng.uniform(0.2, 0.8), rng.uniform(0.3, 0.7),
                  sz + rng.uniform(0.2, 0.8))
        v = np.array([1.0, rng.uniform(-0.05, 0.05),
                      rng.uniform(-0.3, 0.3)], np.float32)
        d[k] = v / np.linalg.norm(v)
    fv = V3(*(jnp.asarray(frm[:, i]) for i in range(3)))
    rv = V3(*(jnp.asarray(d[:, i]) for i in range(3)))
    # run_segment normalizes the ray once at init; compare |tray| to the
    # normalized input ray's own norm
    out = run_segment(env, cfg, fv, rv, jnp.ones(n, bool))

    def norm2(v3):
        x, y, z = (np.asarray(v3.x, np.float32), np.asarray(v3.y,
                   np.float32), np.asarray(v3.z, np.float32))
        return (x * x + z * z) + y * y

    # after any number of quarter-turns the direction stays unit-length
    # (the tracer normalized it once at segment init; rotations must not
    # distort it) and each |component| matches an input |component|
    # exactly -- quarter-turns only permute x/z and flip signs
    assert np.allclose(norm2(out.tray), 1.0, atol=5e-3)
    ix = np.abs(np.asarray(out.tray.x, np.float32))
    iz = np.abs(np.asarray(out.tray.z, np.float32))
    sets_in = np.sort(np.stack([ix, iz]), axis=0)
    # recompute what init normalization produced: trace a portal-free
    # straight corridor with the same rays and compare component sets
    lv2 = make_portal_chain(1)
    world2, meta2 = _world(lv2)
    env2 = make_env(world2, meta2, cfg)
    out2 = run_segment(env2, cfg, fv, rv, jnp.ones(n, bool))
    jx = np.abs(np.asarray(out2.tray.x, np.float32))
    jz = np.abs(np.asarray(out2.tray.z, np.float32))
    sets_ref = np.sort(np.stack([jx, jz]), axis=0)
    assert (sets_in.view(np.uint32) == sets_ref.view(np.uint32)).all(), \
        "portal rotation changed |x|/|z| component magnitudes"
    assert (np.asarray(out.tray.y).view(np.uint32)
            == np.asarray(out2.tray.y).view(np.uint32)).all()


def test_player_portal_round_trip():
    """Walk through a portal and straight back: the player returns to
    the start cell with the original heading (main.c:293-378)."""
    from pwnfps_tpu.render.camera import mat4_roty
    lv = load_level(REF_LEVEL)
    # pick a complete portal pair and walk into endpoint 1 from its free
    # neighbour (same facing scan as the reference, util.h:140-149)
    port = next(p for p in lv.pmap
                if p.open and abs(p.x1 - p.x2) + abs(p.z1 - p.z2) > 2)
    from pwnfps_tpu.world.levelc import _find_free_dir_2d
    from pwnfps_tpu.core.config import FXP, FZP, FXN, FZN
    d1 = _find_free_dir_2d(lv.grid, port.x1, port.z1)
    off = {FXP: (1, 0), FZP: (0, 1), FXN: (-1, 0), FZN: (0, -1)}[d1]
    pl = PlayerState.at_spawn(lv)
    pl.cam[3, :3] = (port.x1 + 0.5 + off[0], 0.5, port.z1 + 0.5 + off[1])
    # roty(a) turns identity-forward (0,0,1) into (sin a, 0, cos a);
    # face the portal cell, i.e. forward = -off
    mat4_roty(pl.cam, float(np.arctan2(-off[0], -off[1])))
    # sanity: forward (row 2) points from the free cell into the portal
    fwd = pl.cam[2, :3]
    assert np.allclose([fwd[0], fwd[2]], [-off[0], -off[1]], atol=1e-5), \
        (fwd, off)
    start = pl.cam.copy()
    keys_fwd = Keys(forward=True)
    traversed = False
    for _ in range(180):
        step_player(lv, pl, 1 / 60, keys_fwd)
        if abs(pl.cam[3, 0] - start[3, 0]) > 3 or \
           abs(pl.cam[3, 2] - start[3, 2]) > 3:
            traversed = True
            break
    assert traversed, f"never traversed: at {pl.cam[3, :3]}"
    keys_back = Keys(back=True)
    returned = False
    for _ in range(240):
        step_player(lv, pl, 1 / 60, keys_back)
        if (abs(pl.cam[3, 0] - start[3, 0]) < 0.6
                and abs(pl.cam[3, 2] - start[3, 2]) < 0.6):
            returned = True
            break
    assert returned, f"player did not return: {pl.cam[3, :3]}"
    # heading preserved (basis columns back to the start frame)
    assert np.allclose(pl.cam[:3, :3], start[:3, :3], atol=1e-4)


def test_fog_blends_monotonically_toward_white():
    lv = compile_level(FOG_LEVEL)
    world, meta = _world(lv)
    # fog is applied in the unwind blend (trace.h:95-101 runs inside
    # trace_hit_bounce), so keep the default reflect depth
    cfg = RenderConfig(maxsteps=1000)
    # rays along +x through ever more fog before the east wall
    depths = np.linspace(2.0, 9.0, 12).astype(np.float32)
    n = len(depths)
    frm = np.stack([11.0 - depths, np.full(n, 0.5, np.float32),
                    np.full(n, 1.5, np.float32)], axis=1)
    fv = V3(*(jnp.asarray(frm[:, i]) for i in range(3)))
    rv = V3(jnp.ones(n, jnp.float32), jnp.zeros(n, jnp.float32),
            jnp.zeros(n, jnp.float32))
    col, dist = trace_wave(world, meta, cfg, fv, rv,
                           jnp.arange(n, dtype=jnp.uint32), np.float32(0))
    # brightness (min channel) approaches white as fog length grows
    b = np.minimum(np.asarray(col.b), np.minimum(np.asarray(col.g),
                                                 np.asarray(col.r)))
    assert (np.diff(b) >= -1e-6).all(), b
    assert b[-1] > b[0] + 0.05, (b[0], b[-1])
