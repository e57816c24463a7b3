"""Out-of-envelope spheres: widened hoist-gate slack instead of a crash.

The hoist gates' brq2 = br*br + slack needs slack >= the gate
expressions' f32 evaluation error; 0.04 is the constant derived for
game-scale scenes.  Round-4 advisor finding: build_world used to RAISE
for scenes outside that envelope, and build_world runs per frame - a
script-animated sphere drifting out of the envelope hard-crashed the
render loop mid-game, where the reference renders such scenes
(/root/reference/trace.h:252-296 has no envelope at all).  Now
worlddev._sphere_slack widens the slack quadratically (power-of-two
quantized, so animation does not respecialize jit every frame) and the
scene renders; widening is sound because the gates are conservative
supersets - these tests pin both halves.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pwnfps_tpu.core.approx import SseTables
from pwnfps_tpu.core.config import RenderConfig
from pwnfps_tpu.ops import worlddev as W
from pwnfps_tpu.ops.tracer_core import T_SPHERE, run_segment
from pwnfps_tpu.ops.tracer_jnp import make_env
from pwnfps_tpu.ops.vec import V3
from pwnfps_tpu.world.levelc import compile_level
from pwnfps_tpu.world.objects import ObjectPool

LEVEL = b"""................
................
................
................
.;;;;;;;;;;;;;;.
................
................
................
"""


def _sphere_set(y, r=0.5):
    pool = ObjectPool()
    i = pool.obj_new()
    pool.obj_set_sphere(i, r, 0.4, 7.5, y, 4.5, 0.8, 0.7, 0.9)
    return pool.prepare_render()


def test_slack_in_envelope_is_exactly_004():
    # game-scale scenes must keep the derived constant bit-for-bit
    # (the flagship's bits and jit keys depend on it)
    assert W._sphere_slack(_sphere_set(0.5)) == 0.04
    assert W._sphere_slack(_sphere_set(3.0, r=2.0)) == 0.04


def test_slack_widens_quantized_outside_envelope():
    s10 = W._sphere_slack(_sphere_set(10.0))
    assert s10 > 0.04
    # power-of-two multiples of 0.04 only, and STABLE under small
    # animation deltas (no per-frame jit respecialization)
    assert s10 / 0.04 == 2 ** round(np.log2(s10 / 0.04))
    assert W._sphere_slack(_sphere_set(10.4)) == s10
    # far scenes scale quadratically: y=1000 needs ~(1004/95)^2 ~ 112x
    s1000 = W._sphere_slack(_sphere_set(1000.0))
    assert s1000 >= 0.04 * 128


def test_out_of_envelope_sphere_renders():
    """An r=3 sphere (outside the derivation envelope's r <= 2) must
    build without raising and still be HIT by the hoisted fast path."""
    lv = compile_level(LEVEL)
    sph = _sphere_set(0.5, r=3.0)
    world, meta = W.build_world(lv, sph, SseTables.load())
    assert meta.sph_slack > 0.04
    world = jax.tree.map(jnp.asarray, world)

    n = 8
    rng = np.random.default_rng(1)
    froms = np.tile(np.array([1.3, 0.5, 4.5], np.float32), (n, 1))
    froms[:, 1] += rng.uniform(-0.05, 0.05, n).astype(np.float32)
    # aim straight at the sphere centre from each jittered origin
    ctr = np.array([7.5, 0.5, 4.5], np.float32)
    dirs = ctr[None, :] - froms
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    fv = V3(*(jnp.asarray(froms[:, k]) for k in range(3)))
    rv = V3(*(jnp.asarray(dirs[:, k]) for k in range(3)))

    cfg = RenderConfig(parity=False, space_skip=True, maxsteps=200,
                       step_chunk=2)
    env = make_env(world, meta, cfg)
    out = run_segment(env, cfg, fv, rv, jnp.ones_like(fv.x) > 0)
    tk = np.asarray(out.tkind)
    td = np.asarray(out.tdist)
    assert (tk == T_SPHERE).all(), (tk, td)
    # reference sphere-distance quirk (trace.h:252-296): for a dead-on
    # ray, aux = t_entry + |centre - pos_entry| - sqrt(1 - d2/r2)
    #         = |centre - origin| - 1   (d2 = 0, unit subtrahend)
    exp = np.linalg.norm(ctr[None, :] - froms, axis=1) - 1.0
    assert (np.abs(td - exp) < 0.5).all(), (td, exp)
