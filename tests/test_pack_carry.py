"""Packed while-carry (cfg.pack_carry) bit-identity.

run_segment folds the small-integer SegState planes (gx/gy/gz sign
bits, ldir, active, sph_dirty, aux_idx, tmeta, page) into one i32 word
and cx/cz into a 2x16-bit word at chunk boundaries, carrying 9-11
fewer (64,128) planes per Mosaic while iteration.  The packing is
lossless by range (see RenderConfig.pack_carry), so every traced
output must be BIT-identical with it on or off - in fast mode, parity
mode, paged worlds and under profile=True (tstep leaves the carry
entirely when profiling is off).  Reference semantics unchanged:
/root/reference/trace.h:247-675 one-step loop state.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pwnfps_tpu.core.approx import SseTables
from pwnfps_tpu.core.config import RenderConfig
from pwnfps_tpu.ops import worlddev as W
from pwnfps_tpu.ops.tracer_core import run_segment
from pwnfps_tpu.ops.tracer_jnp import make_env
from pwnfps_tpu.ops.vec import V3
from pwnfps_tpu.world.levelc import compile_level
from pwnfps_tpu.world.objects import ObjectPool

# Portal + corridor + sphere + ramp: exercises portal rotation
# (gx/gz/ldir rewrites), the empty-space skip (multi-cell cx jumps),
# sphere registration (aux_idx/sph_dirty/tmeta) and the ramp tilt
# (event-cond tilt/wy_ramp yields) in one scene.
LEVEL = b"""................
.;B.............
................
.;;;;;;;;;>;;;B.
................
"""


@pytest.fixture(scope="module")
def setup():
    lv = compile_level(LEVEL)
    pool = ObjectPool()
    i = pool.obj_new()
    pool.obj_set_sphere(i, 0.2, 0.4, 7.5, 0.5, 3.5, 0.8, 0.7, 0.9)
    world, meta = W.build_world(lv, pool.prepare_render(),
                                SseTables.load())
    return jax.tree.map(jnp.asarray, world), meta


def _fan_rays(n=64):
    rng = np.random.default_rng(3)
    froms = np.tile(np.array([1.3, 0.5, 1.5], np.float32), (n, 1))
    froms[:, 1] += rng.uniform(-0.2, 0.2, n).astype(np.float32)
    froms[:, 2] += rng.uniform(-0.3, 0.3, n).astype(np.float32)
    dirs = np.stack([np.ones(n), rng.uniform(-0.3, 0.3, n),
                     rng.uniform(-0.5, 0.5, n)], 1).astype(np.float32)
    fv = V3(*(jnp.asarray(froms[:, k]) for k in range(3)))
    rv = V3(*(jnp.asarray(dirs[:, k]) for k in range(3)))
    return fv, rv


def _run(world, meta, cfg, fv, rv):
    env = make_env(world, meta, cfg)
    act = jnp.ones_like(fv.x) > 0
    out = run_segment(env, cfg, fv, rv, act)
    return [np.asarray(v) for v in jax.tree.leaves(out)]


@pytest.mark.parametrize("parity", [False, True])
@pytest.mark.parametrize("profile", [False, True])
def test_segment_bit_identity(setup, parity, profile):
    world, meta = setup
    fv, rv = _fan_rays()
    cfg1 = RenderConfig(width=16, height=4, parity=parity,
                        profile=profile, pack_carry=True)
    cfg0 = dataclasses.replace(cfg1, pack_carry=False)
    a = _run(world, meta, cfg1, fv, rv)
    b = _run(world, meta, cfg0, fv, rv)
    for x, y in zip(a, b):
        assert (x == y).all()


def test_paged_frame_bit_identity():
    from pwnfps_tpu.render.camera import camera_vectors, mat4_identity
    from pwnfps_tpu.render.frame import render_frame
    from pwnfps_tpu.world.procgen import generate_sector_maze
    words, info = generate_sector_maze(seed=7)
    sp, mx, mz = info["spawn"]
    pool = ObjectPool()
    i = pool.obj_new()
    pool.obj_set_sphere(i, 0.25, 0.5, mx + 0.5, 0.35, mz + 1.2,
                        0.9, 0.6, 0.6)
    world, meta = W.build_world_paged(words, pool.prepare_render(), sp,
                                      SseTables.load())
    world = jax.tree.map(jnp.asarray, world)
    cam = mat4_identity()
    cam[3, :3] = (mx + 0.5, 0.5, mz + 0.5)
    cfg1 = RenderConfig(width=256, height=128, parity=False,
                        cam_page=sp, pack_carry=True)
    cfg0 = dataclasses.replace(cfg1, pack_carry=False)
    o, rb, rdx, rdy = camera_vectors(cam, cfg1.width, cfg1.height)
    o, rb, rdx, rdy = (jnp.asarray(v) for v in (o, rb, rdx, rdy))
    fb1, zb1 = render_frame(world, meta, cfg1, o, rb, rdx, rdy, 0.5)
    fb0, zb0 = render_frame(world, meta, cfg0, o, rb, rdx, rdy, 0.5)
    assert (np.asarray(fb1) == np.asarray(fb0)).all()
    assert (np.asarray(zb1) == np.asarray(zb0)).all()
