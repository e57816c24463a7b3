"""Procedural level generation (BASELINE configs #2/#3)."""

import numpy as np

import jax
import jax.numpy as jnp

from pwnfps_tpu.core.approx import SseTables
from pwnfps_tpu.core.config import RenderConfig
from pwnfps_tpu.ops import worlddev as W
from pwnfps_tpu.ops.tracer_jnp import trace_wave
from pwnfps_tpu.ops.vec import V3
from pwnfps_tpu.world.objects import ObjectPool
from pwnfps_tpu.world.procgen import generate_maze, make_portal_chain


def _world(lv):
    sph = ObjectPool().prepare_render()
    world, meta = W.build_world(lv, sph, SseTables.load())
    return jax.tree.map(jnp.asarray, world), meta


def test_maze_properties():
    lv = generate_maze(seed=11)
    open_cells = sum(
        1 for z in range(64) for x in range(64)
        if chr(lv.grid[z, x]) in ';$#&<>,^')
    assert open_cells >= 1024          # BASELINE config #3 scale
    assert sum(1 for p in lv.pmap if p.open) >= 16
    # spawn is walkable
    assert chr(lv.grid[lv.spawn[1], lv.spawn[0]]) == ";"
    lv.channels()


def test_maze_determinism():
    a = generate_maze(seed=5)
    b = generate_maze(seed=5)
    np.testing.assert_array_equal(a.grid, b.grid)


def test_portal_chain_ray_traverses_8_portals():
    lv = make_portal_chain(8)
    world, meta = _world(lv)
    cfg = RenderConfig()
    # a straight +x ray down the corridor must pass all 8 pairs and
    # reach the far wall: primary distance covers the traversed span
    n = 8
    fv = V3(jnp.full(n, 1.5, jnp.float32), jnp.full(n, 0.5, jnp.float32),
            jnp.full(n, 1.5, jnp.float32))
    rv = V3(jnp.full(n, 1.0, jnp.float32),
            jnp.full(n, 1e-4, jnp.float32),
            jnp.full(n, 1e-5, jnp.float32))
    seeds = jnp.arange(n, dtype=jnp.uint32)
    col, dist = trace_wave(world, meta, cfg, fv, rv, seeds, 0.0)
    d = np.asarray(dist)
    # the walkable span is ~17 cells (each pair teleports over its gap);
    # rays stopping at the first portal-as-wall would report d < 3
    assert (d > 15.0).all(), d
    # and the rays did not die at the first portal as walls
    colv = np.stack([np.asarray(c) for c in col], 1)
    assert np.isfinite(colv).all()


def test_maze_renders():
    lv = generate_maze(seed=11)
    world, meta = _world(lv)
    cfg = RenderConfig()
    sx, sz = lv.spawn
    n = 64
    rng = np.random.default_rng(0)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    fv = V3(jnp.full(n, sx + 0.5, jnp.float32),
            jnp.full(n, 0.5, jnp.float32),
            jnp.full(n, sz + 0.5, jnp.float32))
    rv = V3(jnp.asarray(d[:, 0], jnp.float32),
            jnp.asarray(d[:, 1] * 0.5, jnp.float32),
            jnp.asarray(d[:, 2], jnp.float32))
    seeds = jnp.arange(n, dtype=jnp.uint32)
    col, dist = trace_wave(world, meta, cfg, fv, rv, seeds, 1.0)
    assert np.isfinite(np.asarray(dist)).all()
