"""Dense portal-record slot path (worlddev.portal_slot_tables).

The compact cell entry carries a per-page portal slot id in its
(zero-on-portal-cells) run bits; the rare portal fetch gathers one
packed record from a [n_pages * pslots] table instead of scanning the
full per-cell word table.  Record fields are the w_* decodes of the
portal cell's own word, so the path must be BIT-identical to the
full-table fetch it replaces - pinned here by slot-vs-disabled frame
equality on both a portal-heavy single-page scene and the paged maze.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pwnfps_tpu.core.approx import SseTables
from pwnfps_tpu.core.config import RenderConfig
from pwnfps_tpu.ops import worlddev as W
from pwnfps_tpu.ops.tracer_core import T_WALL, trace_wave_env
from pwnfps_tpu.ops.tracer_jnp import make_env
from pwnfps_tpu.ops.vec import V3
from pwnfps_tpu.world.levelc import load_level
from pwnfps_tpu.world.objects import ObjectPool

from .test_tracer_scalar import REF_LEVEL, make_spheres


def _world():
    lv = load_level(REF_LEVEL)
    sph, _ = make_spheres()
    world, meta = W.build_world(lv, sph, SseTables.load())
    return lv, jax.tree.map(jnp.asarray, world), meta


def test_capacity_and_slot_table():
    lv, world, meta = _world()
    word = np.asarray(world.word)
    n_portal = int((((word & 0xF) == W.PORTAL)).sum())
    assert n_portal > 0
    assert meta.pslots == 128  # reference level: <= 52 endpoints
    slot, ptab = W.portal_slot_tables(word, 1, meta.pslots)
    ptab = np.asarray(ptab)
    # every portal cell's record decodes to its own word's channels
    for idx in np.nonzero((word & 0xF) == W.PORTAL)[0]:
        w = int(word[idx])
        r = int(ptab[int(slot[idx])])
        assert (r & 3) == W.w_pkind(w)
        assert ((r >> 2) & 3) == W.w_prot(w)
        assert ((r >> 4) & 0x7F) - 64 == W.w_pdcx(w)
        assert ((r >> 11) & 0x7F) - 64 == W.w_pdcz(w)
    # slots are dense ranks in cell order
    ranks = slot[np.nonzero((word & 0xF) == W.PORTAL)[0]]
    assert (np.asarray(ranks) == np.arange(n_portal)).all()


def test_capacity_overflow_disables():
    # a page drowning in portals (> 256) must fall back to the
    # full-table fetch (pslots == 0), not corrupt the entry bits
    w = np.zeros(4096, np.int32)
    w[:300] = W.PORTAL | (1 << 4)
    assert W._pslot_capacity(w, 1) == 0


def _rays_through_portals(n=192, seed0=3):
    rng = np.random.default_rng(seed0)
    # aim fans at the reference level's portal-threaded corridors
    bases = [(9.5, 0.5, 5.5), (6.5, 0.5, 4.5), (11.5, 0.5, 3.5)]
    froms = np.zeros((n, 3), np.float32)
    dirs = np.zeros((n, 3), np.float32)
    for k in range(n):
        b = bases[k % len(bases)]
        froms[k] = [b[0] + rng.uniform(-0.4, 0.4), 0.5,
                    b[2] + rng.uniform(-0.4, 0.4)]
        a = rng.uniform(0, 2 * np.pi)
        dirs[k] = [np.cos(a), rng.uniform(-0.2, 0.2), np.sin(a)]
    fv = V3(*(jnp.asarray(froms[:, i]) for i in range(3)))
    rv = V3(*(jnp.asarray(dirs[:, i]) for i in range(3)))
    seeds = jnp.asarray(rng.integers(0, 2**31, n).astype(np.uint32))
    return fv, rv, seeds


def test_slot_vs_disabled_bitexact_jnp():
    lv, world, meta = _world()
    assert meta.pslots > 0
    meta0 = dataclasses.replace(meta, pslots=0)
    cfg = RenderConfig(maxsteps=256)
    fv, rv, seeds = _rays_through_portals()
    env1 = make_env(world, meta, cfg)
    env0 = make_env(world, meta0, cfg)
    c1, d1 = trace_wave_env(env1, cfg, fv, rv, seeds, np.float32(1.5))
    c0, d0 = trace_wave_env(env0, cfg, fv, rv, seeds, np.float32(1.5))
    for a, b in zip(c1, c0):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d0))


def test_slot_vs_disabled_bitexact_paged():
    from pwnfps_tpu.world.procgen import generate_sector_maze
    words, info = generate_sector_maze(seed=7)
    world, meta = W.build_world_paged(
        words, ObjectPool().prepare_render(), 0, SseTables.load())
    assert meta.pslots > 0, "maze pages exceed the slot budget?"
    world = jax.tree.map(jnp.asarray, world)
    meta0 = dataclasses.replace(meta, pslots=0)
    cfg = RenderConfig(maxsteps=256, reflect=1)
    # fans from an open interior cell of page 0
    cls0 = (words.reshape(4, 64, 64) & 0xF)[0]
    z, x = np.argwhere(cls0 == W.FLOOR)[17]
    n = 128
    rng = np.random.default_rng(5)
    a = rng.uniform(0, 2 * np.pi, n).astype(np.float32)
    fv = V3(jnp.full(n, x + 0.5, jnp.float32),
            jnp.full(n, 0.5, jnp.float32),
            jnp.full(n, z + 0.5, jnp.float32))
    rv = V3(jnp.asarray(np.cos(a)), jnp.zeros(n, jnp.float32) + 0.05,
            jnp.asarray(np.sin(a)))
    seeds = jnp.asarray(rng.integers(0, 2**31, n).astype(np.uint32))
    page0 = jnp.zeros(n, jnp.int32)
    env1 = make_env(world, meta, cfg)
    env0 = make_env(world, meta0, cfg)
    c1, d1 = trace_wave_env(env1, cfg, fv, rv, seeds, np.float32(0.5),
                            page0)
    c0, d0 = trace_wave_env(env0, cfg, fv, rv, seeds, np.float32(0.5),
                            page0)
    for q, r in zip(c1, c0):
        np.testing.assert_array_equal(np.asarray(q), np.asarray(r))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d0))
