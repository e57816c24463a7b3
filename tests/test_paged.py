"""Paged world atlas (BASELINE config #3 at spec scale): multi-page
worlds, cross-page portals, and the 1024-sector maze generator.

The reference engine is a single 64x64 grid; pages are this framework's
scale-out of the same semantics (ops/worlddev.py "Paged worlds"), so
there is no C oracle to diff against - these tests pin the geometry
invariants and the jnp/pallas differential instead.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pwnfps_tpu.core.approx import SseTables
from pwnfps_tpu.core.config import RenderConfig
from pwnfps_tpu.ops import worlddev as W
from pwnfps_tpu.ops.tracer_core import T_WALL, run_segment
from pwnfps_tpu.ops.tracer_jnp import make_env
from pwnfps_tpu.ops.vec import V3
from pwnfps_tpu.world.objects import ObjectPool
from pwnfps_tpu.world.procgen import generate_sector_maze


@pytest.fixture(scope="module")
def maze():
    words, info = generate_sector_maze(seed=7)
    world, meta = W.build_world_paged(
        words, ObjectPool().prepare_render(), 0, SseTables.load())
    return words, info, jax.tree.map(jnp.asarray, world), meta


def test_maze_scale(maze):
    words, info, world, meta = maze
    assert info["sectors"] >= 1024
    assert meta.n_pages == 4
    assert info["portal_pairs"] >= 48 + 16   # teleports + ring links
    # every page holds portal cells and open interiors
    cls = words.reshape(4, 64, 64) & 0xF
    for p in range(4):
        assert (cls[p] == W.PORTAL).sum() >= 8, f"page {p}"
        assert (cls[p] == W.FLOOR).sum() >= 2 * 2 * 200, f"page {p}"


def test_portal_words_well_formed(maze):
    words, info, world, meta = maze
    w = words.reshape(-1)
    portal = w[(w & 0xF) == W.PORTAL]
    assert (W.w_pkind(portal) == 1).all()      # all complete pairs
    assert (W.w_dpage(portal) < 4).all()
    # every portal's target cell is itself a portal cell (pairs)
    words2 = words.reshape(4, 64, 64)
    for p in range(4):
        for z, x in np.argwhere((words2[p] & 0xF) == W.PORTAL):
            ww = int(words2[p, z, x])
            tx = x + W.w_pdcx(ww)
            tz = z + W.w_pdcz(ww)
            tp = W.w_dpage(ww)
            assert 0 <= tx < 64 and 0 <= tz < 64
            tw = int(words2[tp, tz, tx])
            assert (tw & 0xF) == W.PORTAL, (p, x, z)
            # and it points straight back
            assert tx + W.w_pdcx(tw) == x
            assert tz + W.w_pdcz(tw) == z
            assert W.w_dpage(tw) == p


def test_cross_page_ray_traversal(maze):
    """A ray aimed into a cross-page portal terminates in the target
    page; one aimed at a plain wall stays in its own page."""
    words, info, world, meta = maze
    words2 = words.reshape(4, 64, 64)
    # pick a portal on page 0 whose target page differs
    cand = None
    for z, x in np.argwhere((words2[0] & 0xF) == W.PORTAL):
        ww = int(words2[0, z, x])
        if W.w_dpage(ww) != 0:
            cand = (int(x), int(z), ww)
            break
    assert cand is not None
    px, pz, ww = cand
    # the free neighbour is the single open 4-neighbour
    nb = [(dx, dz) for dx, dz in ((1, 0), (-1, 0), (0, 1), (0, -1))
          if 0 <= px + dx < 64 and 0 <= pz + dz < 64
          and (words2[0, pz + dz, px + dx] & 0xF) == W.FLOOR]
    assert len(nb) == 1, (px, pz, nb)
    dx, dz = nb[0]
    cfg = RenderConfig(parity=False)
    env = make_env(world, meta, cfg)
    frm = V3(jnp.float32([px + dx + 0.5]), jnp.float32([0.5]),
             jnp.float32([pz + dz + 0.5]))
    ray = V3(jnp.float32([-dx or 1e-6]), jnp.float32([-0.02]),
             jnp.float32([-dz or 1e-6]))
    out = run_segment(env, cfg, frm, ray, jnp.ones(1, bool),
                      jnp.zeros(1, jnp.int32))
    assert int(out.tpage[0]) == W.w_dpage(ww), (
        f"ray did not come out in page {W.w_dpage(ww)}")
    assert int(out.tkind[0]) == T_WALL
    # control: straight up hits the ceiling in page 0
    up = V3(jnp.float32([1e-6]), jnp.float32([1.0]),
            jnp.float32([1e-6]))
    out2 = run_segment(env, cfg, frm, up, jnp.ones(1, bool),
                       jnp.zeros(1, jnp.int32))
    assert int(out2.tpage[0]) == 0


def test_paged_buckets_on_portal_cells_rejected():
    words, info = generate_sector_maze(seed=3)
    # drop a sphere exactly on a portal cell of page 0
    words2 = words.reshape(4, 64, 64)
    z, x = np.argwhere((words2[0] & 0xF) == W.PORTAL)[0]
    pool = ObjectPool()
    i = pool.obj_new()
    pool.obj_set_sphere(i, 0.2, 0.5, x + 0.5, 0.3, z + 0.5, 1, 1, 1)
    with pytest.raises(ValueError, match="portal"):
        W.build_world_paged(words, pool.prepare_render(), 0,
                            SseTables.load())


def test_paged_jnp_pallas_differential(maze):
    """Both backends trace the maze identically (fast mode, interpret
    kernel on CPU)."""
    from pwnfps_tpu.render.camera import camera_vectors, mat4_identity
    from pwnfps_tpu.render.frame import render_frame

    words, info, world, meta = maze
    sp, sx, sz = info["spawn"]
    w, h = 128, 64
    cam = mat4_identity()
    cam[3, :3] = (sx + 0.5, 0.5, sz + 0.5)
    o, rb, rdx, rdy = camera_vectors(cam, w, h)
    args = (jnp.asarray(o), jnp.asarray(rb), jnp.asarray(rdx),
            jnp.asarray(rdy), np.float32(0.25))
    fb_j, zb_j = render_frame(world, meta,
                              RenderConfig(width=w, height=h,
                                           cam_page=sp), *args)
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        fb_p, zb_p = render_frame(world, meta,
                                  RenderConfig(width=w, height=h,
                                               backend="pallas",
                                               cam_page=sp), *args)
    fb_j, fb_p = np.asarray(fb_j), np.asarray(fb_p)
    from .fputil import fma_contracts
    if not fma_contracts():
        # exact backend identity, like the single-page suites (the
        # loose threshold below exists only for the XLA:CPU FMA case)
        assert np.array_equal(fb_j, fb_p), (
            f"backends diverge on {(fb_j != fb_p).sum()} pixels")
    else:
        agree = (fb_j == fb_p).mean()
        assert agree > 0.999, f"backends diverge: {agree}"
