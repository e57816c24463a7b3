"""Page-uniformity of maze tiles: is a dynamic-base single-page cell
fetch worth building?

The paged cell fetch scans ALL pages' table chunks per step (64
broadcast+gather+select rounds on the 4-page maze - the largest block
of its step body).  A dynamic row-offset scan of ONE page's 16 chunks
is 4x cheaper but only correct for tile-steps whose active lanes share
a page.  This replay measures that fraction on the maze bench's own
cameras, plus the mixed-tile fallback rate a nested cond would pay.

Usage: PYTHONPATH=/root/repo python tools/page_uniform.py  (CPU)
"""
import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from pwnfps_tpu.core.approx import SseTables  # noqa: E402
from pwnfps_tpu.core.config import RenderConfig  # noqa: E402
from pwnfps_tpu.ops import tracer_core as TC  # noqa: E402
from pwnfps_tpu.ops import worlddev as W  # noqa: E402
from pwnfps_tpu.ops.tracer_jnp import make_env  # noqa: E402
from pwnfps_tpu.ops.vec import V3, C4  # noqa: E402
from pwnfps_tpu.render.camera import (camera_vectors,  # noqa: E402
                                      mat4_identity, mat4_roty)
from pwnfps_tpu.render.frame import gen_rays  # noqa: E402
from pwnfps_tpu.world.objects import ObjectPool  # noqa: E402
from pwnfps_tpu.world.procgen import generate_sector_maze  # noqa: E402
from pwnfps_tpu.core import lcg  # noqa: E402

words, info = generate_sector_maze(seed=7)
sp, sx, sz = info["spawn"]
pool = ObjectPool()
i = pool.obj_new()
pool.obj_set_sphere(i, 0.25, 0.5, sx + 0.5, 0.35, sz + 1.2,
                    0.9, 0.6, 0.6)
world, meta = W.build_world_paged(words, pool.prepare_render(), sp,
                                  SseTables.load())
world = jax.tree.map(jnp.asarray, world)
w, h = 1280, 704          # bench is 720; 704 = 11 x 64-row tiles
cfg = RenderConfig(width=w, height=h)
env = make_env(world, meta, cfg)


@jax.jit
def gates(s):
    act = s.active != 0
    pg = s.page

    def tile(m, red, fill):
        m2 = jnp.where(act, m, fill).reshape(h // 64, 64, w // 128, 128)
        return red(m2, axis=(1, 3))

    live = tile(act, jnp.max, False)
    pmax = tile(pg, jnp.max, -1)
    pmin = tile(pg, jnp.min, 99)
    return live, (pmax == pmin) & live


@jax.jit
def step(s):
    return TC.segment_body(s, env, cfg, jnp.int32(3))


live_t = 0
uni_t = 0
for rot in (0.0, 0.05 * 8, 0.05 * 16):
    cam = mat4_identity()
    cam[3, :3] = (sx + 0.5, 0.5, sz + 0.5)
    mat4_roty(cam, rot)
    o, rb, rdx, rdy = camera_vectors(cam, w, h)
    rays = gen_rays(jnp.asarray(rb), jnp.asarray(rdx), jnp.asarray(rdy),
                    w, h, False)
    n = w * h
    ifrom = V3(*(jnp.broadcast_to(jnp.float32(o[i]), (n,))
                 for i in range(3)))
    xs = jnp.arange(w, dtype=jnp.uint32)
    ys = jnp.arange(h, dtype=jnp.uint32)
    seed = lcg.pixel_seed(xs[None, :], ys[:, None], w).reshape(-1)
    active = jnp.ones(n, bool)
    icol = C4(*([jnp.ones(n)] * 4))
    page = jnp.full(n, sp, jnp.int32)
    cur_from, cur_ray = ifrom, rays
    for k in range(3):
        s = TC.init_segment(cur_from, cur_ray, active, env, page)
        s = TC._apply_aux(s, env.sphere_all(s, s.active != 0))
        for it in range(96):
            lv, uni = (np.asarray(x) for x in gates(s))
            if not lv.any():
                break
            live_t += int(lv.sum())
            uni_t += int(uni.sum())
            s = step(s)
        out = TC.seg_out_view(s, env)
        page = out.tpage
        base, refl, bounce, mpos, mray, seed = TC.shade_and_bounce(
            out, icol, seed, jnp.float32(0.5), k < cfg.reflect, env)
        icol = base
        cur_from, cur_ray = mpos, mray
        active = bounce
    print(f"rot {rot:.2f}: cumulative live {live_t}, "
          f"uniform {100.0 * uni_t / max(live_t, 1):.1f}%")

print(f"page-uniform tile-steps: {100.0 * uni_t / max(live_t, 1):.1f}% "
      f"of {live_t} live tile-steps (maze bench cameras, 3 waves)")
