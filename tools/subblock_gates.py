"""Sub-block gate rates: sizes the (8,128) split-body lever by replay.

The 240fps roadmap's top item gates the merged event cond (228
planes), the refresh hoist (926 planes) and the per-step sphere
plumbing per (8,128) SUB-BLOCK instead of per (64,128) tile.  Whether
that wins depends on spatial concentration: a tile-step that fires the
event cond pays the branch for all 8 sub-blocks today; if only 1-2 of
its sub-blocks contain event lanes, the effective fire rate drops
~4-8x.  This replay measures, per sub-block-step on the default level
(the flagship bench scene, 3 camera rotations x 3 waves):

  live    - any active lane (sub-block early exit: the body itself)
  event   - any (dirty | portal | ramp) lane (the merged cond)
  sphneed - any (has_aux | dirty) lane (the per-step sphere plumbing)
  anyq    - any dirty lane whose line hits the scene bound (the
            nested 926-plane hoist body)

and prints tile-granularity vs sub-block-granularity rates side by
side.  Pure CPU replay of the shipped segment_body (no chip, ~4 min).

Usage: PYTHONPATH=/root/repo python tools/subblock_gates.py [--json F]
Not a driver contract; evidence for docs/PERFORMANCE.md roadmap #1.
"""
import argparse
import functools
import json
import os
import sys

import numpy as np
import jax
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pwnfps_tpu.world.levelc import load_level
from pwnfps_tpu.world.objects import ObjectPool
from pwnfps_tpu.core.approx import SseTables
from pwnfps_tpu.core.config import RenderConfig
from pwnfps_tpu.core import lcg
from pwnfps_tpu.ops import worlddev as W
from pwnfps_tpu.ops.tracer_jnp import make_env
from pwnfps_tpu.ops import tracer_core as TC
from pwnfps_tpu.ops.vec import V3, C4
from pwnfps_tpu.render.camera import camera_vectors, mat4_identity, \
    mat4_roty
from pwnfps_tpu.render.frame import gen_rays


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument('--json', default=None)
    args = ap.parse_args()

    lv = load_level('/root/reference/level.txt')
    pool = ObjectPool()
    opos = [(0, 0, 0, .3, .6), (0, .3, 0, .1, .2), (.3, 0, 0, .1, .4),
            (0, 0, .3, .1, .4), (-.3, 0, 0, .1, .4),
            (0, 0, -.3, .1, .4), (.3, 0, .1, .03, .2),
            (.1, 0, .3, .03, .2), (-.3, 0, .1, .03, .2),
            (.1, 0, -.3, .03, .2), (.3, 0, -.1, .03, .2),
            (-.1, 0, .3, .03, .2), (-.3, 0, -.1, .03, .2),
            (-.1, 0, -.3, .03, .2)]
    for (x, y, z, r, rf) in opos:
        i = pool.obj_new()
        pool.obj_set_sphere(i, r, rf, 9.5 + x, .3 + y, 5.5 + z,
                            .8, .8, .8)
    world, meta = W.build_world(lv, pool.prepare_render(),
                                SseTables.load())
    world = jax.tree.map(jnp.asarray, world)
    w, h = 896, 512
    cfg = RenderConfig(width=w, height=h, parity=False)
    env = make_env(world, meta, cfg)

    # scene bound sphere (as tracer_pallas.build_tables)
    _c = np.asarray(world.sph_pos)[:meta.n_spheres]
    _lo, _hi = _c.min(axis=0), _c.max(axis=0)
    _bc = ((_lo + _hi) * 0.5).astype(np.float32)
    _br = np.float32(np.sqrt(((_c - _bc[None]) ** 2).sum(axis=1)).max()
                     + np.asarray(world.sph_r)[:meta.n_spheres].max())

    @jax.jit
    def gates(s):
        act = s.active != 0
        cls = s.fields.cls
        dirty = act & ((s.sph_dirty & 1) != 0)
        portal = act & (cls == W.PORTAL)
        ramp = act & (cls >= W.RAMP_GT) & (cls <= W.RAMP_CR)
        event = dirty | portal | ramp
        sphneed = act & ((s.aux_dist != jnp.float32(-1.0))
                         | (s.sph_dirty != 0))
        brq2 = _br * _br + np.float32(0.04)
        rx = _bc[0] - s.pos.x
        rz = _bc[2] - s.pos.z
        d2xz = rx * rx + rz * rz
        dtxz = rx * s.ray.x + rz * s.ray.z
        l2 = s.ray.x * s.ray.x + s.ray.z * s.ray.z
        rel = (d2xz - brq2) * l2 < dtxz * dtxz
        ry_ = _bc[1] - s.pos.y
        d2 = d2xz + ry_ * ry_
        dt3 = dtxz + ry_ * s.ray.y
        l3 = l2 + s.ray.y * s.ray.y
        quick = (rel & ((dt3 > 0) | (dt3 * dt3 < brq2 * l3))
                 & ((d2 - brq2) * l3 < dt3 * dt3))
        anyq = dirty & quick

        def counts(m):
            # image rows of 64 pixels x 128 cols form a (64,128) tile;
            # its 8 sublane groups of 8 rows are the (8,128) sub-blocks
            m2 = m.reshape(h // 64, 8, 8, w // 128, 128)
            sub = m2.any(axis=(2, 4))              # (tiles_y, 8, tiles_x)
            tile = sub.any(axis=1)
            return tile.sum(), sub.sum()

        return tuple(counts(m) for m in (act, event, sphneed, anyq))

    @functools.partial(jax.jit, static_argnums=())
    def step(s):
        return TC.segment_body(s, env, cfg, jnp.int32(3))

    names = ('live', 'event', 'sphneed', 'anyq')
    tile_tot = np.zeros(4, np.int64)
    sub_tot = np.zeros(4, np.int64)
    lane_live = 0
    tile_steps = 0
    for rot in (0.0, 1.1, 2.2):
        cam = mat4_identity()
        sx, sz = lv.spawn
        cam[3, :3] = (sx + .5, .5, sz + .5)
        mat4_roty(cam, rot)
        o, rb, rdx, rdy = camera_vectors(cam, w, h)
        rays = gen_rays(jnp.asarray(rb), jnp.asarray(rdx),
                        jnp.asarray(rdy), w, h, False)
        n = w * h
        ifrom = V3(*(jnp.broadcast_to(jnp.float32(o[i]), (n,))
                     for i in range(3)))
        xs = jnp.arange(w, dtype=jnp.uint32)
        ys = jnp.arange(h, dtype=jnp.uint32)
        seed = lcg.pixel_seed(xs[None, :], ys[:, None], w).reshape(-1)
        active = jnp.ones(n, bool)
        icol = C4(*([jnp.ones(n)] * 4))
        cur_from, cur_ray = ifrom, rays
        for k in range(3):
            s = TC.init_segment(cur_from, cur_ray, active, env)
            s = TC._apply_aux(s, env.sphere_all(s, s.active != 0))
            for it in range(64):
                g = [(int(t), int(u)) for (t, u) in
                     [tuple(np.asarray(x) for x in pair)
                      for pair in gates(s)]]
                if g[0][0] == 0:
                    break
                tile_tot += np.array([t for (t, _) in g])
                sub_tot += np.array([u for (_, u) in g])
                lane_live += int(np.asarray(s.active).sum())
                tile_steps += g[0][0]
                s = step(s)
            out = TC.seg_out_view(s, env)
            base, refl, bounce, mpos, mray, seed = TC.shade_and_bounce(
                out, icol, seed, jnp.float32(0.5), k < cfg.reflect,
                env)
            icol = base
            cur_from, cur_ray = mpos, mray
            active = bounce

    live_t, live_s = tile_tot[0], sub_tot[0]
    res = {'tiles': int((h // 64) * (w // 128)),
           'live_tile_steps': int(live_t),
           'live_subblock_steps': int(live_s),
           'subblock_live_of_tilex8': round(live_s / (8.0 * live_t), 4),
           'lane_occupancy_in_live_tiles':
               round(lane_live / (live_t * 64.0 * 128.0), 4)}
    print('live tile-steps %d; live sub-blocks %.1f%% of tile x8 '
          '(body early-exit headroom); lane occupancy in live tiles '
          '%.1f%%' % (live_t, 100.0 * res['subblock_live_of_tilex8'],
                      100.0 * res['lane_occupancy_in_live_tiles']))
    for i, nm in enumerate(names[1:], start=1):
        tr = tile_tot[i] / float(live_t)
        sr = sub_tot[i] / float(live_s)
        res[nm] = {'tile_rate': round(tr, 4),
                   'subblock_rate': round(sr, 4),
                   'granularity_gain': round(tr / sr, 2)
                   if sr else None}
        print('%8s: tile rate %5.1f%%  sub-block rate %5.1f%%  '
              'gain %.2fx' % (nm, 100 * tr, 100 * sr,
                              (tr / sr) if sr else float('inf')))
    if args.json:
        with open(args.json, 'w') as fh:
            json.dump(res, fh, indent=1)
    return 0


if __name__ == '__main__':
    sys.exit(main())
