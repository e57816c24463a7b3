"""Fetch chunk-span distribution: sizes the dynamic-base fetch lever.

The per-step cell fetch is the single largest unconditional block of
the step body (tools/op_census.py: 64 of 523.5 planes/step): a static
scan of all 16 table chunks (128 packed words each) with one
take_along_axis + select per chunk (tracer_pallas._chunked_gather).
But only lanes that MOVE this step (stepped | portal-go) consume the
fetched word - everyone else keeps s.fields - and movers are the
tile's advancing front, which is spatially compact for most of a
segment.  If the front's chunk indices span <= K chunks, the scan can
cover [hmin, hmin+K) with a dynamic sublane base (the chip-proven
scan_one pattern from the page-uniform maze fetch) behind one
tile-uniform cond, paying K instead of 16 chunk scans.

This replay runs the shipped segment_body on the default level (the
flagship bench scene, 3 camera rotations x 3 waves) with env.fetch
wrapped to record the target cell indices, and prints, per (64,128)
PIXEL-RECTANGLE tile-step (the Pallas tile shape), the distribution
of the mover-lane chunk span: P(span <= K) for K in 1,2,4,8, plus
the fetch-plane model's expected savings.

Usage: PYTHONPATH=/root/repo python tools/fetch_span.py [--json F]
Pure CPU replay (~4 min).  Not a driver contract; evidence for
docs/PERFORMANCE.md's fetch-diet roadmap item.
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

KS = (1, 2, 4, 8)


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

    # wrap env.fetch: surface the per-call target cell index (the
    # value the kernel's chunked scan must cover for consuming lanes)
    # as an extra jit OUTPUT of the step (a dict stash would leak the
    # tracer out of the jit)
    orig_fetch = env.fetch

    @jax.jit
    def spans(s, s2, idx):
        # mover lanes: the step changed the lane's cell (DDA step or
        # portal traversal).  In the kernel this mask is exactly
        # stepped | pgo, both known before the fetch (segment_body
        # lines 991-994); the cell-change test is the replay stand-in.
        moved = (s2.cx != s.cx) | (s2.cz != s.cz)
        act = s.active != 0
        m = act & moved
        # pack2 chunk id of the fetch target (idx>>1 words, 128/row)
        hi = idx >> 8
        BIG = jnp.int32(1 << 20)
        hi_mn = jnp.where(m, hi, BIG)
        hi_mx = jnp.where(m, hi, -BIG)

        def tile(a, red):
            a2 = a.reshape(h // 64, 64, w // 128, 128)
            return red(a2, axis=(1, 3))

        mn = tile(hi_mn, jnp.min)
        mx = tile(hi_mx, jnp.max)
        any_m = tile(m, jnp.any)
        live = tile(act, jnp.any)
        span = jnp.where(any_m, mx - mn + 1, 0)
        return live, any_m, span

    @jax.jit
    def step(s):
        box = []

        def fetch(cx, cz, pg=None, move=None):
            box.append(TC.flat_cell_index(cx, cz, None))
            return orig_fetch(cx, cz, pg)

        s2 = TC.segment_body(s, env._replace(fetch=fetch), cfg,
                             jnp.int32(3))
        return s2, box[0]

    tile_steps = 0
    mover_steps = 0
    span_hist = np.zeros(20, np.int64)   # span buckets, clip 19
    per_wave = [np.zeros(20, np.int64) for _ in range(3)]
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
                if not bool(np.asarray(s.active).any()):
                    break
                s2, idx = step(s)
                live, any_m, span = (np.asarray(x) for x in
                                     spans(s, s2, idx))
                tile_steps += int(live.sum())
                mover_steps += int(any_m.sum())
                sp = np.clip(span[any_m], 0, 19)
                np.add.at(span_hist, sp, 1)
                np.add.at(per_wave[k], sp, 1)
                s = s2
            out = TC.seg_out_view(s, env)
            base, refl, bounce, mpos, mray, seed = TC.shade_and_bounce(
                out, icol, seed, jnp.float32(0.5), k < cfg.reflect,
                env)
            icol = base
            cur_from, cur_ray = mpos, mray
            active = bounce

    tot = span_hist.sum()
    cum = np.cumsum(span_hist)
    res = {'tile_steps': int(tile_steps),
           'mover_tile_steps': int(mover_steps),
           'nchunks_pack2': 16,
           'p_span_le': {}}
    print('live tile-steps %d; %d with movers (%.1f%% fetch-free '
          'already)' % (tile_steps, mover_steps,
                        100.0 * (1 - mover_steps / max(tile_steps, 1))))
    for K in KS:
        p = cum[K] / max(tot, 1)     # span <= K (bucket index == span)
        res['p_span_le'][K] = round(float(p), 4)
        # plane model: scan 16 chunks x2 ops -> K x2 + ~6 overhead
        save = p * (32 - (2 * K + 6))
        print('  P(span<=%2d) = %5.1f%%   est. planes/step saved '
              '~%.1f of 32' % (K, 100 * p, save))
    for k in range(3):
        t = per_wave[k].sum()
        c = np.cumsum(per_wave[k])
        print('  wave %d: P(<=4)=%5.1f%%  P(<=8)=%5.1f%%  (n=%d)'
              % (k, 100 * c[4] / max(t, 1), 100 * c[8] / max(t, 1),
                 int(t)))
    if args.json:
        with open(args.json, 'w') as fh:
            json.dump(res, fh, indent=1)
        print('wrote', args.json)
    return 0


if __name__ == '__main__':
    sys.exit(main())
