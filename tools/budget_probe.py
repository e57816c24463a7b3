#!/usr/bin/env python
"""One-process 1080p component budget on the chip (fast mode).

Times, at deep pipelining (sync cost ~26.6ms/depth amortized away):
  full      render_frame (trace + DoF blur)
  noblur    render_frame with postproc_blur=0
  kernel    trace_wave_pallas alone on PRE-TILED device inputs
            (isolates the Mosaic kernel from raygen/tile/untile glue)
  raygen    gen_rays + seeds + tile_rays only (the input-side glue)

full-noblur = DoF blur; noblur-kernel-raygen ~= untile+dispatch glue.
Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/budget_probe.py
"""

import argparse
import json
import sys
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--depth", type=int, default=32)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from functools import partial

    from pwnfps_tpu.core import lcg
    from pwnfps_tpu.core.approx import SseTables
    from pwnfps_tpu.core.config import RenderConfig
    from pwnfps_tpu.ops import worlddev as W
    from pwnfps_tpu.ops.tracer_pallas import trace_wave_pallas
    from pwnfps_tpu.ops.vec import V3
    from pwnfps_tpu.render.camera import camera_vectors, mat4_identity, \
        mat4_roty
    from pwnfps_tpu.render.frame import (_block_shape, _tile_rays,
                                         gen_rays, render_frame)
    from pwnfps_tpu.world.levelc import load_level
    from pwnfps_tpu.world.objects import ObjectPool

    width, height = 1920, 1080
    lv = load_level("/root/reference/level.txt")
    opos = [(0.0, 0.0, 0.0, 0.3), (0.0, 0.3, 0.0, 0.1),
            (0.3, 0.0, 0.0, 0.1), (0.0, 0.0, 0.3, 0.1),
            (-0.3, 0.0, 0.0, 0.1), (0.0, 0.0, -0.3, 0.1),
            (0.3, 0.0, 0.1, 0.03), (0.1, 0.0, 0.3, 0.03),
            (-0.3, 0.0, 0.1, 0.03), (0.1, 0.0, -0.3, 0.03),
            (0.3, 0.0, -0.1, 0.03), (-0.1, 0.0, 0.3, 0.03),
            (-0.3, 0.0, -0.1, 0.03), (-0.1, 0.0, -0.3, 0.03)]
    pool = ObjectPool()
    for (x, y, z, r) in opos:
        i = pool.obj_new()
        pool.obj_set_sphere(i, r, 0.4, 9.5 + x, 0.3 + y, 5.5 + z,
                            0.8, 0.7, 0.9)
    sph = pool.prepare_render()
    world, meta = W.build_world(lv, sph, SseTables.load())
    world = jax.tree.map(jnp.asarray, world)
    cfg = RenderConfig(width=width, height=height, parity=False,
                       backend="pallas")
    cfg_nb = RenderConfig(width=width, height=height, parity=False,
                          backend="pallas", postproc_blur=0)

    cam = mat4_identity()
    sx, sz = lv.spawn
    cam[3, :3] = (sx + 0.5, 0.5, sz + 0.5)

    def frame_args(k):
        c = cam.copy()
        mat4_roty(c, 0.07 * k)
        origin, rayb, rdx, rdy = camera_vectors(c, width, height)
        return (jnp.asarray(origin), jnp.asarray(rayb),
                jnp.asarray(rdx), jnp.asarray(rdy),
                np.float32(0.016 * k))

    @jax.jit
    def probe2(fb):
        return fb[0, 0] + fb[-1, -1]

    bh, bw = _block_shape(cfg)
    n = height * width

    @partial(jax.jit, static_argnames=())
    def make_inputs(origin, rayb, rdx, rdy):
        rays = gen_rays(rayb, rdx, rdy, width, height, False)
        xs = jnp.arange(width, dtype=jnp.uint32)
        ys = jnp.arange(height, dtype=jnp.uint32)
        seeds = lcg.pixel_seed(xs[None, :], ys[:, None],
                               width).reshape(-1)
        ifrom = V3(jnp.broadcast_to(origin[0], (n,)),
                   jnp.broadcast_to(origin[1], (n,)),
                   jnp.broadcast_to(origin[2], (n,)))
        t = lambda a, fill: _tile_rays(a, height, width, bh, bw, fill)
        ifrom_t = V3(t(ifrom.x, 1.0), t(ifrom.y, 0.5), t(ifrom.z, 1.0))
        rays_t = V3(t(rays.x, 0.5), t(rays.y, -0.5), t(rays.z, 0.5))
        return ifrom_t, rays_t, t(seeds, 1)

    @jax.jit
    def kernel_only(ifrom_t, rays_t, seeds_t, sec):
        fb, dist = trace_wave_pallas(world, meta, cfg, ifrom_t, rays_t,
                                     seeds_t, sec, pack=True)
        return fb

    fargs = [frame_args(k) for k in range(args.frames)]
    pre = [make_inputs(*a[:4]) for a in fargs]
    jax.block_until_ready(pre[-1][0].x)

    def timed(run_one, last_probe):
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            done = 0
            while done < args.frames:
                hi = min(done + args.depth, args.frames)
                out = None
                for k in range(done, hi):
                    out = run_one(k)
                np.asarray(last_probe(out))
                done = hi
            best = min(best, time.perf_counter() - t0)
        return 1000 * best / args.frames

    runs = {
        "full": (lambda k: render_frame(world, meta, cfg, *fargs[k])[0],
                 probe2),
        "noblur": (lambda k: render_frame(world, meta, cfg_nb,
                                          *fargs[k])[0], probe2),
        "kernel": (lambda k: kernel_only(*pre[k], fargs[k][4]),
                   lambda fb: probe2(fb.reshape(-1, 128))),
        "raygen": (lambda k: make_inputs(*fargs[k][:4])[0].x,
                   lambda x: probe2(x.reshape(-1, 128))),
    }
    out = {}
    for name, (fn, pr) in runs.items():
        np.asarray(pr(fn(0)))          # warm/compile
        out[name] = round(timed(fn, pr), 2)
    out["blur=full-noblur"] = round(out["full"] - out["noblur"], 2)
    out["glue=noblur-kernel-raygen"] = round(
        out["noblur"] - out["kernel"] - out["raygen"], 2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
