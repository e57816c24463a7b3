#!/usr/bin/env python
"""Parameterized 1080p perf probe (TPU): sweep tracer knobs quickly.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_probe.py \
           [--chunk N] [--frames N] [--depth N] [--reps N] [--noblur]
           [--reflect N] [--width W --height H]
(set PWNFPS_PALLAS_TILE before launch to change the Mosaic tile).
Prints one JSON line per run; used for the sweeps in
docs/PERFORMANCE.md - not a driver contract (that is bench.py).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=2)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--depths", type=int, nargs="+", default=None,
                    help="sweep several pipeline depths in one process "
                         "(one compile); overrides --depth")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--reflect", type=int, default=2)
    ap.add_argument("--noblur", action="store_true")
    ap.add_argument("--fuse", action="store_true")
    ap.add_argument("--nospheres", action="store_true")
    ap.add_argument("--spheres", type=int, default=None,
                    help="keep only the first N creature spheres "
                         "(sizes the per-sphere hoist slope vs the "
                         "sphere-count-independent machinery)")
    ap.add_argument("--sphfar", action="store_true",
                    help="one tiny sphere 50 units underground: the "
                         "hoist bound gate never fires, isolating the "
                         "carry/step/cond sphere machinery from the "
                         "hoist pass itself")
    ap.add_argument("--noskip", action="store_true",
                    help="disable the empty-space run-length skip")
    ap.add_argument("--nopack", action="store_true",
                    help="disable the packed while-carry (cfg.pack_carry)")
    ap.add_argument("--nowater", action="store_true",
                    help="flat floor normal (sizes the water trig)")
    ap.add_argument("--spanfetch", type=int, default=None,
                    help="mover-window fetch span in chunks (0 "
                         "disables; default = RenderConfig default)")
    ap.add_argument("--notrace2d", action="store_true",
                    help="disable the 2D frame-layout trace I/O "
                         "(cfg.trace_2d, default ON like production): "
                         "fall back to flat tile I/O + untile relayouts")
    ap.add_argument("--rect", default=None,
                    help="tile pixel-rectangle BHxBW (e.g. 8x1024; "
                         "default 64x128)")
    ap.add_argument("--maxsteps", type=int, default=1000)
    ap.add_argument("--lw64", action="store_true",
                    help="force the 64-column compact cell table "
                         "(disable the WorldMeta.lw width trim)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pwnfps_tpu.core.approx import SseTables
    from pwnfps_tpu.core.config import RenderConfig
    from pwnfps_tpu.ops import worlddev as W
    from pwnfps_tpu.render.camera import camera_vectors, mat4_identity, \
        mat4_roty
    from pwnfps_tpu.render.frame import render_frame
    from pwnfps_tpu.world.levelc import load_level
    from pwnfps_tpu.world.objects import ObjectPool

    width, height = args.width, args.height
    lv = load_level("/root/reference/level.txt")
    opos = [(0.0, 0.0, 0.0, 0.3), (0.0, 0.3, 0.0, 0.1),
            (0.3, 0.0, 0.0, 0.1), (0.0, 0.0, 0.3, 0.1),
            (-0.3, 0.0, 0.0, 0.1), (0.0, 0.0, -0.3, 0.1),
            (0.3, 0.0, 0.1, 0.03), (0.1, 0.0, 0.3, 0.03),
            (-0.3, 0.0, 0.1, 0.03), (0.1, 0.0, -0.3, 0.03),
            (0.3, 0.0, -0.1, 0.03), (-0.1, 0.0, 0.3, 0.03),
            (-0.3, 0.0, -0.1, 0.03), (-0.1, 0.0, -0.3, 0.03)]
    if args.spheres is not None:
        opos = opos[:args.spheres]
    if args.sphfar:
        opos = [(0.0, -50.0, 0.0, 0.01)]
    pool = ObjectPool()
    for (x, y, z, r) in ([] if args.nospheres else opos):
        i = pool.obj_new()
        pool.obj_set_sphere(i, r, 0.4, 9.5 + x, 0.3 + y, 5.5 + z,
                            0.8, 0.7, 0.9)
    sph = pool.prepare_render()
    world, meta = W.build_world(lv, sph, SseTables.load())
    if args.lw64:
        import dataclasses
        meta = dataclasses.replace(meta, lw=64)
    world = jax.tree.map(jnp.asarray, world)
    cfg = RenderConfig(width=width, height=height, parity=False,
                       backend="pallas", step_chunk=args.chunk,
                       maxsteps=args.maxsteps, reflect=args.reflect,
                       postproc_blur=0 if args.noblur else 1,
                       fused=args.fuse,
                       space_skip=not args.noskip,
                       pack_carry=not args.nopack,
                       water=not args.nowater,
                       **({} if args.spanfetch is None
                          else {"span_fetch": args.spanfetch}),
                       trace_2d=not args.notrace2d,
                       **({} if args.rect is None
                          else {"tile_rect": tuple(
                           int(x) for x in args.rect.split("x"))}))

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
    def probe(fb):
        return fb[0, 0] + fb[height // 2, width // 2] + fb[-1, -1]

    t0 = time.perf_counter()
    fb, zb = render_frame(world, meta, cfg, *frame_args(0))
    np.asarray(probe(fb))
    compile_s = time.perf_counter() - t0

    fargs = [frame_args(k) for k in range(args.frames)]
    for depth in (args.depths or [args.depth]):
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            done = 0
            while done < args.frames:
                batch = fargs[done:done + depth]
                for a in batch:
                    fb, zb = render_frame(world, meta, cfg, *a)
                np.asarray(probe(fb))
                done += len(batch)
            best = min(best, time.perf_counter() - t0)
        fps = args.frames / best
        print(json.dumps({
            "tile": os.environ.get("PWNFPS_PALLAS_TILE", "8192"),
            "fused": args.fuse, "depth": depth,
            "chunk": args.chunk, "blur": not args.noblur,
            "reflect": args.reflect,
            "res": f"{width}x{height}",
            "ms_per_frame": round(1000 * best / args.frames, 2),
            "fps": round(fps, 2), "compile_s": round(compile_s, 1),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
