#!/usr/bin/env python
"""Op-class calibration ladder (TPU): price the step body's op classes.

Runs the flagship trace (1080p depth-32 pipeline, blur off) across the
RenderConfig.probe variants - each adds a KNOWN count of extra vector
ops of one class to the step body while rendering bit-identical frames
(tests/test_probe.py) - plus the standing config A/Bs (noskip, nopack)
and a repeated baseline to bound session drift.  The deltas calibrate
the op census's flat plane model into ms/plane per op class, which
decides where round-5 perf work goes (docs/PERFORMANCE.md round 5).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_ladder.py \
           [--out FILE] [--frames N] [--depth N] [--reps N]
Appends one JSON line per variant to --out (and stdout) as results
land, so a killed run keeps its completed stages.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# ladder order: most informative first (compiles are ~minutes each)
VARIANTS = [
    ("base", {}),
    ("pad64", {"probe": "pad64"}),       # +128 f32 planes, 8-way ILP
    ("sel64", {"probe": "sel64"}),       # +64 f32 select planes
    ("fetch2x", {"probe": "fetch2x"}),   # +1 full chunked fetch
    ("fire1", {"probe": "fire1"}),       # fire branch at rate 1.0
    ("bool128", {"probe": "bool128"}),   # +128 i1 mask planes
    ("int128", {"probe": "int128"}),     # same chains, i32 masks
    ("cmp64", {"probe": "cmp64"}),       # 64 cmp + 64 sel pairs
    ("pad64d", {"probe": "pad64d"}),     # same 128 planes, no ILP
    ("noskip", {"space_skip": False}),   # -100ish planes (diff bits ok)
    ("nopack", {"pack_carry": False}),   # +9 carried planes
    ("base2", {}),                       # session drift bound
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/probe_ladder.jsonl")
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--depth", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--only", default=None,
                    help="comma-separated variant subset")
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
    def probe_px(fb):
        return fb[0, 0] + fb[height // 2, width // 2] + fb[-1, -1]

    fargs = [frame_args(k) for k in range(args.frames)]
    only = set(args.only.split(",")) if args.only else None

    for name, kw in VARIANTS:
        if only is not None and name not in only:
            continue
        cfg = RenderConfig(width=width, height=height, parity=False,
                           backend="pallas", postproc_blur=0, **kw)
        t0 = time.perf_counter()
        fb, zb = render_frame(world, meta, cfg, *fargs[0])
        np.asarray(probe_px(fb))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            done = 0
            while done < args.frames:
                for a in fargs[done:done + args.depth]:
                    fb, zb = render_frame(world, meta, cfg, *a)
                np.asarray(probe_px(fb))
                done += args.depth
            best = min(best, time.perf_counter() - t0)
        rec = {"variant": name,
               "ms_per_frame": round(1000 * best / args.frames, 3),
               "compile_s": round(compile_s, 1),
               "frames": args.frames, "depth": args.depth}
        line = json.dumps(rec)
        print(line, flush=True)
        with open(args.out, "a") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
