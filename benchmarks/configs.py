#!/usr/bin/env python
"""BASELINE.json benchmark configs, runnable individually or all.

  parity     320x240 default level, scripted path, vs the CPU oracle
  stress     1280x720, portal-chain level, recursive portal depth >= 8
  maze       procedural 1024+-sector portal maze
  multicam   64 agent viewpoints per step (RL-style rollouts)
  ptrace     multi-bounce (reflect=6) 1080p with sample accumulation

Timing is device-compute (3-pixel probe sync): this environment tunnels
the TPU through a relay whose 8MB readback (~60ms) and sync dispatch
(~30ms) would otherwise dominate; production hosts DMA this in <1ms.

Usage: PYTHONPATH=.:$PYTHONPATH python benchmarks/configs.py [names...]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _setup(level, spheres_at=None):
    import jax
    import jax.numpy as jnp

    from pwnfps_tpu.core.approx import SseTables
    from pwnfps_tpu.ops import worlddev as W
    from pwnfps_tpu.world.objects import ObjectPool

    pool = ObjectPool()
    if spheres_at is not None:
        from tests.test_tracer_scalar import OPOS
        for (x, y, z, r, b, g, rr, refl) in OPOS:
            i = pool.obj_new()
            pool.obj_set_sphere(i, r, refl, spheres_at[0] + x,
                                spheres_at[1] + y, spheres_at[2] + z,
                                b, g, rr)
    sph = pool.prepare_render()
    world, meta = W.build_world(level, sph, SseTables.load())
    return jax.tree.map(jnp.asarray, world), meta


def _time_frames(render, n=8, rays_per_frame=None):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def probe(fb):
        return fb[0, 0] + fb[fb.shape[0] // 2, fb.shape[1] // 2]

    fb = render(0)
    np.asarray(probe(fb))
    ts = []
    for k in range(n):
        t0 = time.perf_counter()
        fb = render(k + 1)
        np.asarray(probe(fb))
        ts.append(time.perf_counter() - t0)
    ts = np.array(ts)
    out = dict(ms_mean=float(ts.mean() * 1e3),
               ms_p50=float(np.percentile(ts, 50) * 1e3),
               ms_p99=float(np.percentile(ts, 99) * 1e3),
               fps=float(1.0 / ts.mean()))
    if rays_per_frame is None and hasattr(fb, "shape") and fb.ndim == 2:
        rays_per_frame = int(fb.shape[0]) * int(fb.shape[1])
    if rays_per_frame:
        # primary rays only (bounce waves add up to 3x the traced rays)
        out["mrays_per_sec"] = round(rays_per_frame * out["fps"] / 1e6, 1)
    return out


def _std_render(level, w, h, spheres_at, backend="pallas", reflect=2,
                blur=1, cam_at=None, look=None):
    import jax.numpy as jnp

    from pwnfps_tpu.core.config import RenderConfig
    from pwnfps_tpu.render.camera import (camera_vectors, mat4_identity,
                                          mat4_roty)
    from pwnfps_tpu.render.frame import render_frame

    world, meta = _setup(level, spheres_at)
    cfg = RenderConfig(width=w, height=h, backend=backend,
                       reflect=reflect, postproc_blur=blur)
    cam0 = mat4_identity()
    sx, sz = level.spawn
    cam0[3, :3] = cam_at or (sx + 0.5, 0.5, sz + 0.5)
    if look:
        mat4_roty(cam0, look)

    def render(k):
        cam = cam0.copy()
        mat4_roty(cam, 0.05 * k)
        o, rb, rx, ry = camera_vectors(cam, w, h)
        fb, zb = render_frame(world, meta, cfg, jnp.asarray(o),
                              jnp.asarray(rb), jnp.asarray(rx),
                              jnp.asarray(ry), np.float32(0.016 * k))
        return fb

    return render


def bench_parity():
    """Config #1 is a correctness config: report pixel agreement."""
    from pwnfps_tpu.utils import oracle
    if not oracle.available():
        return {"skipped": "no reference checkout"}
    import jax.numpy as jnp

    from pwnfps_tpu.core.config import RenderConfig
    from pwnfps_tpu.render.camera import camera_vectors, mat4_identity, \
        mat4_roty
    from pwnfps_tpu.render.frame import render_frame
    from pwnfps_tpu.world.levelc import load_level
    from tests.test_tracer_scalar import make_spheres

    lv = load_level("/root/reference/level.txt")
    sph, sph8 = make_spheres()
    world, meta = _setup(lv, (9.5, 0.3, 5.5))
    res = {}
    for backend in ("jnp", "pallas"):
        cfg = RenderConfig(width=320, height=240, parity=True,
                           backend=backend)
        for pinned in (True, False):
            agree, zagree, maxd = [], [], 0
            for k in range(3):
                cam = mat4_identity()
                sx, sz = lv.spawn
                cam[3, :3] = (sx + 0.5, 0.5, sz + 0.5)
                mat4_roty(cam, 0.8 * k)
                sec = 0.4 * k
                o, rb, rx, ry = camera_vectors(cam, 320, 240)
                fb, zb = render_frame(world, meta, cfg, jnp.asarray(o),
                                      jnp.asarray(rb), jnp.asarray(rx),
                                      jnp.asarray(ry), np.float32(sec))
                fb = np.ascontiguousarray(np.asarray(fb))
                zb = np.asarray(zb)
                gold, goldz = oracle.render_frames(
                    "/root/reference/level.txt",
                    [dict(sec=sec, cam=cam, spheres=sph8)], 320, 240,
                    pinned=pinned)
                agree.append(float((fb == gold[0]).mean()))
                zagree.append(float(
                    (zb.view(np.uint32)
                     == np.ascontiguousarray(goldz[0]).view(np.uint32))
                    .mean()))
                a8 = fb.view(np.uint8).astype(np.int16)
                b8 = np.ascontiguousarray(gold[0]).view(np.uint8) \
                    .astype(np.int16)
                maxd = max(maxd, int(np.abs(a8 - b8).max()))
            key = "%s_vs_%s_reference" % (
                backend, "pinned" if pinned else "stock")
            res[key] = {"pixel_agreement": float(np.mean(agree)),
                        "zbuf_bit_agreement": float(np.mean(zagree)),
                        "max_channel_delta": maxd}
    return res


def bench_stress():
    from pwnfps_tpu.world.procgen import make_portal_chain
    lv = make_portal_chain(10)
    # look=+pi/2 faces DOWN the chain (+x); round 2 used -pi/2, which
    # faces the wall at x=1 - that configuration measured a flat wall
    render = _std_render(lv, 1280, 720, None,
                         cam_at=(1.5, 0.5, 1.5), look=1.5707964)
    return _time_frames(render)


def bench_maze():
    """Config #3: 1024 portal-linked sectors (4-page world atlas)."""
    import jax
    import jax.numpy as jnp

    from pwnfps_tpu.core.config import RenderConfig
    from pwnfps_tpu.ops import worlddev as W
    from pwnfps_tpu.render.camera import (camera_vectors, mat4_identity,
                                          mat4_roty)
    from pwnfps_tpu.render.frame import render_frame
    from pwnfps_tpu.world.objects import ObjectPool
    from pwnfps_tpu.world.procgen import generate_sector_maze

    words, info = generate_sector_maze(seed=7)
    sp, sx, sz = info["spawn"]
    pool = ObjectPool()
    i = pool.obj_new()
    pool.obj_set_sphere(i, 0.25, 0.5, sx + 0.5, 0.35, sz + 1.2,
                        0.9, 0.6, 0.6)
    from pwnfps_tpu.core.approx import SseTables
    world, meta = W.build_world_paged(words, pool.prepare_render(), sp,
                                      SseTables.load())
    world = jax.tree.map(jnp.asarray, world)
    w, h = 1280, 720
    # PWNFPS_MAZE_SKIP=0 is an A/B knob: with the skip off, the pallas
    # fetch packs 4 cells/i32 (tracer_pallas._pack4) and the 4-page
    # chunked scan halves - whichever wins on chip is the right maze
    # default (the tight sectors give the skip little to skip).
    cfg = RenderConfig(width=w, height=h, backend="pallas", cam_page=sp,
                       space_skip=os.environ.get(
                           "PWNFPS_MAZE_SKIP", "1") != "0")
    cam0 = mat4_identity()
    cam0[3, :3] = (sx + 0.5, 0.5, sz + 0.5)

    def render(k):
        cam = cam0.copy()
        mat4_roty(cam, 0.05 * k)
        o, rb, rx, ry = camera_vectors(cam, w, h)
        fb, zb = render_frame(world, meta, cfg, jnp.asarray(o),
                              jnp.asarray(rb), jnp.asarray(rx),
                              jnp.asarray(ry), np.float32(0.016 * k))
        return fb

    out = _time_frames(render)
    out["sectors"] = info["sectors"]
    out["pages"] = int(meta.n_pages)
    out["portal_pairs"] = info["portal_pairs"]
    return out


def bench_multicam():
    import jax

    from pwnfps_tpu.core.config import RenderConfig
    from pwnfps_tpu.parallel.sharding import make_mesh, render_cameras
    from pwnfps_tpu.render.camera import mat4_identity, mat4_roty
    from pwnfps_tpu.world.levelc import load_level

    path = "/root/reference/level.txt" if os.path.exists(
        "/root/reference/level.txt") else os.path.join(
        os.path.dirname(__file__), "..", "assets", "levels", "demo.txt")
    lv = load_level(path)
    world, meta = _setup(lv, (9.5, 0.3, 5.5))
    cfg = RenderConfig(width=160, height=120, backend="pallas",
                       postproc_blur=0)
    mesh = make_mesh(1, 1, jax.devices()[:1])
    cams = []
    sx, sz = lv.spawn
    for k in range(64):
        c = mat4_identity()
        c[3, :3] = (sx + 0.5, 0.5, sz + 0.5)
        mat4_roty(c, 0.1 * k)
        cams.append(c)
    cams = np.stack(cams)
    # time device compute with a probe sync; the full [64,120,160]
    # readback costs ~300ms through this environment's relay (~1ms of
    # DMA on a production host) and is reported separately
    import jax.numpy as jnp

    from pwnfps_tpu.core import lcg
    from pwnfps_tpu.parallel.sharding import _render_cams_jit

    xs = np.arange(160, dtype=np.uint32)
    ys = np.arange(120, dtype=np.uint32)
    seeds = jnp.asarray(lcg.pixel_seed(xs[None, :], ys[:, None],
                                       160).reshape(-1))
    camsd = jnp.asarray(cams)

    @jax.jit
    def probe(fb):
        return fb[0, 0, 0] + fb[-1, -1, -1]

    fb, _ = _render_cams_jit(world, meta, cfg, camsd, seeds,
                             np.float32(0.0))
    np.asarray(probe(fb))
    n = 8
    t0 = time.perf_counter()
    for k in range(n):
        fb, _ = _render_cams_jit(world, meta, cfg, camsd, seeds,
                                 np.float32(0.1 * k))
    np.asarray(probe(fb))
    dt = (time.perf_counter() - t0) / n
    t0 = time.perf_counter()
    out = np.asarray(fb)
    readback_ms = (time.perf_counter() - t0) * 1e3
    return dict(cams=64, res="160x120", ms_per_step=dt * 1e3,
                cam_steps_per_sec=64 / dt,
                relay_readback_ms=readback_ms,
                readback_mb=round(out.nbytes / 1e6, 1))


def bench_ptrace():
    """Config #5: multi-bounce (reflect=6) + 4-sample distribution
    path tracing at 1080p."""
    import jax.numpy as jnp

    from pwnfps_tpu.core.config import RenderConfig
    from pwnfps_tpu.render.camera import camera_vectors, mat4_identity, \
        mat4_roty
    from pwnfps_tpu.render.frame import render_accumulated
    from pwnfps_tpu.world.levelc import load_level

    path = "/root/reference/level.txt" if os.path.exists(
        "/root/reference/level.txt") else os.path.join(
        os.path.dirname(__file__), "..", "assets", "levels", "demo.txt")
    lv = load_level(path)
    world, meta = _setup(lv, (9.5, 0.3, 5.5))
    cfg = RenderConfig(width=1920, height=1080, backend="pallas",
                       reflect=6, postproc_blur=1)
    cam0 = mat4_identity()
    sx, sz = lv.spawn
    cam0[3, :3] = (sx + 0.5, 0.5, sz + 0.5)

    def render(k):
        cam = cam0.copy()
        mat4_roty(cam, 0.05 * k)
        o, rb, rx, ry = camera_vectors(cam, 1920, 1080)
        fb, zb = render_accumulated(world, meta, cfg, jnp.asarray(o),
                                    jnp.asarray(rb), jnp.asarray(rx),
                                    jnp.asarray(ry),
                                    np.float32(0.016 * k), samples=4)
        return fb

    out = _time_frames(render, n=3)
    out["samples"] = 4
    out["reflect"] = 6
    return out


ALL = {"parity": bench_parity, "stress": bench_stress,
       "maze": bench_maze, "multicam": bench_multicam,
       "ptrace": bench_ptrace}


def main(argv):
    prefix = None
    if argv and argv[0].startswith("--save="):
        # --save=r3 writes benchmarks/results/r3_<name>.json per config
        prefix = argv[0].split("=", 1)[1]
        argv = argv[1:]
    names = argv or list(ALL)
    out = {}
    for n in names:
        t0 = time.time()
        out[n] = ALL[n]()
        out[n]["wall_s"] = round(time.time() - t0, 1)
        print(json.dumps({n: out[n]}), flush=True)
        if prefix:
            path = os.path.join(os.path.dirname(
                os.path.abspath(__file__)), "results",
                f"{prefix}_{n}.json")
            with open(path, "w") as f:
                json.dump(out[n], f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
