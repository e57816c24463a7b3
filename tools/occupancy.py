#!/usr/bin/env python
"""Wave-occupancy telemetry (VERDICT r2 item #4): do the stress scenes
leave enough dead lanes per tile to justify inter-wave ray compaction?

For each scene, traces every bounce wave with the jnp backend and
cfg.profile=True (per-ray DDA step count at termination), then groups
lanes into the EXACT tiles the Mosaic kernel would run (block-major
64x128-pixel rectangles, 8192 lanes) and reports, per wave:

  occupancy  = sum(steps_i) / (tile_lanes * tile_max_steps), averaged
               over tiles weighted by tile_max (the work a masked
               fixed-trip tile actually executes vs. what the lanes
               needed)
  compaction_bound = the factor a perfect cross-tile compaction could
               save on stepping (upper bound: sum(tile_max*N)/sum(s_i))

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/occupancy.py
           [default|stress|maze|ptrace ...]
Writes JSON to benchmarks/results/occupancy.json and prints it.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

TILE_LANES = 8192
BH, BW = 64, 128


def _tile_ids(h, w):
    """Pallas tile id per pixel, [h*w], matching frame._tile_rays."""
    hp = -(-h // BH) * BH
    wp = -(-w // BW) * BW
    ids = np.arange((hp // BH) * (wp // BW)).reshape(hp // BH, wp // BW)
    per_px = np.repeat(np.repeat(ids, BH, 0), BW, 1)[:h, :w]
    return per_px.reshape(-1)


def wave_stats(world, meta, cfg, ifrom, rays, seeds, sec, h, w, page0=0):
    import jax
    import jax.numpy as jnp

    from pwnfps_tpu.ops.tracer_core import (run_segment,
                                            shade_and_bounce)
    from pwnfps_tpu.ops.tracer_jnp import make_env
    from pwnfps_tpu.ops.vec import C4

    env = make_env(world, meta, cfg)
    one = jnp.ones_like(ifrom.x)
    active = one > 0.0
    icol = C4(one, one, one, one)
    page = (jnp.full_like(seeds, page0).astype(jnp.int32)
            if meta.n_pages > 1 else None)
    cur_from, cur_ray, seed = ifrom, rays, seeds
    tids = _tile_ids(h, w)
    waves = []
    chunk = max(1, cfg.step_chunk)
    ntiles = int(tids.max()) + 1
    lane_total = np.zeros(h * w, np.int64)   # per-lane steps, all waves
    exec_unfused = 0.0
    for k in range(cfg.n_waves):
        out = run_segment(env, cfg, cur_from, cur_ray, active, page)
        page = out.tpage
        steps = np.asarray(out.tstep).astype(np.int64)
        act = np.asarray(active)
        # dead lanes cost nothing (they are masked from step 0 in their
        # own wave only if the TILE is dead; a live tile steps them)
        live_any = np.zeros(int(tids.max()) + 1, bool)
        np.add.at(live_any, tids[act], True)
        # tile max rounded up to the chunk (the while cond only checks
        # at chunk boundaries)
        tmax = np.zeros(int(tids.max()) + 1, np.int64)
        np.maximum.at(tmax, tids[act], steps[act])
        tmax = -(-tmax // chunk) * chunk
        executed = float((tmax * TILE_LANES)[live_any].sum())
        needed = float(steps[act].sum())
        lane_total[act] += steps[act]
        exec_unfused += executed
        waves.append(dict(
            wave=k,
            live_frac=float(act.mean()),
            steps_p50=float(np.percentile(steps[act], 50)) if act.any()
            else 0.0,
            steps_p99=float(np.percentile(steps[act], 99)) if act.any()
            else 0.0,
            steps_max=int(steps[act].max()) if act.any() else 0,
            occupancy=needed / executed if executed else 1.0,
            live_tiles=int(live_any.sum()),
        ))
        depth_ok = k < cfg.reflect
        base, refl, bounce, mpos, mray, seed = shade_and_bounce(
            out, icol, seed, jnp.float32(sec), depth_ok, env)
        icol = base
        cur_from, cur_ray = mpos, mray
        active = bounce
    # upper bound for a FUSED wave loop (lanes restart their bounce
    # segment the moment they terminate, so a tile executes
    # max_lane(total steps) instead of sum_w max_lane(steps_w))
    tmax_tot = np.zeros(ntiles, np.int64)
    np.maximum.at(tmax_tot, tids, lane_total)
    tmax_tot = -(-tmax_tot // chunk) * chunk
    exec_fused = float((tmax_tot * TILE_LANES)[tmax_tot > 0].sum())
    summary = dict(
        fused_step_bound=round(exec_unfused / exec_fused, 3)
        if exec_fused else 1.0,
        needed_frac_unfused=round(
            float(lane_total.sum()) / exec_unfused, 3)
        if exec_unfused else 1.0,
    )
    return waves, summary


def _scene_default():
    from pwnfps_tpu.world.levelc import load_level
    from benchmarks.configs import _setup
    lv = load_level("/root/reference/level.txt")
    world, meta = _setup(lv, (9.5, 0.3, 5.5))
    return world, meta, lv.spawn, 0, 2, 0.0


def _scene_stress():
    from pwnfps_tpu.world.procgen import make_portal_chain
    from benchmarks.configs import _setup
    lv = make_portal_chain(10)
    world, meta = _setup(lv, None)
    # cam lands at (sx+0.5, 0.5, sz+0.5) = (1.5, 0.5, 1.5), facing +x
    return world, meta, (1.0, 1.0), 0, 2, 1.5707964


def _scene_maze():
    import jax
    import jax.numpy as jnp
    from pwnfps_tpu.core.approx import SseTables
    from pwnfps_tpu.ops import worlddev as W
    from pwnfps_tpu.world.objects import ObjectPool
    from pwnfps_tpu.world.procgen import generate_sector_maze
    words, info = generate_sector_maze(seed=7)
    sp, sx, sz = info["spawn"]
    pool = ObjectPool()
    i = pool.obj_new()
    pool.obj_set_sphere(i, 0.25, 0.5, sx + 0.5, 0.35, sz + 1.2,
                        0.9, 0.6, 0.6)
    world, meta = W.build_world_paged(words, pool.prepare_render(), sp,
                                      SseTables.load())
    return (jax.tree.map(jnp.asarray, world), meta, (sx, sz), sp, 2,
            0.0)


def _scene_ptrace():
    world, meta, spawn, sp, _, look = _scene_default()
    return world, meta, spawn, sp, 6, look


SCENES = {"default": (_scene_default, 1920, 1080),
          "stress": (_scene_stress, 1280, 720),
          "maze": (_scene_maze, 1280, 720),
          "ptrace": (_scene_ptrace, 1920, 1080)}


def main(argv):
    import jax
    import jax.numpy as jnp

    from pwnfps_tpu.core import lcg
    from pwnfps_tpu.core.config import RenderConfig
    from pwnfps_tpu.ops.vec import V3
    from pwnfps_tpu.render.camera import camera_vectors, mat4_identity, \
        mat4_roty
    from pwnfps_tpu.render.frame import gen_rays

    names = argv or list(SCENES)
    res = {}
    for name in names:
        build, w, h = SCENES[name]
        world, meta, (sx, sz), page0, reflect, look = build()
        cfg = RenderConfig(width=w, height=h, parity=False,
                           backend="jnp", profile=True,
                           reflect=reflect, cam_page=page0)
        cam = mat4_identity()
        cam[3, :3] = (sx + 0.5, 0.5, sz + 0.5)
        if look:
            mat4_roty(cam, look)
        origin, rayb, rdx, rdy = camera_vectors(cam, w, h)
        rays = gen_rays(jnp.asarray(rayb), jnp.asarray(rdx),
                        jnp.asarray(rdy), w, h, parity=False)
        n = w * h
        xs = np.arange(w, dtype=np.uint32)
        ys = np.arange(h, dtype=np.uint32)
        seeds = jnp.asarray(
            lcg.pixel_seed(xs[None, :], ys[:, None], w).reshape(-1))
        ifrom = V3(jnp.full(n, origin[0]), jnp.full(n, origin[1]),
                   jnp.full(n, origin[2]))
        waves, summary = wave_stats(world, meta, cfg, ifrom, rays,
                                    seeds, 0.25, h, w, page0)
        res[name] = dict(res=f"{w}x{h}", reflect=reflect, waves=waves,
                         **summary)
        print(json.dumps({name: res[name]}), flush=True)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks", "results",
        "occupancy.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
