#!/usr/bin/env python
"""Executed-step sweeps over tile geometry, from per-ray telemetry.

Two questions, answered offline from cfg.profile step counts (no
kernel rebuild):

1. TILE SHAPE: a Mosaic tile is 8192 lanes = some (bh x bw) pixel
   rectangle (today 64x128).  Executed steps = sum over tiles of
   max-lane steps (rounded to step_chunk): a shape whose rectangles
   group step-coherent rays cuts executed work for free.  Scanlines
   are depth-coherent, so wide-short rectangles may beat the square.

2. SUB-TILE LOOPS: the (8,128)-vreg band is the finest granularity a
   split while-loop could exit at.  win_band bounds what such a split
   could save (its extra scalar conds cost ~0.12us each - the lean/
   full experiment - so the bound must be LARGE to pay).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/band_occupancy.py [scene...]
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from tools.occupancy import SCENES  # noqa: E402

SHAPES = [(64, 128), (32, 256), (16, 512), (8, 1024), (128, 64),
          (256, 32)]
BANDS = {"band8": (8, 128), "band32": (32, 128)}


def _rect_ids(h, w, bh, bw):
    """Rectangle id per pixel, [h*w] (block-major grouping)."""
    hp = -(-h // bh) * bh
    wp = -(-w // bw) * bw
    ids = np.arange((hp // bh) * (wp // bw)).reshape(hp // bh, wp // bw)
    per_px = np.repeat(np.repeat(ids, bh, 0), bw, 1)[:h, :w]
    return per_px.reshape(-1)


def _executed(ids, steps, act, lanes, chunk):
    nb = int(ids.max()) + 1
    bmax = np.zeros(nb, np.int64)
    np.maximum.at(bmax, ids[act], steps[act])
    bmax = -(-bmax // chunk) * chunk
    return float((bmax * lanes).sum())


def main(argv):
    import jax.numpy as jnp

    from pwnfps_tpu.core import lcg
    from pwnfps_tpu.core.config import RenderConfig
    from pwnfps_tpu.ops.tracer_core import run_segment, shade_and_bounce
    from pwnfps_tpu.ops.tracer_jnp import make_env
    from pwnfps_tpu.ops.vec import C4, V3
    from pwnfps_tpu.render.camera import camera_vectors, mat4_identity, \
        mat4_roty
    from pwnfps_tpu.render.frame import gen_rays

    names = argv or ["default", "ptrace"]
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

        env = make_env(world, meta, cfg)
        one = jnp.ones_like(ifrom.x)
        active = one > 0.0
        icol = C4(one, one, one, one)
        page = (jnp.full_like(seeds, page0).astype(jnp.int32)
                if meta.n_pages > 1 else None)
        cur_from, cur_ray, seed = ifrom, rays, seeds
        chunk = max(1, cfg.step_chunk)
        groups = {f"{bh}x{bw}": (_rect_ids(h, w, bh, bw), 8192)
                  for bh, bw in SHAPES}
        # sub-tile bands WITHIN the current 64x128 shape
        for bn, (bh, bw) in BANDS.items():
            groups[bn] = (_rect_ids(h, w, bh, bw), bh * bw)
        execd = {g: 0.0 for g in groups}
        needed = 0.0
        for k in range(cfg.n_waves):
            out = run_segment(env, cfg, cur_from, cur_ray, active, page)
            page = out.tpage
            steps = np.asarray(out.tstep).astype(np.int64)
            act = np.asarray(active)
            needed += float(steps[act].sum())
            for g, (ids, lanes) in groups.items():
                execd[g] += _executed(ids, steps, act, lanes, chunk)
            depth_ok = k < cfg.reflect
            base, refl, bounce, mpos, mray, seed = shade_and_bounce(
                out, icol, seed, jnp.float32(0.25), depth_ok, env)
            icol = base
            cur_from, cur_ray = mpos, mray
            active = bounce
        base_e = execd["64x128"]
        r = {g: {"Msteps": round(e / 8192 / 1e3, 1),
                 "occ": round(needed / e, 3),
                 "win_vs_64x128": round(base_e / e, 3)}
             for g, e in sorted(execd.items())}
        res[name] = r
        print(json.dumps({name: r}), flush=True)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks", "results",
        "tile_shape.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
