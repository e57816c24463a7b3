#!/usr/bin/env python
"""Bound the win of between-wave ray RE-BINNING before building it.

The occupancy study (tools/occupancy.py) showed bounce waves idle
43-71% of lane-steps: every lane is live (live_frac 1.0), but a few
long lanes keep each 8192-lane Mosaic tile stepping while the rest
are done.  Inline per-step restart (the fused loop) lost to its
per-death cost; the remaining structural move is to PERMUTE the
bounce rays between waves so lanes with similar step counts share a
tile.  Per-lane trace math is tile-invariant (tile-uniform conds only
gate per-lane-masked values), so any permutation is bit-exact after
scatter-back — the question is only whether a PRACTICAL sort key
(computable from the pre-wave state: bounce origin, ray direction,
parent terminals) recovers enough of the oracle bound to pay for the
kernel split + permutation it requires.

This tool replays recorded per-lane step telemetry through candidate
tile assignments — no kernel changes — and reports executed lane-steps
per strategy:

  spatial   the shipped 64x128-pixel rectangles (baseline)
  oracle    lanes sorted by their actual step count (upper bound)
  cell      morton(bounce-origin cell)               } practical keys,
  octcell   ray-sign octant, then morton(cell)       } available before
  dircell   quantized ray direction, then cell       } the wave runs
  parent    parent wave's step count
  ldircell  parent terminal face, then cell

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/rebin_bound.py
           [default|stress|maze|ptrace ...]
Writes benchmarks/results/rebin_bound.json.
"""

import json
import os
import sys

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")   # replay is CPU-only

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from tools.occupancy import SCENES, TILE_LANES, _tile_ids  # noqa: E402


def record_waves(world, meta, cfg, ifrom, rays, seeds, sec, h, w,
                 page0=0):
    """Trace every wave; return per-wave dicts of numpy arrays:
    steps, act (pre-wave live mask) and the pre-wave predictors."""
    import jax.numpy as jnp

    from pwnfps_tpu.ops.tracer_core import run_segment, shade_and_bounce
    from pwnfps_tpu.ops.tracer_jnp import make_env
    from pwnfps_tpu.ops.vec import C4

    env = make_env(world, meta, cfg)
    one = jnp.ones_like(ifrom.x)
    active = one > 0.0
    icol = C4(one, one, one, one)
    page = (jnp.full_like(seeds, page0).astype(jnp.int32)
            if meta.n_pages > 1 else None)
    cur_from, cur_ray, seed = ifrom, rays, seeds
    parent_steps = np.zeros(h * w, np.int64)
    parent_ldir = np.zeros(h * w, np.int64)
    recs = []
    for k in range(cfg.n_waves):
        rec = dict(
            act=np.asarray(active),
            ox=np.asarray(cur_from.x), oz=np.asarray(cur_from.z),
            rx=np.asarray(cur_ray.x), ry=np.asarray(cur_ray.y),
            rz=np.asarray(cur_ray.z),
            parent_steps=parent_steps.copy(),
            parent_ldir=parent_ldir.copy(),
        )
        out = run_segment(env, cfg, cur_from, cur_ray, active, page)
        page = out.tpage
        rec["steps"] = np.asarray(out.tstep).astype(np.int64)
        recs.append(rec)
        parent_steps = rec["steps"]
        parent_ldir = np.asarray(out.tldir).astype(np.int64)
        depth_ok = k < cfg.reflect
        base, refl, bounce, mpos, mray, seed = shade_and_bounce(
            out, icol, seed, jnp.float32(sec), depth_ok, env)
        icol = base
        cur_from, cur_ray = mpos, mray
        active = bounce
    return recs


def _morton6(cx, cz):
    """Interleave two 6-bit cell coords (z-order over the 64x64 grid)."""
    cx = np.clip(cx, 0, 63).astype(np.int64)
    cz = np.clip(cz, 0, 63).astype(np.int64)
    m = np.zeros_like(cx)
    for b in range(6):
        m |= ((cx >> b) & 1) << (2 * b) | ((cz >> b) & 1) << (2 * b + 1)
    return m


def executed_spatial(steps, act, tids, chunk):
    """Lane-steps of the shipped layout: group by tile id (edge tiles
    are partial; the kernel pads them with 1-step dead rays), exactly
    as tools/occupancy.py counts them."""
    ntiles = int(tids.max()) + 1
    live = np.zeros(ntiles, bool)
    np.add.at(live, tids[act], True)
    tmax = np.zeros(ntiles, np.int64)
    np.maximum.at(tmax, tids[act], steps[act])
    tmax = -(-tmax // chunk) * chunk
    return float((tmax * TILE_LANES)[live].sum())


def executed_steps(steps, act, order, chunk):
    """Lane-steps a masked fixed-trip kernel executes when live lanes
    are assigned to 8192-lane tiles in `order`."""
    s = steps[order]
    a = act[order]
    n = len(s)
    ntiles = -(-n // TILE_LANES)
    pad = ntiles * TILE_LANES - n
    s = np.concatenate([np.where(a, s, 0), np.zeros(pad, np.int64)])
    live = np.concatenate([a, np.zeros(pad, bool)])
    s2 = s.reshape(ntiles, TILE_LANES)
    live2 = live.reshape(ntiles, TILE_LANES)
    tmax = s2.max(axis=1)
    tmax = -(-tmax // chunk) * chunk
    return float((tmax * TILE_LANES)[live2.any(axis=1)].sum())


def eval_scene(name, build, w, h):
    import jax.numpy as jnp

    from pwnfps_tpu.core import lcg
    from pwnfps_tpu.core.config import RenderConfig
    from pwnfps_tpu.ops.vec import V3
    from pwnfps_tpu.render.camera import (camera_vectors, mat4_identity,
                                          mat4_roty)
    from pwnfps_tpu.render.frame import gen_rays

    world, meta, (sx, sz), page0, reflect, look = build()
    cfg = RenderConfig(width=w, height=h, parity=False, backend="jnp",
                       profile=True, reflect=reflect, cam_page=page0)
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
    recs = record_waves(world, meta, cfg, ifrom, rays, seeds, 0.25,
                        h, w, page0)

    chunk = max(1, cfg.step_chunk)
    tids = _tile_ids(h, w)

    def keys_for(rec):
        cx = rec["ox"].astype(np.int64)
        cz = rec["oz"].astype(np.int64)
        mort = _morton6(cx, cz)
        octant = ((rec["rx"] < 0).astype(np.int64)
                  | ((rec["ry"] < 0).astype(np.int64) << 1)
                  | ((rec["rz"] < 0).astype(np.int64) << 2))
        # 4-bit azimuth bucket of the XZ heading (cheap, portable)
        az = np.arctan2(rec["rz"], rec["rx"])
        azq = np.clip(((az + np.pi) * (16 / (2 * np.pi))).astype(
            np.int64), 0, 15)
        return {
            "oracle": rec["steps"],
            "cell": mort,
            "octcell": (octant << 12) | mort,
            "dircell": (azq << 12) | mort,
            "celldir": (mort << 4) | azq,
            "parent": rec["parent_steps"],
            "ldircell": (rec["parent_ldir"] << 12) | mort,
        }

    waves = []
    tot = {"spatial": 0.0}
    for k, rec in enumerate(recs):
        steps, act = rec["steps"], rec["act"]
        row = {"wave": k,
               "spatial": executed_spatial(steps, act, tids, chunk)}
        for kname, key in keys_for(rec).items():
            order = np.argsort(key, kind="stable")
            row[kname] = executed_steps(steps, act, order, chunk)
            tot[kname] = tot.get(kname, 0.0) + row[kname]
        tot["spatial"] += row["spatial"]
        waves.append(row)

    # headline ratios: total stepping win; bounce-only win (waves >= 1,
    # the ones a rebin between waves can actually touch - wave 0 keeps
    # the spatial layout, its key needs no trace output)
    b_spatial = sum(r["spatial"] for r in waves[1:]) or 1.0
    out = {"res": f"{w}x{h}", "reflect": reflect, "chunk": chunk,
           "waves": [{k: (v if isinstance(v, int) else round(v))
                      for k, v in r.items()} for r in waves],
           "total_win": {k: round(tot["spatial"] / v, 3)
                         for k, v in tot.items() if v},
           "bounce_win": {k: round(
               b_spatial / (sum(r[k] for r in waves[1:]) or 1.0), 3)
               for k in tot}}
    return out


def main(argv):
    names = argv or list(SCENES)
    res = {}
    for name in names:
        build, w, h = SCENES[name]
        res[name] = eval_scene(name, build, w, h)
        print(json.dumps({name: res[name]["total_win"],
                          "bounce": res[name]["bounce_win"]}),
              flush=True)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks", "results",
        "rebin_bound.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
