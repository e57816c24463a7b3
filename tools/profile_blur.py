#!/usr/bin/env python
"""Break down DoF blur cost at 1080p on the real TPU.

Times (device-compute, probe sync):
  trace      render_frame without blur
  full       render_frame with blur
  blur       dof_blur alone on resident fb/zbuf
  idx        index computation only (jump + randfs + clip)
  gather1d   jnp.take flat [4,h,w] from [h*w] (current scheme)
  gather2d   fb[tyi, txi] 2D-index variant
  gather4    four separate [h,w] gathers
  avg        SWAR average chain alone
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from pwnfps_tpu.core import lcg
from pwnfps_tpu.core.config import RenderConfig
from pwnfps_tpu.ops.blur import _avg_epu8, _draw_tables, dof_blur
from pwnfps_tpu.render.camera import camera_vectors, mat4_identity, mat4_roty
from pwnfps_tpu.render.frame import render_frame
from pwnfps_tpu.world.levelc import load_level
from pwnfps_tpu.core.approx import SseTables
from pwnfps_tpu.ops import worlddev as W
from pwnfps_tpu.world.objects import ObjectPool

F32 = jnp.float32
U32 = jnp.uint32
H, WID = 1080, 1920


def timeit(name, fn, *args, n=6):
    probe = jax.jit(lambda t: jax.tree.leaves(t)[0].reshape(-1)[:3])
    r = fn(*args)
    np.asarray(probe(r))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn(*args)
        np.asarray(probe(r))
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts) * 1e3)
    print(f"{name:10s} {ms:8.2f} ms", flush=True)
    return ms


def main():
    pool = ObjectPool()
    from tests.test_tracer_scalar import OPOS
    for (x, y, z, r, b, g, rr, refl) in OPOS:
        i = pool.obj_new()
        pool.obj_set_sphere(i, r, refl, 9.5 + x, 0.3 + y, 5.5 + z, b, g, rr)
    lv = load_level("/root/reference/level.txt")
    world, meta = W.build_world(lv, pool.prepare_render(), SseTables.load())
    world = jax.tree.map(jnp.asarray, world)

    cam = mat4_identity()
    sx, sz = lv.spawn
    cam[3, :3] = (sx + 0.5, 0.5, sz + 0.5)
    mat4_roty(cam, 0.3)
    o, rb, rx, ry = camera_vectors(cam, WID, H)
    o, rb, rx, ry = map(jnp.asarray, (o, rb, rx, ry))
    sec = np.float32(1.0)

    cfg_nb = RenderConfig(width=WID, height=H, backend="pallas",
                          postproc_blur=0)
    cfg_b = RenderConfig(width=WID, height=H, backend="pallas",
                         postproc_blur=1)
    fb, zb = render_frame(world, meta, cfg_nb, o, rb, rx, ry, sec)
    fb, zb = jnp.asarray(fb), jnp.asarray(zb)

    t_tr = timeit("trace", lambda: render_frame(world, meta, cfg_nb, o,
                                                rb, rx, ry, sec))
    t_f = timeit("full", lambda: render_frame(world, meta, cfg_b, o,
                                              rb, rx, ry, sec))
    timeit("blur", jax.jit(dof_blur), fb, zb)

    # -- pieces ---------------------------------------------------------
    (akx, ckx), (aky, cky) = _draw_tables(WID)
    akx, ckx = jnp.asarray(akx), jnp.asarray(ckx)
    aky, cky = jnp.asarray(aky), jnp.asarray(cky)

    def indices(zbuf):
        fstr = F32(0.002) * F32(H)
        s0 = lcg.blur_row_seed(jnp.arange(H, dtype=U32))
        s1, _ = lcg.randi(s0)
        xs = jnp.arange(WID, dtype=jnp.int32)
        xf = xs.astype(F32)
        yf = jnp.arange(H, dtype=jnp.int32).astype(F32)
        z = zbuf - F32(1.0)
        out = []
        for i in range(4):
            stx = lcg.jump(s1[:, None], akx[None, :, i], ckx[None, :, i])
            sty = lcg.jump(s1[:, None], aky[None, :, i], cky[None, :, i])
            rxj = (stx % np.uint32(3759)).astype(F32) * lcg.INV_MOD_F \
                * F32(2.0) - F32(1.0)
            ryj = (sty % np.uint32(3759)).astype(F32) * lcg.INV_MOD_F \
                * F32(2.0) - F32(1.0)
            tx = xf[None, :] + (rxj * fstr) * z
            ty = yf[:, None] + (ryj * fstr) * z
            txi = jnp.clip(tx.astype(jnp.int32), 0, WID - 1)
            tyi = jnp.clip(ty.astype(jnp.int32), 0, H - 1)
            out.append((tyi, txi))
        return out

    idx_pairs = jax.jit(indices)(zb)
    idx_pairs = jax.tree.map(jnp.asarray, idx_pairs)
    flat_idx = jnp.stack([ty * WID + tx for ty, tx in idx_pairs])

    timeit("idx", jax.jit(lambda z: jnp.stack(
        [p[0] + p[1] for p in indices(z)])), zb)

    timeit("gather1d", jax.jit(lambda f, ix: jnp.take(
        f.reshape(-1), ix, mode="clip")), fb, flat_idx)

    def g2d(f, pairs):
        return jnp.stack([f[ty, tx] for ty, tx in pairs])
    timeit("gather2d", jax.jit(g2d), fb, idx_pairs)

    def g4(f, ix):
        t = [jnp.take(f.reshape(-1), ix[i], mode="clip")
             for i in range(4)]
        return _avg_epu8(_avg_epu8(t[0], t[1]), _avg_epu8(t[2], t[3]))
    timeit("gather4", jax.jit(g4), fb, flat_idx)

    taps = jnp.asarray(jnp.take(fb.reshape(-1), flat_idx, mode="clip"))
    timeit("avg", jax.jit(lambda t: _avg_epu8(
        _avg_epu8(t[0], t[1]), _avg_epu8(t[2], t[3]))), taps)

    # dy/dx spread -> locality potential
    ty0, tx0 = (np.asarray(idx_pairs[0][0]), np.asarray(idx_pairs[0][1]))
    dy = ty0 - np.arange(H)[:, None]
    dx = tx0 - np.arange(WID)[None, :]
    print(f"dy: p50={np.percentile(np.abs(dy), 50):.0f} "
          f"p99={np.percentile(np.abs(dy), 99):.0f} "
          f"max={np.abs(dy).max()}")
    print(f"dx: p50={np.percentile(np.abs(dx), 50):.0f} "
          f"p99={np.percentile(np.abs(dx), 99):.0f} "
          f"max={np.abs(dx).max()}")
    print(f"blur-in-frame = {t_f - t_tr:.2f} ms")


if __name__ == "__main__":
    main()
