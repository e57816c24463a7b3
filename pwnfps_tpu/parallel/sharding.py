"""Multi-chip scale-out: shard rays/cameras over a device mesh.

The reference's only parallelism is OpenMP fork-join over scanline blocks
(screen.h:63-67).  The TPU-native analogue: the ray batch axis is sharded
over the ICI mesh with jax.sharding - each chip traces its slice of the
pixel (or camera) batch against a replicated world.  XLA inserts the
collectives (the while-loop all-done reduction becomes an AND across
chips; the DoF gather all-gathers the small framebuffer).

Mesh axes:
  cam  - batched viewpoints (RL-style multi-camera rollouts, config #4)
  px   - pixel tiles within a camera
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import RenderConfig
from ..core import lcg
from ..ops import worlddev as W
from ..ops.tracer_jnp import col_ftoint, trace_wave
from ..ops.vec import V3


def make_mesh(n_cam: int, n_px: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) == n_cam * n_px, (n_cam, n_px, len(devices))
    dev = np.asarray(devices).reshape(n_cam, n_px)
    return Mesh(dev, ("cam", "px"))


def _tile_cams(a3, bh, bw, fill):
    """[C,h,w] -> flat block-major per camera (see frame._tile_rays)."""
    C, h, w = a3.shape
    hp = -(-h // bh) * bh
    wp = -(-w // bw) * bw
    a3 = jnp.pad(a3, ((0, 0), (0, hp - h), (0, wp - w)),
                 constant_values=fill)
    return (a3.reshape(C, hp // bh, bh, wp // bw, bw)
            .transpose(0, 1, 3, 2, 4).reshape(-1))


def _untile_cams(a, C, h, w, bh, bw):
    hp = -(-h // bh) * bh
    wp = -(-w // bw) * bw
    return (a.reshape(C, hp // bh, wp // bw, bh, bw)
            .transpose(0, 1, 3, 2, 4).reshape(C, hp, wp)[:, :h, :w])


@partial(jax.jit, static_argnames=("meta", "cfg"))
def _render_cams_jit(world, meta: W.WorldMeta, cfg: RenderConfig,
                     cams, seeds, sec):
    """cams: [C,4,4] f32 on device; ray gen + trace fully in-jit.
    Returns (fb [C,h,w] uint32, zbuf [C,h,w] f32)."""
    h, w = cfg.height, cfg.width
    n = h * w
    c = cams.shape[0]
    # camera_vectors, vectorized over the camera batch (screen.h:42-57)
    xrat = jnp.float32(-1.0)
    yrat = -(jnp.float32(h) / jnp.float32(w))
    xsrat = jnp.float32(2.0) * xrat / jnp.float32(w)
    ysrat = jnp.float32(2.0) * yrat / jnp.float32(h)
    rayb = cams[:, 2, :3] + ((-xrat) * cams[:, 0, :3]
                             + (-yrat) * cams[:, 1, :3])   # [C,3]
    rdx = xsrat * cams[:, 0, :3]
    rdy = ysrat * cams[:, 1, :3]
    ys_ = jnp.arange(h, dtype=jnp.int32).astype(jnp.float32)
    xs_ = jnp.arange(1, w + 1, dtype=jnp.int32).astype(jnp.float32)

    def comp(i):
        return (rayb[:, i, None, None]
                + ys_[None, :, None] * rdy[:, i, None, None]
                + xs_[None, None, :] * rdx[:, i, None, None])  # [C,h,w]

    from ..render.frame import _block_shape
    bh, bw = _block_shape(cfg)
    hp = -(-h // bh) * bh
    wp = -(-w // bw) * bw
    # spatial blocks only when their padding overhead is small; small
    # cameras are already tile-local (one camera ~ 1-3 tiles)
    tile_spatially = (hp * wp) <= 1.15 * (h * w)
    if cfg.backend == "pallas" and tile_spatially:
        from ..ops.tracer_pallas import trace_wave_pallas
        t = lambda a3, fill: _tile_cams(a3, bh, bw, fill)
        exp = lambda v: jnp.broadcast_to(v[:, None, None], (c, h, w))
        rays = V3(t(comp(0), 0.5), t(comp(1), -0.5), t(comp(2), 0.5))
        origins = V3(t(exp(cams[:, 3, 0]), 1.0),
                     t(exp(cams[:, 3, 1]), 0.5),
                     t(exp(cams[:, 3, 2]), 1.0))
        seeds_t = t(jnp.broadcast_to(seeds.reshape(1, h, w), (c, h, w)),
                    1)
        fbf, dist = trace_wave_pallas(world, meta, cfg, origins, rays,
                                      seeds_t, sec,
                                      page0=cfg.cam_page, pack=True)
        fb = _untile_cams(fbf, c, h, w, bh, bw)
        zbuf = _untile_cams(dist, c, h, w, bh, bw)
    elif cfg.backend == "pallas":
        from ..ops.tracer_pallas import trace_wave_pallas
        n3 = (c, h, w)
        rays = V3(*(comp(i).reshape(c * n) for i in range(3)))
        origins = V3(
            jnp.repeat(cams[:, 3, 0], n), jnp.repeat(cams[:, 3, 1], n),
            jnp.repeat(cams[:, 3, 2], n))
        seeds_flat = jnp.broadcast_to(seeds.reshape(1, n),
                                      (c, n)).reshape(c * n)
        fbf, dist = trace_wave_pallas(world, meta, cfg, origins, rays,
                                      seeds_flat, sec,
                                      page0=cfg.cam_page, pack=True)
        fb = fbf.reshape(n3)
        zbuf = dist.reshape(n3)
    else:
        rays = V3(*(comp(i).reshape(c * n) for i in range(3)))
        origins = V3(
            jnp.repeat(cams[:, 3, 0], n), jnp.repeat(cams[:, 3, 1], n),
            jnp.repeat(cams[:, 3, 2], n))
        seeds_flat = jnp.broadcast_to(seeds.reshape(1, n),
                                      (c, n)).reshape(c * n)
        col4, dist = trace_wave(world, meta, cfg, origins, rays,
                                seeds_flat, sec)
        fb = col_ftoint(col4).reshape(c, h, w)
        zbuf = dist.reshape(c, h, w)

    if cfg.postproc_blur:
        # per-camera DoF blur, bit-identical to blurring each frame
        # alone (reference screen.h:69-123 per viewpoint)
        if cfg.backend == "pallas" and h % 8 == 0:
            from ..ops.blur_pallas import dof_blur_auto
            fb = dof_blur_auto(fb.reshape(c * h, w),
                               zbuf.reshape(c * h, w),
                               cfg.postproc_blur,
                               frame_h=h).reshape(c, h, w)
        else:
            from ..ops.blur import dof_blur
            fb = jax.vmap(
                lambda a, b: dof_blur(a, b, cfg.postproc_blur))(fb,
                                                                zbuf)
    return fb, zbuf


def render_cameras(world, meta: W.WorldMeta, cfg: RenderConfig,
                   cams: np.ndarray, sec: float, mesh: Mesh):
    """Batched multi-camera render, sharded (cam, px) over the mesh.

    cams: [C, 4, 4] float32 camera matrices.  Returns [C, h, w] uint32.
    Honours cfg.postproc_blur (per-camera DoF).  Parity mode is
    rejected: its serial ray-offset accumulation only exists on the
    single-camera path (render.frame.gen_rays)."""
    if cfg.parity:
        raise ValueError(
            "render_cameras is fast-mode only; parity-exact frames go "
            "through render.frame.render_frame per camera")
    h, w = cfg.height, cfg.width
    xs = np.arange(w, dtype=np.uint32)
    ys = np.arange(h, dtype=np.uint32)
    seed_img = jnp.asarray(
        lcg.pixel_seed(xs[None, :], ys[:, None], w).reshape(-1))
    sh_rep = NamedSharding(mesh, P())
    cams_d = jax.device_put(jnp.asarray(cams, jnp.float32),
                            NamedSharding(mesh, P("cam", None, None)))
    world = jax.device_put(world, sh_rep)
    fb, _ = _render_cams_jit(world, meta, cfg, cams_d, seed_img,
                             np.float32(sec))
    return np.asarray(fb)
