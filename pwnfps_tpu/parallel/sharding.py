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


@partial(jax.jit, static_argnames=("meta", "cfg"))
def _render_cams_jit(world, meta: W.WorldMeta, cfg: RenderConfig,
                     cams, seeds, sec):
    """cams: [C,4,4] f32 on device; ray gen + trace fully in-jit."""
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
        v = (rayb[:, i, None, None] + ys_[None, :, None] * rdy[:, i, None, None]
             + xs_[None, None, :] * rdx[:, i, None, None])
        return v.reshape(c * n)

    rays = V3(comp(0), comp(1), comp(2))
    origins = V3(
        jnp.repeat(cams[:, 3, 0], n), jnp.repeat(cams[:, 3, 1], n),
        jnp.repeat(cams[:, 3, 2], n))
    seeds_flat = jnp.broadcast_to(seeds[None], (c, n)).reshape(c * n)
    if cfg.backend == "pallas":
        from ..ops.tracer_pallas import trace_wave_pallas
        col4, dist = trace_wave_pallas(world, meta, cfg, origins, rays,
                                       seeds_flat, sec)
    else:
        col4, dist = trace_wave(world, meta, cfg, origins, rays,
                                seeds_flat, sec)
    return col_ftoint(col4).reshape(c, h, w)


def render_cameras(world, meta: W.WorldMeta, cfg: RenderConfig,
                   cams: np.ndarray, sec: float, mesh: Mesh):
    """Batched multi-camera render, sharded (cam, px) over the mesh.

    cams: [C, 4, 4] float32 camera matrices.  Returns [C, h, w] uint32.
    NB: ray generation runs in-jit (fast mode); the parity-exact serial
    ray accumulation lives in the single-camera path.
    """
    h, w = cfg.height, cfg.width
    xs = np.arange(w, dtype=np.uint32)
    ys = np.arange(h, dtype=np.uint32)
    seed_img = jnp.asarray(
        lcg.pixel_seed(xs[None, :], ys[:, None], w).reshape(-1))
    sh_rep = NamedSharding(mesh, P())
    cams_d = jax.device_put(jnp.asarray(cams, jnp.float32),
                            NamedSharding(mesh, P("cam", None, None)))
    world = jax.device_put(world, sh_rep)
    fb = _render_cams_jit(world, meta, cfg, cams_d, seed_img,
                          np.float32(sec))
    return np.asarray(fb)
