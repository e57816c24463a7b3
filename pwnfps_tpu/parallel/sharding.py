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
from ..render.camera import camera_vectors
from ..render.frame import gen_rays


def make_mesh(n_cam: int, n_px: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) == n_cam * n_px, (n_cam, n_px, len(devices))
    dev = np.asarray(devices).reshape(n_cam, n_px)
    return Mesh(dev, ("cam", "px"))


@partial(jax.jit, static_argnames=("meta", "cfg"))
def _render_batch(world, meta: W.WorldMeta, cfg: RenderConfig,
                  origins, rays, seeds, sec):
    """origins/rays: V3 of [C, N]; seeds: [C, N] -> fb/z [C, N]."""
    c, n = seeds.shape
    flat = lambda v: V3(v.x.reshape(c * n), v.y.reshape(c * n),
                        v.z.reshape(c * n))
    col4, dist = trace_wave(world, meta, cfg, flat(origins), flat(rays),
                            seeds.reshape(c * n), sec)
    fb = col_ftoint(col4).reshape(c, n)
    return fb, dist.reshape(c, n)


def render_cameras(world, meta: W.WorldMeta, cfg: RenderConfig,
                   cams: np.ndarray, sec: float, mesh: Mesh):
    """Batched multi-camera render, sharded (cam, px) over the mesh.

    cams: [C, 4, 4] float32 camera matrices.  Returns [C, h, w] uint32.
    """
    h, w = cfg.height, cfg.width
    n = h * w
    origins, rays, seeds = [], [], []
    xs = np.arange(w, dtype=np.uint32)
    ys = np.arange(h, dtype=np.uint32)
    seed_img = lcg.pixel_seed(xs[None, :], ys[:, None], w).reshape(-1)
    for cam in cams:
        origin, rayb, rdx, rdy = camera_vectors(cam, w, h)
        r = gen_rays(jnp.asarray(rayb), jnp.asarray(rdx), jnp.asarray(rdy),
                     w, h, cfg.parity)
        rays.append(r)
        origins.append(V3(*(jnp.broadcast_to(jnp.asarray(origin[i]), (n,))
                            for i in range(3))))
        seeds.append(jnp.asarray(seed_img))
    stack = lambda vs: V3(jnp.stack([v.x for v in vs]),
                          jnp.stack([v.y for v in vs]),
                          jnp.stack([v.z for v in vs]))
    origins = stack(origins)
    rays = stack(rays)
    seeds = jnp.stack(seeds)

    sh_batch = NamedSharding(mesh, P("cam", "px"))
    sh_rep = NamedSharding(mesh, P())
    put = lambda v: V3(jax.device_put(v.x, sh_batch),
                       jax.device_put(v.y, sh_batch),
                       jax.device_put(v.z, sh_batch))
    origins = put(origins)
    rays = put(rays)
    seeds = jax.device_put(seeds, sh_batch)
    world = jax.device_put(world, sh_rep)
    fb, dist = _render_batch(world, meta, cfg, origins, rays, seeds,
                             np.float32(sec))
    return np.asarray(fb).reshape(len(cams), h, w)
