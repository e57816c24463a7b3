"""Frame renderer: one jitted device call per frame.

The reference's trace_screen_centred (screen.h:31-124) - OpenMP scanline
fan-out, per-pixel seeds, trace, DoF blur - becomes:

  ray gen -> wavefront trace (3 bounce waves) -> quantize -> DoF blur

all inside a single jit.  Parity mode reproduces the reference's serial
ray-offset accumulation per 32-pixel tile (the `rayl += rdx` off-by-one
and its floating-point drift, screen.h:6-24); fast mode generates rays
closed-form.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import lcg
from ..core.config import RenderConfig
from ..ops import worlddev as W
from ..ops.blur import dof_blur
from ..ops.tracer_jnp import col_ftoint, trace_wave
from ..ops.vec import V3

F32 = jnp.float32


def _blur(cfg: RenderConfig, fb, zbuf):
    """DoF blur; the pallas backend uses the VMEM halo kernel, which is
    bit-identical to dof_blur and ~7x faster (ops/blur_pallas.py)."""
    if cfg.backend == "pallas":
        from ..ops.blur_pallas import dof_blur_auto
        return dof_blur_auto(fb, zbuf, cfg.postproc_blur)
    return dof_blur(fb, zbuf, cfg.postproc_blur)


def gen_rays(rayb, rdx, rdy, width: int, height: int, parity: bool) -> V3:
    """Per-pixel ray directions as V3 of [h*w] arrays.

    Pixel (x, y) uses rayb + y*rdy + (x+1)*rdx; in parity mode the x term
    is accumulated serially within each 32-wide tile, replaying the
    reference's float drift (screen.h:12-24)."""
    ys = jnp.arange(height, dtype=jnp.int32).astype(F32)
    if not parity:
        xs = jnp.arange(1, width + 1, dtype=jnp.int32).astype(F32)

        def comp(i):
            v = (rayb[i] + ys[:, None] * rdy[i]) + xs[None, :] * rdx[i]
            return v.reshape(-1)

        return V3(comp(0), comp(1), comp(2))
    tiles = -(-width // 32)
    tx = (jnp.arange(tiles, dtype=jnp.int32) * 32).astype(F32)

    def comp(i):
        base = (rayb[i] + ys[:, None] * rdy[i]) + tx[None, :] * rdx[i]

        def step(carry, _):
            nxt = carry + rdx[i]
            return nxt, nxt

        _, seq = jax.lax.scan(step, base, None, length=32)  # [32,h,tiles]
        v = jnp.transpose(seq, (1, 2, 0)).reshape(height, tiles * 32)
        return v[:, :width].reshape(-1)

    return V3(comp(0), comp(1), comp(2))


def _block_shape(cfg: RenderConfig):
    """Pixel-rectangle shape of one Mosaic tile.

    The kernel consumes a FLAT 8192-lane batch per tile; the rectangle
    only decides WHICH pixels share a tile (spatial coherence of the
    tile-uniform event/sphere gates).  Default: (64, 128).
    cfg.tile_rect overrides (fast mode) - e.g. (8, 1024) makes each
    device's tiles whole 8-row bands, the shape that would let the
    mesh paths untile locally (docs/PERFORMANCE.md round 4)."""
    from ..ops.tracer_pallas import PARITY_TILE, TILE
    n = PARITY_TILE if cfg.parity else TILE
    if cfg.tile_rect is not None and not cfg.parity:
        bh, bw = cfg.tile_rect
        if bh * bw != n:
            raise ValueError(f"tile_rect {cfg.tile_rect} must cover "
                             f"{n} pixels")
        return (bh, bw)
    return (n // 128, 128)


def _tile_rays(a, h, w, bh, bw, fill):
    """[h*w] row-major -> block-major over (bh x bw) pixel rectangles.

    Each Mosaic tile then traces a compact screen rectangle instead of
    4+ full image rows: the tile-uniform sphere/portal conds fire only
    in tiles whose rectangle actually sees those cells, and the per-tile
    early exit tracks the LOCAL step count, not the frame-global max."""
    hp = -(-h // bh) * bh
    wp = -(-w // bw) * bw
    a2 = jnp.pad(a.reshape(h, w), ((0, hp - h), (0, wp - w)),
                 constant_values=fill)
    return (a2.reshape(hp // bh, bh, wp // bw, bw)
            .transpose(0, 2, 1, 3).reshape(-1))


def _untile(a, h, w, bh, bw):
    hp = -(-h // bh) * bh
    wp = -(-w // bw) * bw
    return (a.reshape(hp // bh, wp // bw, bh, bw)
            .transpose(0, 2, 1, 3).reshape(hp, wp)[:h, :w])


def _trace_cols(world, meta, cfg, ifrom, rays, seeds, sec, h, w):
    """Backend dispatch; returns (col4 of [h,w] f32 planes, [h,w] zbuf)."""
    from ..ops.vec import C4
    if cfg.backend == "pallas":
        from ..ops.tracer_pallas import trace_wave_pallas
        bh, bw = _block_shape(cfg)
        if cfg.trace_2d and bw == 128 and not cfg.parity:
            col4, dist = trace_wave_pallas(world, meta, cfg, ifrom,
                                           rays, seeds, sec,
                                           page0=cfg.cam_page,
                                           frame_hw=(h, w))
            return C4(*col4), dist
        # pad rays sit at (1,.5,1) - inside a wall cell, dead in 1 step
        t = lambda a, fill: _tile_rays(a, h, w, bh, bw, fill)
        ifrom_t = V3(t(ifrom.x, 1.0), t(ifrom.y, 0.5), t(ifrom.z, 1.0))
        rays_t = V3(t(rays.x, 0.5), t(rays.y, -0.5), t(rays.z, 0.5))
        col4, dist = trace_wave_pallas(world, meta, cfg, ifrom_t, rays_t,
                                       t(seeds, 1), sec,
                                       page0=cfg.cam_page)
        return (C4(*(_untile(c, h, w, bh, bw) for c in col4)),
                _untile(dist, h, w, bh, bw))
    page = (jnp.full_like(seeds, cfg.cam_page).astype(jnp.int32)
            if meta.n_pages > 1 else None)
    col4, dist = trace_wave(world, meta, cfg, ifrom, rays, seeds, sec,
                            page)
    return (C4(*(c.reshape(h, w) for c in col4)), dist.reshape(h, w))


def _trace(world, meta, cfg, ifrom, rays, seeds, sec, h, w):
    """Backend dispatch; returns ([h,w] uint32 fb pre-blur, [h,w] zbuf)."""
    if cfg.backend == "pallas":
        # quantize in-kernel: same bits as col_ftoint, fewer HBM writes
        from ..ops.tracer_pallas import trace_wave_pallas
        bh, bw = _block_shape(cfg)
        if cfg.trace_2d and bw == 128 and not cfg.parity:
            # default rect: the kernel's 2D BlockSpecs address the
            # pixel rectangles directly - no tile/untile relayouts
            return trace_wave_pallas(world, meta, cfg, ifrom, rays,
                                     seeds, sec, page0=cfg.cam_page,
                                     pack=True, frame_hw=(h, w))
        t = lambda a, fill: _tile_rays(a, h, w, bh, bw, fill)
        ifrom_t = V3(t(ifrom.x, 1.0), t(ifrom.y, 0.5), t(ifrom.z, 1.0))
        rays_t = V3(t(rays.x, 0.5), t(rays.y, -0.5), t(rays.z, 0.5))
        fb, dist = trace_wave_pallas(world, meta, cfg, ifrom_t, rays_t,
                                     t(seeds, 1), sec,
                                     page0=cfg.cam_page, pack=True)
        return (_untile(fb, h, w, bh, bw), _untile(dist, h, w, bh, bw))
    col4, dist = _trace_cols(world, meta, cfg, ifrom, rays, seeds, sec,
                             h, w)
    return col_ftoint(col4), dist


@partial(jax.jit, static_argnames=("meta", "cfg"))
def render_frame(world: W.WorldDev, meta: W.WorldMeta, cfg: RenderConfig,
                 origin, rayb, rdx, rdy, sec):
    """-> (framebuffer [h,w] uint32 BGRA, zbuf [h,w] f32)."""
    h, w = cfg.height, cfg.width
    rays = gen_rays(rayb, rdx, rdy, w, h, cfg.parity)
    n = h * w
    xs = jnp.arange(w, dtype=jnp.uint32)
    ys = jnp.arange(h, dtype=jnp.uint32)
    seeds = lcg.pixel_seed(xs[None, :], ys[:, None], w).reshape(-1)
    ifrom = V3(jnp.broadcast_to(origin[0], (n,)),
               jnp.broadcast_to(origin[1], (n,)),
               jnp.broadcast_to(origin[2], (n,)))
    fb, zbuf = _trace(world, meta, cfg, ifrom, rays, seeds, sec, h, w)
    if cfg.postproc_blur:
        fb = _blur(cfg, fb, zbuf)
    return fb, zbuf


@partial(jax.jit, static_argnames=("meta", "cfg", "samples"))
def render_accumulated(world: W.WorldDev, meta: W.WorldMeta,
                       cfg: RenderConfig, origin, rayb, rdx, rdy, sec,
                       samples: int = 4):
    """Distribution path tracing (BASELINE config #5): average `samples`
    renders whose stochastic parts (reflect blur, DoF jitter) are
    decorrelated by a Weyl increment on the per-pixel seed stream.
    Use with cfg.reflect > 2 for deep multi-bounce transport.

    All samples trace in ONE device call with the primary wave shared
    (it consumes no RNG - see trace_wave_env); the mean reproduces the
    old per-sample-call accumulation's float ops in order.

    Returns (fb uint32 [h,w] of the averaged image, zbuf of sample 0).
    """
    import dataclasses

    h, w = cfg.height, cfg.width
    cfg = dataclasses.replace(cfg, samples=samples)
    rays = gen_rays(rayb, rdx, rdy, w, h, cfg.parity)
    n = h * w
    xs = jnp.arange(w, dtype=jnp.uint32)
    ys = jnp.arange(h, dtype=jnp.uint32)
    seeds = lcg.pixel_seed(xs[None, :], ys[:, None], w).reshape(-1)
    ifrom = V3(jnp.broadcast_to(origin[0], (n,)),
               jnp.broadcast_to(origin[1], (n,)),
               jnp.broadcast_to(origin[2], (n,)))
    mean, zbuf0 = _trace_cols(world, meta, cfg, ifrom, rays, seeds,
                              sec, h, w)
    fb = col_ftoint(mean)
    if cfg.postproc_blur:
        fb = _blur(cfg, fb, zbuf0)
    return fb, zbuf0


def upscale(fb: np.ndarray, scale: int) -> np.ndarray:
    """Nearest-neighbour integer upscale (screen.h:126-149), host-side."""
    return np.repeat(np.repeat(fb, scale, axis=0), scale, axis=1)


def fb_to_rgb(fb: np.ndarray) -> np.ndarray:
    """uint32 BGRA framebuffer -> [h,w,3] uint8 RGB for export."""
    px = np.ascontiguousarray(fb).view(np.uint8).reshape(*fb.shape, 4)
    return px[..., [2, 1, 0]]
