"""Multi-chip scale-out: shard rays/cameras over a device mesh.

The reference's only parallelism is OpenMP fork-join over scanline blocks
(screen.h:63-67).  The TPU-native analogue: the flat block-major ray
batch is sharded over BOTH mesh axes - cameras over "cam" and each
camera's pixel blocks over "px" - and the trace runs under shard_map,
so every device marches its own ray slice with purely LOCAL while-loop
reductions (no per-step collectives).  One camera's frame therefore
spans n_px chips, the true analogue of the reference splitting one
frame across cores.  The world is replicated (64KB).  After the trace,
the framebuffer is reassembled per camera (XLA inserts the all-gather
over px) for the DoF blur, whose gather taps reach arbitrary rows.

Mesh axes:
  cam  - batched viewpoints (RL-style multi-camera rollouts, config #4)
  px   - pixel blocks within one camera's frame
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


def _trace_flat(meta: W.WorldMeta, cfg: RenderConfig, world,
                fx, fy, fz, rx, ry, rz, seeds, sec):
    """Trace a flat ray batch -> (fb uint32, zbuf f32), both flat.

    Pure on its shard: runs per-device under shard_map, so the DDA
    while-loop's reductions stay device-local (no per-step
    collectives over ICI - each chip early-exits on its own rays,
    mirroring the reference's independent scanline blocks)."""
    ifrom = V3(fx, fy, fz)
    rays = V3(rx, ry, rz)
    if cfg.backend == "pallas":
        from ..ops.tracer_pallas import trace_wave_pallas
        return trace_wave_pallas(world, meta, cfg, ifrom, rays, seeds,
                                 sec, page0=cfg.cam_page, pack=True)
    page = (jnp.full_like(seeds, cfg.cam_page).astype(jnp.int32)
            if meta.n_pages > 1 else None)
    col4, dist = trace_wave(world, meta, cfg, ifrom, rays, seeds, sec,
                            page)
    return col_ftoint(col4), dist


def shard_trace(world, meta: W.WorldMeta, cfg: RenderConfig, mesh: Mesh,
                ifrom: V3, rays: V3, seeds, sec):
    """shard_map the trace over every mesh axis on the flat ray batch.

    ifrom/rays/seeds: flat [N] arrays with N % mesh.size == 0 (pad with
    dead rays first); each device traces N/mesh.size rays.  Returns
    (fb uint32 [N], zbuf [N]) sharded the same way."""
    spec = P(tuple(mesh.axis_names))
    wspec = jax.tree.map(lambda _: P(), world)
    return jax.shard_map(
        partial(_trace_flat, meta, cfg),
        mesh=mesh,
        in_specs=(wspec, spec, spec, spec, spec, spec, spec, spec,
                  P()),
        out_specs=(spec, spec),
    )(world, ifrom.x, ifrom.y, ifrom.z, rays.x, rays.y, rays.z, seeds,
      jnp.asarray(sec, jnp.float32))


def _pad_flat(a, n_to, fill):
    return jnp.pad(a, (0, n_to - a.shape[0]), constant_values=fill)


# dead-ray fill values: origin (1,.5,1) sits inside a wall cell, the
# ray dies on its first step (same convention as frame._tile_rays)
_FILLS = dict(fx=1.0, fy=0.5, fz=1.0, rx=0.5, ry=-0.5, rz=0.5, seed=1)


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


def _dof_blur_mesh(fb, zbuf, cfg: RenderConfig, mesh: Mesh,
                   cam_axes: tuple, row_axes: tuple, band: int = 0,
                   real_h: int = 0):
    """Row-band sharded DoF blur (round-3 VERDICT #5).

    Each device blurs only the frame rows it already owns after a
    halo exchange over ICI (ppermute of <= 48 rows per direction —
    the Pallas halo kernel's static tap reach, blur_pallas.G_WIDE),
    instead of replicating the frame per camera.  This is the sharded
    analogue of the reference blurring scanline rows across OpenMP
    threads (screen.h:77-78): the whole frame scales over the mesh,
    not just the trace.  Frames beyond even the wide kernel's reach
    fall back to the replicated XLA gather, exactly like
    dof_blur_auto's own fallback branch.

    fb, zbuf: [C, h, w] global arrays.  cam_axes/row_axes: mesh axes
    sharding the camera dim and the row dim (row_axes may name every
    mesh axis for a single-camera frame).  Returns blurred fb with
    rows still band-sharded over row_axes — NOT replicated.
    Bit-identical to per-camera blur.dof_blur for every input.

    band (banded-trace callers): use this band height per row shard
    (a BR multiple; fb must arrive already padded to band*nrow rows
    with zbuf=1.0 pad) so the blur shards exactly like the trace's
    bands and NO resharding sits between them; real_h is then the
    camera's true frame height (tap clipping + focal strength)."""
    from ..ops.blur import dof_blur, dof_blur_band
    from ..ops.blur_pallas import BR, G_NEAR, RR

    C, h, w = fb.shape
    passes = cfg.postproc_blur
    nrow = 1
    for a in row_axes:
        nrow *= mesh.shape[a]
    if band:
        assert band % BR == 0 and h == band * nrow and real_h
        hp2 = h
        h = real_h
    else:
        hp2 = -(-h // (BR * nrow)) * (BR * nrow)
    hb = hp2 // nrow
    # halo: K full-band hops cover >= 48 rows (or the whole frame)
    K = 0 if nrow == 1 else min(-(-48 // hb), nrow - 1)
    H = min(48, K * hb)
    cam_spec = cam_axes[0] if cam_axes else None
    row_spec = row_axes if len(row_axes) > 1 else row_axes[0]
    spec = P(cam_spec, row_spec, None)
    row_ax = row_axes if len(row_axes) > 1 else row_axes[0]
    use_pallas = cfg.backend == "pallas"
    fstr = float(np.float32(0.002) * np.float32(float(h)))
    reach = jnp.max(jnp.abs(zbuf - jnp.float32(1.0))) * jnp.float32(fstr)
    near_ok = reach < jnp.float32((G_NEAR // 2) * BR - 0.5)
    wide_ok = reach < jnp.float32(RR - 0.5)

    def exchange(x):
        """[cl, hb, w] own rows -> [cl, hb+2H, w] with neighbour halos
        (zero-filled past the frame edges — never tapped there)."""
        if K == 0:
            return x
        parts = []
        for k in range(K, 0, -1):    # from row-shard d-k (above)
            parts.append(jax.lax.ppermute(
                x, row_ax, [(i, i + k) for i in range(nrow - k)]))
        parts.append(x)
        for k in range(1, K + 1):    # from row-shard d+k (below)
            parts.append(jax.lax.ppermute(
                x, row_ax, [(i + k, i) for i in range(nrow - k)]))
        buf = jnp.concatenate(parts, axis=1)
        return buf[:, K * hb - H:K * hb + hb + H]

    def make_local(wide):
        def local(f_l, zb_l):
            idx = jnp.int32(0)
            for a in row_axes:
                idx = idx * mesh.shape[a] + jax.lax.axis_index(a)
            y0 = idx * hb
            for _ in range(passes):
                fp = exchange(f_l)
                if use_pallas:
                    from ..ops.blur_pallas import dof_blur_band_pallas
                    f_l = dof_blur_band_pallas(fp, zb_l, y0, h, wide)
                else:
                    f_l = jax.vmap(
                        lambda a, b: dof_blur_band(a, b, y0, h))(fp,
                                                                 zb_l)
            return f_l
        return local

    def sharded(wide):
        def run(f):
            if band:
                fp, zp = f, zbuf     # caller pre-padded to band * nrow
            else:
                fp = jnp.pad(f, ((0, 0), (0, hp2 - h), (0, 0)))
                zp = jnp.pad(zbuf, ((0, 0), (0, hp2 - h), (0, 0)),
                             constant_values=1.0)
            out = jax.shard_map(make_local(wide), mesh=mesh,
                                in_specs=(spec, spec),
                                out_specs=spec)(fp, zp)
            return out if band else out[:, :h]
        return run

    def fallback(f):
        # beyond the wide kernel's reach: per-camera replication + the
        # exact XLA gather (what dof_blur_auto's fallback branch does)
        sh_cam = NamedSharding(mesh, P(cam_spec))
        f = jax.lax.with_sharding_constraint(f, sh_cam)
        zz = jax.lax.with_sharding_constraint(zbuf, sh_cam)
        if band:
            # the pad rows must not shape the blur (fstr, tap clip):
            # blur the true frame, re-pad to the band layout
            fr = jax.vmap(
                lambda a, b: dof_blur(a[:h], b[:h], passes))(f, zz)
            f = jnp.concatenate([fr, f[:, h:]], axis=1)
        else:
            f = jax.vmap(lambda a, b: dof_blur(a, b, passes))(f, zz)
        return jax.lax.with_sharding_constraint(
            f, NamedSharding(mesh, spec))

    if use_pallas:
        return jax.lax.cond(
            near_ok, sharded(False),
            lambda f: jax.lax.cond(wide_ok, sharded(True), fallback, f),
            fb)
    return jax.lax.cond(wide_ok, sharded(True), fallback, fb)


@partial(jax.jit, static_argnames=("meta", "cfg", "mesh"))
def _render_cams_mesh_jit(world, meta: W.WorldMeta, cfg: RenderConfig,
                          mesh: Mesh, cams, seeds, sec):
    """Mesh-sharded batched render: cameras over "cam", each camera's
    pixel blocks over "px" (shard_trace).  One camera's rays span n_px
    devices - the analogue of the reference's OpenMP scanline split
    (screen.h:63-67) over ICI instead of cores.

    cams: [C,4,4] f32, C % mesh.shape["cam"] == 0.
    Returns (fb [C,h,w] uint32, zbuf [C,h,w] f32), cam-sharded."""
    h, w = cfg.height, cfg.width
    c = cams.shape[0]
    n_px = mesh.shape["px"]
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

    Rloc = _band_rows(cfg, n_px)
    if Rloc:
        # row-banded 2D layout: cameras over "cam", each camera's rows
        # over "px" as contiguous bands; rays/seeds generated INSIDE
        # shard_map from the per-camera vectors (zero prologue
        # collectives), local trace + local untile + banded blur - no
        # relayout collectives (the flat path below pays ~11.5 frame
        # equivalents of all-gathers per step, tools/mesh_collectives.py)
        hp2 = Rloc * n_px
        spec3 = P("cam", "px", None)

        def local(wd, og_l, sec_l, rb_l, rx_l, ry_l, sd_l):
            # promote cam-only/replicated inputs to vary over every
            # axis, so lax.cond branches inside the tracer agree on
            # varying manual axes
            og_l = jax.lax.pcast(og_l, "px", to="varying")
            rb_l = jax.lax.pcast(rb_l, "px", to="varying")
            rx_l = jax.lax.pcast(rx_l, "px", to="varying")
            ry_l = jax.lax.pcast(ry_l, "px", to="varying")
            sd_l = jax.lax.pcast(sd_l, "cam", to="varying")
            cl = og_l.shape[0]
            ys_l = (jax.lax.axis_index("px") * Rloc
                    + jnp.arange(Rloc, dtype=jnp.int32))
            live = (ys_l < h)[None, :, None]           # [1, Rloc, 1]
            ysf = ys_l.astype(jnp.float32)

            def compl(i, fill):
                v = (rb_l[:, i, None, None]
                     + ysf[None, :, None] * ry_l[:, i, None, None]
                     + xs_[None, None, :] * rx_l[:, i, None, None])
                return jnp.where(live, v,
                                 jnp.float32(fill)).reshape(-1)

            rv = V3(compl(0, _FILLS["rx"]), compl(1, _FILLS["ry"]),
                    compl(2, _FILLS["rz"]))
            # the caller's seed image, band rows only (pad rows filled
            # by the where; was lcg.pixel_seed regenerated here, which
            # silently ignored a custom `seeds` - r4 advisor finding)
            s1 = jnp.where(live[0], sd_l, jnp.uint32(_FILLS["seed"]))
            s_l = jnp.broadcast_to(s1[None], (cl, Rloc, w)).reshape(-1)
            n_l = cl * Rloc * w
            rep = lambda v: jnp.repeat(v, Rloc * w,
                                       total_repeat_length=n_l)
            fv = V3(rep(og_l[:, 0]), rep(og_l[:, 1]), rep(og_l[:, 2]))
            fbl, zbl = _trace_band(wd, meta, cfg, fv, rv, s_l, sec_l,
                                   (cl * Rloc, w))
            return (fbl.reshape(cl, Rloc, w), zbl.reshape(cl, Rloc, w))

        seeds_p = jnp.pad(seeds.reshape(h, w).astype(jnp.uint32),
                          ((0, hp2 - h), (0, 0)),
                          constant_values=_FILLS["seed"])
        wspec = jax.tree.map(lambda _: P(), world)
        fb, zbuf = jax.shard_map(
            local, mesh=mesh,
            in_specs=(wspec, P("cam", None), P(), P("cam", None),
                      P("cam", None), P("cam", None), P("px", None)),
            out_specs=(spec3, spec3),
        )(world, cams[:, 3, :3], jnp.asarray(sec, jnp.float32),
          rayb, rdx, rdy, seeds_p)

        if cfg.postproc_blur:
            rows = jnp.arange(hp2, dtype=jnp.int32)[None, :, None]
            zb1 = jnp.where(rows < h, zbuf, jnp.float32(1.0))
            fb = _dof_blur_mesh(fb, zb1, cfg, mesh, ("cam",), ("px",),
                                band=Rloc, real_h=h)
        return fb[:, :h], zbuf[:, :h]

    if cfg.backend == "pallas":
        from ..render.frame import _block_shape
        bh, bw = _block_shape(cfg)    # keep spatial blocks per device
    else:
        bh, bw = 1, w                 # row-major scanline bands
    hp = -(-h // bh) * bh
    wp = -(-w // bw) * bw
    npad = hp * wp
    blk = bh * bw
    # pad each camera's block count to a px multiple so the flat
    # P(("cam","px")) split never slices a block
    npad2 = -(-npad // (blk * n_px)) * (blk * n_px)

    def t(a3, fill):
        a2 = _tile_cams(a3, bh, bw, fill).reshape(c, npad)
        a2 = jnp.pad(a2, ((0, 0), (0, npad2 - npad)),
                     constant_values=fill)
        return a2.reshape(-1)

    exp = lambda v: jnp.broadcast_to(v[:, None, None], (c, h, w))
    rays = V3(t(comp(0), _FILLS["rx"]), t(comp(1), _FILLS["ry"]),
              t(comp(2), _FILLS["rz"]))
    origins = V3(t(exp(cams[:, 3, 0]), _FILLS["fx"]),
                 t(exp(cams[:, 3, 1]), _FILLS["fy"]),
                 t(exp(cams[:, 3, 2]), _FILLS["fz"]))
    seeds_t = t(jnp.broadcast_to(seeds.reshape(1, h, w), (c, h, w)),
                _FILLS["seed"])
    fbf, zbf = shard_trace(world, meta, cfg, mesh, origins, rays,
                           seeds_t, sec)

    def ut(a):
        # block-major -> row-major relayout: XLA reshards this via
        # full-frame all-gathers (~11.5 frame equivalents over ICI per
        # multicam step at 1080p, tools/mesh_collectives.py).  Pinning
        # the target sharding here was measured WORSE (13.6 frame
        # equivalents: the partitioner adds all-to-alls without
        # dropping the gathers); the structural fix - 8-row tile
        # rectangles so each device's tiles untile locally into its
        # own blur band - is a trace-tile-shape change, left measured
        # but unbuilt (docs/PERFORMANCE.md round 4).
        return _untile_cams(a.reshape(c, npad2)[:, :npad].reshape(-1),
                            c, h, w, bh, bw)

    fb, zbuf = ut(fbf), ut(zbf)
    if cfg.postproc_blur:
        # row-band sharded DoF per camera: each (cam, px) device blurs
        # its own rows after a +-48-row halo ppermute over px — no
        # full-frame replication (see _dof_blur_mesh)
        fb = _dof_blur_mesh(fb, zbuf, cfg, mesh, ("cam",), ("px",))
    return fb, zbuf


@partial(jax.jit, static_argnames=("meta", "cfg", "mesh"))
def _render_frame_mesh_jit(world, meta: W.WorldMeta, cfg: RenderConfig,
                           mesh: Mesh, origin, rayb, rdx, rdy, sec):
    """ONE camera's frame sharded over every device of the mesh: the
    flat block-major ray batch is split across all mesh axes
    (shard_trace), so a single frame uses every chip - the direct
    analogue of /root/reference/screen.h:63-67.  Fast mode only.
    Returns (fb [h,w] uint32, zbuf [h,w] f32)."""
    from ..render.frame import _block_shape, _tile_rays, _untile, \
        gen_rays
    h, w = cfg.height, cfg.width
    n = h * w
    nd = mesh.size
    rays = gen_rays(rayb, rdx, rdy, w, h, parity=False)
    xs = jnp.arange(w, dtype=jnp.uint32)
    ys = jnp.arange(h, dtype=jnp.uint32)
    seeds = lcg.pixel_seed(xs[None, :], ys[:, None], w).reshape(-1)
    ifrom = V3(jnp.broadcast_to(origin[0], (n,)),
               jnp.broadcast_to(origin[1], (n,)),
               jnp.broadcast_to(origin[2], (n,)))
    if cfg.backend == "pallas":
        bh, bw = _block_shape(cfg)
    else:
        bh, bw = 1, w
    blk = bh * bw
    hp = -(-h // bh) * bh
    wp = -(-w // bw) * bw
    npad = hp * wp
    npad2 = -(-npad // (blk * nd)) * (blk * nd)

    def t(a, fill):
        return _pad_flat(_tile_rays(a, h, w, bh, bw, fill), npad2, fill)

    rays_t = V3(t(rays.x, _FILLS["rx"]), t(rays.y, _FILLS["ry"]),
                t(rays.z, _FILLS["rz"]))
    ifrom_t = V3(t(ifrom.x, _FILLS["fx"]), t(ifrom.y, _FILLS["fy"]),
                 t(ifrom.z, _FILLS["fz"]))
    seeds_t = t(seeds, _FILLS["seed"])
    fbf, zbf = shard_trace(world, meta, cfg, mesh, ifrom_t, rays_t,
                           seeds_t, sec)

    def ut(a):
        # see _render_cams_mesh_jit.ut on the relayout's collective
        # cost (this path: ~5.4 frame equivalents per frame)
        return _untile(a[:npad], h, w, bh, bw)

    fb, zbuf = ut(fbf), ut(zbf)
    if cfg.postproc_blur:
        # row-band sharded DoF over EVERY device of the mesh: the one
        # frame's rows split across (cam, px) jointly, halo-exchanged
        # — the blur scales with the trace (see _dof_blur_mesh)
        fb = _dof_blur_mesh(fb[None], zbuf[None], cfg, mesh, (),
                            tuple(mesh.axis_names))[0]
    return fb, zbuf


def _band_rows(cfg: RenderConfig, n_bands: int) -> int:
    """Rows per row-shard of the banded mesh path, or 0 if the frame
    does not band (too short, parity, or a non-default tile
    rectangle).  pallas: a band is a whole number of (64, 128)
    block-rows so each device's 2D-layout trace tiles land inside its
    own band; jnp: any blur-band (8-row) multiple (the flat trace is
    layout-free)."""
    if cfg.parity or not cfg.mesh_bands or n_bands < 1:
        return 0
    if cfg.backend == "pallas":
        from ..ops.tracer_pallas import TILE
        BH = TILE // 128
        if cfg.tile_rect is not None and cfg.tile_rect != (BH, 128):
            return 0
    else:
        BH = 8
    h = cfg.height
    if h // BH < n_bands:       # fewer live block-rows than shards
        return 0
    return -(-h // (BH * n_bands)) * BH


def _trace_band(wd, meta: W.WorldMeta, cfg: RenderConfig, fv: V3,
                rv: V3, seeds, sec, hw):
    """Per-device band trace -> (fb [*hw] uint32, zbuf [*hw] f32).
    pallas: 2D frame-layout kernel I/O (no relayouts); jnp: the flat
    elementwise trace reshaped (layout-free)."""
    if cfg.backend == "pallas":
        from ..ops.tracer_pallas import trace_wave_pallas
        return trace_wave_pallas(wd, meta, cfg, fv, rv, seeds, sec,
                                 page0=cfg.cam_page, pack=True,
                                 frame_hw=hw)
    page = (jnp.full_like(seeds, cfg.cam_page).astype(jnp.int32)
            if meta.n_pages > 1 else None)
    col4, dist = trace_wave(wd, meta, cfg, fv, rv, seeds, sec, page)
    return col_ftoint(col4).reshape(hw), dist.reshape(hw)


@partial(jax.jit, static_argnames=("meta", "cfg", "mesh"))
def _render_frame_mesh_banded_jit(world, meta: W.WorldMeta,
                                  cfg: RenderConfig, mesh: Mesh,
                                  origin, rayb, rdx, rdy, sec):
    """ONE camera's frame sharded over the mesh as CONTIGUOUS ROW
    BANDS, traced in 2D frame layout (tracer_pallas frame_hw): every
    device traces, untiles and DoF-blurs its own rows, so the only
    collectives in the whole frame are the blur's +-48-row halo
    ppermutes - no block-major->row-major relayout all-gathers (the
    ~5.4 frame equivalents the flat path pays,
    tools/mesh_collectives.py).  The banding trades that for trace
    imbalance bounded by ceil(blocks/devices)/(blocks/devices) (the
    pad bands die in one step).  Direct analogue of
    /root/reference/screen.h:63-67,77-78 where BOTH the trace rows and
    the blur rows split across OpenMP threads.

    Returns (fb [hp2, w] uint32, zbuf [hp2, w] f32), band-sharded over
    every mesh axis; rows >= cfg.height are pad."""
    h, w = cfg.height, cfg.width
    nd = mesh.size
    axes = tuple(mesh.axis_names)
    Rloc = _band_rows(cfg, nd)
    hp2 = Rloc * nd
    spec = P(axes if len(axes) > 1 else axes[0], None)

    # rays/seeds are generated INSIDE shard_map from the 4 camera
    # vectors: each device builds exactly its own band's pixels from
    # scalars, so the blur-off path compiles to ZERO collectives (a
    # globally-materialized+pad+reshard prologue cost ~0.5 frame
    # equivalents of boundary ppermutes; tools/mesh_collectives.py,
    # pinned by test_banded_frame_trace_has_no_collectives).  Pad rows
    # (band rows >= h) get the dead-ray fills.
    xs = jnp.arange(1, w + 1, dtype=jnp.int32).astype(jnp.float32)
    xs_u = jnp.arange(w, dtype=jnp.uint32)

    def local(wd, og, sec_l, rb, rx, ry):
        og = jax.lax.pcast(og, axes, to="varying")
        rb = jax.lax.pcast(rb, axes, to="varying")
        rx = jax.lax.pcast(rx, axes, to="varying")
        ry = jax.lax.pcast(ry, axes, to="varying")
        idx = jnp.int32(0)
        for a in axes:
            idx = idx * mesh.shape[a] + jax.lax.axis_index(a)
        ys_l = idx * Rloc + jnp.arange(Rloc, dtype=jnp.int32)
        live = (ys_l < h)[:, None]                       # [Rloc, 1]
        ysf = ys_l.astype(jnp.float32)

        def comp(i, fill):
            v = (rb[i] + ysf[:, None] * ry[i]) + xs[None, :] * rx[i]
            return jnp.where(live, v, jnp.float32(fill)).reshape(-1)

        rv = V3(comp(0, _FILLS["rx"]), comp(1, _FILLS["ry"]),
                comp(2, _FILLS["rz"]))
        s2 = jnp.where(live,
                       lcg.pixel_seed(xs_u[None, :],
                                      ys_l.astype(jnp.uint32)[:, None],
                                      w),
                       jnp.uint32(_FILLS["seed"])).reshape(-1)
        n_l = Rloc * w
        fv = V3(jnp.full((n_l,), og[0]), jnp.full((n_l,), og[1]),
                jnp.full((n_l,), og[2]))
        return _trace_band(wd, meta, cfg, fv, rv, s2, sec_l, (Rloc, w))

    wspec = jax.tree.map(lambda _: P(), world)
    og = jnp.asarray(origin, jnp.float32)
    fb, zbuf = jax.shard_map(
        local, mesh=mesh,
        in_specs=(wspec, P(), P(), P(), P(), P()),
        out_specs=(spec, spec),
    )(world, og, jnp.asarray(sec, jnp.float32),
      jnp.asarray(rayb, jnp.float32), jnp.asarray(rdx, jnp.float32),
      jnp.asarray(rdy, jnp.float32))

    if cfg.postproc_blur:
        # pad rows must not source blur taps (nor widen the per-frame
        # reach that picks the kernel variant): zbuf 1.0 = radius 0,
        # exactly like _dof_blur_mesh's own padding
        rows = jnp.arange(hp2, dtype=jnp.int32)[:, None]
        zb1 = jnp.where(rows < h, zbuf, jnp.float32(1.0))
        fb = _dof_blur_mesh(fb[None], zb1[None], cfg, mesh, (),
                            axes, band=Rloc, real_h=h)[0]
    return fb, zbuf


def render_frame_sharded(world, meta: W.WorldMeta, cfg: RenderConfig,
                         origin, rayb, rdx, rdy, sec, mesh: Mesh):
    """Single-camera multi-chip render (fast mode).  Row-banded 2D
    layout when the frame is tall enough (_band_rows; no relayout
    collectives), else the flat block-major path
    (_render_frame_mesh_jit)."""
    if cfg.parity:
        raise ValueError(
            "render_frame_sharded is fast-mode only; parity-exact "
            "frames go through render.frame.render_frame")
    world = jax.device_put(world, NamedSharding(mesh, P()))
    if _band_rows(cfg, mesh.size):
        fb, zbuf = _render_frame_mesh_banded_jit(
            world, meta, cfg, mesh, jnp.asarray(origin),
            jnp.asarray(rayb), jnp.asarray(rdx), jnp.asarray(rdy),
            jnp.float32(sec))
        return fb[:cfg.height], zbuf[:cfg.height]
    return _render_frame_mesh_jit(
        world, meta, cfg, mesh, jnp.asarray(origin), jnp.asarray(rayb),
        jnp.asarray(rdx), jnp.asarray(rdy), jnp.float32(sec))


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
    if mesh.size > 1:
        # real mesh: cam x px sharded trace under shard_map (one
        # camera's frame spans the px axis)
        assert cams.shape[0] % mesh.shape["cam"] == 0, (
            cams.shape, dict(mesh.shape))
        world = jax.device_put(world, sh_rep)
        cams_d = jax.device_put(jnp.asarray(cams, jnp.float32), sh_rep)
        fb, _ = _render_cams_mesh_jit(world, meta, cfg, mesh, cams_d,
                                      seed_img.reshape(h, w),
                                      np.float32(sec))
        return np.asarray(fb)
    cams_d = jax.device_put(jnp.asarray(cams, jnp.float32),
                            NamedSharding(mesh, P("cam", None, None)))
    world = jax.device_put(world, sh_rep)
    fb, _ = _render_cams_jit(world, meta, cfg, cams_d, seed_img,
                             np.float32(sec))
    return np.asarray(fb)
