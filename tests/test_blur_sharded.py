"""Row-band sharded DoF blur (round-3 VERDICT #5).

Round 3's mesh paths ran the DoF blur either replicated per camera
(_render_cams_mesh_jit: all-gather over px, then the slow XLA gather)
or fully replicated (_render_frame_mesh_jit) — with blur on, 8 real
chips would have been slower than one.  _dof_blur_mesh fixes it: each
device blurs only the rows it owns after a <=48-row halo ppermute
(the Pallas halo kernel's static tap reach).  These tests assert

  * the band formulations (XLA and Pallas) are bit-identical to the
    full-frame blur.dof_blur on the rows they own,
  * the mesh render with blur ON stays bit-equal to the single-device
    render, and
  * the blurred output's sharding is NOT fully replicated (the round-3
    failure mode), for both mesh renderers.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from pwnfps_tpu.core.approx import SseTables
from pwnfps_tpu.core.config import RenderConfig
from pwnfps_tpu.ops import worlddev as W
from pwnfps_tpu.ops.blur import dof_blur, dof_blur_band
from pwnfps_tpu.parallel.sharding import (_dof_blur_mesh,
                                          _render_cams_mesh_jit,
                                          make_mesh, render_cameras,
                                          render_frame_sharded)
from pwnfps_tpu.render.camera import camera_vectors, mat4_identity, \
    mat4_roty
from pwnfps_tpu.render.frame import render_frame
from pwnfps_tpu.world.levelc import load_level
from pwnfps_tpu.world.objects import ObjectPool

REF_LEVEL = "/root/reference/level.txt"

needs_mesh = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs the 8-device CPU mesh")


def _frame(h, w, zmax, seed):
    rng = np.random.default_rng(seed)
    fb = rng.integers(0, 2 ** 32, (h, w),
                      dtype=np.uint64).astype(np.uint32)
    z = rng.uniform(1.0, zmax, (h, w)).astype(np.float32)
    z[h // 3:h // 2] = 1.01
    return jnp.asarray(fb), jnp.asarray(z)


def _pad_band(fb, y0, hb, H):
    """Rows [y0-H, y0+hb+H) of fb, zero-filled outside the frame."""
    h, w = fb.shape
    out = np.zeros((hb + 2 * H, w), fb.dtype)
    lo, hi = y0 - H, y0 + hb + H
    slo, shi = max(lo, 0), min(hi, h)
    out[slo - lo:shi - lo] = np.asarray(fb)[slo:shi]
    return jnp.asarray(out)


@pytest.mark.parametrize("h,w,zmax,hb,H", [
    (64, 130, 5.0, 16, 16),     # interior + both frame edges, w%4
    (64, 256, 120.0, 16, 48),   # taps past one band (reach ~ 15)
    (40, 96, 3.0, 8, 8),        # tiny bands
])
def test_dof_blur_band_matches_full(h, w, zmax, hb, H):
    """Band XLA formulation == the same rows of dof_blur, bit-exact,
    for every band position (including frame edges)."""
    fb, z = _frame(h, w, zmax, seed=h + w)
    want = np.asarray(jax.jit(dof_blur)(fb, z))
    for y0 in range(0, h, hb):
        got = np.asarray(jax.jit(
            lambda fp, zb, y0=y0: dof_blur_band(fp, zb, y0, h))(
                _pad_band(fb, y0, hb, H), z[y0:y0 + hb]))
        assert (got == want[y0:y0 + hb]).all(), f"band y0={y0} differs"


@pytest.mark.parametrize("zmax,wide,v2", [
    (4.0, False, False), (120.0, True, False),
    (4.0, False, True), (120.0, True, True),
])
def test_dof_blur_band_pallas_matches_full(zmax, wide, v2):
    """Pallas band kernel (near and wide variants) == the same rows of
    dof_blur, bit-exact, stacked cameras included."""
    from jax.experimental.pallas import tpu as pltpu
    from pwnfps_tpu.ops.blur_pallas import dof_blur_band_pallas
    h, w, hb, H, cl = 48, 256, 16, 48, 2
    frames = [_frame(h, w, zmax, seed=7 + c) for c in range(cl)]
    want = [np.asarray(jax.jit(dof_blur)(fb, z)) for fb, z in frames]
    on_tpu = jax.devices()[0].platform != "cpu"
    for y0 in range(0, h, hb):
        fp = jnp.stack([_pad_band(fb, y0, hb, H) for fb, _ in frames])
        zb = jnp.stack([z[y0:y0 + hb] for _, z in frames])
        fn = lambda: np.asarray(dof_blur_band_pallas(
            fp, zb, jnp.int32(y0), h, wide, v2=v2))
        if on_tpu:
            got = fn()
        else:
            with pltpu.force_tpu_interpret_mode():
                got = fn()
        for c in range(cl):
            assert (got[c] == want[c][y0:y0 + hb]).all(), \
                f"cam {c} band y0={y0} differs"


@pytest.fixture(scope="module")
def setup():
    import os
    path = REF_LEVEL if os.path.exists(REF_LEVEL) else None
    if path is None:
        pytest.skip("reference checkout unavailable")
    lv = load_level(path)
    pool = ObjectPool()
    for k in range(6):
        i = pool.obj_new()
        pool.obj_set_sphere(i, 0.1 + 0.02 * k, 0.4, 9.5 + 0.1 * k,
                            0.35, 5.5 - 0.1 * k, 0.8, 0.7, 0.9)
    sph = pool.prepare_render()
    world, meta = W.build_world(lv, sph, SseTables.load())
    return jax.tree.map(jnp.asarray, world), meta, lv


def _cams(lv, n):
    cam = mat4_identity()
    sx, sz = lv.spawn
    cam[3, :3] = (sx + 0.5, 0.5, sz + 0.5)
    out = []
    for k in range(n):
        c = cam.copy()
        mat4_roty(c, 0.4 * k)
        out.append(c)
    return np.stack(out)


@needs_mesh
@pytest.mark.parametrize("passes", [1, 2])
def test_mesh_blur_matches_single_device(setup, passes):
    """(2,4) mesh multicam render WITH BLUR == single device,
    bit-exact, incl. multi-pass (halo re-exchange between passes)."""
    world, meta, lv = setup
    mesh = make_mesh(2, 4, jax.devices()[:8])
    cfg = RenderConfig(width=64, height=32, parity=False,
                       postproc_blur=passes)
    cams = _cams(lv, 4)
    fb_mesh = render_cameras(world, meta, cfg, cams, 0.25, mesh)
    mesh1 = make_mesh(1, 1, jax.devices()[:1])
    fb_one = render_cameras(world, meta, cfg, cams, 0.25, mesh1)
    assert np.array_equal(fb_mesh, fb_one), (
        f"{(fb_mesh != fb_one).sum()} pixels differ")


@needs_mesh
def test_mesh_blur_output_not_replicated(setup):
    """The blurred multicam output must stay (cam, px)-sharded — the
    round-3 path replicated the frame per camera before the blur."""
    world, meta, lv = setup
    mesh = make_mesh(2, 4, jax.devices()[:8])
    cfg = RenderConfig(width=64, height=64, parity=False)
    cams = jnp.asarray(_cams(lv, 4), jnp.float32)
    seeds = jnp.zeros((64, 64), jnp.uint32) + 1
    world_d = jax.device_put(world, NamedSharding(mesh, P()))
    fb, _ = _render_cams_mesh_jit(world_d, meta, cfg, mesh,
                                  jax.device_put(
                                      cams, NamedSharding(mesh, P())),
                                  seeds, np.float32(0.25))
    sh = fb.sharding
    assert not sh.is_fully_replicated, sh
    # every device holds a disjoint (cam, row) slice — 8 distinct
    # (cam-slice, row-slice) rectangles, not 2 cam groups x4 copies
    rects = {(s.index[0].start, s.index[1].start)
             for s in fb.addressable_shards}
    assert len(rects) == 8, f"devices hold duplicate slices: {rects}"


@needs_mesh
def test_frame_sharded_blur_matches_unsharded(setup):
    """ONE camera over all 8 devices WITH BLUR == render_frame,
    bit-exact; rows of the blurred frame stay sharded."""
    world, meta, lv = setup
    mesh = make_mesh(2, 4, jax.devices()[:8])
    cfg = RenderConfig(width=96, height=64, parity=False,
                       postproc_blur=1)
    cam = _cams(lv, 1)[0]
    origin, rayb, rdx, rdy = camera_vectors(cam, 96, 64)
    fb_s, zb_s = render_frame_sharded(world, meta, cfg, origin, rayb,
                                      rdx, rdy, 0.25, mesh)
    fb_u, zb_u = render_frame(world, meta, cfg, jnp.asarray(origin),
                              jnp.asarray(rayb), jnp.asarray(rdx),
                              jnp.asarray(rdy), np.float32(0.25))
    assert np.array_equal(np.asarray(fb_s), np.asarray(fb_u))
    assert not fb_s.sharding.is_fully_replicated, fb_s.sharding
    starts = {s.index[0].start for s in fb_s.addressable_shards}
    assert len(starts) == 8, f"rows not 8-way banded: {starts}"


@needs_mesh
def test_mesh_blur_fallback_branch(setup):
    """Depth beyond the wide kernel's reach takes the replicated XLA
    fallback and stays bit-exact (the lax.cond's other branch)."""
    world, meta, lv = setup
    mesh = make_mesh(2, 4, jax.devices()[:8])
    cfg = RenderConfig(width=96, height=32, parity=False)
    fb, z = _frame(32, 96, 4000.0, seed=3)   # reach >> 47.5
    fb3, z3 = fb[None], z[None]
    out = jax.jit(
        lambda a, b: _dof_blur_mesh(a, b, cfg, mesh, (),
                                    ("cam", "px")),
        static_argnames=())(fb3, z3)
    want = np.asarray(jax.jit(dof_blur)(fb, z))
    assert np.array_equal(np.asarray(out)[0], want)


@needs_mesh
def test_mesh_blur_nondivisible_rows(setup):
    """h not divisible by 8*nrow (padding + slice path), bit-exact."""
    world, meta, lv = setup
    mesh = make_mesh(2, 4, jax.devices()[:8])
    cfg = RenderConfig(width=64, height=40, parity=False)
    fb, z = _frame(40, 64, 6.0, seed=11)
    out = jax.jit(
        lambda a, b: _dof_blur_mesh(a, b, cfg, mesh, (),
                                    ("cam", "px")))(fb[None], z[None])
    want = np.asarray(jax.jit(dof_blur)(fb, z))
    assert np.array_equal(np.asarray(out)[0], want)
