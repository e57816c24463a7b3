"""Real px-axis sharding (round-2 VERDICT item #3).

Round 2's mesh delivered only cam-way parallelism: the "px" axis was
pure replication (PartitionSpec('cam',) + last_tile_dim_replicate in the
compiled HLO).  The shard_map path (parallel.sharding.shard_trace) fixes
that: the flat ray batch is split over BOTH axes, every device traces
its own slice with local while-loop reductions, and one camera's frame
spans the px axis.  These tests assert the partitioning directly on the
output sharding (bit-identity alone cannot catch replication) and the
bit-equality of the sharded path against the single-device renderer.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from pwnfps_tpu.core.approx import SseTables
from pwnfps_tpu.core.config import RenderConfig
from pwnfps_tpu.core import lcg
from pwnfps_tpu.ops import worlddev as W
from pwnfps_tpu.parallel.sharding import (_render_cams_jit, make_mesh,
                                          render_cameras,
                                          render_frame_sharded,
                                          shard_trace)
from pwnfps_tpu.ops.vec import V3
from pwnfps_tpu.render.camera import camera_vectors, mat4_identity, \
    mat4_roty
from pwnfps_tpu.render.frame import render_frame
from pwnfps_tpu.world.levelc import load_level
from pwnfps_tpu.world.objects import ObjectPool

REF_LEVEL = "/root/reference/level.txt"

needs_mesh = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs the 8-device CPU mesh")


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
def test_shard_trace_output_really_partitioned(setup):
    """The trace output must be sharded P(('cam','px')) across all 8
    devices with disjoint index slices - NOT replicated (the round-2
    failure mode was last_tile_dim_replicate over px)."""
    world, meta, lv = setup
    mesh = make_mesh(2, 4, jax.devices()[:8])
    cfg = RenderConfig(width=64, height=32, parity=False)
    n = 64 * 32 * 4          # 4 cams x one 64x32 frame, flat
    sx, sz = lv.spawn
    rng = np.random.default_rng(2)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    fv = V3(jnp.full(n, sx + 0.5), jnp.full(n, 0.5),
            jnp.full(n, sz + 0.5))
    rv = V3(*(jnp.asarray(d[:, i]) for i in range(3)))
    seeds = jnp.asarray(
        lcg.pixel_seed(np.arange(n, dtype=np.uint32) % 64,
                       np.arange(n, dtype=np.uint32) // 64, 64))
    fb, zb = jax.jit(
        lambda *a: shard_trace(world, meta, cfg, mesh, V3(*a[:3]),
                               V3(*a[3:6]), a[6], np.float32(0.1))
    )(fv.x, fv.y, fv.z, rv.x, rv.y, rv.z, seeds)
    sh = fb.sharding
    assert isinstance(sh, NamedSharding)
    assert sh.spec == P(("cam", "px")), sh.spec
    assert not sh.is_fully_replicated
    shards = fb.addressable_shards
    assert len(shards) == 8
    # disjoint, full-cover slices of n/8 rays each - no replication
    seen = set()
    for s in shards:
        assert s.data.shape == (n // 8,)
        seen.add(s.index[0].start)
    assert len(seen) == 8, "devices hold duplicate slices"


@needs_mesh
def test_mesh_render_matches_single_device(setup):
    """(2,4) mesh multicam render == single-device render, bit-exact
    (fast jnp; CPU mesh)."""
    world, meta, lv = setup
    mesh = make_mesh(2, 4, jax.devices()[:8])
    cfg = RenderConfig(width=64, height=32, parity=False)
    cams = _cams(lv, 4)
    fb_mesh = render_cameras(world, meta, cfg, cams, 0.25, mesh)
    mesh1 = make_mesh(1, 1, jax.devices()[:1])
    fb_one = render_cameras(world, meta, cfg, cams, 0.25, mesh1)
    assert np.array_equal(fb_mesh, fb_one), (
        f"{(fb_mesh != fb_one).sum()} pixels differ")


@needs_mesh
@pytest.mark.parametrize("fact", [(8, 1), (4, 2), (1, 8)])
def test_mesh_factorizations_agree(setup, fact):
    """bench_multicam's shape over mesh factorizations (VERDICT #7):
    every (cam,px) split of 8 devices renders the same frames."""
    world, meta, lv = setup
    n_cam, n_px = fact
    mesh = make_mesh(n_cam, n_px, jax.devices()[:8])
    cfg = RenderConfig(width=64, height=48, parity=False,
                       postproc_blur=0)
    cams = _cams(lv, 8)
    fb = render_cameras(world, meta, cfg, cams, 0.5, mesh)
    mesh24 = make_mesh(2, 4, jax.devices()[:8])
    fb24 = render_cameras(world, meta, cfg, cams, 0.5, mesh24)
    assert np.array_equal(fb, fb24)


@needs_mesh
def test_banded_frame_pad_rows_bitexact(setup):
    """Banded path with a frame height NOT divisible by the band
    quantum (like real 1080p: 1080 rows over 8 devices pads to 1088):
    h=72 pads to 128 over 8 row-shards, so the last devices trace
    mostly dead pad rays and the blur must ignore pad rows (zbuf 1.0
    = zero tap radius).  Must stay bit-equal to the unsharded render."""
    from pwnfps_tpu.parallel.sharding import _band_rows
    world, meta, lv = setup
    mesh = make_mesh(2, 4, jax.devices()[:8])
    cfg = RenderConfig(width=96, height=72, parity=False)
    assert _band_rows(cfg, mesh.size) * mesh.size > 72  # pad rows real
    cam = _cams(lv, 1)[0]
    origin, rayb, rdx, rdy = camera_vectors(cam, 96, 72)
    fb_s, zb_s = render_frame_sharded(world, meta, cfg, origin, rayb,
                                      rdx, rdy, 0.25, mesh)
    fb_u, zb_u = render_frame(world, meta, cfg, jnp.asarray(origin),
                              jnp.asarray(rayb), jnp.asarray(rdx),
                              jnp.asarray(rdy), np.float32(0.25))
    assert np.array_equal(np.asarray(fb_s), np.asarray(fb_u))
    assert np.array_equal(np.asarray(zb_s), np.asarray(zb_u))


@needs_mesh
def test_banded_cams_pad_rows_bitexact(setup):
    """Multicam banded path with pad rows (h=72 over 4 px-shards pads
    to 96): cam x px banded render == single-device render, bit-exact,
    blur on."""
    world, meta, lv = setup
    mesh = make_mesh(2, 4, jax.devices()[:8])
    cfg = RenderConfig(width=96, height=72, parity=False)
    cams = _cams(lv, 4)
    fb_mesh = render_cameras(world, meta, cfg, cams, 0.25, mesh)
    mesh1 = make_mesh(1, 1, jax.devices()[:1])
    fb_one = render_cameras(world, meta, cfg, cams, 0.25, mesh1)
    assert np.array_equal(fb_mesh, fb_one), (
        f"{(fb_mesh != fb_one).sum()} pixels differ")


@needs_mesh
def test_banded_frame_trace_has_no_collectives(setup):
    """The row-banded single-frame path (the default when the frame is
    tall enough, sharding._band_rows) must trace with ZERO cross-device
    collectives when blur is off: every device generates, traces and
    untiles its own contiguous row band locally — the whole point of
    banding over the flat block-major path, whose block-major ->
    row-major relayout costs ~5.4 frame equivalents of all-gathers
    (tools/mesh_collectives.py).  With blur on, the only
    unconditionally-executed collectives are the halo ppermutes."""
    from pwnfps_tpu.parallel.sharding import (_band_rows,
                                              _render_frame_mesh_banded_jit)
    world, meta, lv = setup
    mesh = make_mesh(2, 4, jax.devices()[:8])
    cam = _cams(lv, 1)[0]
    origin, rayb, rdx, rdy = camera_vectors(cam, 96, 64)
    world_d = jax.device_put(world, NamedSharding(mesh, P()))
    for blur, want in ((0, False), (1, True)):
        cfg = RenderConfig(width=96, height=64, parity=False,
                           postproc_blur=blur)
        assert _band_rows(cfg, mesh.size) == 8
        hlo = _render_frame_mesh_banded_jit.lower(
            world_d, meta, cfg, mesh, jnp.asarray(origin),
            jnp.asarray(rayb), jnp.asarray(rdx), jnp.asarray(rdy),
            jnp.float32(0.25)).compile().as_text()
        has_gather = "all-gather" in hlo
        has_permute = "collective-permute" in hlo
        if blur == 0:
            assert not has_gather and not has_permute, (
                "banded blur-off trace must be collective-free")
            assert "all-reduce" not in hlo and "all-to-all" not in hlo
        else:
            assert has_permute, "blur-on must halo-exchange via ppermute"
            # all-gathers may exist only inside the never-taken
            # beyond-reach fallback branch (a called conditional
            # computation), never in the entry computation
            entry = hlo.split("ENTRY")[-1]
            assert "all-gather" not in entry


@needs_mesh
def test_single_frame_spans_mesh(setup):
    """ONE camera split over all 8 devices == the unsharded
    render_frame, bit-exact (the reference's scanline-split analogue,
    screen.h:63-67)."""
    world, meta, lv = setup
    mesh = make_mesh(2, 4, jax.devices()[:8])
    cfg = RenderConfig(width=96, height=64, parity=False)
    cam = _cams(lv, 1)[0]
    origin, rayb, rdx, rdy = camera_vectors(cam, 96, 64)
    fb_s, zb_s = render_frame_sharded(world, meta, cfg, origin, rayb,
                                      rdx, rdy, 0.25, mesh)
    fb_u, zb_u = render_frame(world, meta, cfg, jnp.asarray(origin),
                              jnp.asarray(rayb), jnp.asarray(rdx),
                              jnp.asarray(rdy), np.float32(0.25))
    assert np.array_equal(np.asarray(fb_s), np.asarray(fb_u))
    assert np.array_equal(np.asarray(zb_s), np.asarray(zb_u))
