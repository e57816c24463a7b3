"""Full-frame differential: jnp renderer (CPU backend) vs the compiled
reference.  Residual diffs come only from transcendental/div/sqrt ULPs
(XLA vs glibc/SSE); geometry, RNG, quantization and blur are exact, so we
require near-total pixel agreement with channel delta <= 1."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pwnfps_tpu.core.approx import SseTables
from pwnfps_tpu.core.config import RenderConfig
from pwnfps_tpu.ops import worlddev as W
from pwnfps_tpu.render.camera import camera_vectors, mat4_identity, \
    mat4_roty
from pwnfps_tpu.render.frame import render_frame
from pwnfps_tpu.utils import oracle
from pwnfps_tpu.world.levelc import load_level

from .test_tracer_scalar import REF_LEVEL, make_spheres

pytestmark = pytest.mark.skipif(not oracle.available(),
                                reason="reference checkout unavailable")

W_, H_ = 96, 64


@pytest.fixture(scope="module")
def setup():
    lv = load_level(REF_LEVEL)
    sph, sph8 = make_spheres()
    world, meta = W.build_world(lv, sph, SseTables.load())
    world = jax.tree.map(jnp.asarray, world)
    return lv, world, meta, sph8


def _run(lv, world, meta, sph8, cam, sec, blur):
    cfg = RenderConfig(width=W_, height=H_, parity=True,
                       postproc_blur=1 if blur else 0)
    origin, rayb, rdx, rdy = camera_vectors(cam, W_, H_)
    fb, zb = render_frame(world, meta, cfg, jnp.asarray(origin),
                          jnp.asarray(rayb), jnp.asarray(rdx),
                          jnp.asarray(rdy), np.float32(sec))
    fb = np.ascontiguousarray(np.asarray(fb))
    zb = np.asarray(zb)
    gold, goldz = oracle.render_frames(
        REF_LEVEL, [dict(sec=sec, cam=cam, spheres=sph8)], W_, H_,
        blur=blur)
    return fb, zb, gold[0], goldz[0]


def _check(fb, gold, min_agree=0.995, max_delta=1):
    agree = (fb == gold).mean()
    a8 = fb.view(np.uint8).astype(np.int16)
    b8 = np.ascontiguousarray(gold).view(np.uint8).astype(np.int16)
    delta = np.abs(a8 - b8).max()
    assert agree >= min_agree, f"pixel agreement {agree:.4%}"
    assert delta <= max_delta, f"max channel delta {delta}"


def test_frame_spawn_with_blur(setup):
    lv, world, meta, sph8 = setup
    cam = mat4_identity()
    sx, sz = lv.spawn
    cam[3, :3] = (sx + 0.5, 0.5, sz + 0.5)
    fb, zb, gold, goldz = _run(lv, world, meta, sph8, cam, 1.25, True)
    _check(fb, gold)


def test_frame_pinned_100_percent(setup):
    """Against the pinned-libm oracle the renderer is fully bit-exact:
    every pixel and every depth bit (BASELINE config #1, achieved).

    NB the 100.0000%% branch is only ENFORCED where the XLA backend
    does not FMA-contract f32 mul+add - i.e. on real TPU
    (PWNFPS_TPU_TESTS=1 runs, benchmarks/configs.py parity, and the
    per-round artifact benchmarks/results/r*_parity.json).  The CPU
    CI backend contracts unconditionally (tests/fputil.py probes it;
    every jaxlib 0.9.0 disable knob is inert), so CI exercises the
    relaxed branch below and a strict-path regression would surface
    only on chip: keep the on-chip parity config in the round loop."""
    import os
    if os.environ.get("PWNFPS_TPU_TESTS"):
        from .fputil import fma_contracts
        assert not fma_contracts(), \
            "PWNFPS_TPU_TESTS=1 requires a non-contracting backend " \
            "(run on TPU) for the strict 100% branch"
    lv, world, meta, sph8 = setup
    cam = mat4_identity()
    sx, sz = lv.spawn
    cam[3, :3] = (sx + 0.5, 0.5, sz + 0.5)
    cfg = RenderConfig(width=W_, height=H_, parity=True, postproc_blur=1)
    origin, rayb, rdx, rdy = camera_vectors(cam, W_, H_)
    fb, zb = render_frame(world, meta, cfg, jnp.asarray(origin),
                          jnp.asarray(rayb), jnp.asarray(rdx),
                          jnp.asarray(rdy), np.float32(1.25))
    fb = np.ascontiguousarray(np.asarray(fb))
    zb = np.asarray(zb)
    gold, goldz = oracle.render_frames(
        REF_LEVEL, [dict(sec=1.25, cam=cam, spheres=sph8)], W_, H_,
        blur=True, pinned=True)
    from .fputil import fma_contracts
    if not fma_contracts():
        np.testing.assert_array_equal(fb, gold[0])
        np.testing.assert_array_equal(zb.view(np.uint32),
                                      np.ascontiguousarray(
                                          goldz[0]).view(np.uint32))
    else:
        # backend fuses mul+add (see tests/fputil.py): low-order float
        # bits shift; quantization absorbs nearly all of it, rare
        # branch-flipped rays may diverge structurally
        agree = (fb == gold[0]).mean()
        d = np.abs(fb.view(np.uint8).astype(np.int16)
                   - np.ascontiguousarray(gold[0]).view(np.uint8)
                   .astype(np.int16))
        assert agree > 0.98 and (d > 1).mean() < 2e-3, \
            (agree, (d > 1).mean())
        rel = np.abs(zb - goldz[0]) / np.maximum(np.abs(goldz[0]), 1e-3)
        assert np.quantile(rel, 0.999) < 1e-3


def test_frame_rotated_no_blur(setup):
    lv, world, meta, sph8 = setup
    cam = mat4_identity()
    sx, sz = lv.spawn
    cam[3, :3] = (sx + 0.5, 0.5, sz + 0.5)
    mat4_roty(cam, 2.2)
    fb, zb, gold, goldz = _run(lv, world, meta, sph8, cam, 7.5, False)
    _check(fb, gold)
    # zbuf: bit-exact wherever no sphere/div ULP is involved; everywhere
    # else within 1e-4 relative
    rel = np.abs(zb - goldz) / np.maximum(np.abs(goldz), 1e-3)
    assert (zb.view(np.uint32) == goldz.view(np.uint32)).mean() > 0.80
    assert rel.max() < 1e-3
