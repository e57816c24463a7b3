"""Pallas halo DoF blur: bit-differential vs the XLA gather path.

Covers both lax.cond branches: shallow depth (halo kernel) and deep
depth (fallback to ops/blur.dof_blur), plus frame edges, non-multiple
widths (w%128, w%4 tail rule) and multi-pass.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pwnfps_tpu.ops.blur import dof_blur
from pwnfps_tpu.ops.blur_pallas import dof_blur_auto


def _frame(h, w, zmax, seed):
    rng = np.random.default_rng(seed)
    fb = rng.integers(0, 2**32, (h, w), dtype=np.uint64).astype(np.uint32)
    z = rng.uniform(1.0, zmax, (h, w)).astype(np.float32)
    # bands of near/far depth so taps cluster and spread
    z[h // 3:h // 2] = 1.01
    z[:, : w // 4] = zmax
    return jnp.asarray(fb), jnp.asarray(z)


def _run(fn, fb, z, passes=1):
    on_tpu = jax.devices()[0].platform != "cpu"
    if on_tpu:
        return np.asarray(fn(fb, z, passes))
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        return np.asarray(fn(fb, z, passes))


@pytest.mark.parametrize("h,w,zmax", [
    (48, 256, 7.0),      # halo branch (fstr=0.096, offsets < 1)
    (240, 320, 8.0),     # reference res, w%128 != 0
    (64, 130, 5.0),      # w%4 == 2 tail rule
    (240, 320, 80.0),    # outer windows + wide rows (fstr*z ~ 38)
    (64, 256, 370.0),    # reach limit (fstr*z ~ 47.2)
    (40, 384, 4000.0),   # deep depth -> XLA fallback branch
])
def test_blur_pallas_bitexact(h, w, zmax):
    fb, z = _frame(h, w, zmax, seed=h * 1000 + w)
    got = _run(dof_blur_auto, fb, z)
    want = np.asarray(jax.jit(dof_blur)(fb, z))
    eq = got == want
    assert eq.all(), (
        f"{(~eq).sum()}/{eq.size} px differ, first at "
        f"{np.argwhere(~eq)[0]}")


@pytest.mark.parametrize("h,w,zmax", [
    (48, 256, 7.0),      # near variant, dyn (dma="all")
    (240, 320, 80.0),    # wide variant, dyn: outer windows fire
    (64, 256, 370.0),    # wide variant, dyn: reach limit
])
def test_blur_pallas_dma_bitexact(h, w, zmax):
    """Explicit-DMA halo fetch (PWNFPS_BLUR_DMA) is bit-identical to
    the BlockSpec-prefetch variants."""
    fb, z = _frame(h, w, zmax, seed=h * 7 + w)
    got = _run(lambda f, d, p: dof_blur_auto(f, d, p, dma="all"), fb, z)
    want = np.asarray(jax.jit(dof_blur)(fb, z))
    eq = got == want
    assert eq.all(), (
        f"{(~eq).sum()}/{eq.size} px differ, first at "
        f"{np.argwhere(~eq)[0]}")


@pytest.mark.parametrize("v2", [True, False])
@pytest.mark.parametrize("h,w,zmax", [
    (48, 256, 7.0),      # near variant: merged single-window scan
    (64, 130, 5.0),      # w%128, w%4 tails: wrapped rolls cross chunks
    (240, 320, 80.0),    # wide variant: outer-pair merge fires
    (64, 256, 370.0),    # wide reach limit
])
def test_blur_pallas_v2_bitexact(h, w, zmax, v2):
    """Both scan generations (PWNFPS_BLUR_V2 merged window keys +
    single-reduction row/col bands, and the v1 two-window scan) are
    bit-identical to the XLA path when forced on either variant.  The
    default (v2=None) is per-variant — near v1, wide v2, the chip
    A/B's winner on each side — and is covered by the unforced tests
    above."""
    fb, z = _frame(h, w, zmax, seed=h * 31 + w)
    got = _run(lambda f, d, p: dof_blur_auto(f, d, p, v2=v2), fb, z)
    want = np.asarray(jax.jit(dof_blur)(fb, z))
    eq = got == want
    assert eq.all(), (
        f"{(~eq).sum()}/{eq.size} px differ, first at "
        f"{np.argwhere(~eq)[0]}")


@pytest.mark.parametrize("h,w,zmax", [
    (16, 256, 5.0),      # nblk=2 < G: every slot formula edge at once
    (48, 256, 7.0),      # near variant
    (64, 130, 5.0),      # w%128, w%4 tails
    (240, 320, 80.0),    # wide variant (ring of 13)
    (64, 256, 370.0),    # wide reach limit
])
def test_blur_pallas_ring_bitexact(h, w, zmax):
    """PWNFPS_BLUR_RING (one fetched block per grid step + persistent
    VMEM ring instead of G halo-group BlockSpecs) is bit-identical to
    the XLA path — same taps and keys, different data movement."""
    fb, z = _frame(h, w, zmax, seed=h * 17 + w)
    got = _run(lambda f, d, p: dof_blur_auto(f, d, p, ring=True), fb, z)
    want = np.asarray(jax.jit(dof_blur)(fb, z))
    eq = got == want
    assert eq.all(), (
        f"{(~eq).sum()}/{eq.size} px differ, first at "
        f"{np.argwhere(~eq)[0]}")


def test_blur_ring_batched_frames_bitexact():
    """Ring mode with stacked camera frames (frame_h < h): the ring
    crosses camera boundaries with no special casing because per-camera
    semantics live in the tap scan, not the fetch."""
    C, h, w = 3, 40, 256
    fb, z = _frame(C * h, w, 6.0, seed=101)
    got = _run(lambda f, d, p: dof_blur_auto(f, d, p, frame_h=h,
                                             ring=True), fb, z)
    for k in range(C):
        want = np.asarray(jax.jit(dof_blur)(fb[k * h:(k + 1) * h],
                                            z[k * h:(k + 1) * h]))
        eq = got[k * h:(k + 1) * h] == want
        assert eq.all(), f"camera {k}: {(~eq).sum()} px differ"


def test_blur_pallas_multipass():
    fb, z = _frame(56, 256, 6.0, seed=3)
    got = _run(dof_blur_auto, fb, z, passes=2)
    want = np.asarray(jax.jit(lambda f, zz: dof_blur(f, zz, 2))(fb, z))
    assert (got == want).all()


def test_blur_batched_frames_bitexact():
    """frame_h < h blurs vertically stacked camera frames exactly as
    per-frame blurs (the multicam path, parallel/sharding.py)."""
    C, h, w = 3, 40, 256
    fb, z = _frame(C * h, w, 6.0, seed=99)
    got = _run(lambda f, d, p: dof_blur_auto(f, d, p, frame_h=h), fb, z)
    for k in range(C):
        want = np.asarray(jax.jit(dof_blur)(fb[k * h:(k + 1) * h],
                                            z[k * h:(k + 1) * h]))
        eq = got[k * h:(k + 1) * h] == want
        assert eq.all(), f"camera {k}: {(~eq).sum()} px differ"
