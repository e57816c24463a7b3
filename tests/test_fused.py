"""Fused wave loop (tracer_core.run_fused) vs the per-wave structure.

The fused loop is the direct wavefront form of the reference's bounded
recursion (trace.h:86-105): a terminated lane shades and restarts its
bounce segment inside the same DDA loop.  It is OFF by default - the
per-death shade/restart block measured slower than the wave barrier on
every BASELINE scene (see core/config.py and docs/PERFORMANCE.md) -
but it is the committed, measured test of the north star's "ray
compaction between bounces", so these tests keep it correct:

  * geometry (zbuf/dist) bit-identical to the unfused loop,
  * colours equal to ~1 ULP (the forward-affine unwind blend
    associates reflectance products differently), identical after
    8-bit quantization for virtually every pixel,
  * jnp and pallas backends bit-identical to EACH OTHER when fused.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pwnfps_tpu.core.approx import SseTables
from pwnfps_tpu.core.config import RenderConfig
from pwnfps_tpu.ops import worlddev as W
from pwnfps_tpu.ops.tracer_core import col_ftoint
from pwnfps_tpu.ops.tracer_jnp import trace_wave
from pwnfps_tpu.ops.vec import C4
from pwnfps_tpu.world.levelc import compile_level
from pwnfps_tpu.world.objects import ObjectPool

from .test_space_skip import FUZZ_LEVEL, FUZZ_SPHERES, _fuzz_rays


@pytest.fixture(scope="module")
def setup():
    lv = compile_level(FUZZ_LEVEL)
    pool = ObjectPool()
    for (x, y, z, r) in FUZZ_SPHERES:
        i = pool.obj_new()
        pool.obj_set_sphere(i, r, 0.4, x, y, z, 0.8, 0.7, 0.9)
    sph = pool.prepare_render()
    world, meta = W.build_world(lv, sph, SseTables.load())
    return jax.tree.map(jnp.asarray, world), meta


def _run(world, meta, fused, fv, rv, seeds, reflect=2):
    cfg = RenderConfig(parity=False, maxsteps=200, fused=fused,
                       reflect=reflect)
    col, dist = trace_wave(world, meta, cfg, fv, rv, seeds,
                           np.float32(0.7))
    return (np.stack([np.asarray(c) for c in col], 1),
            np.asarray(dist), col)


@pytest.mark.parametrize("reflect", [2, 4])
def test_fused_matches_unfused(setup, reflect):
    world, meta = setup
    fv, rv = _fuzz_rays(n=512, seed0=3)
    seeds = jnp.asarray(np.random.default_rng(1)
                        .integers(0, 2**31, 512).astype(np.uint32))
    cf, df, colf = _run(world, meta, True, fv, rv, seeds, reflect)
    cu, du, colu = _run(world, meta, False, fv, rv, seeds, reflect)
    # geometry identical
    assert np.array_equal(df.view(np.uint32), du.view(np.uint32))
    # colours to ~1 ULP; quantized output near-identical
    np.testing.assert_allclose(cf, cu, rtol=3e-6, atol=3e-6)
    qf = np.asarray(col_ftoint(C4(*[jnp.asarray(cf[:, i])
                                    for i in range(4)])))
    qu = np.asarray(col_ftoint(C4(*[jnp.asarray(cu[:, i])
                                    for i in range(4)])))
    assert (qf == qu).mean() > 0.995, (qf != qu).sum()


def test_fused_backends_identical(setup):
    """jnp-fused == pallas-fused bit-exact (the cross-backend
    invariant holds in fused mode too)."""
    from jax.experimental.pallas import tpu as pltpu

    from pwnfps_tpu.ops.tracer_pallas import trace_wave_pallas

    world, meta = setup
    fv, rv = _fuzz_rays(n=64, seed0=9)
    seeds = jnp.asarray(np.arange(64, dtype=np.uint32) + 3)
    cfg = RenderConfig(parity=False, maxsteps=64, fused=True)
    col_j, dist_j = trace_wave(world, meta, cfg, fv, rv, seeds,
                               np.float32(0.3))
    on_tpu = jax.devices()[0].platform != "cpu"
    if on_tpu:
        col_p, dist_p = trace_wave_pallas(world, meta, cfg, fv, rv,
                                          seeds, np.float32(0.3))
    else:
        with pltpu.force_tpu_interpret_mode():
            col_p, dist_p = trace_wave_pallas(world, meta, cfg, fv, rv,
                                              seeds, np.float32(0.3))
    from .fputil import fma_contracts
    cj = np.stack([np.asarray(c) for c in col_j], 1)
    cp = np.stack([np.asarray(c) for c in col_p], 1)
    if not fma_contracts():
        assert np.array_equal(cj.view(np.uint32), cp.view(np.uint32))
        assert np.array_equal(np.asarray(dist_j).view(np.uint32),
                              np.asarray(dist_p).view(np.uint32))
    else:
        np.testing.assert_allclose(cj, cp, rtol=1e-5, atol=1e-5)
