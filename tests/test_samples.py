"""Multi-sample path tracing with the shared primary wave.

cfg.samples > 1 traces every distribution sample in ONE call, sharing
the primary wave (it consumes no RNG - trace_wave_env).  These tests
pin that the restructure reproduces the old per-sample-call
accumulation exactly: same Weyl seed streams, same accumulation order.
"""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from pwnfps_tpu.core.approx import SseTables
from pwnfps_tpu.core.config import RenderConfig
from pwnfps_tpu.ops import worlddev as W
from pwnfps_tpu.ops.tracer_jnp import trace_wave
from pwnfps_tpu.ops.vec import C4, V3
from pwnfps_tpu.world.levelc import load_level

from .fputil import fma_contracts
from .test_tracer_scalar import REF_LEVEL, make_spheres


def _setup():
    lv = load_level(REF_LEVEL)
    sph, _ = make_spheres()
    world, meta = W.build_world(lv, sph, SseTables.load())
    return jax.tree.map(jnp.asarray, world), meta


def _rays(n=160, seed0=23):
    rng = np.random.default_rng(seed0)
    froms = np.zeros((n, 3), np.float32)
    dirs = np.zeros((n, 3), np.float32)
    for k in range(n):
        froms[k] = [9.5 + rng.uniform(-0.4, 0.4), 0.5,
                    5.5 + rng.uniform(-0.4, 0.4)]
        a = rng.uniform(0, 2 * np.pi)
        dirs[k] = [np.cos(a), rng.uniform(-0.3, 0.3), np.sin(a)]
    fv = V3(*(jnp.asarray(froms[:, i]) for i in range(3)))
    rv = V3(*(jnp.asarray(dirs[:, i]) for i in range(3)))
    seeds = jnp.asarray(rng.integers(0, 2**31, n).astype(np.uint32))
    return fv, rv, seeds


def _old_accumulate(world, meta, cfg, fv, rv, seeds, sec, samples):
    """The retired per-sample-call path, verbatim ops."""
    cfg1 = dataclasses.replace(cfg, samples=1)
    acc = None
    dist0 = None
    for k in range(samples):
        sk = seeds + jnp.uint32(k) * jnp.uint32(0x9E3779B9)
        col4, dist = trace_wave(world, meta, cfg1, fv, rv, sk, sec)
        if k == 0:
            dist0 = dist
            acc = list(col4)
        else:
            acc = [a + c for a, c in zip(acc, col4)]
    inv = jnp.float32(1.0 / samples)
    return C4(*(a * inv for a in acc)), dist0


def test_shared_primary_matches_per_sample_calls():
    world, meta = _setup()
    cfg = RenderConfig(maxsteps=256, reflect=3, samples=3)
    fv, rv, seeds = _rays()
    sec = np.float32(1.75)
    col_new, dist_new = trace_wave(world, meta, cfg, fv, rv, seeds, sec)
    col_old, dist_old = _old_accumulate(world, meta, cfg, fv, rv, seeds,
                                        sec, 3)
    np.testing.assert_array_equal(np.asarray(dist_new),
                                  np.asarray(dist_old))
    for a, b in zip(col_new, col_old):
        a, b = np.asarray(a), np.asarray(b)
        if not fma_contracts():
            np.testing.assert_array_equal(a, b)
        else:
            # contracting backends may fuse the two graph shapes
            # differently; exactness holds on the chip
            assert np.allclose(a, b, rtol=1e-5, atol=1e-6), \
                np.abs(a - b).max()


def test_samples_one_unchanged():
    """samples=1 must be the exact pre-restructure single-pass trace
    (chain() is the old loop verbatim)."""
    world, meta = _setup()
    fv, rv, seeds = _rays(96, seed0=7)
    sec = np.float32(0.5)
    cfg = RenderConfig(maxsteps=256)
    c1, d1 = trace_wave(world, meta, cfg, fv, rv, seeds, sec)
    c2, d2 = trace_wave(world, meta, dataclasses.replace(cfg, samples=1),
                        fv, rv, seeds, sec)
    for a, b in zip(c1, c2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))


def test_pallas_samples_matches_jnp():
    from jax.experimental.pallas import tpu as pltpu

    from pwnfps_tpu.ops.tracer_pallas import trace_wave_pallas

    world, meta = _setup()
    on_tpu = jax.devices()[0].platform != "cpu"
    n = 128 if on_tpu else 32
    cfg = RenderConfig(maxsteps=1000 if on_tpu else 48, reflect=2,
                       samples=2)
    fv, rv, seeds = _rays(n, seed0=41)
    sec = np.float32(2.0)
    cj, dj = trace_wave(world, meta, cfg, fv, rv, seeds, sec)
    if on_tpu:
        cp, dp = trace_wave_pallas(world, meta, cfg, fv, rv, seeds, sec)
    else:
        with pltpu.force_tpu_interpret_mode():
            cp, dp = trace_wave_pallas(world, meta, cfg, fv, rv, seeds,
                                       sec)
    cj = np.stack([np.asarray(x) for x in cj], 1)
    cp = np.stack([np.asarray(x) for x in cp], 1)
    dj, dp = np.asarray(dj), np.asarray(dp)
    bit = ((cp.view(np.uint32) == cj.view(np.uint32)).all(axis=1)
           & (dp.view(np.uint32) == dj.view(np.uint32)))
    if not fma_contracts():
        assert bit.mean() == 1.0, f"{(~bit).sum()}/{n} rays differ"
    else:
        dd = np.abs(dp - dj) / np.maximum(np.abs(dj), 1e-3)
        close = (np.abs(cp - cj).max(axis=1) <= 0.25) & (dd < 1e-3)
        assert (bit | close).mean() >= 0.9
