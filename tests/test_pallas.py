"""Pallas kernel backend: differential vs the jnp backend.

On CPU the kernel runs in Mosaic interpret mode (tiny workload); on a
real TPU (PWNFPS_TPU_TESTS=1, run outside this conftest) the same test
covers the compiled kernel.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pwnfps_tpu.core.approx import SseTables
from pwnfps_tpu.core.config import RenderConfig
from pwnfps_tpu.ops import worlddev as W
from pwnfps_tpu.ops.tracer_jnp import trace_wave
from pwnfps_tpu.ops.tracer_pallas import trace_wave_pallas
from pwnfps_tpu.ops.vec import V3
from pwnfps_tpu.world.levelc import load_level

from .test_tracer_scalar import REF_LEVEL, make_spheres


def _setup():
    lv = load_level(REF_LEVEL)
    sph, _ = make_spheres()
    world, meta = W.build_world(lv, sph, SseTables.load())
    return jax.tree.map(jnp.asarray, world), meta


def _rays(n, seed0=11):
    rng = np.random.default_rng(seed0)
    bases = [(9.5, 0.5, 4.5), (9.5, 0.5, 5.5), (11.5, 0.5, 3.5),
             (6.5, 0.5, 4.5)]
    froms = np.zeros((n, 3), np.float32)
    dirs = np.zeros((n, 3), np.float32)
    for k in range(n):
        b = bases[k % len(bases)]
        froms[k] = [b[0] + rng.uniform(-0.4, 0.4),
                    b[1] + rng.uniform(-0.1, 0.4),
                    b[2] + rng.uniform(-0.4, 0.4)]
        d = rng.normal(size=3)
        d /= np.linalg.norm(d)
        dirs[k] = [d[0], d[1] * 0.6, d[2]]
    seeds = rng.integers(0, 2**31, n).astype(np.uint32)
    fv = V3(*(jnp.asarray(froms[:, i]) for i in range(3)))
    rv = V3(*(jnp.asarray(dirs[:, i]) for i in range(3)))
    return fv, rv, jnp.asarray(seeds)


def _col_np(c):
    return np.stack([np.asarray(x) for x in c], axis=1)


@pytest.mark.parametrize("parity", [False, True])
def test_pallas_matches_jnp(parity):
    on_tpu = jax.devices()[0].platform != "cpu"
    world, meta = _setup()
    # small workload + bounded steps so interpret mode stays tractable
    n = 256 if on_tpu else 32
    cfg = RenderConfig(parity=parity,
                       maxsteps=1000 if on_tpu else 48)
    fv, rv, seeds = _rays(n)
    sec = np.float32(2.5)
    colj, distj = trace_wave(world, meta, cfg, fv, rv, seeds, sec)
    colj, distj = _col_np(colj), np.asarray(distj)

    if on_tpu:
        colp, distp = trace_wave_pallas(world, meta, cfg, fv, rv, seeds,
                                        sec)
    else:
        from jax.experimental.pallas import tpu as pltpu
        with pltpu.force_tpu_interpret_mode():
            colp, distp = trace_wave_pallas(world, meta, cfg, fv, rv,
                                            seeds, sec)
    colp, distp = _col_np(colp), np.asarray(distp)

    bit = ((colp.view(np.uint32) == colj.view(np.uint32)).all(axis=1)
           & (distp.view(np.uint32) == distj.view(np.uint32)))
    from .fputil import fma_contracts
    if not fma_contracts():
        assert bit.mean() == 1.0, (
            f"{(~bit).sum()}/{n} rays differ; first "
            f"{colp[~bit][0]} vs {colj[~bit][0]}")
    else:
        # the two programs fuse mul+add differently on a contracting
        # backend (tests/fputil.py): most rays agree to ULPs, the rare
        # ray whose branch flips may diverge structurally
        dd = np.abs(distp - distj) / np.maximum(np.abs(distj), 1e-3)
        close = (np.abs(colp - colj).max(axis=1) <= 0.25) & (dd < 1e-3)
        assert bit.any(), "no ray bit-exact at all"
        assert (bit | close).mean() >= 0.9, (
            f"{(~(bit | close)).sum()}/{n} rays diverge structurally")


@pytest.mark.parametrize("pack", [True, False])
def test_pallas_frame_hw_bitexact(pack):
    """frame_hw 2D BlockSpec layout == flat tile/untile path, bit for
    bit (same pixel rectangles, same grid order; only the HBM layout
    the specs address differs)."""
    from jax.experimental.pallas import tpu as pltpu
    from pwnfps_tpu.render.frame import _tile_rays, _untile

    on_tpu = jax.devices()[0].platform != "cpu"
    world, meta = _setup()
    cfg = RenderConfig(maxsteps=1000 if on_tpu else 48)
    h, w = 24, 100                      # pads to one (64, 128) tile
    n = h * w
    rng = np.random.default_rng(7)
    o = (9.5, 0.5, 4.5)
    fv = V3(*(jnp.full((n,), o[i], jnp.float32) for i in range(3)))
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d[:, 1] *= 0.6
    rv = V3(*(jnp.asarray(d[:, i].astype(np.float32)) for i in range(3)))
    seeds = jnp.asarray(rng.integers(0, 2**31, n).astype(np.uint32))
    sec = np.float32(2.5)

    t = lambda a, fill: _tile_rays(a, h, w, 64, 128, fill)
    fv_t = V3(t(fv.x, 1.0), t(fv.y, 0.5), t(fv.z, 1.0))
    rv_t = V3(t(rv.x, 0.5), t(rv.y, -0.5), t(rv.z, 0.5))

    import contextlib
    ctx = (contextlib.nullcontext() if on_tpu
           else pltpu.force_tpu_interpret_mode())
    with ctx:
        got = trace_wave_pallas(world, meta, cfg, fv, rv, seeds, sec,
                                pack=pack, frame_hw=(h, w))
        want = trace_wave_pallas(world, meta, cfg, fv_t, rv_t,
                                 t(seeds, 1), sec, pack=pack)
    if pack:
        fb2, z2 = np.asarray(got[0]), np.asarray(got[1])
        fbf = np.asarray(_untile(want[0], h, w, 64, 128))
        zf = np.asarray(_untile(want[1], h, w, 64, 128))
        assert (fb2 == fbf).all() and (
            z2.view(np.uint32) == zf.view(np.uint32)).all()
    else:
        for a2, af in list(zip(got[0], want[0])) + [(got[1], want[1])]:
            a2 = np.asarray(a2)
            af = np.asarray(_untile(af, h, w, 64, 128))
            assert (a2.view(np.uint32) == af.view(np.uint32)).all()
