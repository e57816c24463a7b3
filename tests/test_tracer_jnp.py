"""Differential: batched jnp wavefront vs the scalar spec.

Bit-exactness holds except where XLA's div/sqrt/sin/cos/exp differ from
glibc/SSE by ULPs; quantized 8-bit colour must agree within 1 count."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pwnfps_tpu.core.approx import SseTables
from pwnfps_tpu.core.config import RenderConfig
from pwnfps_tpu.ops import worlddev as W
from pwnfps_tpu.ops.tracer_jnp import trace_wave
from pwnfps_tpu.ops.vec import V3
from pwnfps_tpu.ops.tracer_ref import ScalarTracer, ScalarWorld
from pwnfps_tpu.utils import oracle
from pwnfps_tpu.world.levelc import load_level

from .test_tracer_scalar import REF_LEVEL, make_spheres

pytestmark = pytest.mark.skipif(not oracle.available(),
                                reason="reference checkout unavailable")


def quant(col4: np.ndarray) -> np.ndarray:
    v = col4.astype(np.float64) * 255.0
    return np.clip(np.rint(v), 0, 255).astype(np.int16)


def test_jnp_matches_scalar():
    lv = load_level(REF_LEVEL)
    sph, _ = make_spheres()
    tables = SseTables.load()
    world, meta = W.build_world(lv, sph, tables)
    world = jax.tree.map(jnp.asarray, world)
    cfg = RenderConfig(parity=True)
    sw = ScalarWorld(lv, sph, tables)

    rng = np.random.default_rng(31)
    n = 48
    bases = [(9.5, 0.5, 4.5), (9.5, 0.5, 5.5), (11.5, 0.5, 3.5),
             (2.5, 0.5, 7.5), (21.5, 0.5, 20.5), (6.5, 0.5, 4.5)]
    froms, dirs, seeds = [], [], []
    for k in range(n):
        b = bases[k % len(bases)]
        froms.append([b[0] + rng.uniform(-0.45, 0.45),
                      b[1] + rng.uniform(-0.1, 0.45),
                      b[2] + rng.uniform(-0.45, 0.45)])
        d = rng.normal(size=3)
        d /= np.linalg.norm(d)
        dirs.append([d[0], d[1] * 0.6, d[2]])
        seeds.append(int(rng.integers(0, 2**32)))
    froms = np.array(froms, np.float32)
    dirs = np.array(dirs, np.float32)
    seeds = np.array(seeds, np.uint32)
    sec = np.float32(4.75)

    fn = jax.jit(lambda f, r, s: trace_wave(world, meta, cfg, f, r, s,
                                            sec))
    fv = V3(*(jnp.asarray(froms[:, i]) for i in range(3)))
    rv = V3(*(jnp.asarray(dirs[:, i]) for i in range(3)))
    colc, dist = fn(fv, rv, jnp.asarray(seeds))
    col = np.stack([np.asarray(colc.b), np.asarray(colc.g),
                    np.asarray(colc.r), np.asarray(colc.a)], axis=1)
    dist = np.asarray(dist)

    exact = 0
    for k in range(n):
        tr = ScalarTracer(sw, sec_current=sec)
        c, d, _ = tr.trace(np.array([*froms[k], 1.0], np.float32),
                           np.array([*dirs[k], 0.0], np.float32), seeds[k])
        if np.array_equal(c.view(np.uint32), col[k].view(np.uint32)):
            exact += 1
        # quantized colour within 1 count everywhere
        dq = np.abs(quant(col[k]) - quant(c)).max()
        assert dq <= 1, (k, col[k], c)
        assert abs(dist[k] - d) <= max(1e-5, 2e-6 * abs(d)), (k, dist[k], d)
    # the majority of rays must be fully bit-exact -- unless this
    # backend FMA-contracts mul+add chains (tests/fputil.py), which
    # perturbs low-order float bits; quantized outputs stay within 1
    # (asserted above) and the strict check runs on TPU
    from .fputil import fma_contracts
    floor = 0.30 if fma_contracts() else 0.55
    assert exact >= n * floor, f"only {exact}/{n} bit-exact"
