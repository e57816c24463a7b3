"""Synthetic-level differentials for branches the default level never
hits: wrong-endpoint (magenta) portal cells, half-open portals-as-walls,
rotated portal pairs (all four rot12 values), and dense fog runs -
scalar spec vs the compiled reference, then jnp vs scalar."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pwnfps_tpu.core.approx import SseTables
from pwnfps_tpu.core.config import RenderConfig
from pwnfps_tpu.ops import worlddev as W
from pwnfps_tpu.ops.tracer_jnp import trace_wave
from pwnfps_tpu.ops.tracer_ref import ScalarTracer, ScalarWorld
from pwnfps_tpu.ops.vec import V3
from pwnfps_tpu.utils import oracle
from pwnfps_tpu.world.levelc import compile_level
from pwnfps_tpu.world.objects import ObjectPool

pytestmark = pytest.mark.skipif(not oracle.available(),
                                reason="reference checkout unavailable")

# 'A' x3: two endpoints + one wrong-endpoint (magenta wall);
# 'Z' half-open (solid wall); 'B' pair with rot12 != 0; fog pocket;
# ramps; a 2-high room with a '"' link.
LEVEL = b"""................
.;;;;;;;;;;;;;;.
.;A;;;;;;;;;A;;.
.;;;$$$;;;;;;;;.
.;A;$$$;;B;;;Z;.
.;;;$$$;;;;;;;;.
.;;;;;>;;;##\x22#.
.;;B;;;;;;##&#.
.;;;;;,;;;####.
.;;;;;;;;;;;;;.
................
"""


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    path = tmp_path_factory.mktemp("lv") / "synth.txt"
    path.write_bytes(LEVEL)
    lv = compile_level(LEVEL)
    sph = ObjectPool().prepare_render()
    tables = SseTables.load()
    return str(path), lv, sph, tables


def _rays(n=96, seed0=3):
    rng = np.random.default_rng(seed0)
    bases = [(2.5, 0.5, 2.5), (5.0, 0.5, 4.5), (6.5, 0.5, 6.5),
             (11.5, 0.5, 7.5), (12.5, 0.5, 2.5), (11.5, 1.5, 7.0)]
    out = []
    for k in range(n):
        b = bases[k % len(bases)]
        frm = np.array([b[0] + rng.uniform(-0.4, 0.4),
                        b[1] + rng.uniform(-0.1, 0.4),
                        b[2] + rng.uniform(-0.4, 0.4), 1.0], np.float32)
        d = rng.normal(size=3)
        d /= np.linalg.norm(d)
        out.append({"from": frm,
                    "dir": np.array([d[0], d[1] * 0.6, d[2], 0.0],
                                    np.float32),
                    "seed": int(rng.integers(0, 2**32)),
                    "sec": float(np.float32(rng.uniform(0, 9.0)))})
    return out


def test_scalar_vs_reference(setup):
    path, lv, sph, tables = setup
    world = ScalarWorld(lv, sph, tables)
    rays = _rays()
    cols, dists = oracle.trace_rays(path, rays)
    for k, r in enumerate(rays):
        tr = ScalarTracer(world, sec_current=np.float32(r["sec"]))
        c, d, _ = tr.trace(r["from"], r["dir"], r["seed"])
        assert np.array_equal(c.view(np.uint32),
                              cols[k].view(np.uint32)), (k, c, cols[k])
        assert np.float32(d).view(np.uint32) == \
            np.float32(dists[k]).view(np.uint32), k


def test_magenta_wall_reachable(setup):
    """A ray aimed at the third 'A' must return the debug magenta wall
    colour blend (trace.h:547-559)."""
    path, lv, sph, tables = setup
    world = ScalarWorld(lv, sph, tables)
    # the wrong endpoint is whichever 'A' registered third (2,4)
    tr = ScalarTracer(world, sec_current=np.float32(0.0))
    frm = np.array([3.5, 0.5, 4.5, 1.0], np.float32)  # ';' cell, no fog
    ray = np.array([-1.0, 1e-4, 1e-5, 0.0], np.float32)
    c, d, _ = tr.trace(frm, ray, 7)
    # magenta base (5,0,5) lit by headlight diffuse: red/blue dominate,
    # green stays near zero before any bounce blend
    assert c[2] > 1.0 and c[0] > 1.0 and c[1] < 0.5, c


def test_jnp_matches_scalar_synthetic(setup):
    path, lv, sph, tables = setup
    world, meta = W.build_world(lv, sph, tables)
    world = jax.tree.map(jnp.asarray, world)
    cfg = RenderConfig(parity=True)
    sworld = ScalarWorld(lv, sph, tables)
    rays = _rays(48, seed0=8)
    sec = np.float32(2.0)
    fv = V3(*(jnp.asarray(np.array([r["from"][i] for r in rays],
                                   np.float32)) for i in range(3)))
    rv = V3(*(jnp.asarray(np.array([r["dir"][i] for r in rays],
                                   np.float32)) for i in range(3)))
    seeds = jnp.asarray(np.array([r["seed"] for r in rays], np.uint32))
    col, dist = trace_wave(world, meta, cfg, fv, rv, seeds, sec)
    colv = np.stack([np.asarray(c) for c in col], 1)
    distv = np.asarray(dist)
    from .fputil import fma_contracts
    strict = not fma_contracts()
    exact = diverged = 0
    for k, r in enumerate(rays):
        tr = ScalarTracer(sworld, sec_current=sec, pinned=True)
        c, d, _ = tr.trace(r["from"], r["dir"], r["seed"])
        # jnp parity mode uses the pinned libm; scalar pinned matches it
        # bit-for-bit on backends that double-round (TPU; see
        # tests/fputil.py for the XLA:CPU FMA caveat)
        if strict:
            assert np.array_equal(colv[k].view(np.uint32),
                                  c.view(np.uint32)), (k, colv[k], c)
            assert np.float32(distv[k]).view(np.uint32) == \
                np.float32(d).view(np.uint32), k
        else:
            exact += np.array_equal(colv[k].view(np.uint32),
                                    c.view(np.uint32))
            close = (np.abs(colv[k] - c).max() <= 0.25
                     and abs(distv[k] - d) <= max(1e-4, 1e-3 * abs(d)))
            diverged += not close
    if not strict:
        assert exact >= len(rays) * 0.3, f"only {exact} bit-exact"
        assert diverged <= len(rays) * 0.1, f"{diverged} rays diverged"
