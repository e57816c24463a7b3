"""Page-uniform cell fetch (tracer_pallas._compact_fetch).

Paged worlds' per-step fetch scans one page's table chunks when the
tile's lanes share a page (measured 100% of live maze-bench
tile-steps, tools/page_uniform.py) and falls back to the all-pages
scan on mixed tiles.  The fallback is the risky path - no bench
camera exercises it - so this test builds a tile whose lanes GENUINELY
straddle pages (a fan half-entering a cross-page portal) and pins the
pallas backend to the jnp one, plus knob-off equality.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pwnfps_tpu.core.approx import SseTables
from pwnfps_tpu.core.config import RenderConfig
from pwnfps_tpu.ops import worlddev as W
from pwnfps_tpu.ops.tracer_jnp import make_env, trace_wave
from pwnfps_tpu.ops.tracer_core import run_segment
from pwnfps_tpu.ops.vec import V3
from pwnfps_tpu.world.objects import ObjectPool
from pwnfps_tpu.world.procgen import generate_sector_maze

from .fputil import fma_contracts


@pytest.fixture(scope="module")
def maze():
    words, info = generate_sector_maze(seed=7)
    world, meta = W.build_world_paged(
        words, ObjectPool().prepare_render(), 0, SseTables.load())
    return words, jax.tree.map(jnp.asarray, world), meta


def _portal_fan(words, n=160):
    """Rays from the open cell beside a cross-page portal, fanned so
    a fraction traverses (page changes) and the rest stays."""
    words2 = words.reshape(4, 64, 64)
    for z, x in np.argwhere((words2[0] & 0xF) == W.PORTAL):
        ww = int(words2[0, z, x])
        if W.w_dpage(ww) != 0:
            px, pz = int(x), int(z)
            break
    nb = [(dx, dz) for dx, dz in ((1, 0), (-1, 0), (0, 1), (0, -1))
          if 0 <= px + dx < 64 and 0 <= pz + dz < 64
          and (words2[0, pz + dz, px + dx] & 0xF) == W.FLOOR]
    dx, dz = nb[0]
    rng = np.random.default_rng(11)
    a = rng.uniform(0, 2 * np.pi, n).astype(np.float32)
    frm = V3(jnp.full(n, px + dx + 0.5, jnp.float32),
             jnp.full(n, 0.5, jnp.float32),
             jnp.full(n, pz + dz + 0.5, jnp.float32))
    ray = V3(jnp.asarray(np.cos(a)),
             jnp.asarray(rng.uniform(-0.1, 0.1, n).astype(np.float32)),
             jnp.asarray(np.sin(a)))
    seeds = jnp.asarray(rng.integers(0, 2**31, n).astype(np.uint32))
    return frm, ray, seeds


def test_fan_actually_mixes_pages(maze):
    words, world, meta = maze
    frm, ray, _ = _portal_fan(words)
    cfg = RenderConfig(maxsteps=256)
    env = make_env(world, meta, cfg)
    out = run_segment(env, cfg, frm, ray, jnp.ones(frm.x.shape[0], bool),
                      jnp.zeros_like(frm.x).astype(jnp.int32))
    pages = np.asarray(out.tpage)
    assert (pages != 0).any(), "no ray crossed - fan test is vacuous"
    assert (pages == 0).any()


@pytest.mark.parametrize("knob", ["1", "0"])
def test_mixed_page_pallas_matches_jnp(maze, knob, monkeypatch):
    from jax.experimental.pallas import tpu as pltpu

    from pwnfps_tpu.ops import tracer_pallas as TP

    monkeypatch.setattr(TP, "_PAGE_UNIFORM", knob != "0")
    words, world, meta = maze
    on_tpu = jax.devices()[0].platform != "cpu"
    frm, ray, seeds = _portal_fan(words, n=160 if on_tpu else 64)
    cfg = RenderConfig(maxsteps=1000 if on_tpu else 64, reflect=1)
    sec = np.float32(0.5)
    pg = 0
    cj, dj = trace_wave(world, meta, cfg, frm, ray, seeds, sec,
                        jnp.zeros_like(frm.x).astype(jnp.int32))
    if on_tpu:
        cp, dp = TP.trace_wave_pallas(world, meta, cfg, frm, ray, seeds,
                                      sec, pg)
    else:
        with pltpu.force_tpu_interpret_mode():
            cp, dp = TP.trace_wave_pallas(world, meta, cfg, frm, ray,
                                          seeds, sec, pg)
    cj = np.stack([np.asarray(x) for x in cj], 1)
    cp = np.stack([np.asarray(x) for x in cp], 1)
    dj, dp = np.asarray(dj), np.asarray(dp)
    bit = ((cp.view(np.uint32) == cj.view(np.uint32)).all(axis=1)
           & (dp.view(np.uint32) == dj.view(np.uint32)))
    if not fma_contracts():
        assert bit.mean() == 1.0, f"{(~bit).sum()} rays differ"
    else:
        dd = np.abs(dp - dj) / np.maximum(np.abs(dj), 1e-3)
        close = (np.abs(cp - cj).max(axis=1) <= 0.25) & (dd < 1e-3)
        assert (bit | close).mean() >= 0.9
