"""Width-trimmed compact cell table (WorldMeta.lw).

When every content/sphere column of a single-page level sits below 32,
worlddev derives lw=32 and the pallas backend re-strides the compact
cell table to 32 columns, halving the per-step chunked-gather scan
(docs/PERFORMANCE.md round 5).  Soundness argument under test:

  * columns >= lw hold '.'-pad whose compact byte is 0;
  * flat_cell_index_lw pushes in-bounds cx >= lw past any table, so
    the chunked gather misses and returns the same 0;
  * OOB lanes still read cell 0 of the page (reference clamp quirk,
    cells.h semantics via world/cells.py).

Covers: lw derivation (grid + sphere-bucket columns), exhaustive
fetched-entry equality lw=32 vs lw=64 over every cell incl. OOB (both
pack2 and pack4 layouts), and full-trace bit-equality on the default
level (which derives lw=32).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pwnfps_tpu.core.approx import SseTables
from pwnfps_tpu.core.config import RenderConfig
from pwnfps_tpu.ops import tracer_pallas as TP
from pwnfps_tpu.ops import worlddev as W
from pwnfps_tpu.ops.vec import V3
from pwnfps_tpu.world.levelc import compile_level, load_level
from pwnfps_tpu.world.objects import ObjectPool

from .test_tracer_scalar import REF_LEVEL


def _world(level_bytes=None, sphere_x=None):
    lv = (compile_level(level_bytes) if level_bytes is not None
          else load_level(REF_LEVEL))
    pool = ObjectPool()
    if sphere_x is not None:
        i = pool.obj_new()
        pool.obj_set_sphere(i, 0.2, 0.4, sphere_x, 0.3, 2.5,
                            0.8, 0.7, 0.9)
    sph = pool.prepare_render()
    world, meta = W.build_world(lv, sph, SseTables.load())
    return jax.tree.map(jnp.asarray, world), meta


def test_lw_derivation():
    # default level: content cols 2..27 -> lw=32
    _, meta = _world()
    assert meta.lw == 32
    # a wall at col 40 forces lw=64
    wide = b"." * 41 + b"#\n" + b"..;..\n"
    _, meta = _world(wide)
    assert meta.lw == 64
    # narrow grid, but a sphere bucket at col ~40 forces lw=64 too
    narrow = b"#####\n#;;;#\n#####\n"
    _, meta = _world(narrow, sphere_x=40.5)
    assert meta.lw == 64
    _, meta = _world(narrow, sphere_x=2.5)
    assert meta.lw == 32


@pytest.mark.parametrize("space_skip", [True, False])
def test_fetch_values_exhaustive(space_skip):
    """Every cell (incl. OOB rims) fetches the same compact entry from
    the lw=32 table as from the 64-stride table — pure-jnp stand-in
    refs, both pack2 (skip on) and pack4 (skip off) layouts."""
    world, meta = _world()
    assert meta.lw == 32
    cfg = RenderConfig(space_skip=space_skip, backend="pallas")
    pack4 = TP._pack4(cfg, meta.has_clear)
    rows = TP._rows(False)
    t32 = TP.build_tables(world, meta, rows, False, pack4, lw=32)
    t64 = TP.build_tables(world, meta, rows, False, pack4, lw=64)

    # query every (cx, cz) in [-2, 66)^2, padded up to [64, 128] lanes
    ks = np.arange(64 * 128)
    q = np.minimum(ks, 68 * 68 - 1)
    cx = jnp.asarray((q % 68 - 2).reshape(64, 128).astype(np.int32))
    cz = jnp.asarray((q // 68 - 2).reshape(64, 128).astype(np.int32))

    e32 = TP._compact_fetch(t32.cword, cx, cz, rows,
                            TP._cchunks(meta.lh, pack4, 32),
                            pack4=pack4, is_ref=False, lw=32).ent
    e64 = TP._compact_fetch(t64.cword, cx, cz, rows,
                            TP._cchunks(meta.lh, pack4, 64),
                            pack4=pack4, is_ref=False, lw=64).ent
    neq = int((np.asarray(e32) != np.asarray(e64)).sum())
    assert neq == 0, f"{neq} cells fetch different entries"


def test_trace_bit_identical():
    """Full pallas trace, lw=32 vs lw=64 (forced): bit-equal frames."""
    from jax.experimental.pallas import tpu as pltpu

    world, meta = _world()
    assert meta.lw == 32
    cfg = RenderConfig(width=64, height=32, parity=False,
                       backend="pallas", maxsteps=16, reflect=2)
    n = 64 * 32
    rng = np.random.RandomState(0)
    fv = V3(*(jnp.asarray(np.full(n, v, np.float32))
              for v in (9.5, 0.5, 5.5)))
    rd = rng.rand(3, n).astype(np.float32) - 0.5
    rd[1] *= 0.2
    rv = V3(*(jnp.asarray(rd[k]) for k in range(3)))
    seeds = jnp.asarray(rng.randint(1, 1 << 30, size=n)
                        .astype(np.int32))
    on_tpu = jax.devices()[0].platform != "cpu"
    import contextlib
    ctx = (contextlib.nullcontext() if on_tpu
           else pltpu.force_tpu_interpret_mode())
    with ctx:
        c32, d32 = TP.trace_wave_pallas(world, meta, cfg, fv, rv,
                                        seeds, 0.25)
        import dataclasses
        meta64 = dataclasses.replace(meta, lw=64)
        c64, d64 = TP.trace_wave_pallas(world, meta64,
                                        cfg, fv, rv, seeds, 0.25)
    for a, b in ((c32.b, c64.b), (c32.g, c64.g), (c32.r, c64.r),
                 (c32.a, c64.a), (d32, d64)):
        av, bv = np.asarray(a), np.asarray(b)
        assert (av.view(np.int32) == bv.view(np.int32)).all()
