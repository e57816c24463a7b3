"""Calibration probes (RenderConfig.probe) are bit-exact no-ops.

Every probe variant adds extra vector work whose results are discarded
at runtime behind a data-opaque select (tracer_core.segment_body), so
the rendered output must be IDENTICAL bits to probe="".  This pins the
opacity construction: if a probe ever leaks into the output (or a
compiler change folds the opaque select), this fails before a chip
session wastes hours on a miscalibrated ladder.
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
from pwnfps_tpu.world.levelc import load_level

from .test_pallas import _col_np, _rays, _setup

PROBES = ["fire1", "fetch2x", "pad64", "pad64d", "sel64", "bool128",
          "int128", "cmp64"]


def _trace(world, meta, cfg, fv, rv, seeds, sec, pallas):
    if not pallas:
        return trace_wave(world, meta, cfg, fv, rv, seeds, sec)
    on_tpu = jax.devices()[0].platform != "cpu"
    if on_tpu:
        return trace_wave_pallas(world, meta, cfg, fv, rv, seeds, sec)
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        return trace_wave_pallas(world, meta, cfg, fv, rv, seeds, sec)


@pytest.mark.parametrize("probe", PROBES)
def test_probe_bit_identical_jnp(probe):
    world, meta = _setup()
    n = 64
    fv, rv, seeds = _rays(n)
    sec = np.float32(2.5)
    base = RenderConfig(maxsteps=48)
    col0, d0 = trace_wave(world, meta, base, fv, rv, seeds, sec)
    colp, dp = trace_wave(world, meta,
                          RenderConfig(maxsteps=48, probe=probe),
                          fv, rv, seeds, sec)
    assert (_col_np(colp).view(np.uint32)
            == _col_np(col0).view(np.uint32)).all(), probe
    assert (np.asarray(dp).view(np.uint32)
            == np.asarray(d0).view(np.uint32)).all(), probe


@pytest.mark.parametrize("probe", ["fire1", "fetch2x", "pad64"])
def test_probe_bit_identical_pallas(probe):
    # interpret mode is slow: cover the structurally distinct probes
    # (always-fire cond, duplicated chunked fetch, opaque pad) on the
    # real kernel path; the rest share the pad construction
    world, meta = _setup()
    n = 32
    fv, rv, seeds = _rays(n)
    sec = np.float32(2.5)
    base = RenderConfig(maxsteps=48)
    col0, d0 = _trace(world, meta, base, fv, rv, seeds, sec, True)
    colp, dp = _trace(world, meta,
                      RenderConfig(maxsteps=48, probe=probe),
                      fv, rv, seeds, sec, True)
    assert (_col_np(colp).view(np.uint32)
            == _col_np(col0).view(np.uint32)).all(), probe
    assert (np.asarray(dp).view(np.uint32)
            == np.asarray(d0).view(np.uint32)).all(), probe
