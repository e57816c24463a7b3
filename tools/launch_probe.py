#!/usr/bin/env python
"""Measure per-pallas_call overhead inside ONE jitted executable.

Times a jit that chains N trivial grid kernels (same grid/shape as the
1080p trace call) for N in --ns; the slope is the per-call launch cost
on this chip+relay.  Used to size the value of fusing trace+blur into
one call (docs/PERFORMANCE.md round-3 'fixed' budget).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/launch_probe.py
"""

import argparse
import functools
import json
import sys
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ns", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--rows", type=int, default=64)
    ap.add_argument("--tiles", type=int, default=255)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ROWS, TILES = args.rows, args.tiles

    def kern(x_ref, o_ref):
        o_ref[:] = x_ref[:] + jnp.float32(1.0)

    spec = pl.BlockSpec((ROWS, 128), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kern, grid=(TILES,), in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((TILES * ROWS, 128), jnp.float32))

    def chain(n):
        @jax.jit
        def f(x):
            for _ in range(n):
                x = call(x)
            return x
        return f

    @jax.jit
    def probe(x):
        return x[0, 0] + x[-1, -1]

    x = jnp.ones((TILES * ROWS, 128), jnp.float32)
    out = {}
    for n in args.ns:
        f = chain(n)
        np.asarray(probe(f(x)))                      # compile+warm
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            np.asarray(probe(f(x)))
            best = min(best, time.perf_counter() - t0)
        out[n] = round(1000 * best, 3)
    ns = sorted(out)
    if len(ns) >= 2:
        slope = (out[ns[-1]] - out[ns[0]]) / (ns[-1] - ns[0])
    else:
        slope = float("nan")
    print(json.dumps({"ms_by_n": out,
                      "per_call_ms": round(slope, 3)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
