#!/usr/bin/env python
"""VPU issue-rate microbenchmark: sustained vreg-ops/cycle vs ILP.

The step-body roofline arithmetic (docs/PERFORMANCE.md) assumed ~1
(8,128)-vreg-op/cycle.  If the VPU sustains more given independent
streams (v5e has multiple VPU ALUs), the DDA step body is running far
below true peak and an ILP restructuring (interleaved independent
planes) is the round-4 lever; if 1/cycle is the ceiling, the only
lever is fewer ops/step.

Design notes (v2 — the first version measured nothing: every call sat
at the ~3 ms relay-dispatch floor regardless of body size):
  * planes are ROWS=8 (ONE vreg), so a plane's update chain has zero
    intra-op ILP; S independent planes = S independent chains.
  * each fori iteration applies U=32 chained updates per plane, so the
    loop-carry/branch overhead is amortized 32x.
  * T is scaled per S so the expected kernel time is 15-60 ms >> the
    relay floor; time is measured with a probe readback.
  * variants: fma (mul+add, 2 ops/update) and sel (cmp+mul+select,
    3 ops/update) — the step body's diet is roughly half-and-half.

Interpretation: vreg_ops_per_us ~ 0.94e3 == 1 op/cycle @940 MHz.
S16/S1 throughput ratio >> 1 => dependency-bound at S1, ILP headroom.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/vpu_probe.py
"""

import json
import sys
import time

import numpy as np

ROWS = 8          # one vreg per plane
U = 32            # chained updates per plane per fori iteration
# total updates tuned for ~15-60 ms kernel time if issue-bound at
# 1 op/cycle (and longer if latency-bound — still fine)
TOTAL = {1: 4_000_000, 4: 8_000_000, 16: 16_000_000}


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def make_kernel(variant, S, T):
        def kern(a_ref, o_ref):
            a = a_ref[...]
            m = a * np.float32(0.9999) + np.float32(1e-7)

            def body(_, accs):
                out = list(accs)
                for _u in range(U):
                    for s in range(S):
                        acc = out[s]
                        if variant == "fma":
                            out[s] = acc * m + a
                        else:  # sel
                            out[s] = jnp.where(acc > a, acc * m, a)
                return tuple(out)

            init = tuple(a + np.float32(s) for s in range(S))
            accs = jax.lax.fori_loop(0, T, body, init)
            acc = accs[0]
            for x in accs[1:]:
                acc = acc + x
            o_ref[...] = acc

        return kern

    OPC = {"fma": 2, "sel": 3}
    a = jnp.asarray(np.random.rand(ROWS, 128).astype(np.float32) + 1.0)
    spec = pl.BlockSpec((ROWS, 128), lambda: (0, 0),
                        memory_space=pltpu.VMEM)
    for variant in ("fma", "sel"):
        for S in (1, 4, 16):
            T = TOTAL[S] // (U * S)
            call = pl.pallas_call(
                make_kernel(variant, S, T),
                in_specs=[spec], out_specs=spec,
                out_shape=jax.ShapeDtypeStruct((ROWS, 128), jnp.float32))
            f = jax.jit(call)
            np.asarray(f(a)[0, 0])            # compile+warm
            reps = 3
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                out = f(a)
                np.asarray(out[0, 0])         # probe readback
                best = min(best, time.perf_counter() - t0)
            updates = T * U * S
            vops = updates * OPC[variant]
            print(json.dumps({
                "variant": variant, "S": S, "T": T,
                "ms": round(best * 1e3, 2),
                "vreg_ops_per_us": round(vops / (best * 1e6), 1),
                "ops_per_cycle@940MHz": round(vops / (best * 1e6) / 940.0,
                                              3),
            }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
