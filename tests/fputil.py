"""Detect whether this XLA backend contracts f32 mul+add into FMAs.

TPU never contracts (verified on hardware: add/mul are IEEE-exact and
every mul+add chain double-rounds).  XLA:CPU historically honoured
--xla_cpu_enable_fast_math=false, but jaxlib 0.9.0's CPU emitters fuse
unconditionally (the flag parses but is inert, as are
--xla_allow_excess_precision / --xla_cpu_use_fusion_emitters /
optimization_barrier / bitcast laundering — all verified 2026-08-16).

Bit-exact parity vs the C oracle is therefore a *platform* property:
asserted strictly where the backend double-rounds (TPU, or any future
CPU jaxlib that honours the flag) and relaxed to quantized-within-1
elsewhere.  Tests call `fma_contracts()` to pick the strict or relaxed
assertion; the oracle itself never contracts (-ffp-contract=off).
"""

from functools import lru_cache

import numpy as np

import jax


@lru_cache(maxsize=1)
def fma_contracts() -> bool:
    """True if jitted (a*b)+c fuses into one rounding on this backend."""
    a = np.float32(1.0000001)
    c = np.float32(-1.0000002)
    got = np.float32(jax.jit(lambda x, y, z: (x * y) + z)(a, a, c))
    two_round = np.float32(np.float32(a * a) + c)
    return bool(got != two_round)
