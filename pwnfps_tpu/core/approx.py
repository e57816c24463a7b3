"""Bit-accurate emulation of SSE approximate intrinsics.

The reference's image depends on two ~12-bit approximations:
  * `_mm_rsqrt_ps` inside v_normalise (/root/reference/util.h:43)
  * `_mm_rcp_ps` for the DDA inverse velocity (/root/reference/trace.h:231)

On x86 these are (exponent-parity, top-12-mantissa-bit) lookup tables with
exact power-of-two scaling - a structure the oracle harness verifies
empirically on the host CPU (`oracle tables`, tools/oracle/harness.c) and
dumps as raw tables.  Parity mode reproduces them on TPU with an integer
decompose + table gather + exact pow2 rescale.

Fast mode simply uses the hardware ops.
"""

from __future__ import annotations

import os

import numpy as np

BLOCK = 11  # low mantissa bits ignored by the approximation

_DEFAULT_TABLE_PATH = os.path.join(
    os.path.dirname(__file__), "..", "..", "assets", "tables",
    "sse_tables.bin")


class SseTables:
    """rsqrt [8192] + rcp [4096] uint32 result-bit tables."""

    def __init__(self, rsqrt: np.ndarray, rcp: np.ndarray):
        assert rsqrt.shape == (8192,) and rcp.shape == (4096,)
        self.rsqrt = rsqrt.astype(np.uint32)
        self.rcp = rcp.astype(np.uint32)

    @classmethod
    def load(cls, path: str | None = None) -> "SseTables":
        path = path or _DEFAULT_TABLE_PATH
        raw = np.fromfile(path, np.uint32)
        magic, block, ok_block, ok_scale = raw[:4]
        assert magic == 0x52535154 and block == BLOCK
        assert ok_block == 1 and ok_scale == 1, (
            "host CPU rsqrt/rcp did not match the table structure; "
            "re-derive the emulation")
        return cls(raw[4:4 + 8192], raw[4 + 8192:4 + 8192 + 4096])


def _bitcast_ops(xp):
    if xp is np:
        def f2u(x):
            return np.asarray(x, np.float32).view(np.uint32)

        def u2f(u):
            return np.asarray(u, np.uint32).view(np.float32)

        def take(t, i):
            return t[i]
    else:  # jax.numpy
        import jax

        def f2u(x):
            return jax.lax.bitcast_convert_type(x, np.uint32)

        def u2f(u):
            return jax.lax.bitcast_convert_type(u, np.float32)

        def take(t, i):
            return xp.take(t, i)
    return f2u, u2f, take


def rsqrt_emu(x, table, xp=np):
    """Bit-exact `_mm_rsqrt_ps` for positive normal f32 inputs."""
    f2u, u2f, take = _bitcast_ops(xp)
    bits = f2u(x)
    e = (bits >> np.uint32(23)).astype(xp.int32)
    m = bits & np.uint32(0x7FFFFF)
    d = e - 127
    k = d >> 1                      # arithmetic shift: floor division by 2
    p = d - 2 * k                   # exponent parity in {0, 1}
    idx = p * 4096 + (m >> np.uint32(BLOCK)).astype(xp.int32)
    y = u2f(take(table, idx))
    scale = u2f(((127 - k).astype(xp.uint32)) << np.uint32(23))
    return y * scale


def rcp_emu(x, table, xp=np):
    """Bit-exact `_mm_rcp_ps` for positive normal f32 inputs."""
    f2u, u2f, take = _bitcast_ops(xp)
    bits = f2u(x)
    e = (bits >> np.uint32(23)).astype(xp.int32)
    m = bits & np.uint32(0x7FFFFF)
    k = e - 127
    idx = (m >> np.uint32(BLOCK)).astype(xp.int32)
    y = u2f(take(table, idx))
    scale = u2f(((127 - k).astype(xp.uint32)) << np.uint32(23))
    return y * scale
