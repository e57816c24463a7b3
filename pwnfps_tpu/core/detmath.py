"""Deterministic f32 transcendentals (sin/cos/exp) - the pinned libm.

glibc's float transcendentals are not correctly rounded and cannot be
reproduced on TPU; even computing in f64 and rounding would disagree
with glibc ~1.2% of the time.  For 100% pixel parity the engine and the
oracle must share ONE implementation, so this module defines sin/cos/
exp as fixed sequences of IEEE f32 add/mul/floor/bit ops (no fma, no
reassociation) - semantics that are bit-identical on x86 SSE, XLA:CPU,
XLA:TPU and inside Mosaic kernels.

tools/oracle/detmath.c is the line-for-line C twin, linked into the
`oracle_pinned` build where it overrides libm's sinf/cosf/expf; the
cross-implementation bit-equality is asserted in tests/test_detmath.py.

Accuracy: ~1-2 ulp over the engine's argument range (|x| < ~2^12 for
sin/cos via 3-term Cody-Waite reduction; exp over the fog range).
Determinism, not correct rounding, is the contract.
"""

from __future__ import annotations

import numpy as np

F = np.float32

# pi/2 split with 12 zeroed low mantissa bits in HI/MID: j*HI and j*MID
# are exact for j < 2^12 (hex bit patterns asserted in tests)
PIO2_HI = np.uint32(0x3FC90000).view(np.float32)    # 1.5703125
PIO2_MID = np.uint32(0x39FDA000).view(np.float32)   # 4.8375130e-04
PIO2_LO = np.uint32(0x33A22169).view(np.float32)    # 7.5497901e-08
TWO_OVER_PI = np.uint32(0x3F22F983).view(np.float32)

# sin/cos kernel polynomial coefficients (fdlibm float kernels)
S1 = F(-1.6666667163e-01)
S2 = F(8.3333337680e-03)
S3 = F(-1.9841270114e-04)
S4 = F(2.7557314297e-06)
C1 = F(4.1666667908e-02)
C2 = F(-1.3888889225e-03)
C3 = F(2.4801587642e-05)
C4 = F(-2.7557314297e-07)

INV_LN2 = np.uint32(0x3FB8AA3B).view(np.float32)
LN2_HI = np.uint32(0x3F317000).view(np.float32)     # 0.693115234375
LN2_LO = np.uint32(0x3805F000).view(np.float32)     # 3.1933188e-05
LN2_LO2 = np.uint32(0x325F473E).view(np.float32)    # 1.2996507e-08
E0 = F(1.0)
E2 = F(0.5)
E3 = F(0.16666667163581848)
E4 = F(0.041666667908430099)
E5 = F(0.0083333337679505348)


def _kernel_sin(r, r2, xp):
    p = S3 + (r2 * S4)
    p = S2 + (r2 * p)
    p = S1 + (r2 * p)
    return r + ((r * r2) * p)


def _kernel_cos(r, r2, xp):
    p = C3 + (r2 * C4)
    p = C2 + (r2 * p)
    p = C1 + (r2 * p)
    return (F(1.0) - (r2 * F(0.5))) + ((r2 * r2) * p)


def _reduce(x, xp):
    j = xp.floor((x * TWO_OVER_PI) + F(0.5))
    r = x - (j * PIO2_HI)
    r = r - (j * PIO2_MID)
    r = r - (j * PIO2_LO)
    n = j.astype(xp.int32) & 3
    return r, n


def sin_det(x, xp=np):
    x = xp.asarray(x, np.float32)
    r, n = _reduce(x, xp)
    r2 = r * r
    ks = _kernel_sin(r, r2, xp)
    kc = _kernel_cos(r, r2, xp)
    v = xp.where(n == 0, ks,
                 xp.where(n == 1, kc,
                          xp.where(n == 2, -ks, -kc)))
    return v


def cos_det(x, xp=np):
    x = xp.asarray(x, np.float32)
    r, n = _reduce(x, xp)
    r2 = r * r
    ks = _kernel_sin(r, r2, xp)
    kc = _kernel_cos(r, r2, xp)
    v = xp.where(n == 0, kc,
                 xp.where(n == 1, -ks,
                          xp.where(n == 2, -kc, ks)))
    return v


def exp_det(x, xp=np):
    x = xp.asarray(x, np.float32)
    k = xp.floor((x * INV_LN2) + F(0.5))
    r = x - (k * LN2_HI)
    r = r - (k * LN2_LO)
    r = r - (k * LN2_LO2)
    p = E4 + (r * E5)
    p = E3 + (r * p)
    p = E2 + (r * p)
    p = E0 + (r * p)
    p = E0 + (r * p)            # 1 + r*(1 + r*(1/2 + ...))
    ki = k.astype(xp.int32)
    e = ki + 127
    e = xp.clip(e, 0, 254)             # clamp huge
    # flush results at/below the normal boundary to zero: denormal
    # handling differs across backends (x86 FTZ under -ffast-math,
    # XLA flush modes); e<=1 outputs are < 3e-38 - invisible in fog
    if xp is np:
        scale = (np.asarray(e, np.int64).astype(np.uint32) << 23) \
            .view(np.float32)
    else:
        import jax
        scale = jax.lax.bitcast_convert_type(
            (e << 23).astype(xp.int32), np.float32)
    out = p * scale
    out = xp.where(e <= 1, xp.zeros_like(out), out)
    return out
