"""Exactly-rounded f32 division and sqrt from primitive ops.

Neither XLA:TPU nor XLA:CPU lower f32 `div`/`sqrt` to IEEE
correctly-rounded results (measured: ~35%/~44% of values are 1 ulp off
vs x86 divss/sqrtss).  The reference image depends on those exact
results (sphere intersection, ramp crossings), so parity mode computes
them with integer restoring algorithms built only from add/sub/compare/
select/shift - ops that are bit-identical everywhere, including inside
Mosaic kernels.

Domain: positive normal f32 in, normal f32 out (the engine guarantees
this: inputs are radii, squared distances and |ray components| clamped
to >= 1e-13).  Out-of-domain lanes fall back to the hardware op.
"""

from __future__ import annotations

import numpy as np


def _ops(xp):
    if xp is np:
        def f2i(x):
            return np.asarray(x, np.float32).view(np.uint32) \
                .astype(np.int64)

        def i2f(u):
            return (np.asarray(u, np.int64).astype(np.uint32)
                    .view(np.float32))
    else:
        import jax

        def f2i(x):
            return jax.lax.bitcast_convert_type(x, np.int32)

        def i2f(u):
            return jax.lax.bitcast_convert_type(
                u.astype(xp.int32), np.float32)
    return f2i, i2f


def div_rn(a, b, xp=np):
    """Correctly-rounded a / b for positive normal f32 (IEEE RN).

    Restoring long division on the mantissas: q = floor(ma*2^27 / mb)
    in (2^26, 2^28) plus a sticky remainder; round to nearest even.
    """
    f2i, i2f = _ops(xp)
    ab = f2i(a)
    bb = f2i(b)
    ea = (ab >> 23) & 0xFF
    eb = (bb >> 23) & 0xFF
    ma = (ab & 0x7FFFFF) | 0x800000
    mb = (bb & 0x7FFFFF) | 0x800000

    # integer bit first (ma may exceed mb); keeps the restoring
    # invariant r < mb for the 27 fraction iterations
    ge0 = ma >= mb
    q = ge0.astype(ma.dtype)
    r = xp.where(ge0, ma - mb, ma)

    def _step(rq):
        r, q = rq
        r = r << 1
        q = q << 1
        ge = r >= mb
        return (xp.where(ge, r - mb, r), xp.where(ge, q + 1, q))

    if xp is np:
        for _ in range(27):
            r, q = _step((r, q))
    else:
        import jax
        r, q = jax.lax.fori_loop(0, 27, lambda i, rq: _step(rq), (r, q))

    big = q >= (1 << 27)                    # quotient in [1, 2) vs [0.5, 1)
    e = ea - eb + xp.where(big, 127, 126)
    m24 = xp.where(big, q >> 4, q >> 3)
    g = xp.where(big, (q >> 3) & 1, (q >> 2) & 1)
    low = xp.where(big, q & 7, q & 3)
    s = (low != 0) | (r != 0)
    roundup = (g == 1) & (s | ((m24 & 1) == 1))
    m24 = m24 + roundup.astype(m24.dtype)
    carry = m24 >= (1 << 24)
    m24 = xp.where(carry, m24 >> 1, m24)
    e = e + carry.astype(e.dtype)

    ok = (ea > 0) & (ea < 255) & (eb > 0) & (eb < 255) \
        & (e > 0) & (e < 255) & (ab >= 0) & (bb >= 0)
    out = i2f((e << 23) | (m24 & 0x7FFFFF))
    return xp.where(ok, out, a / b)


def sqrt_rn(x, xp=np):
    """Correctly-rounded sqrt for positive normal f32 (IEEE RN).

    Digit-by-digit (restoring) root of N = M * 2^25 where M is the
    (possibly doubled, for odd exponents) 23-bit-scaled mantissa:
    root = floor(sqrt(N)) has 25 bits; guard = root bit 0,
    sticky = remainder.  Intermediates stay below 2^28.
    """
    f2i, i2f = _ops(xp)
    xb = f2i(x)
    e = (xb >> 23) & 0xFF
    m = (xb & 0x7FFFFF) | 0x800000
    d = e - 127
    odd = d & 1                         # works for negative d (two's compl.)
    M = xp.where(odd == 1, m << 1, m)   # < 2^25
    k = (d - odd) >> 1                  # floor((e-127)/2)

    root = xp.zeros_like(M)
    rem = xp.zeros_like(M)

    # N = M << 25 has <= 50 bits; feed bit-pairs MSB-first (p = 0..24);
    # pair p covers N bits (48-2p, 49-2p) <=> M bits (23-2p, 24-2p)
    def _pair(p_dyn):
        # branchless pair extraction for traced p: shift = 23-2p may be
        # negative; sft==-1 contributes M bit 0 as the high pair bit
        sft = 23 - 2 * p_dyn
        pos_part = (M >> xp.maximum(sft, 0)) & 3
        neg1 = (M & 1) << 1
        return xp.where(sft >= 0, pos_part,
                        xp.where(sft == -1, neg1, xp.zeros_like(M)))

    def _step(p_dyn, state):
        root, rem = state
        rem = (rem << 2) | _pair(p_dyn)
        trial = (root << 2) | 1
        ge = rem >= trial
        rem = xp.where(ge, rem - trial, rem)
        root = xp.where(ge, (root << 1) | 1, root << 1)
        return (root, rem)

    if xp is np:
        for p in range(25):
            root, rem = _step(p, (root, rem))
    else:
        import jax
        root, rem = jax.lax.fori_loop(0, 25, _step, (root, rem))

    m24 = root >> 1
    g = root & 1
    s = rem != 0
    roundup = (g == 1) & (s | ((m24 & 1) == 1))
    m24 = m24 + roundup.astype(m24.dtype)
    carry = m24 >= (1 << 24)
    m24 = xp.where(carry, m24 >> 1, m24)
    eo = 127 + k + carry.astype(k.dtype)

    ok = (e > 0) & (e < 255) & (xb >= 0) & (eo > 0) & (eo < 255)
    out = i2f((eo << 23) | (m24 & 0x7FFFFF))
    return xp.where(ok, out, xp.sqrt(x))
