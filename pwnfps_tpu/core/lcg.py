"""The reference engine's LCG, re-expressed for SPMD execution.

Reference semantics (/root/reference/util.h:1-16):

    randi:  seed = (seed * 25739 + 4) & 0x7FFFFFFF   (uint32 ops)
    randfu: (randi % 3759) / 3759.0f                 (float32 divide)
    randfs: randfu * 2 - 1                           (float32)

Because the multiply-add happens mod 2^32 and the mask keeps the low 31
bits, the recurrence is exactly  s' = (A*s + C) mod 2^31  for every draw
after the first; the *initial* seed may use all 32 bits (the per-pixel
seed derivation /root/reference/screen.h:19-21 is full uint32 arithmetic).

Pixel parity requires reproducing not just the generator but the *order*
of draws (e.g. the reflect-blur consumes 5 draws with 2 discarded,
/root/reference/trace.h:79-84, and the DoF blur consumes draws serially
along a scanline, /root/reference/screen.h:100-102).  For data-parallel
execution we jump the generator ahead analytically:

    s_n = A^n * s_0 + C_n  (mod 2^31),   C_n = C * (A^n - 1) / (A - 1)

computed iteratively to avoid modular division.  All functions below work
on numpy *or* jax arrays (pure ufunc arithmetic on uint32).
"""

from __future__ import annotations

import numpy as np

A = np.uint32(25739)
C = np.uint32(4)
MASK31 = np.uint32(0x7FFFFFFF)
MOD_U = np.uint32(3759)
# The reference builds with -ffast-math, which compiles `x / 3759.0f` into
# `x * (1.0f/3759.0f)` (verified bit-for-bit against the compiled oracle,
# tools/oracle harness `rng` mode).  We reproduce the multiply form.
INV_MOD_F = np.float32(1.0) / np.float32(3759.0)


def randi(seed):
    """One LCG step. seed: uint32 array -> (new_seed, draw). draw == new_seed."""
    with np.errstate(over="ignore"):
        seed = (seed * A + C) & MASK31
    return seed, seed


def randfu(seed, np_mod=np):
    """Uniform in [0,1): (randi % 3759) * (1/3759.0f). Returns (seed, f32)."""
    seed, v = randi(seed)
    f = (v % MOD_U).astype(np_mod.float32) * INV_MOD_F
    return seed, f


def randfs(seed, np_mod=np):
    """Signed uniform in [-1,1): randfu*2-1. Returns (seed, f32)."""
    seed, f = randfu(seed, np_mod)
    return seed, f * np_mod.float32(2.0) - np_mod.float32(1.0)


def jump_coeffs(n_max: int) -> tuple[np.ndarray, np.ndarray]:
    """(A^k mod 2^31, C_k mod 2^31) for k in [0, n_max].

    s_k = (A^k * s_0 + C_k) mod 2^31  -- valid when s_0 is already 31-bit
    (i.e. for every state after the first randi call).
    """
    ak = np.empty(n_max + 1, np.uint32)
    ck = np.empty(n_max + 1, np.uint32)
    a, c = np.uint32(1), np.uint32(0)
    with np.errstate(over="ignore"):
        for k in range(n_max + 1):
            ak[k] = a
            ck[k] = c
            # next: A^(k+1), C_{k+1} = A*C_k + C  (all mod 2^31)
            c = (A * c + C) & MASK31
            a = (a * A) & MASK31
    return ak, ck


def jump(seed, ak, ck):
    """Jump a 31-bit state forward: s -> A^k*s + C_k (mod 2^31).

    `ak`/`ck` may be scalars or arrays broadcastable with `seed`.
    """
    with np.errstate(over="ignore"):
        return (seed * ak + ck) & MASK31


def pixel_seed(x, y, rwidth: int):
    """Per-pixel primary-ray seed, /root/reference/screen.h:19-21.

    seed = (x + y*y*(rwidth+1)); seed *= seed^2; seed *= seed^2  -> seed^9,
    all in wrapping uint32 (no 31-bit mask until the first randi).
    `x`, `y` must be uint32 arrays (or scalars).
    """
    with np.errstate(over="ignore"):
        s = x + y * y * np.uint32(rwidth + 1)
        s = s * (s * s)
        s = s * (s * s)
    return s


def blur_row_seed(cy):
    """Per-scanline DoF blur seed, /root/reference/screen.h:82."""
    cy = np.uint32(cy) if np.isscalar(cy) else cy
    return cy * cy + np.uint32(415135)
