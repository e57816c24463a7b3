"""Structure-of-arrays vector helpers for the batched tracers.

TPU layout note: a [N,3] array tiles as (8,128) with the 3-wide minor
dim padded to 128 lanes - a 42x memory blowup at 1080p (measured: the
first compile of the [N,3] tracer needed 17.3 GB of HBM).  Components
therefore live as separate [N] arrays; V3/C4 are flat pytrees of those.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class V3(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    def __add__(self, o):
        if isinstance(o, V3):
            return V3(self.x + o.x, self.y + o.y, self.z + o.z)
        return V3(self.x + o, self.y + o, self.z + o)

    def __sub__(self, o):
        if isinstance(o, V3):
            return V3(self.x - o.x, self.y - o.y, self.z - o.z)
        return V3(self.x - o, self.y - o, self.z - o)

    def __mul__(self, o):
        if isinstance(o, V3):
            return V3(self.x * o.x, self.y * o.y, self.z * o.z)
        return V3(self.x * o, self.y * o, self.z * o)

    __rmul__ = __mul__

    def where(self, mask, other: "V3") -> "V3":
        return V3(jnp.where(mask, self.x, other.x),
                  jnp.where(mask, self.y, other.y),
                  jnp.where(mask, self.z, other.z))


class C4(NamedTuple):
    """Colour in reference lane order (b, g, r, a)."""

    b: jnp.ndarray
    g: jnp.ndarray
    r: jnp.ndarray
    a: jnp.ndarray

    def __add__(self, o):
        if isinstance(o, C4):
            return C4(self.b + o.b, self.g + o.g, self.r + o.r,
                      self.a + o.a)
        return C4(self.b + o, self.g + o, self.r + o, self.a + o)

    def __mul__(self, o):
        if isinstance(o, C4):
            return C4(self.b * o.b, self.g * o.g, self.r * o.r,
                      self.a * o.a)
        return C4(self.b * o, self.g * o, self.r * o, self.a * o)

    __rmul__ = __mul__

    def where(self, mask, other: "C4") -> "C4":
        return C4(jnp.where(mask, self.b, other.b),
                  jnp.where(mask, self.g, other.g),
                  jnp.where(mask, self.r, other.r),
                  jnp.where(mask, self.a, other.a))


def dot_sse(a: V3, b: V3):
    """v_dot association for w=0 vectors: (px + pz) + py (util.h:18-30)."""
    return (a.x * b.x + a.z * b.z) + a.y * b.y


def normalise_sse(v: V3, rsq) -> V3:
    """v_normalise: s = (x^2 + z^2) + y^2, then the rsqrt approximation."""
    s = (v.x * v.x + v.z * v.z) + v.y * v.y
    r = rsq(s)
    return V3(v.x * r, v.y * r, v.z * r)
