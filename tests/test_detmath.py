"""Exact-math stack: IEEE div/sqrt emulation + the pinned libm."""

import struct
import subprocess

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pwnfps_tpu.core import detmath as D
from pwnfps_tpu.core.ieee import div_rn, sqrt_rn
from pwnfps_tpu.utils import oracle


def _inputs(n=100000):
    rng = np.random.default_rng(9)
    return np.exp(rng.uniform(np.log(1e-13), np.log(1e8), n)) \
        .astype(np.float32)


def test_div_sqrt_exact_numpy():
    a = _inputs()
    b = _inputs()[::-1].copy()
    np.testing.assert_array_equal(div_rn(a, b).view(np.uint32),
                                  (a / b).view(np.uint32))
    np.testing.assert_array_equal(sqrt_rn(a).view(np.uint32),
                                  np.sqrt(a).view(np.uint32))
    # exact quotients / perfect squares (tie and carry paths)
    ex = np.float32([1, 2, 3, 10, 0.25, 6.25, 9, 1024])
    np.testing.assert_array_equal(sqrt_rn(ex), np.sqrt(ex))
    np.testing.assert_array_equal(div_rn(ex, np.float32(2.0) + 0 * ex),
                                  ex / np.float32(2.0))


def test_div_sqrt_exact_jnp():
    a = _inputs(20000)
    b = _inputs(20000)[::-1].copy()
    g = np.asarray(jax.jit(lambda x, y: div_rn(x, y, jnp))(a, b))
    np.testing.assert_array_equal(g.view(np.uint32),
                                  (a / b).view(np.uint32))
    g = np.asarray(jax.jit(lambda x: sqrt_rn(x, jnp))(a))
    np.testing.assert_array_equal(g.view(np.uint32),
                                  np.sqrt(a).view(np.uint32))


def _detmath_c(x):
    exe = oracle._bin("detmath_test")
    inp = "/tmp/dmt_in.bin"
    out = "/tmp/dmt_out.bin"
    with open(inp, "wb") as f:
        f.write(struct.pack("<I", x.size))
        f.write(np.asarray(x, np.float32).tobytes())
    subprocess.run([exe, inp, out], check=True)
    return np.fromfile(out, np.float32).reshape(x.size, 3)


@pytest.mark.skipif(not oracle.available(),
                    reason="reference checkout unavailable")
def test_pinned_libm_bit_identical_c_vs_numpy():
    rng = np.random.default_rng(12)
    x = np.concatenate([rng.uniform(-700, 700, 100000),
                        rng.uniform(-4, 4, 30000),
                        rng.uniform(-600, 0, 30000)]).astype(np.float32)
    c = _detmath_c(x)
    for i, f in enumerate((D.sin_det, D.cos_det, D.exp_det)):
        np.testing.assert_array_equal(f(x).view(np.uint32),
                                      c[:, i].view(np.uint32))


def test_pinned_libm_bit_identical_numpy_vs_jnp():
    # bit-identity requires a backend that double-rounds mul+add (TPU
    # always; XLA:CPU only when its emitters honour no-FMA -- jaxlib
    # 0.9.0's do not, see tests/fputil.py), else assert close ULPs
    from .fputil import fma_contracts
    rng = np.random.default_rng(13)
    x = rng.uniform(-700, 700, 50000).astype(np.float32)
    xe = rng.uniform(-300, 0, 50000).astype(np.float32)
    for f, v in ((D.sin_det, x), (D.cos_det, x), (D.exp_det, xe)):
        g = np.asarray(jax.jit(lambda a, f=f: f(a, jnp))(v))
        want = f(v)
        if not fma_contracts():
            np.testing.assert_array_equal(g.view(np.uint32),
                                          want.view(np.uint32))
        else:
            ulp = np.abs(g.view(np.int32) - want.view(np.int32))
            frac = (ulp == 0).mean()
            assert frac > 0.95 and ulp.max() <= 16, (frac, ulp.max())


def test_pinned_libm_accuracy():
    rng = np.random.default_rng(14)
    x = rng.uniform(-700, 700, 50000).astype(np.float32)
    assert np.abs(D.sin_det(x) - np.sin(x.astype(np.float64))).max() < 2e-7
    assert np.abs(D.cos_det(x) - np.cos(x.astype(np.float64))).max() < 2e-7
    xe = rng.uniform(-80, 0, 50000).astype(np.float32)
    rel = np.abs(D.exp_det(xe) - np.exp(xe.astype(np.float64))) \
        / np.exp(xe.astype(np.float64))
    assert rel.max() < 1e-5
