"""DoF blur: jnp vectorized pass vs a direct numpy transliteration of the
reference loops (screen.h:69-123).  Must be BIT exact (pure LCG +
integer ops given the same inputs)."""

import numpy as np

import jax.numpy as jnp

from pwnfps_tpu.core import lcg
from pwnfps_tpu.ops.blur import dof_blur


def numpy_blur_reference(fb: np.ndarray, zbuf: np.ndarray) -> np.ndarray:
    h, w = fb.shape
    out = fb.copy()
    tsbuf = fb.copy()
    fstr = np.float32(0.002) * np.float32(h)
    foffs = np.float32(1.0)
    for cy in range(h):
        seed = np.uint32(cy * cy + 415135)
        for cx in range(0, w - 3, 4):
            vbuf = np.zeros((4, 4), np.uint32)
            for i in range(4):
                for j in range(4):
                    z = zbuf[cy, cx + j] - foffs
                    seed, r1 = lcg.randfs(seed)
                    x = int(np.float32(cx + j) + (r1 * fstr) * z)
                    seed, r2 = lcg.randfs(seed)
                    y = int(np.float32(cy) + (r2 * fstr) * z)
                    x = min(max(x, 0), w - 1)
                    y = min(max(y, 0), h - 1)
                    vbuf[i, j] = tsbuf[y, x]
            for j in range(4):
                b = np.ascontiguousarray(vbuf[:, j]).view(
                    np.uint8).reshape(4, 4).astype(np.uint16)
                a01 = (b[0] + b[1] + 1) >> 1
                a23 = (b[2] + b[3] + 1) >> 1
                acc = ((a01 + a23 + 1) >> 1).astype(np.uint8)
                out[cy, cx + j] = acc.view(np.uint32)[0]
    return out


def test_blur_bit_exact_vs_reference_loops():
    rng = np.random.default_rng(3)
    h, w = 24, 36  # non-multiple-of-4 width exercises the tail rule
    fb = rng.integers(0, 2**32, (h, w), dtype=np.uint32)
    zbuf = rng.uniform(-0.5, 8.0, (h, w)).astype(np.float32)
    want = numpy_blur_reference(fb, zbuf)
    got = np.asarray(dof_blur(jnp.asarray(fb), jnp.asarray(zbuf)))
    np.testing.assert_array_equal(got, want)


def test_blur_multi_pass():
    rng = np.random.default_rng(4)
    h, w = 16, 32
    fb = rng.integers(0, 2**32, (h, w), dtype=np.uint32)
    zbuf = rng.uniform(0.0, 4.0, (h, w)).astype(np.float32)
    want = numpy_blur_reference(numpy_blur_reference(fb, zbuf), zbuf)
    got = np.asarray(dof_blur(jnp.asarray(fb), jnp.asarray(zbuf),
                              passes=2))
    np.testing.assert_array_equal(got, want)
