"""Native C++ host runtime vs the Python implementations."""

import numpy as np
import pytest

from pwnfps_tpu.host import native
from pwnfps_tpu.world.objects import ObjectPool

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no native toolchain")


def test_fb_to_rgb_upscaled():
    rng = np.random.default_rng(0)
    fb = rng.integers(0, 2**32, (7, 9), dtype=np.uint32)
    got = native.fb_to_rgb_upscaled(fb, 3)
    px = fb.view(np.uint8).reshape(7, 9, 4)[..., [2, 1, 0]]
    want = np.repeat(np.repeat(px, 3, 0), 3, 1)
    np.testing.assert_array_equal(got, want)


def test_write_ppm(tmp_path):
    rgb = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    p = str(tmp_path / "x.ppm")
    native.write_ppm(p, rgb)
    raw = open(p, "rb").read()
    assert raw.startswith(b"P6\n3 2\n255\n")
    assert raw.endswith(rgb.tobytes())


def test_prepare_render_matches_python():
    pool = ObjectPool()
    rng = np.random.default_rng(1)
    for k in range(10):
        i = pool.obj_new()
        pool.obj_set_sphere(i, 0.05 + 0.3 * rng.random(), 0.5,
                            2 + 50 * rng.random(), 0.3,
                            2 + 50 * rng.random(), 1, 1, 1)
    pool.obj_free(3)       # free-list hole: skipped by both paths
    py = pool.prepare_render()
    res = native.prepare_render_native(pool, py.buckets.shape[2])
    assert res is not None
    buckets, counts, masks, n = res
    np.testing.assert_array_equal(counts, py.counts)
    np.testing.assert_array_equal(buckets, py.buckets)
    # mask bits equal bucket membership
    want_mask = np.zeros((64, 64), np.int32)
    for k in range(py.buckets.shape[2]):
        si = py.buckets[:, :, k]
        want_mask |= np.where(si >= 0, (1 << np.clip(si, 0, 30)), 0)
    np.testing.assert_array_equal(masks, want_mask)
    assert n == 9
