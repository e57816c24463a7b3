import numpy as np

from pwnfps_tpu.core import lcg


def ref_randi(seed: int) -> tuple[int, int]:
    # straight transliteration of /root/reference/util.h:1-6 semantics
    seed = ((seed * 25739) + 4) & 0xFFFFFFFF
    seed &= 0x7FFFFFFF
    return seed, seed


def test_randi_matches_reference_semantics():
    rng = np.random.default_rng(0)
    seeds = rng.integers(0, 2**32, size=1000, dtype=np.uint32)
    got, _ = lcg.randi(seeds.copy())
    want = np.array([ref_randi(int(s))[0] for s in seeds], np.uint32)
    np.testing.assert_array_equal(got, want)


def test_randfu_randfs_values():
    # golden bits from `oracle rng 3039 8` (gcc -O3 -ffast-math build of
    # the reference util.h): state, randfu bits, state, randfs bits
    golden = [
        (0x12F072F7, 0x3F6AD1E4, 0x3F55A3C8),
        (0x3576E821, 0x3EAC2A39, 0xBEA7AB8E),
        (0x7A3CEDEF, 0x3E4E376F, 0xBF18E448),
        (0x2C068CC9, 0x3F0C052D, 0x3DC052D0),
    ]
    su = np.uint32(0x3039)
    ss = np.uint32(0x3039)
    for state, fu_bits, fs_bits in golden:
        su, fu = lcg.randfu(su)
        ss, fs = lcg.randfs(ss)
        assert int(su) == state and int(ss) == state
        assert fu.view(np.uint32) == np.uint32(fu_bits)
        assert fs.view(np.uint32) == np.uint32(fs_bits)


def test_jump_matches_serial():
    ak, ck = lcg.jump_coeffs(100)
    # jump is defined on 31-bit states: advance once first
    s0 = np.uint32(0xDEADBEEF)
    s0, _ = lcg.randi(s0)
    s = s0
    for k in range(101):
        assert lcg.jump(s0, ak[k], ck[k]) == s
        s, _ = lcg.randi(s)


def test_jump_vectorized():
    ak, ck = lcg.jump_coeffs(32)
    seeds = np.arange(16, dtype=np.uint32) * np.uint32(7919)
    seeds, _ = lcg.randi(seeds)
    jumped = lcg.jump(seeds, ak[32], ck[32])
    serial = seeds.copy()
    for _ in range(32):
        serial, _ = lcg.randi(serial)
    np.testing.assert_array_equal(jumped, serial)


def test_pixel_seed_wraps_uint32():
    # screen.h:19-21: full uint32 wraparound, no 31-bit mask
    s = lcg.pixel_seed(np.uint32(37), np.uint32(150), 320)
    base = (37 + 150 * 150 * 321) & 0xFFFFFFFF
    want = base
    want = (want * ((want * want) & 0xFFFFFFFF)) & 0xFFFFFFFF
    want = (want * ((want * want) & 0xFFFFFFFF)) & 0xFFFFFFFF
    assert int(s) == want


def test_blur_row_seed():
    assert int(lcg.blur_row_seed(7)) == 7 * 7 + 415135
