import numpy as np
import pytest

from pwnfps_tpu.core import approx
from pwnfps_tpu.utils import oracle

pytestmark = pytest.mark.skipif(not oracle.available(),
                                reason="reference checkout unavailable")


@pytest.fixture(scope="module")
def tables():
    return approx.SseTables.load(oracle.extract_tables())


def _random_inputs(n=50000):
    rng = np.random.default_rng(42)
    # positive normal floats across the engine's realistic range
    logx = rng.uniform(np.log(1e-13), np.log(1e6), n)
    return np.exp(logx).astype(np.float32)


def test_rsqrt_rcp_bit_exact_numpy(tables):
    x = _random_inputs()
    want_rsq, want_rcp = oracle.approx_pairs(x)
    got_rsq = approx.rsqrt_emu(x, tables.rsqrt)
    got_rcp = approx.rcp_emu(x, tables.rcp)
    np.testing.assert_array_equal(got_rsq.view(np.uint32),
                                  want_rsq.view(np.uint32))
    np.testing.assert_array_equal(got_rcp.view(np.uint32),
                                  want_rcp.view(np.uint32))


def test_rsqrt_rcp_bit_exact_jax(tables):
    import jax.numpy as jnp
    x = _random_inputs(10000)
    want_rsq, want_rcp = oracle.approx_pairs(x)
    got_rsq = np.asarray(approx.rsqrt_emu(jnp.asarray(x),
                                          jnp.asarray(tables.rsqrt), jnp))
    got_rcp = np.asarray(approx.rcp_emu(jnp.asarray(x),
                                        jnp.asarray(tables.rcp), jnp))
    np.testing.assert_array_equal(got_rsq.view(np.uint32),
                                  want_rsq.view(np.uint32))
    np.testing.assert_array_equal(got_rcp.view(np.uint32),
                                  want_rcp.view(np.uint32))


def test_committed_tables_match_host():
    live = approx.SseTables.load(oracle.extract_tables())
    committed = approx.SseTables.load()
    np.testing.assert_array_equal(live.rsqrt, committed.rsqrt)
    np.testing.assert_array_equal(live.rcp, committed.rcp)
