"""Test environment: run JAX on a virtual 8-device CPU mesh.

Real-TPU tests live behind the PWNFPS_TPU_TESTS=1 env switch (the CI/test
default must be green without hardware).  Must run before jax imports.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_enable_fast_math" not in flags:
    # asks XLA:CPU not to contract f32 mul+add chains into FMAs, which
    # breaks bit-parity of the deterministic libm (TPU never contracts).
    # jaxlib 0.9.0 parses but IGNORES this flag -- tests/fputil.py
    # probes the actual behaviour and parity tests relax accordingly.
    flags = (flags + " --xla_cpu_enable_fast_math=false").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

# the flag alone does not take effect on this jax version; the config
# API does (must run before backend initialization)
jax.config.update("jax_num_cpu_devices", 8)
# a sitecustomize.py may have force-registered a TPU plugin before this
# file runs (making the JAX_PLATFORMS env var above inert); the config
# API still wins as long as no backend has been initialized
jax.config.update("jax_platforms", "cpu")
