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
    # without this, XLA:CPU contracts f32 mul+add chains into FMAs,
    # breaking bit-parity of the deterministic libm (TPU never does)
    flags = (flags + " --xla_cpu_enable_fast_math=false").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

# the flag alone does not take effect on this jax version; the config
# API does (must run before backend initialization)
jax.config.update("jax_num_cpu_devices", 8)
