"""Test environment: force JAX onto CPU with 8 virtual devices.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on a virtual 8-device CPU mesh.

Note: this image's sitecustomize imports jax and registers the axon TPU
plugin before conftest runs, so JAX_PLATFORMS must be overridden through
jax.config (env-var writes are too late), while XLA_FLAGS still takes effect
because the CPU client is created lazily.
"""
import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # lets parity tests run complex128

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
