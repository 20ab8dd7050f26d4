"""Test environment: force JAX onto CPU with 8 virtual devices.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on a virtual 8-device CPU mesh. Must run before jax is imported.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
