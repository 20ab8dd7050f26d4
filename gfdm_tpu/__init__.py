"""gfdm_tpu — a TPU-native GFDM (Generalized Frequency Division Multiplexing)
software-radio framework built on JAX/XLA/Pallas.

Re-imagines the capabilities of the kit-cel/gr-gfdm GNU Radio module for TPU
hardware: every signal-processing kernel is a batched, jit-compiled linear
operator or fused kernel; streams of bursts are the parallel axis, sharded
over device meshes with jax.sharding.

Layout:
  gfdm_tpu.config    - GfdmConfig, the single source of truth
  gfdm_tpu.ref       - NumPy golden model (ground truth for all QA)
  gfdm_tpu.ops       - batched JAX ops (XLA path)
  gfdm_tpu.kernels   - Pallas TPU kernels for the hot fused paths
  gfdm_tpu.runtime   - Tx/Rx chain composites + streaming
  gfdm_tpu.parallel  - mesh sharding, halo exchange, distributed metrics
"""
from .config import GfdmConfig

__version__ = "0.1.0"

__all__ = ["GfdmConfig", "__version__"]
