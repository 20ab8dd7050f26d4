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
import os as _os

from .config import GfdmConfig

# Persistent XLA compilation cache - the analogue of the reference's FFTW
# wisdom file (~/.gr_fftw_wisdom, lib/gfdm_kernel_utils.cc:37-55). Remote TPU
# compilation in constrained environments can take minutes; caching makes
# repeat runs start instantly. Opt out with GFDM_TPU_DISABLE_COMPILE_CACHE=1.
if _os.environ.get("GFDM_TPU_DISABLE_COMPILE_CACHE") != "1":
    try:
        import jax as _jax

        _cache_dir = _os.environ.get(
            "GFDM_TPU_COMPILE_CACHE_DIR",
            _os.path.expanduser("~/.cache/gfdm_tpu_xla"),
        )
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

__version__ = "0.1.0"

__all__ = ["GfdmConfig", "__version__"]
