"""Legacy oversampled modulator as a batched JAX op.

TPU form of the reference's modulator_cc block
(/root/reference/lib/modulator_cc_impl.cc:115-153): the whole oversampled
modulation (per-subcarrier FFT, width-2 filtering, centered circular
placement, fft_len IFFT) is one dense (fft_len, N) operator built from the
golden model in gfdm_tpu.ref.legacy.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GfdmConfig
from ..ref import legacy as legacy_ref

__all__ = ["modulate_oversampled", "legacy_taps"]

DEFAULT_DTYPE = jnp.complex64


@lru_cache(maxsize=16)
def legacy_taps(cfg: GfdmConfig) -> np.ndarray:
    return legacy_ref.sparse_taps_legacy(
        cfg.filtertype, cfg.filteralpha, cfg.timeslots, cfg.subcarriers
    )


@lru_cache(maxsize=16)
def _legacy_operator(cfg: GfdmConfig, fft_len: int) -> np.ndarray:
    n = cfg.block_len
    taps = legacy_taps(cfg)

    A = np.empty((fft_len, n), dtype=np.complex128)
    e = np.zeros(n, dtype=np.complex128)
    for j in range(n):
        e[j] = 1.0
        A[:, j] = legacy_ref.modulate_oversampled_block(
            e.reshape(cfg.subcarriers, cfg.timeslots), taps, fft_len
        )
        e[j] = 0.0
    return A


@lru_cache(maxsize=16)
def _mod_fn(cfg: GfdmConfig, fft_len: int, dtype):
    A_T = _legacy_operator(cfg, fft_len).T.astype(np.dtype(dtype))

    @jax.jit
    def fn(grid_flat):
        return grid_flat @ A_T

    return fn


def modulate_oversampled(cfg: GfdmConfig, grid_flat, fft_len: int | None = None,
                         dtype=DEFAULT_DTYPE):
    """(..., M*K) grid symbols -> (..., fft_len) oversampled centered frame."""
    if fft_len is None:
        fft_len = cfg.block_len
    return _mod_fn(cfg, int(fft_len), dtype)(jnp.asarray(grid_flat, dtype=dtype))
