"""Batched channel + SNR estimation ops (JAX/XLA path).

The whole preamble channel estimator (per-half FFT x inverse reference,
Gaussian smoothing, linear frame interpolation) is linear in the received
preamble and is applied as a single (M*K, 2K) matmul built in
gfdm_tpu.ops.operators. SNR estimation is the quadratic even/odd-bin energy
split of /root/reference/lib/preamble_channel_estimator_cc.cc:187-235.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GfdmConfig
from . import operators
from ._validate import check_last_dim

__all__ = ["estimate_frame", "estimate_snr", "prepare_for_zf"]

DEFAULT_DTYPE = jnp.complex64


@lru_cache(maxsize=16)
def _estimate_fn(cfg: GfdmConfig, dtype):
    E_T = operators.channel_estimation_operator(cfg).T.astype(np.dtype(dtype))

    @jax.jit
    def fn(rx_preamble):
        return rx_preamble @ E_T

    return fn


def estimate_frame(cfg: GfdmConfig, rx_preamble, dtype=DEFAULT_DTYPE):
    """(..., 2K) received core preamble -> (..., M*K) FD channel estimate."""
    rx_preamble = jnp.asarray(rx_preamble, dtype=dtype)
    check_last_dim(rx_preamble, 2 * cfg.subcarriers, "estimate_frame",
                   "2*subcarriers (core preamble)")
    return _estimate_fn(cfg, dtype)(rx_preamble)


@jax.jit
def prepare_for_zf(frame_estimate):
    """conj(1/H): divide-free ZF form (preamble_channel_estimator_cc.cc:276-282)."""
    return jnp.conj(1.0 / frame_estimate)


@lru_cache(maxsize=16)
def _snr_fn(cfg: GfdmConfig, dtype):
    K = cfg.subcarriers
    half = cfg.active_subcarriers // 2
    offset = 1 if cfg.dc_free else 0
    hi = 2 * (np.arange(half) + offset)
    unused_half = (K - cfg.active_subcarriers) // 2
    lo = 2 * (np.arange(half) + unused_half + K // 2)
    sig_idx = np.concatenate((hi, lo))
    noise_idx = np.concatenate((hi + 1, lo + 1))
    F2_T = operators.dft_matrix(2 * K).T.astype(np.dtype(dtype))

    @jax.jit
    def fn(rx_preamble):
        F = rx_preamble @ F2_T
        p = jnp.abs(F) ** 2
        cnrs = jnp.take(p, jnp.asarray(sig_idx), axis=-1)
        sym = jnp.sum(cnrs, axis=-1)
        noise = jnp.sum(jnp.take(p, jnp.asarray(noise_idx), axis=-1), axis=-1)
        snr_lin = (sym - noise) / noise
        scale = snr_lin / (sym / cnrs.shape[-1])
        return snr_lin, cnrs * scale[..., None]

    return fn


def estimate_snr(cfg: GfdmConfig, rx_preamble, dtype=DEFAULT_DTYPE):
    """(..., 2K) preamble -> ((...,) linear SNR, (..., active) CNRs)."""
    return _snr_fn(cfg, dtype)(jnp.asarray(rx_preamble, dtype=dtype))
