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

__all__ = ["estimate_frame", "estimate_snr", "prepare_for_zf", "mmse_channel"]

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


@lru_cache(maxsize=16)
def _mmse_fn(cfg: GfdmConfig, per_bin: bool, dtype):
    CNRI_T = operators.cnr_interpolation_operator(cfg).T.astype(np.float32)

    @jax.jit
    def fn(channel_fd, snr_lin, cnrs):
        if per_bin:
            cnr_bins = jnp.maximum(jnp.maximum(cnrs, 0.0) @ CNRI_T, 1e-6)
            w = cnr_bins / (cnr_bins + 1.0)
        else:
            h2 = jnp.abs(channel_fd) ** 2
            w = h2 / (h2 + (1.0 / jnp.maximum(snr_lin, 1e-6))[..., None])
        return channel_fd / w.astype(jnp.float32)

    return fn


def mmse_channel(cfg: GfdmConfig, channel_fd, snr_lin=None, cnrs=None,
                 dtype=DEFAULT_DTYPE):
    """Effective channel for MMSE equalization via the ZF divide path.

    Dividing the block FFT by the returned channel (exactly like
    receiver_kernel_cc.cc:315-316 does with the plain estimate) realizes the
    MMSE-shrunk inversion. With ``cnrs`` (from :func:`estimate_snr`) the
    shrinkage is per-bin (frequency-selective); with only ``snr_lin`` it is
    the scalar-SNR MMSE. Capability beyond the reference's ZF-only divide.
    """
    per_bin = cnrs is not None
    if not per_bin and snr_lin is None:
        raise ValueError("mmse_channel needs snr_lin or cnrs")
    channel_fd = jnp.asarray(channel_fd, dtype=dtype)
    snr_lin = jnp.asarray(0.0 if snr_lin is None else snr_lin, dtype=jnp.float32)
    cnrs = (
        jnp.zeros(2 * (cfg.active_subcarriers // 2), jnp.float32)
        if cnrs is None
        else jnp.asarray(cnrs, dtype=jnp.float32)
    )
    return _mmse_fn(cfg, per_bin, dtype)(channel_fd, snr_lin, cnrs)
