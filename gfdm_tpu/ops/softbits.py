"""Soft-output demapping: per-bit log-likelihood ratios.

A capability beyond the reference (its receiver produces hard symbols only):
LLRs enable coded links (LDPC/convolutional) downstream. Max-log LLRs for
Gray-mapped QPSK reduce to scaled I/Q components; noise variance comes from
the preamble SNR estimate.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["qpsk_llrs", "qpsk_llrs_planar", "maxlog_llrs",
           "maxlog_llrs_planar"]

_SQRT2 = 2.0**0.5


@jax.jit
def qpsk_llrs(symbols, noise_var):
    """(..., n) complex symbols -> (..., n, 2) LLRs (I-bit, Q-bit).

    Convention: bit 0 maps to +1/sqrt2, bit 1 to -1/sqrt2 per component
    (matches ref.utils.random_qpsk / eval.ber bit mapping). Positive LLR
    favors bit 0.
    """
    s = 2.0 * _SQRT2 / jnp.maximum(noise_var, 1e-12)[..., None]
    return jnp.stack([symbols.real * s, symbols.imag * s], axis=-1)


@jax.jit
def qpsk_llrs_planar(symbols_pl, noise_var):
    """(..., 2, n) planar symbols -> (..., n, 2) LLRs."""
    s = 2.0 * _SQRT2 / jnp.maximum(noise_var, 1e-12)[..., None]
    return jnp.stack(
        [symbols_pl[..., 0, :] * s, symbols_pl[..., 1, :] * s], axis=-1
    )


@lru_cache(maxsize=16)
def _maxlog_fn(points_key: tuple):
    points = np.asarray(points_key, dtype=np.complex64)
    order = int(np.log2(points.size))
    shifts = np.arange(order - 1, -1, -1)
    # bit_masks[b, i] = 1.0 where constellation index i has bit b set
    bit_masks = (((np.arange(points.size)[None, :] >> shifts[:, None]) & 1)
                 .astype(np.float32))
    big = np.float32(1e30)

    @jax.jit
    def fn(symbols, noise_var):
        d = jnp.abs(symbols[..., None] - jnp.asarray(points)) ** 2  # (..., P)
        masks = jnp.asarray(bit_masks)  # (order, P)
        d1 = jnp.min(d[..., None, :] + (1.0 - masks) * big, axis=-1)
        d0 = jnp.min(d[..., None, :] + masks * big, axis=-1)
        return (d1 - d0) / jnp.maximum(noise_var, 1e-12)[..., None]

    return fn


def maxlog_llrs(symbols, points, noise_var):
    """Generic max-log LLRs for any labeled constellation.

    ``points``: (2**order,) complex, index = MSB-first bit label (the
    ref.symbolmapping convention). (..., n) symbols -> (..., n, order) LLRs;
    positive favors bit 0. For Gray QPSK this reduces exactly to
    :func:`qpsk_llrs`.
    """
    key = tuple(np.asarray(points).astype(np.complex64).tolist())
    return _maxlog_fn(key)(jnp.asarray(symbols), jnp.asarray(noise_var))


@lru_cache(maxsize=16)
def _maxlog_planar_fn(points_key: tuple):
    points = np.asarray(points_key, dtype=np.complex64)
    order = int(np.log2(points.size))
    shifts = np.arange(order - 1, -1, -1)
    bit_masks = (((np.arange(points.size)[None, :] >> shifts[:, None]) & 1)
                 .astype(np.float32))
    big = np.float32(1e30)
    pr = points.real.astype(np.float32)
    pi = points.imag.astype(np.float32)

    @jax.jit
    def fn(symbols_pl, noise_var):
        # distances are purely real arithmetic - the complex-free TPU form
        sr = symbols_pl[..., 0, :, None]
        si = symbols_pl[..., 1, :, None]
        d = (sr - jnp.asarray(pr)) ** 2 + (si - jnp.asarray(pi)) ** 2
        masks = jnp.asarray(bit_masks)  # (order, P)
        d1 = jnp.min(d[..., None, :] + (1.0 - masks) * big, axis=-1)
        d0 = jnp.min(d[..., None, :] + masks * big, axis=-1)
        return (d1 - d0) / jnp.maximum(noise_var, 1e-12)[..., None]

    return fn


def maxlog_llrs_planar(symbols_pl, points, noise_var):
    """:func:`maxlog_llrs` on (..., 2, n) planar symbols (no complex dtype
    anywhere - the on-device form the streaming service's FEC path uses).
    Returns (..., n, order); positive favors bit 0."""
    key = tuple(np.asarray(points).astype(np.complex64).tolist())
    return _maxlog_planar_fn(key)(
        jnp.asarray(symbols_pl), jnp.asarray(noise_var)
    )
