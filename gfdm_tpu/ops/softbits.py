"""Soft-output demapping: per-bit log-likelihood ratios.

A capability beyond the reference (its receiver produces hard symbols only):
LLRs enable coded links (LDPC/convolutional) downstream. Max-log LLRs for
Gray-mapped QPSK reduce to scaled I/Q components; noise variance comes from
the preamble SNR estimate.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["qpsk_llrs", "qpsk_llrs_planar"]

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
