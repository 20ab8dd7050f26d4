"""Channel simulation utilities for tests, benchmarks and link demos.

The reference simulates channels in QA with np.convolve + synthetic AWGN
(SURVEY.md section 4); this is the batched JAX equivalent: static multipath
(circulant-free causal FIR), AWGN at a target SNR, CFO, and a burst-position
offset within a longer noise floor.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["awgn", "apply_cfo", "multipath", "place_in_stream"]


def multipath(signal, taps):
    """Causal FIR channel along the last axis (same length as input)."""
    taps = jnp.asarray(taps, dtype=signal.dtype)
    n = taps.shape[-1]
    padded = jnp.pad(signal, [(0, 0)] * (signal.ndim - 1) + [(n - 1, 0)])
    # correlation with reversed taps == convolution
    windows = jnp.stack([padded[..., i : i + signal.shape[-1]] for i in range(n)], axis=-1)
    return jnp.sum(windows * taps[::-1], axis=-1)


def awgn(key, signal, snr_db, measure=None):
    """Add complex AWGN at the given SNR (energy measured over ``measure``)."""
    ref = signal if measure is None else measure
    avg_energy = jnp.mean(jnp.abs(ref) ** 2)
    snr_lin = 10.0 ** (snr_db / 10.0)
    nvar = avg_energy / (2.0 * snr_lin)
    kr, ki = jax.random.split(key)
    noise = jnp.sqrt(nvar) * (
        jax.random.normal(kr, signal.shape) + 1j * jax.random.normal(ki, signal.shape)
    )
    return signal + noise.astype(signal.dtype)


def apply_cfo(signal, cfo, fft_len):
    """Multiply by e^{j 2 pi cfo n / fft_len} along the last axis."""
    n = jnp.arange(signal.shape[-1], dtype=jnp.float32)
    rot = jnp.exp(2j * jnp.pi * cfo * n / fft_len)
    return signal * rot.astype(signal.dtype)


def place_in_stream(key, bursts, chunk_len: int, offset: int, noise_floor: float = 0.0):
    """Embed each burst at ``offset`` inside a longer noise-floor chunk."""
    shape = bursts.shape[:-1] + (chunk_len,)
    if noise_floor > 0.0:
        kr, ki = jax.random.split(key)
        stream = noise_floor * (
            jax.random.normal(kr, shape) + 1j * jax.random.normal(ki, shape)
        )
        stream = stream.astype(bursts.dtype)
    else:
        stream = jnp.zeros(shape, dtype=bursts.dtype)
    return jax.lax.dynamic_update_slice_in_dim(
        stream, stream[..., offset : offset + bursts.shape[-1]] + bursts, offset, axis=-1
    )
