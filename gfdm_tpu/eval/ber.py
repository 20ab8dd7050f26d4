"""Monte-Carlo link evaluation: BER/EVM over SNR, batched on device.

TPU-native replacement for the reference's multiprocessing BER sweep harness
(/root/reference/python/pygfdm/testsuite.py:11-80): each SNR point is one
batched end-to-end link simulation (thousands of bursts in one jit call)
instead of thousands of per-frame Python processes.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GfdmConfig
from ..ops.planar_pipeline import (
    prepare,
    receive_bursts_planar,
    transmit_planar,
)

__all__ = ["ber_sweep", "qpsk_bits_to_planar", "planar_to_bits"]


def qpsk_bits_to_planar(bits):
    """(..., n_data, 2) bits -> (..., 2, n_data) planar QPSK symbols."""
    symbols = (1.0 - 2.0 * bits.astype(np.float32)) / np.sqrt(2.0)
    return np.moveaxis(symbols, -1, -2)


def planar_to_bits(symbols):
    """(..., 2, n_data) planar symbols -> (..., n_data, 2) hard bits."""
    return jnp.moveaxis(symbols < 0.0, -2, -1)


@lru_cache(maxsize=16)
def _sweep_fn(cfg: GfdmConfig, ic_iterations: int):
    n_data = cfg.n_data_symbols

    @jax.jit
    def one_point(key, snr_db, batch_bits):
        # batch_bits: (B, n_data, 2) in {0,1}
        data = (1.0 - 2.0 * batch_bits.astype(jnp.float32)) / jnp.sqrt(2.0)
        data = jnp.moveaxis(data, -1, -2)  # (B, 2, n_data)
        bursts = transmit_planar(cfg, data)[:, 0, :, :]  # (B, 2, L)
        # AWGN at target SNR (planar): noise var per real component
        power = jnp.mean(jnp.sum(bursts**2, axis=-2))
        nvar = power / (2.0 * 10.0 ** (snr_db / 10.0))
        noise = jnp.sqrt(nvar) * jax.random.normal(key, bursts.shape)
        out = receive_bursts_planar(cfg, bursts + noise, ic_iterations=ic_iterations)
        rx_bits = planar_to_bits(out["data"])
        errors = jnp.sum(rx_bits != batch_bits)
        err = jnp.sum((out["data"] - data) ** 2)
        ref = jnp.sum(data**2)
        return errors, jnp.sqrt(err / ref), jnp.mean(out["snr_lin"])

    return one_point


def ber_sweep(
    cfg: GfdmConfig,
    snrs_db,
    bursts_per_point: int = 1024,
    ic_iterations: int = 2,
    seed: int = 0,
):
    """BER + EVM + estimated-SNR curve over the given SNR points.

    Returns a dict of numpy arrays keyed by 'snr_db', 'ber', 'evm',
    'snr_est_db'.
    """
    prepare(cfg)
    fn = _sweep_fn(cfg, int(ic_iterations))
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)

    bers, evms, snr_ests = [], [], []
    n_bits = bursts_per_point * cfg.n_data_symbols * 2
    for i, snr_db in enumerate(np.asarray(snrs_db, dtype=np.float32)):
        bits = rng.integers(0, 2, (bursts_per_point, cfg.n_data_symbols, 2))
        key, sub = jax.random.split(key)
        errors, evm, snr_est = fn(sub, jnp.float32(snr_db), jnp.asarray(bits))
        bers.append(float(np.asarray(errors)) / n_bits)
        evms.append(float(np.asarray(evm)))
        snr_ests.append(10.0 * np.log10(max(float(np.asarray(snr_est)), 1e-12)))
    return {
        "snr_db": np.asarray(snrs_db, dtype=np.float64),
        "ber": np.asarray(bers),
        "evm": np.asarray(evms),
        "snr_est_db": np.asarray(snr_ests),
    }
