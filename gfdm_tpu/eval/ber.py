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
def _sweep_fn(cfg: GfdmConfig, ic_iterations: int, constellation: str,
              equalizer: str):
    from ..ops.rx import constellation_points

    points = constellation_points(constellation)
    order = int(np.log2(points.size))  # bits per symbol
    pts_r = np.ascontiguousarray(points.real.astype(np.float32))
    pts_i = np.ascontiguousarray(points.imag.astype(np.float32))
    weights = (1 << np.arange(order - 1, -1, -1)).astype(np.int32)
    shifts = np.arange(order - 1, -1, -1).astype(np.int32)

    @jax.jit
    def one_point(key, snr_db, batch_bits):
        # batch_bits: (B, n_data, order) in {0,1}; index = bits (msb first)
        # per the golden mapping (ref.symbolmapping.bits_to_symbols)
        idx = jnp.sum(batch_bits.astype(jnp.int32) * weights, axis=-1)
        data = jnp.stack(
            [jnp.take(jnp.asarray(pts_r), idx), jnp.take(jnp.asarray(pts_i), idx)],
            axis=-2,
        )  # (B, 2, n_data)
        bursts = transmit_planar(cfg, data)[:, 0, :, :]  # (B, 2, L)
        # AWGN at target SNR (planar): noise var per real component
        power = jnp.mean(jnp.sum(bursts**2, axis=-2))
        nvar = power / (2.0 * 10.0 ** (snr_db / 10.0))
        noise = jnp.sqrt(nvar) * jax.random.normal(key, bursts.shape)
        out = receive_bursts_planar(
            cfg, bursts + noise, ic_iterations=ic_iterations,
            constellation=tuple(points.tolist()), equalizer=equalizer,
        )
        # hard decision back to bit indices (nearest point)
        r, i = out["data"][..., 0, :], out["data"][..., 1, :]
        dist = (r[..., None] - pts_r) ** 2 + (i[..., None] - pts_i) ** 2
        idx_hat = jnp.argmin(dist, axis=-1)
        rx_bits = (idx_hat[..., None] >> shifts) & 1
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
    constellation: str = "qpsk",
    equalizer: str = "zf",
):
    """BER + EVM + estimated-SNR curve over the given SNR points.

    ``constellation``: 'qpsk', 'qam16' or 'qam64' (Gray, per the golden model).
    Returns a dict of numpy arrays keyed by 'snr_db', 'ber', 'evm',
    'snr_est_db'.
    """
    prepare(cfg)
    fn = _sweep_fn(cfg, int(ic_iterations), constellation, equalizer)
    from ..ops.rx import constellation_points

    order = int(np.log2(constellation_points(constellation).size))
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)

    bers, evms, snr_ests = [], [], []
    n_bits = bursts_per_point * cfg.n_data_symbols * order
    for i, snr_db in enumerate(np.asarray(snrs_db, dtype=np.float32)):
        bits = rng.integers(0, 2, (bursts_per_point, cfg.n_data_symbols, order))
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
