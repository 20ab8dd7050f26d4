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


def _apply_multipath(key, bursts, n_taps: int, decay: float = 1.0):
    """Per-burst random frequency-selective Rayleigh channel (planar).

    Taps are CN(0, p_l) with an exponential power-delay profile
    p_l ~ exp(-decay*l), normalized to unit total power; tap 0 keeps the
    burst causally aligned and ``n_taps <= cp_len`` keeps all ISI inside the
    cyclic prefix. The analogue of the reference QA's np.convolve channel
    (SURVEY section 4; /root/reference/python/qa_channel_estimator_cc.py).
    """
    B, _, L = bursts.shape
    profile = np.exp(-decay * np.arange(n_taps)).astype(np.float32)
    profile /= profile.sum()
    amp = jnp.sqrt(jnp.asarray(profile) / 2.0)
    taps = amp[None, None, :] * jax.random.normal(key, (B, 2, n_taps))
    # y[t] = sum_l h[l] * x[t-l], complex product in planar form
    y_r = jnp.zeros((B, L))
    y_i = jnp.zeros((B, L))
    x_r, x_i = bursts[:, 0, :], bursts[:, 1, :]
    for l in range(n_taps):
        xs_r = jnp.pad(x_r, ((0, 0), (l, 0)))[:, :L]
        xs_i = jnp.pad(x_i, ((0, 0), (l, 0)))[:, :L]
        h_r, h_i = taps[:, 0, l : l + 1], taps[:, 1, l : l + 1]
        y_r = y_r + h_r * xs_r - h_i * xs_i
        y_i = y_i + h_r * xs_i + h_i * xs_r
    return jnp.stack([y_r, y_i], axis=-2)


def _apply_cfo(cfg: GfdmConfig, bursts, cfo: float):
    """Constant carrier-frequency offset (fraction of subcarrier spacing)."""
    L = bursts.shape[-1]
    phase = 2.0 * np.pi * cfo * np.arange(L) / cfg.subcarriers
    c = jnp.asarray(np.cos(phase).astype(np.float32))
    s = jnp.asarray(np.sin(phase).astype(np.float32))
    r, i = bursts[..., 0, :], bursts[..., 1, :]
    return jnp.stack([r * c - i * s, r * s + i * c], axis=-2)


@lru_cache(maxsize=32)
def _sweep_fn(cfg: GfdmConfig, ic_iterations: int, constellation: str,
              equalizer: str, channel: str, n_channel_taps: int, cfo: float):
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
        key, k_ch, k_n = jax.random.split(key, 3)
        if channel == "multipath":
            bursts = _apply_multipath(k_ch, bursts, n_channel_taps)
        if cfo:
            bursts = _apply_cfo(cfg, bursts, cfo)
        # AWGN at target SNR (planar): noise var per real component
        power = jnp.mean(jnp.sum(bursts**2, axis=-2))
        nvar = power / (2.0 * 10.0 ** (snr_db / 10.0))
        noise = jnp.sqrt(nvar) * jax.random.normal(k_n, bursts.shape)
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
    channel: str = "awgn",
    n_channel_taps: int = 8,
    cfo: float = 0.0,
):
    """BER + EVM + estimated-SNR curve over the given SNR points.

    ``constellation``: 'qpsk', 'qam16' or 'qam64' (Gray, per the golden model).
    ``channel``: 'awgn' (flat) or 'multipath' (per-burst Rayleigh taps with an
    exponential power-delay profile, ``n_channel_taps`` long - keep it at or
    below cp_len so ISI stays inside the prefix). ``cfo`` adds a residual
    carrier-frequency offset in subcarrier spacings (uncorrected by this
    receiver path - models post-sync residue).
    Returns a dict of numpy arrays keyed by 'snr_db', 'ber', 'evm',
    'snr_est_db'.
    """
    if channel not in ("awgn", "multipath"):
        raise ValueError(f"unknown channel model {channel!r}")
    prepare(cfg)
    fn = _sweep_fn(cfg, int(ic_iterations), constellation, equalizer,
                   str(channel), int(n_channel_taps), float(cfo))
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
