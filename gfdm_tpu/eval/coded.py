"""Coded-link evaluation: conv-coded GFDM bursts, soft-decision decoding.

Closes the LLR loop (round-3 verdict item 7): ops.softbits produces max-log
LLRs, coding.viterbi_decode consumes them, and this harness measures the
coded BER against the uncoded link at equal Eb/N0 - the coding gain that
justifies the soft-output receiver. One burst carries one zero-terminated
codeword (468 QPSK symbols = 936 coded bits = 462 info bits at rate 1/2),
batched on device; the interleaver spreads faded-subcarrier error bursts
under the multipath channel.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GfdmConfig
from ..coding import (
    conv_encode,
    info_bits_for_block,
    interleaver,
    viterbi_decode,
)
from ..ops.planar_pipeline import prepare, receive_bursts_planar, transmit_planar
from ..ops.softbits import qpsk_llrs_planar
from .ber import _apply_multipath

__all__ = ["coded_ber_point", "coded_vs_uncoded"]

_SQRT2 = np.float32(2.0**0.5)


@lru_cache(maxsize=16)
def _coded_fn(cfg: GfdmConfig, ic_iterations: int, equalizer: str,
              channel: str, n_channel_taps: int):
    n_coded = 2 * cfg.n_data_symbols  # QPSK: 2 coded bits per symbol
    n_info = info_bits_for_block(n_coded)
    perm = interleaver(n_coded)
    inv_perm = np.argsort(perm)

    @jax.jit
    def fn(key, snr_db, coded_bits):
        # coded_bits: (B, n_coded) already interleaved; map to planar QPSK
        pairs = coded_bits.reshape(coded_bits.shape[0], -1, 2)
        data = jnp.moveaxis(1.0 - 2.0 * pairs.astype(jnp.float32), -1, -2)
        data = data / _SQRT2  # (B, 2, n_data)
        bursts = transmit_planar(cfg, data)[:, 0, :, :]
        key, k_ch, k_n = jax.random.split(key, 3)
        if channel == "multipath":
            bursts = _apply_multipath(k_ch, bursts, n_channel_taps)
        power = jnp.mean(jnp.sum(bursts**2, axis=-2))
        nvar = power / (2.0 * 10.0 ** (snr_db / 10.0))
        noise = jnp.sqrt(nvar) * jax.random.normal(k_n, bursts.shape)
        out = receive_bursts_planar(
            cfg, bursts + noise, ic_iterations=ic_iterations,
            equalizer=equalizer,
        )
        # max-log LLRs from the estimated in-band SNR (unit-power QPSK)
        noise_var = 1.0 / jnp.maximum(out["snr_lin"], 1e-6)
        llrs = qpsk_llrs_planar(out["data"], noise_var)
        llrs = llrs.reshape(llrs.shape[0], -1)  # (B, n_coded)
        llrs = jnp.take(llrs, jnp.asarray(inv_perm), axis=-1)  # deinterleave
        return viterbi_decode(llrs, n_info)

    return fn, n_info, perm


def coded_ber_point(
    cfg: GfdmConfig,
    ebn0_db: float,
    bursts: int = 256,
    ic_iterations: int = 2,
    equalizer: str = "zf",
    channel: str = "awgn",
    n_channel_taps: int = 8,
    seed: int = 0,
) -> float:
    """Coded BER at one Eb/N0 point (dB).

    Es/N0 accounting: rate-1/2 QPSK carries 1 info bit per symbol, so
    Es/N0 = Eb/N0 and the channel SNR equals ``ebn0_db`` (the uncoded QPSK
    link at equal Eb/N0 runs 3 dB hotter: Es = 2 Eb).
    """
    prepare(cfg)
    fn, n_info, perm = _coded_fn(cfg, int(ic_iterations), equalizer,
                                 str(channel), int(n_channel_taps))
    rng = np.random.default_rng(seed)
    bits = rng.integers(0, 2, (bursts, n_info)).astype(np.uint8)
    coded = conv_encode(bits)[..., perm]  # interleave
    key = jax.random.PRNGKey(seed + 17)
    dec = np.asarray(fn(key, jnp.float32(ebn0_db), jnp.asarray(coded)))
    return float(np.mean(dec != bits))


def coded_vs_uncoded(
    cfg: GfdmConfig,
    ebn0_db,
    bursts: int = 256,
    ic_iterations: int = 2,
    equalizer: str = "zf",
    channel: str = "awgn",
    n_channel_taps: int = 8,
    seed: int = 0,
):
    """Coded and uncoded BER over Eb/N0 points (equal-energy comparison).

    Returns dict with 'ebn0_db', 'coded_ber', 'uncoded_ber'. Uncoded QPSK
    at Eb/N0 x runs at channel SNR x + 3.01 dB (2 info bits per symbol).
    """
    from .ber import ber_sweep

    ebn0 = np.asarray(ebn0_db, dtype=np.float64)
    coded = [
        coded_ber_point(cfg, float(e), bursts=bursts,
                        ic_iterations=ic_iterations, equalizer=equalizer,
                        channel=channel, n_channel_taps=n_channel_taps,
                        seed=seed + i)
        for i, e in enumerate(ebn0)
    ]
    un = ber_sweep(cfg, ebn0 + 10 * np.log10(2.0), bursts_per_point=bursts,
                   ic_iterations=ic_iterations, equalizer=equalizer,
                   channel=channel, n_channel_taps=n_channel_taps, seed=seed)
    return {
        "ebn0_db": ebn0,
        "coded_ber": np.asarray(coded),
        "uncoded_ber": un["ber"],
    }
