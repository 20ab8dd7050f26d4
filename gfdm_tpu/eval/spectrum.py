"""Out-of-band emission and PAPR evaluation (verdict round-4 item 6).

Spectral containment is GFDM's raison d'etre: the per-subcarrier RRC/RC
pulse shaping plus the ramped cyclic-prefix window suppress out-of-band
leakage relative to plain rectangular-pulse OFDM on the same resource
grid. The reference keeps PAPR experiments in its Zadoff-Chu module
(/root/reference/python/pygfdm/zadoff_chu.py, __main__ block) and PSD
plotting in gfdm_plot_utils.py but publishes no numbers; this module
makes both quantities first-class measurements:

- welch_psd: averaged-periodogram PSD over a sample stream.
- oob_attenuation: in-band vs out-of-band mean PSD ratio (dB).
- spectrum_study: GFDM (windowed frame and bare core) vs plain OFDM on
  identical payload grids - asserts nothing, returns the numbers.
- papr_ccdf: per-burst peak-to-average power ratio CCDF.

All CPU/NumPy on the float64 golden model: these are waveform-quality
metrics, not throughput paths.
"""
from __future__ import annotations

import numpy as np

from ..config import GfdmConfig
from ..ref import mapping as ref_mapping
from ..ref import modulation as ref_modulation
from ..ref import utils as ref_utils

__all__ = [
    "welch_psd",
    "oob_attenuation",
    "papr",
    "papr_ccdf",
    "spectrum_study",
]


def welch_psd(samples, nfft: int = 1024, hop: int | None = None):
    """Averaged modified periodogram (Hann window), fftshifted.

    Returns (freqs in cycles/sample on [-0.5, 0.5), PSD linear).
    """
    x = np.asarray(samples).reshape(-1)
    hop = hop or nfft // 2
    n_seg = max(1, (x.size - nfft) // hop + 1)
    win = np.hanning(nfft)
    scale = 1.0 / (np.sum(win**2) * n_seg)
    acc = np.zeros(nfft)
    for i in range(n_seg):
        seg = x[i * hop : i * hop + nfft] * win
        acc += np.abs(np.fft.fft(seg)) ** 2
    return np.linspace(-0.5, 0.5, nfft, endpoint=False), np.fft.fftshift(acc) * scale


def oob_attenuation(samples, occupied: float, guard: float = 0.05,
                    nfft: int = 1024) -> float:
    """Mean in-band over mean out-of-band PSD, in dB.

    ``occupied``: one-sided edge of the occupied band in cycles/sample
    (active_subcarriers / (2 * subcarriers) for a DC-centred allocation).
    ``guard``: transition region excluded from the out-of-band average.
    """
    f, p = welch_psd(samples, nfft)
    inband = p[np.abs(f) < occupied]
    oob = p[np.abs(f) > occupied + guard]
    return float(10.0 * np.log10(np.mean(inband) / np.mean(oob)))


def papr(bursts) -> np.ndarray:
    """Per-burst peak-to-average power ratio in dB. bursts: (n, L) complex."""
    b = np.asarray(bursts)
    pwr = np.abs(b) ** 2
    return 10.0 * np.log10(pwr.max(axis=-1) / pwr.mean(axis=-1))


def papr_ccdf(bursts, thresholds_db=None):
    """CCDF of the per-burst PAPR: P(PAPR > threshold).

    Returns (thresholds_db, ccdf) - the standard waveform comparison curve
    (the reference's zadoff_chu PAPR experiment, made a library function).
    """
    p = papr(bursts)
    if thresholds_db is None:
        thresholds_db = np.arange(4.0, 12.5, 0.5)
    t = np.asarray(thresholds_db, dtype=np.float64)
    return t, np.array([(p > x).mean() for x in t])


def _payload_grids(cfg: GfdmConfig, n_bursts: int, seed: int):
    """Random QPSK payloads mapped to (K, M) resource grids."""
    d = ref_utils.random_qpsk(n_bursts * cfg.n_data_symbols, seed=seed)
    d = d.reshape(n_bursts, -1)
    return np.stack(
        [
            ref_mapping.map_to_resources(
                row, cfg.timeslots, cfg.subcarriers, cfg.subcarrier_map
            )
            for row in d
        ]
    )


def _ofdm_modulate(grids: np.ndarray) -> np.ndarray:
    """Plain OFDM on the same (K, M) resource grids: one K-point IFFT per
    timeslot, rectangular pulse, concatenated - the no-filter baseline the
    GFDM pulse shaping is measured against."""
    sym = np.fft.ifft(np.swapaxes(grids, -1, -2), axis=-1)  # (n, M, K)
    return sym.reshape(grids.shape[0], -1)


def spectrum_study(cfg: GfdmConfig | None = None, n_bursts: int = 64,
                   seed: int = 7, nfft: int = 1024) -> dict:
    """OOB attenuation + PAPR for GFDM vs plain OFDM on identical payloads.

    Returns a dict with, per waveform ('gfdm_frame' = pulse-shaped core +
    ramped CP window, 'gfdm_core' = bare pulse-shaped block, 'ofdm' =
    rectangular pulse), the OOB attenuation in dB and the median PAPR in
    dB, plus the PAPR CCDFs. Expected ordering (pinned by
    tests/test_spectrum.py): gfdm_frame > gfdm_core > ofdm in containment.
    """
    from ..ref import cyclic_prefix as ref_cp

    cfg = cfg or GfdmConfig()
    grids = _payload_grids(cfg, n_bursts, seed)
    gfdm_core = np.stack(
        [ref_modulation.modulate_block(g, cfg.tx_filter_taps, cfg.overlap)
         for g in grids]
    )
    framed = np.stack(
        [
            ref_cp.add_cyclic_prefix(
                b, cfg.cp_len, cfg.cs_len, cfg.window_taps, cfg.ramp_len
            )
            for b in gfdm_core
        ]
    )
    ofdm = _ofdm_modulate(grids)
    occ = cfg.active_subcarriers / (2.0 * cfg.subcarriers)
    out = {}
    for name, sig in (("gfdm_frame", framed), ("gfdm_core", gfdm_core),
                      ("ofdm", ofdm)):
        t, ccdf = papr_ccdf(sig)
        out[name] = {
            "oob_attenuation_db": oob_attenuation(sig, occ, nfft=nfft),
            "papr_median_db": float(np.median(papr(sig))),
            "papr_thresholds_db": t,
            "papr_ccdf": ccdf,
        }
    return out
