"""Structure-exploiting (factorized) planar pipeline - the 'fast' method.

The dense-operator path (planar_pipeline) applies (2N, 2N) realified matmuls
for the block DFT and the FD demodulation stage. For N = K*M those have
Cooley-Tukey structure: a K-point stage, a twiddle multiply, and an M-point
stage - ~8x fewer MXU FLOPs at the cost of a few transposes. Likewise the
sparse filter fold/scatter is L rolls + elementwise tap multiplies instead of
a dense matmul.

Decomposition used (N = K*M, n = M*n2 + n1, X index = K*k1 + k2 with
n1,k1 in [0,M), n2,k2 in [0,K)):

  X[K*k1 + k2] = sum_n1 W_M^{n1 k1} * T[n1,k2] * sum_n2 x[M*n2+n1] W_K^{n2 k2}

with twiddle T[n1,k2] = exp(-2pi i n1 k2 / N). The M*K spectrum in this
framework's layout is indexed k*M + m (subcarrier-major blocks), so a final
(M, K) -> (K, M) transpose puts the factorized output into the same layout
the dense F operator produces... careful: the dense operator's spectrum is
the plain DFT in natural order; reshaping n = K*k1 + k2 corresponds to
(M, K) row-major. All layout fixes happen here, validated element-wise
against the dense path.
"""
from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from ..config import GfdmConfig
from . import operators
from .planar import pdiv, pmatmul, pmul, real_operator, to_planar

__all__ = [
    "fast_fft_n",
    "fast_ifft_n",
    "demod_fast",
    "modulate_core_fast",
    "estimate_channel_fast",
    "snr_power_fast",
]


@lru_cache(maxsize=16)
def _fft_consts(cfg: GfdmConfig, dtype_name: str):
    dt = np.dtype(dtype_name)
    K, M = cfg.subcarriers, cfg.timeslots
    N = K * M
    n1 = np.arange(M).reshape(M, 1)
    k2 = np.arange(K).reshape(1, K)
    tw = np.exp(-2j * np.pi * n1 * k2 / N)  # (M, K)
    itw = np.conjugate(tw)
    return {
        "FK_W": real_operator(operators.dft_matrix(K).T, dt),
        "iFK_W": real_operator(operators.idft_matrix(K).T, dt),
        "FM_W": real_operator(operators.dft_matrix(M).T, dt),
        "iFM_W": real_operator(operators.idft_matrix(M).T, dt),
        "tw": to_planar(tw, dtype=dt),  # (M, 2, K)
        "itw": to_planar(itw, dtype=dt),
        "tx_parts": to_planar(
            cfg.tx_filter_taps.reshape(cfg.overlap, M), dtype=dt
        ),  # (L, 2, M)
        "rx_parts": to_planar(
            cfg.rx_filter_taps.reshape(cfg.overlap, M), dtype=dt
        ),
    }


@lru_cache(maxsize=16)
def _est_consts(cfg: GfdmConfig, dtype_name: str):
    """Factorized channel/SNR estimation constants.

    The dense (2N, 4K) channel-estimation operator (planar_pipeline E_W) is
    the composition interpolate . smooth . per-half-FFT-times-inverse
    (preamble_channel_estimator_cc.cc:111-294). Factorized form: two K-point
    DFT matmuls + elementwise inverse-preamble multiply, one small real
    (K, n_est) smoothing matmul, and a 2-tap gather/lerp for the linear
    interpolation - O(K^2) state instead of O(K*N), which is what makes
    K >= 1024 configs practical.
    """
    from ..ref.channel_estimation import PreambleChannelEstimator

    dt = np.dtype(dtype_name)
    rdt = np.float32 if dtype_name == "bfloat16" else dt
    K = cfg.subcarriers
    est = PreambleChannelEstimator(
        cfg.timeslots, K, cfg.active_subcarriers, cfg.dc_free, cfg.core_preamble
    )
    n_est = cfg.active_subcarriers + (1 if cfg.dc_free else 0)
    # The reference's 0.5/FFT(preamble half) inverse is +-inf at unused
    # subcarriers (preamble energy 0 there); the smoothing stage never reads
    # those bins, but in factorized form 0 * inf would poison the matmul -
    # mask the inverse to the active band the smoother actually reads.
    half = cfg.active_subcarriers // 2
    offset = 1 if cfg.dc_free else 0
    read_mask = np.zeros(K)
    read_mask[offset : offset + half] = 1.0
    read_mask[K - half : K] = 1.0
    inv0 = np.where(read_mask > 0, est.inv_freq_preamble0, 0.0)
    inv1 = np.where(read_mask > 0, est.inv_freq_preamble1, 0.0)
    # smoothing (step 2) as a small real matrix, probed column-wise
    S = np.zeros((K, n_est), dtype=np.float64)
    e = np.zeros(K, dtype=np.complex128)
    for j in range(K):
        e[j] = 1.0
        S[j, :] = est.filter_preamble_estimate(e).real
        e[j] = 0.0
    # interpolation (step 3) as gather + lerp: probe with arange so each
    # output bin encodes (left index + fractional weight) exactly
    p1 = est.interpolate_frame(np.arange(n_est, dtype=np.float64)).real
    idxA = np.floor(p1 + 1e-9).astype(np.int32)
    t = (p1 - idxA).astype(rdt)
    idxB = np.minimum(idxA + 1, n_est - 1).astype(np.int32)
    k2 = np.arange(2 * K)
    return {
        "FK_W": real_operator(operators.dft_matrix(K).T, dt),
        "inv0": to_planar(inv0, dtype=rdt),  # (2, K), masked to active band
        "inv1": to_planar(inv1, dtype=rdt),
        "S_T": S.astype(rdt),  # (K, n_est)
        "idxA": idxA,
        "idxB": idxB,
        "t": t,
        "tw2": to_planar(np.exp(-2j * np.pi * k2 / (2 * K)), dtype=rdt),
    }


def estimate_channel_fast(cfg: GfdmConfig, rx_pre, consts):
    """Factorized channel estimate: (..., 2, 2K) preamble -> (..., 2, N).

    Matches pmatmul(rx_pre, E_W) (the dense estimator) element-wise.
    """
    K = cfg.subcarriers
    r0, r1 = rx_pre[..., :K], rx_pre[..., K:]
    e = pmul(pmatmul(r0, consts["FK_W"]), jnp.asarray(consts["inv0"])) + pmul(
        pmatmul(r1, consts["FK_W"]), jnp.asarray(consts["inv1"])
    )
    f = e @ jnp.asarray(consts["S_T"])  # real smoothing, per plane
    fA = jnp.take(f, jnp.asarray(consts["idxA"]), axis=-1)
    fB = jnp.take(f, jnp.asarray(consts["idxB"]), axis=-1)
    t = jnp.asarray(consts["t"])
    return fA * (1.0 - t) + fB * t


def snr_power_fast(cfg: GfdmConfig, rx_pre, consts):
    """|FFT_2K(preamble)|^2 via a radix-2 split: two K-point stages.

    Matches pabs2(pmatmul(rx_pre, F2_W)) without the (4K, 4K) dense DFT.
    """
    ev, od = rx_pre[..., 0::2], rx_pre[..., 1::2]
    A = pmatmul(ev, consts["FK_W"])
    Bv = pmatmul(od, consts["FK_W"])
    A2 = jnp.concatenate([A, A], axis=-1)
    B2 = pmul(jnp.asarray(consts["tw2"]), jnp.concatenate([Bv, Bv], axis=-1))
    from .planar import pabs2

    return pabs2(A2 + B2)


def fast_fft_n(cfg: GfdmConfig, x, consts):
    """Factorized N-point DFT of planar (..., 2, N) -> (..., 2, N).

    Matches pmatmul(x, F_W) (natural-order DFT) element-wise.
    """
    K, M = cfg.subcarriers, cfg.timeslots
    lead = x.shape[:-2]
    # n = M*n2 + n1  ->  (..., 2, K(n2), M(n1))
    xr = x.reshape(lead + (2, K, M))
    # inner K-point DFTs over n2 for each n1: arrange (..., M(n1), 2, K(n2))
    xt = jnp.transpose(xr, tuple(range(len(lead))) + tuple(
        len(lead) + i for i in (2, 0, 1)
    ))
    Z = pmatmul(xt, consts["FK_W"])  # (..., M, 2, K), DFT over n2
    Z = pmul(Z, jnp.asarray(consts["tw"]))  # twiddle (M, 2, K) broadcast
    # outer M-point DFTs over n1: arrange (..., K(k2), 2, M(n1))
    Zt = jnp.transpose(Z, tuple(range(len(lead))) + tuple(
        len(lead) + i for i in (2, 1, 0)
    ))
    Xr = pmatmul(Zt, consts["FM_W"])  # (..., K(k2), 2, M(k1))
    # X index = K*k1 + k2 -> layout (..., 2, M(k1), K(k2))
    Xt = jnp.transpose(Xr, tuple(range(len(lead))) + tuple(
        len(lead) + i for i in (1, 2, 0)
    ))
    return Xt.reshape(lead + (2, K * M))


def fast_ifft_n(cfg: GfdmConfig, X, consts):
    """Inverse of fast_fft_n (matches numpy ifft normalization)."""
    K, M = cfg.subcarriers, cfg.timeslots
    lead = X.shape[:-2]
    # X index = K*k1 + k2 -> (..., 2, M(k1), K(k2))
    Xr = X.reshape(lead + (2, M, K))
    # undo outer stage: arrange (..., K(k2), 2, M(k1)), inverse M-DFT
    Xt = jnp.transpose(Xr, tuple(range(len(lead))) + tuple(
        len(lead) + i for i in (2, 0, 1)
    ))
    Z = pmatmul(Xt, consts["iFM_W"])  # (..., K, 2, M) over k1 -> n1
    # undo twiddle: arrange (..., M(n1), 2, K(k2))
    Zt = jnp.transpose(Z, tuple(range(len(lead))) + tuple(
        len(lead) + i for i in (2, 1, 0)
    ))
    Zt = pmul(Zt, jnp.asarray(consts["itw"]))
    xr = pmatmul(Zt, consts["iFK_W"])  # (..., M(n1), 2, K(n2)) over k2 -> n2
    # n = M*n2 + n1 -> (..., 2, K(n2), M(n1))
    xt = jnp.transpose(xr, tuple(range(len(lead))) + tuple(
        len(lead) + i for i in (1, 2, 0)
    ))
    return xt.reshape(lead + (2, K * M))


def _fold_rx(cfg: GfdmConfig, X, consts):
    """Sparse-filter gather/fold: spectrum (..., 2, N) -> (..., K, 2, M)."""
    K, M, L = cfg.subcarriers, cfg.timeslots, cfg.overlap
    lead = X.shape[:-2]
    # (..., K, 2, M): planes adjacent to the M axis for pmul/pmatmul
    Xb = jnp.moveaxis(X.reshape(lead + (2, K, M)), -3, -2)
    S = None
    parts = jnp.asarray(consts["rx_parts"])  # (L, 2, M)
    for i in range(L):
        contrib = pmul(
            jnp.roll(Xb, -(i - L // 2), axis=-3), parts[(i + L // 2) % L]
        )
        S = contrib if S is None else S + contrib
    return S


def _scatter_tx(cfg: GfdmConfig, W, consts):
    """Sparse-filter scatter: per-SC spectra (..., K, 2, M) -> (..., 2, N)."""
    K, M, L = cfg.subcarriers, cfg.timeslots, cfg.overlap
    lead = W.shape[:-3]
    X = None
    parts = jnp.asarray(consts["tx_parts"])
    for i in range(L):
        contrib = jnp.roll(
            pmul(W, parts[(i + L // 2) % L]), i - L // 2, axis=-3
        )
        X = contrib if X is None else X + contrib
    return jnp.moveaxis(X, -2, -3).reshape(lead + (2, K * M))


def demod_fast(cfg: GfdmConfig, frames, channel, consts, equalize=True):
    """Factorized ZF demod: (..., 2, N) frames -> (..., K, 2, M) symbols.

    Equivalent to the dense F_W / Bfd_W path of planar_pipeline.
    """
    X = fast_fft_n(cfg, frames, consts)
    if equalize:
        X = pdiv(X, channel)
    S = _fold_rx(cfg, X, consts)
    return pmatmul(S, consts["iFM_W"])  # per-SC M-point IFFT


def modulate_core_fast(cfg: GfdmConfig, grid, consts):
    """Factorized modulator: (..., 2, N) grid symbols -> (..., 2, N) samples."""
    K, M = cfg.subcarriers, cfg.timeslots
    lead = grid.shape[:-2]
    g = grid.reshape(lead + (2, K, M))
    gk = jnp.moveaxis(g, -3, -2)  # (..., K, 2, M)
    W = pmatmul(gk, consts["FM_W"])  # per-SC M-point FFT
    X = _scatter_tx(cfg, W, consts)
    return fast_ifft_n(cfg, X, consts)
