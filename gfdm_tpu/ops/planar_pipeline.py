"""Complex-free (planar) implementations of the full GFDM pipeline.

This is the TPU production path: identical math to gfdm_tpu.ops.{tx,rx,
estimation,sync} but expressed entirely in real float32 tensors with the
planar layout of gfdm_tpu.ops.planar - every complex matmul is one real MXU
matmul against a realified operator, the sync cross-correlation is a 2-in/
2-out-channel real convolution, and nonlinear steps (divide, decisions,
angles) are explicit real arithmetic.

The large realified operators are passed through the jit boundary as device
arrays (device_put once per config) rather than being embedded as HLO
literals - embedding them inflates the HLO by tens of MB and multiplies
compile time, especially with this image's remote TPU compiler.

Parity: tested element-wise against the complex ops (which are themselves
tested against the float64 golden model), see tests/test_planar.py.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GfdmConfig
from ..ref.demodulation import ic_filter_taps as _ic_taps_ref
from . import operators
from .planar import (
    gauss_stack,
    pabs2,
    pconj,
    pdiv,
    pmatmul,
    pmul,
    real_operator,
    to_planar,
)
from .rx import qpsk_constellation
from .sync import moving_sum
from .tx import demap_indices
from ._validate import check_planar

__all__ = [
    "prepare",
    "transmit_planar",
    "receive_bursts_planar",
    "detect_bursts_planar",
    "detect_bursts_topk_planar",
    "extract_bursts_planar",
    "link_step_planar",
]


# ---------------------------------------------------------------------------
# device-resident operator matrices (one transfer per config+dtype)
# ---------------------------------------------------------------------------
def _interference_matrix(cfg: GfdmConfig) -> np.ndarray:
    """(M, M) time-domain IC operator C = idft_M . diag(ic_taps) . dft_M."""
    return (
        operators.idft_matrix(cfg.timeslots)
        @ np.diag(_ic_taps_ref(cfg.rx_filter_taps, cfg.timeslots, cfg.overlap))
        @ operators.dft_matrix(cfg.timeslots)
    )


@lru_cache(maxsize=16)
def _np_mats_fast(cfg: GfdmConfig, dtype_name: str):
    """Small-operator set for method='fast': no O(N^2) matrices anywhere,
    so K >= 1024 configs stay practical (the factorized stages carry only
    K- and M-point matrices, gfdm_tpu.ops.planar_fast)."""
    dt = np.dtype(dtype_name)
    return {
        "C_W": real_operator(_interference_matrix(cfg).T, dt),
        "CNRI_T": np.ascontiguousarray(
            operators.cnr_interpolation_operator(cfg).T.astype(dt)
        ),
    }


@lru_cache(maxsize=16)
def _np_mats(cfg: GfdmConfig, dtype_name: str):
    dt = np.dtype(dtype_name)
    K, M = cfg.subcarriers, cfg.timeslots
    return {
        "T_W": real_operator(operators.tx_core_operator(cfg).T, dt),
        # full per-shift Tx operators with CP gather + window folded in:
        # one matmul emits the windowed framed burst directly
        "TF_W": np.stack(
            [
                real_operator(operators.tx_frame_operator(cfg, s).T, dt)
                for s in cfg.cyclic_shifts
            ]
        ),
        "E_W": real_operator(operators.channel_estimation_operator(cfg).T, dt),
        # real (n_active, N) CNR->per-bin interpolation for per-bin MMSE
        "CNRI_T": np.ascontiguousarray(
            operators.cnr_interpolation_operator(cfg).T.astype(dt)
        ),
        "F_W": real_operator(operators.dft_matrix(cfg.block_len).T, dt),
        "Bfd_W": real_operator(operators.demodulation_fd_operator(cfg).T, dt),
        "F2_W": real_operator(operators.dft_matrix(2 * K).T, dt),
        "Fm_W": real_operator(operators.dft_matrix(M).T, dt),
        "iFm_W": real_operator(operators.idft_matrix(M).T, dt),
        # interference operator: time-domain form of fft -> x ic_taps -> ifft
        # (one tiny matmul per IC iteration instead of two transforms)
        "C_W": real_operator(_interference_matrix(cfg).T, dt),
        # Gauss 3-matmul stacks for the fused Pallas kernels (25% fewer MXU
        # FLOPs than the realified forms above, see planar.gauss_stack)
        "T_G": gauss_stack(operators.tx_core_operator(cfg).T, dt),
        "E_G": gauss_stack(operators.channel_estimation_operator(cfg).T, dt),
        "F_G": gauss_stack(operators.dft_matrix(cfg.block_len).T, dt),
        "Bfd_G": gauss_stack(operators.demodulation_fd_operator(cfg).T, dt),
        "F2_G": gauss_stack(operators.dft_matrix(2 * K).T, dt),
    }


_DEVICE_MATS_CACHE: dict = {}


def _tracing_active() -> bool:
    try:
        from jax._src import core as _core

        return not _core.trace_state_clean()
    except Exception:
        return False


def _device_mats(cfg: GfdmConfig, dtype_name: str, method: str = "dense"):
    """Operator matrices as device arrays, transferred once per config.

    Must never create (or cache) device arrays while a jit/shard_map trace is
    active - they would be tracer-bound and leak. Under a trace the NumPy
    matrices are returned instead (they become compile-time constants of the
    outer program); call prepare() once outside any trace to get the
    pass-by-argument fast path.

    method="fast" loads only the small-operator set (_np_mats_fast).
    """
    key = (cfg, dtype_name, method)
    hit = _DEVICE_MATS_CACHE.get(key)
    if hit is not None:
        return hit
    mats = (_np_mats_fast if method == "fast" else _np_mats)(cfg, dtype_name)
    if _tracing_active():
        return mats
    mats = {k: jax.device_put(v) for k, v in mats.items()}
    _DEVICE_MATS_CACHE[key] = mats
    return mats


def prepare(cfg: GfdmConfig, dtype_name: str = "float32",
            method: str = "dense") -> None:
    """Eagerly build + upload all operators (call once, outside jit)."""
    assert not _tracing_active(), "prepare() must run outside jit"
    _device_mats(cfg, dtype_name, method)


@lru_cache(maxsize=16)
def _small_consts(cfg: GfdmConfig, dtype_name: str):
    # windows/preambles/taps stay float32 even in the bfloat16 fast mode -
    # only the big matmul operators are quantized
    dt = np.float32 if dtype_name == "bfloat16" else np.dtype(dtype_name)
    K = cfg.subcarriers
    c = {
        "cp_idx": np.stack([operators.cp_indices(cfg, s) for s in cfg.cyclic_shifts]),
        "win": operators.cp_window(cfg).astype(dt),
        "preambles": to_planar(cfg.full_preambles, dtype=dt),
        "ic_taps": to_planar(_ic_taps_ref(cfg.rx_filter_taps, cfg.timeslots, cfg.overlap), dt),
        "demap_idx": demap_indices(cfg),
    }
    active = np.zeros(K, dtype=bool)
    active[cfg.subcarrier_map] = True
    c["active"] = active
    half = cfg.active_subcarriers // 2
    offset = 1 if cfg.dc_free else 0
    hi = 2 * (np.arange(half) + offset)
    unused_half = (K - cfg.active_subcarriers) // 2
    lo = 2 * (np.arange(half) + unused_half + K // 2)
    c["sig_idx"] = np.concatenate((hi, lo))
    c["noise_idx"] = np.concatenate((hi + 1, lo + 1))
    return c


# ---------------------------------------------------------------------------
# Tx
# ---------------------------------------------------------------------------
@lru_cache(maxsize=16)
def _tx_fn(cfg: GfdmConfig, dtype_name: str):
    c = _small_consts(cfg, dtype_name)
    w_len = cfg.window_len

    @jax.jit
    def fn(d, TF_W):
        # TF_W: (n_shifts, 2*n_data, 2*window_len) - CP + window folded in
        n2 = d.shape[-1] * 2
        flat = d.reshape(d.shape[:-2] + (n2,))
        if TF_W.dtype == jnp.bfloat16:
            flat = flat.astype(jnp.bfloat16)
        framed = jnp.einsum(
            "...i,sij->...sj", flat, TF_W, preferred_element_type=jnp.float32
        ).astype(d.dtype)
        framed = framed.reshape(framed.shape[:-1] + (2, w_len))
        pre = jnp.broadcast_to(
            jnp.asarray(c["preambles"]), framed.shape[:-2] + c["preambles"].shape[-2:]
        )
        return jnp.concatenate([pre, framed], axis=-1)

    return fn


def transmit_planar(cfg: GfdmConfig, data, dtype_name: str = "float32",
                    method: str = "dense"):
    """(..., 2, n_data) planar payload -> (..., n_shifts, 2, frame_len).

    method="fast" modulates via the factorized per-subcarrier FFT pipeline.
    """
    check_planar(data, cfg.n_data_symbols, "transmit_planar",
                 "timeslots*active_subcarriers")
    if method == "fast":
        return _tx_fast_fn(cfg, dtype_name)(data)
    return _tx_fn(cfg, dtype_name)(data, _device_mats(cfg, dtype_name)["TF_W"])


@lru_cache(maxsize=16)
def _tx_fast_fn(cfg: GfdmConfig, dtype_name: str):
    from . import planar_fast

    c = _small_consts(cfg, dtype_name)
    fft_consts = planar_fast._fft_consts(cfg, dtype_name)
    n_data = cfg.n_data_symbols
    # direct index form of the resource-mapper scatter (no O(N*n_data) matrix)
    map_idx = np.full(cfg.block_len, n_data, dtype=np.int32)
    smap = cfg.subcarrier_map
    M = cfg.timeslots
    for j in range(n_data):
        if cfg.per_timeslot:
            tidx, aidx = divmod(j, smap.size)
        else:
            aidx, tidx = divmod(j, M)
        map_idx[M * smap[aidx] + tidx] = j

    @jax.jit
    def fn(d):
        zero = jnp.zeros(d.shape[:-1] + (1,), dtype=d.dtype)
        grid = jnp.take(
            jnp.concatenate([d, zero], axis=-1), jnp.asarray(map_idx), axis=-1
        )
        core = planar_fast.modulate_core_fast(cfg, grid, fft_consts)
        framed = jnp.take(core, jnp.asarray(c["cp_idx"]), axis=-1) * c["win"]
        framed = jnp.moveaxis(framed, -2, -3)  # (..., n_shifts, 2, W)
        pre = jnp.broadcast_to(
            jnp.asarray(c["preambles"]), framed.shape[:-2] + c["preambles"].shape[-2:]
        )
        return jnp.concatenate([pre, framed], axis=-1)

    return fn


# ---------------------------------------------------------------------------
# Rx (channel estimation + SNR + ZF + IC + demap)
# ---------------------------------------------------------------------------
def _is_qpsk(points: np.ndarray) -> bool:
    if points.size != 4:
        return False
    a = np.abs(points[0].real)
    return bool(
        np.allclose(np.abs(points.real), a) and np.allclose(np.abs(points.imag), a)
        and len({(np.sign(p.real), np.sign(p.imag)) for p in points}) == 4
    )


def _decide_kc(d, points_pl, active_mask, qpsk_amp=None):
    """Nearest-point decision in (..., K, 2, M) layout, zero off active SCs.

    Fast path: when ``qpsk_amp`` is set (QPSK-shaped constellation) the
    decision is two sign selects instead of a 4-way distance tensor.
    """
    r, i = d[..., 0, :], d[..., 1, :]
    if qpsk_amp is not None:
        a = float(qpsk_amp)
        hr = jnp.where(r >= 0, a, -a)
        hi_ = jnp.where(i >= 0, a, -a)
    else:
        pr = points_pl[:, 0].reshape((-1,) + (1,) * r.ndim)
        pi = points_pl[:, 1].reshape((-1,) + (1,) * r.ndim)
        dist = (r[None] - pr) ** 2 + (i[None] - pi) ** 2
        idx = jnp.argmin(dist, axis=0)
        hr = jnp.take(points_pl[:, 0], idx)
        hi_ = jnp.take(points_pl[:, 1], idx)
    m = active_mask[..., 0, :]
    return jnp.stack([jnp.where(m, hr, 0.0), jnp.where(m, hi_, 0.0)], axis=-2)


@lru_cache(maxsize=32)
def _receive_fn(
    cfg: GfdmConfig,
    ic_iterations: int,
    equalize: bool,
    constellation: tuple,
    phase_compensation: bool,
    dtype_name: str,
    method: str = "dense",
    equalizer: str = "zf",
):
    if method == "fast":
        from . import planar_fast

        fft_consts = planar_fast._fft_consts(cfg, dtype_name)
        est_consts = planar_fast._est_consts(cfg, dtype_name)
    else:
        fft_consts = est_consts = None
    c = _small_consts(cfg, dtype_name)
    K, M = cfg.subcarriers, cfg.timeslots
    points = np.asarray(constellation)
    points_pl = np.ascontiguousarray(to_planar(points).T)  # (P, 2)
    qpsk_amp = float(np.abs(points[0].real)) if _is_qpsk(points) else None
    n_active = cfg.subcarrier_map.size

    @jax.jit
    def fn(bursts, mats):
        # bursts: (..., 2, >= frame_len) aligned at full-preamble start
        rx_pre = bursts[..., cfg.cp_len : cfg.cp_len + 2 * K]
        if method == "fast":
            from . import planar_fast

            channel = planar_fast.estimate_channel_fast(cfg, rx_pre, est_consts)
            p = planar_fast.snr_power_fast(cfg, rx_pre, est_consts)
        else:
            channel = pmatmul(rx_pre, mats["E_W"])  # (..., 2, N)
            # SNR from the 2K preamble FFT
            F = pmatmul(rx_pre, mats["F2_W"])
            p = pabs2(F)
        cnrs = jnp.take(p, jnp.asarray(c["sig_idx"]), axis=-1)
        sym = jnp.sum(cnrs, axis=-1)
        noise = jnp.sum(jnp.take(p, jnp.asarray(c["noise_idx"]), axis=-1), axis=-1)
        snr_lin = (sym - noise) / noise
        cnrs = cnrs * (snr_lin / (sym / cnrs.shape[-1]))[..., None]

        start = cfg.preamble_len + cfg.cp_len
        frame = bursts[..., start : start + cfg.block_len]
        if equalize and equalizer == "mmse":
            # MMSE weighting: divide by H then shrink by |H|^2/(|H|^2+1/snr)
            # - equivalently multiply the ZF-equalized bins by that factor.
            # Uses the per-burst SNR estimate from the preamble (a capability
            # the reference lacks: it only implements the ZF divide,
            # receiver_kernel_cc.cc:315-316).
            h2 = pabs2(channel)
            w = h2 / (h2 + (1.0 / jnp.maximum(snr_lin, 1e-6))[..., None])
            channel_eff = jnp.stack(
                [channel[..., 0, :] / w, channel[..., 1, :] / w], axis=-2
            )
        elif equalize and equalizer == "mmse_cnr":
            # Per-bin MMSE from the measured CNR vector: the received
            # carrier-to-noise ratio per bin IS |H|^2 * tx-SNR, so the MMSE
            # shrinkage of the ZF-equalized bin is cnr/(cnr+1) directly.
            # CNRs are smoothed + interpolated to all M*K bins with the same
            # machinery the channel estimate uses (cnr_interpolation_operator).
            cnr_bins = jnp.maximum(cnrs, 0.0) @ mats["CNRI_T"]
            cnr_bins = jnp.maximum(cnr_bins, 1e-6)
            w = cnr_bins / (cnr_bins + 1.0)
            channel_eff = channel / w[..., None, :]
        else:
            channel_eff = channel

        if method == "fast":
            from . import planar_fast

            d0 = planar_fast.demod_fast(
                cfg, frame, channel_eff, fft_consts, equalize=equalize
            )  # (..., K, 2, M) directly in IC layout
            grid = None
        else:
            X = pmatmul(frame, mats["F_W"])
            if equalize:
                X = pdiv(X, channel_eff)
            S = pmatmul(X, mats["Bfd_W"])  # (..., 2, N) symbol estimates
            grid = S.reshape(S.shape[:-1] + (K, M))  # (..., 2, K, M)

        # IC loop in (..., K, 2, M) layout so the interference operator is a
        # single per-subcarrier planar matmul (no transposes per iteration).
        # Key algebraic collapse: subtracting ifft(fft(neighbors) * ic_taps)
        # from the folded FD state each iteration against the CONSTANT
        # original fold (advanced_receiver_kernel_cc.cc:56-76) is, in the
        # time domain,  d_{k+1} = d0 - neighbors_k @ C  with
        # C = idft_M . diag(ic_taps) . dft_M  - one tiny (2M, 2M) matmul.
        if grid is not None:
            d0 = jnp.moveaxis(grid, -3, -2)  # (..., K, 2, M)
        active_mask = jnp.asarray(c["active"])[..., :, None, None]  # over K

        def cancel(d0_ref, hard):
            neighbors = jnp.roll(hard, 1, axis=-3) + jnp.roll(hard, -1, axis=-3)
            # keep the carry dtype stable for fori_loop (weak-type stripping)
            return (d0_ref - pmatmul(neighbors, mats["C_W"])).astype(d0_ref.dtype)

        remaining = ic_iterations
        if phase_compensation and ic_iterations > 0:
            # C++ semantics: iteration-0 decisions come from the UNROTATED
            # estimates; the phase fix applies to the receiver state before
            # the first cancellation (advanced_receiver_kernel_cc.cc:59-75)
            hard0 = _decide_kc(d0, jnp.asarray(points_pl), active_mask, qpsk_amp)
            nz = (hard0[..., 0, :] ** 2 + hard0[..., 1, :] ** 2) > 0
            ang_h = jnp.arctan2(hard0[..., 1, :], hard0[..., 0, :])
            ang_d = jnp.arctan2(d0[..., 1, :], d0[..., 0, :])
            diff = jnp.where(active_mask[..., 0, :] & nz, ang_h - ang_d, 0.0)
            phase = jnp.sum(diff, axis=(-2, -1)) / (n_active * M)
            cr = jnp.cos(phase)[..., None, None]
            ci = jnp.sin(phase)[..., None, None]
            r0, i0 = d0[..., 0, :], d0[..., 1, :]
            d0 = jnp.stack([r0 * cr - i0 * ci, r0 * ci + i0 * cr], axis=-2)
            d = cancel(d0, hard0)
            remaining = ic_iterations - 1
        else:
            d = d0

        def body(_, d):
            hard = _decide_kc(d, jnp.asarray(points_pl), active_mask, qpsk_amp)
            return cancel(d0, hard)

        d = jax.lax.fori_loop(0, remaining, body, d)
        symbols = jnp.moveaxis(d, -2, -3).reshape(
            bursts.shape[:-2] + (2, cfg.block_len)
        )
        data = jnp.take(symbols, jnp.asarray(c["demap_idx"]), axis=-1)
        return {
            "data": data,
            "symbols": symbols,
            "channel": channel,
            "snr_lin": snr_lin,
            "cnrs": cnrs,
        }

    return fn


def receive_bursts_planar(
    cfg: GfdmConfig,
    bursts,
    ic_iterations: int = 2,
    equalize: bool = True,
    constellation=qpsk_constellation,
    phase_compensation: bool = False,
    dtype_name: str = "float32",
    method: str = "dense",
    equalizer: str = "zf",
):
    """Planar receiver chain: (..., 2, >=frame_len) -> dict of planar outputs.

    method="fast" uses the factorized Cooley-Tukey demodulation stage
    (gfdm_tpu.ops.planar_fast) instead of the dense (2N, 2N) operators.
    equalizer="mmse" regularizes the per-bin inversion with the estimated
    SNR (better low-SNR behavior than the reference's plain ZF divide);
    equalizer="mmse_cnr" uses the per-subcarrier CNR vector interpolated to
    every FD bin (frequency-selective noise weighting).
    """
    fn = _receive_fn(
        cfg,
        int(ic_iterations),
        bool(equalize),
        tuple(np.asarray(constellation).tolist()),
        bool(phase_compensation),
        dtype_name,
        method,
        equalizer,
    )
    return fn(bursts, _device_mats(cfg, dtype_name, method))


# ---------------------------------------------------------------------------
# Sync + extraction
# ---------------------------------------------------------------------------
@lru_cache(maxsize=16)
def _detect_consts(cfg: GfdmConfig, dtype_name: str):
    dt = np.dtype(dtype_name)
    x_pre = cfg.core_preamble
    x_pre = x_pre / np.sqrt(np.mean(np.abs(x_pre) ** 2))
    # XLA conv computes cross-correlation (no kernel flip), so the kernel is
    # conj(x_pre) directly; channels realize the complex product
    p = np.conjugate(x_pre)
    pr, pi = p.real.astype(dt), p.imag.astype(dt)
    return np.stack([np.stack([pr, -pi]), np.stack([pi, pr])])  # (2out, 2in, k)


# matmul front end: sliding-window ops as polyphase block matmuls. The XLA
# conv lowering ran the 128-tap xcorr at ~1 TF/s (10.5 ms @ 4096 chunks,
# round-4 profile); expressing every sliding window as one
# (rows, 2b) @ (2b, b) banded matmul doubles the FLOPs but runs on the MXU
# at chain rates - the same design move as the operator kernels.
_FLOOR_STRIDE = 8  # noise-floor median subsample (same estimator, 1/8 sort)


@lru_cache(maxsize=16)
def _poly_consts(cfg: GfdmConfig, dtype_name: str):
    from .planar import real_operator

    dt = np.dtype(dtype_name)
    p = np.conjugate(cfg.core_preamble)
    p = p / np.sqrt(np.mean(np.abs(p) ** 2))
    b = p.size  # block size = xcorr kernel length = 2K
    Kc = np.zeros((2 * b, b), dtype=np.complex128)
    for v in range(b):
        Kc[v : v + b, v] = p
    bands = {}
    for w in (cfg.subcarriers, 2 * cfg.subcarriers, cfg.cp_len + 1):
        Bm = np.zeros((2 * b, b), dtype=dt)
        for v in range(b):
            Bm[v : v + w, v] = 1.0
        bands[w] = Bm
    return {"xcorr": real_operator(Kc, dt), "bands": bands, "b": b}


def _poly_blocks(x, b: int):
    """(..., T) -> (..., nb, 2b) overlapping block pairs (zero-padded)."""
    T = x.shape[-1]
    nb = -(-T // b)
    pad = (nb + 1) * b - T
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    xb = xp.reshape(x.shape[:-1] + (nb + 1, b))
    return jnp.concatenate([xb[..., :-1, :], xb[..., 1:, :]], axis=-1)


def _poly_window_sum(x, Bm, b: int, n_out: int):
    """Trailing-window sliding sum via one banded block matmul."""
    pairs = _poly_blocks(x, b)
    y = jnp.matmul(pairs, jnp.asarray(Bm), preferred_element_type=jnp.float32)
    return y.reshape(x.shape[:-1] + (-1,))[..., :n_out].astype(x.dtype)


# default front-end implementation; benchmarks flip this to compare.
# "twostage" (default since round 5): coarse position from the integrated
# autocorrelation, preamble xcorr only in a +-128 window around it -
# measured bit-identical to "matmul" from 0 dB up (starts, found, cfo) and
# +4% on the full service step (7.05 -> 6.77 ms); falls back to "matmul"
# for chunk lengths that are not 128-aligned
DETECT_IMPL = "twostage"  # "twostage" | "matmul" | "conv" | "pallas"


def _detect_front_planar(cfg: GfdmConfig, kernel, s, search_limit: int,
                         impl: str | None = None,
                         dtype_name: str = "float32"):
    """Shared planar sync front end: (gated metric, ac, energy, ic trace).

    impl="matmul" (default): every sliding window - the 2K-tap preamble
    cross-correlation, the K-wide autocorrelation sum, the 2K energy window
    and the CP-integration - runs as a polyphase banded block matmul on the
    MXU. impl="pallas" fuses the whole chain into one VMEM kernel
    (kernels/detect.py). impl="conv" keeps the original lax.conv + cumsum
    forms (the correctness reference; ~7x slower on the measured chip).

    dtype_name="bfloat16" (matmul impl only) carries the big trace
    intermediates and matmul operands in bf16 - the front end is
    bandwidth-bound, so this halves its HBM traffic at ~0.4% trace
    rounding (outputs and all peak decisions stay float32).
    """
    if impl is None:
        impl = DETECT_IMPL
    if impl == "twostage":
        # the full-trace front end (top-k path etc.) has no two-stage form;
        # the matmul front is its dense equivalent
        impl = "matmul"
    if impl == "pallas":
        from ..kernels.detect import detect_front_pallas

        return detect_front_pallas(cfg, s, search_limit)
    K = cfg.subcarriers
    cp_len = cfg.cp_len
    p_len = 2 * K
    T = s.shape[-1]
    lead = s.shape[:-2]
    n_ac = T - 2 * K
    bf16 = impl == "matmul" and dtype_name == "bfloat16"
    sw = s.astype(jnp.bfloat16) if bf16 else s
    # --- coarse autocorrelation ---
    a = sw[..., : T - K]
    b = sw[..., K:]
    c_prod = pmul(pconj(a), b)
    if impl == "matmul":
        pc = _poly_consts(cfg, dtype_name if bf16 else "float32")
        bb = pc["b"]
        p_ms = _poly_window_sum(c_prod, pc["bands"][K], bb, n_ac)
        energy = _poly_window_sum(pabs2(sw).astype(sw.dtype),
                                  pc["bands"][2 * K], bb, n_ac)
        p_ms = p_ms.astype(jnp.float32)
        energy = energy.astype(jnp.float32)
    else:
        p_ms = moving_sum(c_prod, K)[..., :n_ac]
        energy = moving_sum(pabs2(s), 2 * K)[..., :n_ac]
    energy = jnp.maximum(energy, 1e-30)
    ac = p_ms * (2.0 / energy)[..., None, :]
    ac_mag = jnp.sqrt(pabs2(ac))
    if impl == "matmul":
        pad = jnp.zeros(ac_mag.shape[:-1] + (cp_len,), sw.dtype)
        padded_mag = jnp.concatenate(
            [pad, ac_mag.astype(sw.dtype)], axis=-1
        )
        ic = _poly_window_sum(padded_mag, pc["bands"][cp_len + 1], bb,
                              n_ac).astype(jnp.float32) / (cp_len + 1)
        # --- fine: xcorr as one polyphase complex block matmul -------------
        pairs = _poly_blocks(sw, bb)  # (..., 2, nb, 2b)
        rows = jnp.concatenate([pairs[..., 0, :, :], pairs[..., 1, :, :]],
                               axis=-1)  # (..., nb, 4b)
        y = jnp.matmul(rows, jnp.asarray(pc["xcorr"]),
                       preferred_element_type=jnp.float32)
        cc = jnp.stack([y[..., :bb], y[..., bb:]], axis=-3)
        cc = cc.reshape(lead + (2, -1))[..., : T - p_len + 1] / p_len
    else:
        pad = jnp.zeros(ac_mag.shape[:-1] + (cp_len,), ac_mag.dtype)
        padded_mag = jnp.concatenate([pad, ac_mag], axis=-1)
        ic = moving_sum(padded_mag, cp_len + 1) / (cp_len + 1)
        # --- fine: cross-correlation as a 2-channel real conv --------------
        s_nc = s.reshape((-1, 2, T))
        cc = jax.lax.conv_general_dilated(
            s_nc, jnp.asarray(kernel), (1,), "VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
        )
        cc = cc.reshape(lead + (2, T - p_len + 1)) / p_len
    n_valid = min(n_ac, search_limit)
    gated = jnp.sqrt(pabs2(cc))[..., :n_valid] * ic[..., :n_valid]
    return gated, ac, energy, ic


@lru_cache(maxsize=16)
def _detect_fn_planar(cfg: GfdmConfig, chunk_len: int, search_limit: int, dtype_name: str):
    K = cfg.subcarriers
    kernel = _detect_consts(cfg, dtype_name)
    p_len = 2 * K

    @jax.jit
    def fn(s):
        gated, ac, energy, ic = _detect_front_planar(
            cfg, kernel, s, search_limit, dtype_name=dtype_name
        )

        nc = jnp.argmax(gated, axis=-1)
        peak = jnp.take_along_axis(gated, nc[..., None], axis=-1)[..., 0]
        ac_r = jnp.take_along_axis(ac[..., 0, :], nc[..., None], axis=-1)[..., 0]
        ac_i = jnp.take_along_axis(ac[..., 1, :], nc[..., None], axis=-1)[..., 0]
        cfo = jnp.arctan2(ac_i, ac_r) / (2.0 * jnp.pi)
        e_at = jnp.take_along_axis(energy, nc[..., None], axis=-1)[..., 0]
        scale = jnp.sqrt(p_len / e_at)
        ic_v = ic[..., : gated.shape[-1]]
        return {"start": nc, "cfo": cfo, "scale": scale, "strength": peak,
                "ac_peak": jnp.take_along_axis(ic_v, nc[..., None], axis=-1)[..., 0],
                "noise_floor": jnp.median(ic_v[..., ::_FLOOR_STRIDE], axis=-1),
                "ac_metric": ic}

    return fn


@lru_cache(maxsize=16)
def _detect_fn_twostage(cfg: GfdmConfig, chunk_len: int, search_limit: int,
                        dtype_name: str):
    """Two-stage detection (EXPERIMENTAL, DETECT_IMPL="twostage"):

    Stage 1 localizes the burst with the cheap traces alone (argmax of the
    CP-integrated autocorrelation), stage 2 runs the 128-tap preamble
    xcorr only in a block-gathered +-128-sample window around it - the
    xcorr matmul work drops ~4x. Risk (why this is not the default until
    measured AND sensitivity-validated): a low-SNR ic-peak error > 128
    samples puts the true xcorr peak outside the window. Full traces are
    still produced for cfo/scale/floor, so the output contract is
    identical to the default detector.
    """
    K = cfg.subcarriers
    cp_len = cfg.cp_len
    p_len = 2 * K
    b = 128  # window block granularity
    W_HALF = 128
    # gathered blocks: enough samples for +-W_HALF candidate positions
    # plus the p_len xcorr taps plus block-alignment slack
    NB = (2 * W_HALF + p_len) // b + 2

    @jax.jit
    def fn(s):
        T = s.shape[-1]
        lead = s.shape[:-2]
        n_ac = T - 2 * K
        bf16 = dtype_name == "bfloat16"
        sw = s.astype(jnp.bfloat16) if bf16 else s
        pc = _poly_consts(cfg, dtype_name if bf16 else "float32")
        bb = pc["b"]
        a = sw[..., : T - K]
        bcm = sw[..., K:]
        c_prod = pmul(pconj(a), bcm)
        p_ms = _poly_window_sum(c_prod, pc["bands"][K], bb, n_ac).astype(
            jnp.float32
        )
        energy = _poly_window_sum(
            pabs2(sw).astype(sw.dtype), pc["bands"][2 * K], bb, n_ac
        ).astype(jnp.float32)
        energy = jnp.maximum(energy, 1e-30)
        ac = p_ms * (2.0 / energy)[..., None, :]
        ac_mag = jnp.sqrt(pabs2(ac))
        pad = jnp.zeros(ac_mag.shape[:-1] + (cp_len,), sw.dtype)
        padded_mag = jnp.concatenate([pad, ac_mag.astype(sw.dtype)], axis=-1)
        ic = _poly_window_sum(padded_mag, pc["bands"][cp_len + 1], bb,
                              n_ac).astype(jnp.float32) / (cp_len + 1)
        n_valid = min(n_ac, search_limit)

        # stage 1: coarse position from the integrated autocorrelation
        nc0 = jnp.argmax(ic[..., :n_valid], axis=-1)

        # stage 2: xcorr only in NB gathered blocks around the coarse peak
        nbT = T // b  # ext chunk lengths are b-aligned in the service
        b0 = jnp.clip((nc0 - W_HALF) // b, 0, nbT - NB)
        sblk = sw[..., : nbT * b].reshape(s.shape[:-1] + (nbT, b))
        idx = b0[..., None] + jnp.arange(NB)
        win = jnp.take_along_axis(
            sblk, idx[..., None, :, None], axis=-2
        ).reshape(lead + (2, NB * b))
        pairs = _poly_blocks(win, bb)
        rows = jnp.concatenate(
            [pairs[..., 0, :, :], pairs[..., 1, :, :]], axis=-1
        )
        y = jnp.matmul(rows, jnp.asarray(pc["xcorr"]),
                       preferred_element_type=jnp.float32)
        cc = jnp.stack([y[..., :bb], y[..., bb:]], axis=-3)
        n_pos = NB * b - p_len + 1
        cc = cc.reshape(lead + (2, -1))[..., :n_pos] / p_len
        # gate with the ic values at the same absolute positions
        nbI = n_ac // b
        icblk = ic[..., : nbI * b].reshape(ic.shape[:-1] + (nbI, b))
        idx_ic = jnp.clip(b0[..., None] + jnp.arange(NB), 0, nbI - 1)
        ic_w = jnp.take_along_axis(
            icblk, idx_ic[..., :, None], axis=-2
        ).reshape(lead + (NB * b,))[..., :n_pos]
        pos = b0[..., None] * b + jnp.arange(n_pos)
        gated_w = jnp.where(
            pos < n_valid, jnp.sqrt(pabs2(cc)) * ic_w, -1.0
        )
        j = jnp.argmax(gated_w, axis=-1)
        nc = (b0 * b + j).astype(nc0.dtype)
        peak = jnp.take_along_axis(gated_w, j[..., None], axis=-1)[..., 0]

        ac_r = jnp.take_along_axis(ac[..., 0, :], nc[..., None], axis=-1)[..., 0]
        ac_i = jnp.take_along_axis(ac[..., 1, :], nc[..., None], axis=-1)[..., 0]
        cfo = jnp.arctan2(ac_i, ac_r) / (2.0 * jnp.pi)
        e_at = jnp.take_along_axis(energy, nc[..., None], axis=-1)[..., 0]
        scale = jnp.sqrt(p_len / e_at)
        ic_v = ic[..., :n_valid]
        return {"start": nc, "cfo": cfo, "scale": scale, "strength": peak,
                "ac_peak": jnp.take_along_axis(ic_v, nc[..., None], axis=-1)[..., 0],
                "noise_floor": jnp.median(ic_v[..., ::_FLOOR_STRIDE], axis=-1),
                "ac_metric": ic}

    return fn


def detect_bursts_planar(cfg: GfdmConfig, stream, search_limit: int | None = None,
                         dtype_name: str = "float32"):
    """Planar burst detection: (..., 2, T) -> metadata dict (real arrays).

    ``search_limit`` restricts the detection argmax to owned positions when
    the chunk carries a lookahead halo (see ops.sync.detect_bursts).
    With DETECT_IMPL == "pallas2" the whole front end runs as the
    trace-lean fused kernel (kernels/detect.detect_bursts_pallas; no
    ac_metric debug trace in the dict).
    """
    T = int(stream.shape[-1])
    limit = T if search_limit is None else int(search_limit)
    if DETECT_IMPL == "pallas2":
        from ..kernels.detect import detect_bursts_pallas

        return detect_bursts_pallas(cfg, stream, limit)
    if DETECT_IMPL == "twostage" and T % 128 == 0:
        return _detect_fn_twostage(cfg, T, limit, dtype_name)(stream)
    return _detect_fn_planar(cfg, T, limit, dtype_name)(stream)


@lru_cache(maxsize=16)
def _detect_topk_fn_planar(cfg: GfdmConfig, chunk_len: int, search_limit: int,
                           max_bursts: int, min_distance: int, dtype_name: str):
    kernel = _detect_consts(cfg, dtype_name)
    p_len = 2 * cfg.subcarriers

    @jax.jit
    def fn(s):
        gated, ac, energy, ic = _detect_front_planar(
            cfg, kernel, s, search_limit, dtype_name=dtype_name
        )
        pos = jnp.arange(gated.shape[-1])

        def body(g, _):
            nc = jnp.argmax(g, axis=-1)
            peak = jnp.take_along_axis(g, nc[..., None], axis=-1)[..., 0]
            mask = jnp.abs(pos - nc[..., None]) < min_distance
            return jnp.where(mask, 0.0, g), (nc, peak)

        _, (ncs, peaks) = jax.lax.scan(body, gated, None, length=max_bursts)
        ncs = jnp.moveaxis(ncs, 0, -1)  # (..., max_bursts)
        peaks = jnp.moveaxis(peaks, 0, -1)
        ac_r = jnp.take_along_axis(ac[..., 0, :], ncs, axis=-1)
        ac_i = jnp.take_along_axis(ac[..., 1, :], ncs, axis=-1)
        e_at = jnp.take_along_axis(energy, ncs, axis=-1)
        ic_v = ic[..., : gated.shape[-1]]
        return {
            "start": ncs,
            "cfo": jnp.arctan2(ac_i, ac_r) / (2.0 * jnp.pi),
            "scale": jnp.sqrt(p_len / e_at),
            "strength": peaks,
            "ac_peak": jnp.take_along_axis(ic_v, ncs, axis=-1),
            "noise_floor": jnp.median(ic_v[..., ::_FLOOR_STRIDE], axis=-1),
        }

    return fn


def detect_bursts_topk_planar(
    cfg: GfdmConfig,
    stream,
    max_bursts: int,
    search_limit: int | None = None,
    min_distance: int | None = None,
    dtype_name: str = "float32",
):
    """Planar top-k burst detection: up to ``max_bursts`` per chunk.

    Iterative peak picking with +-min_distance suppression (defaults to one
    frame length), the planar counterpart of ops.sync.detect_bursts_topk.
    Entries beyond the real burst count have near-zero ``strength``.
    """
    T = int(stream.shape[-1])
    limit = T if search_limit is None else int(search_limit)
    if min_distance is None:
        min_distance = cfg.frame_len
    fn = _detect_topk_fn_planar(
        cfg, T, limit, int(max_bursts), int(min_distance), dtype_name
    )
    return fn(stream)


@lru_cache(maxsize=16)
def _extract_fn_planar(cfg: GfdmConfig, burst_len: int, backoff: int,
                       correct_cfo: bool, impl: str = "barrel",
                       dtype_name: str = "float32"):
    K = cfg.subcarriers
    b = 128  # barrel block: coarse gather granularity and fine-shift span
    f1, f2 = 16, b // 16  # two one-hot select stages: shift = 8*r1 + r2
    # bf16 (barrel impl): the coarse gather + select stages are pure
    # bandwidth - halving the sample bytes halves their HBM traffic. The
    # ~2^-8 relative sample quantization sits at -42 dB, far below the
    # receive chain's own floors; scale/CFO math stays f32 on the output
    bf16 = impl == "barrel" and dtype_name == "bfloat16"

    @jax.jit
    def fn(stream, start, scale, cfo):
        # Exact zero-fill semantics for out-of-range positions (the
        # reference's tag_backoff pre-roll, extract_burst_cc_impl.cc:184-191)
        T = stream.shape[-1]
        lead = stream.shape[:-2]
        if bf16:
            stream = stream.astype(jnp.bfloat16)
        st = jnp.clip(start.reshape(-1), 0, T)
        if impl == "slice":
            # one dynamic_slice per chunk - the round-3 form; measured
            # 8.3 ms @ 4096 chunks, entirely gather-bound
            zfront = jnp.zeros(stream.shape[:-1] + (backoff,), stream.dtype)
            zback = jnp.zeros(stream.shape[:-1] + (burst_len,), stream.dtype)
            padded = jnp.concatenate([zfront, stream, zback], axis=-1)
            flat = padded.reshape((-1, 2, padded.shape[-1]))

            def one(ch, s):
                return jax.lax.dynamic_slice(ch, (0, s), (2, burst_len))

            burst = jax.vmap(one)(flat, st).reshape(lead + (2, burst_len))
        else:
            # barrel extraction: the per-chunk variable shift decomposes into
            # a coarse whole-block gather (contiguous 128-sample rows) and
            # two one-hot select-accumulate stages (16 + 8 static slices) -
            # dense vector work instead of 752 per-element gathers per chunk
            # (round-4 profile: the dynamic-slice form was the service
            # step's dominator at 8.3 ms / 4096 chunks)
            nbl = -(-(b - 1 + burst_len) // b)  # coarse blocks per burst
            P = backoff + T + burst_len
            pad_tail = (-P) % b + b  # align + one spare zero block
            flat = stream.reshape((-1, 2, T))
            Bf = flat.shape[0]
            zfront = jnp.zeros((Bf, 2, backoff), stream.dtype)
            zback = jnp.zeros((Bf, 2, burst_len + pad_tail), stream.dtype)
            padded = jnp.concatenate([zfront, flat, zback], axis=-1)
            nb = padded.shape[-1] // b
            xb = padded.reshape(Bf, 2, nb, b)
            q, r = st // b, st % b
            idx = jnp.clip(q[:, None] + jnp.arange(nbl), 0, nb - 1)
            coarse = jnp.take_along_axis(
                xb, idx[:, None, :, None], axis=2
            ).reshape(Bf, 2, nbl * b)
            r1, r2 = r // f2, r % f2
            L1 = nbl * b - (f1 - 1) * f2
            y1 = jnp.zeros((Bf, 2, L1), stream.dtype)
            for a in range(f1):
                y1 = y1 + jnp.where(
                    (r1 == a)[:, None, None], coarse[..., a * f2 : a * f2 + L1], 0.0
                )
            burst = jnp.zeros((Bf, 2, burst_len), stream.dtype)
            for c in range(f2):
                burst = burst + jnp.where(
                    (r2 == c)[:, None, None], y1[..., c : c + burst_len], 0.0
                )
            burst = burst.reshape(lead + (2, burst_len))
        burst = burst.astype(jnp.float32) * scale[..., None, None]
        if correct_cfo:
            offs = jnp.arange(burst_len)
            phase = -2.0 * jnp.pi * cfo[..., None] * offs / K
            rot = jnp.stack([jnp.cos(phase), jnp.sin(phase)], axis=-2)
            burst = pmul(burst, rot)
        return burst

    return fn


def extract_bursts_planar(
    cfg: GfdmConfig,
    stream,
    detection,
    burst_len: int | None = None,
    backoff: int | None = None,
    correct_cfo: bool = True,
    dtype_name: str = "float32",
):
    """Planar burst extraction: (..., 2, T) + detection -> (..., 2, burst_len).

    ``dtype_name="bfloat16"`` runs the barrel gather/select stages on bf16
    samples (half the HBM traffic; output back in float32 before the
    scale/CFO epilogue) - the production service threads its detection
    dtype here.
    """
    if burst_len is None:
        burst_len = cfg.frame_len
    if backoff is None:
        backoff = cfg.cp_len
    fn = _extract_fn_planar(cfg, int(burst_len), int(backoff),
                            bool(correct_cfo), dtype_name=str(dtype_name))
    return fn(stream, detection["start"], detection["scale"], detection["cfo"])


@lru_cache(maxsize=8)
def _refine_cfo_fn(cfg: GfdmConfig, skip: int, burst_len: int):
    """Two-stage CFO: fine residual from the payload block's CP.

    The extracted burst is already coarse-corrected by the Schmidl&Cox
    K-lag preamble estimate (one-shot std ~0.007 subcarriers at 8 dB -
    tail draws cost ~50 deg of drift across the burst, the dominant frame
    killer at low SNR; see docs/STATUS round-5 sensitivity entry). The
    payload block's cyclic prefix offers an N-lag observable: CP sample i
    equals block-end sample i rotated by 2*pi*cfo*N/K, an N/K = 9x longer
    phase lever than the preamble lag. The residual after coarse
    correction (|res| < ~0.03) is far inside the +-K/(2N) ambiguity, so
    the combination is unambiguous. Measured: residual std 0.0072 ->
    0.0024, max 0.027 -> 0.008 at 8 dB (3x) - beyond the reference, whose
    sync stops at the coarse stage (XFDMSync role).

    ``skip`` drops the first CP samples (ISI-polluted by the preceding
    preamble tail under multipath; default cp_len/2).
    """
    K = cfg.subcarriers
    N = cfg.block_len
    cp0 = cfg.preamble_len + skip  # block-CP window [cp0, cp1)
    cp1 = cfg.preamble_len + cfg.cp_len

    @jax.jit
    def fn(bursts):
        a = bursts[..., cp0:cp1]
        b = bursts[..., cp0 + N : cp1 + N]
        z = jnp.sum(pmul(pconj(a), b), axis=-1)  # (..., 2)
        fine = jnp.arctan2(z[..., 1], z[..., 0]) * (K / (2.0 * np.pi * N))
        offs = jnp.arange(burst_len)
        phase = -2.0 * jnp.pi * fine[..., None] * offs / K
        rot = jnp.stack([jnp.cos(phase), jnp.sin(phase)], axis=-2)
        return pmul(bursts, rot), fine

    return fn


def refine_cfo_planar(cfg: GfdmConfig, bursts, skip: int | None = None):
    """Fine CFO correction of coarse-corrected extracted bursts.

    (..., 2, frame_len) planar -> (corrected bursts, fine residual in
    subcarrier fractions). See :func:`_refine_cfo_fn`.
    """
    if skip is None:
        skip = cfg.cp_len // 2
    return _refine_cfo_fn(cfg, int(skip), int(bursts.shape[-1]))(bursts)


# ---------------------------------------------------------------------------
# Full link step (bench / entry)
# ---------------------------------------------------------------------------
def link_step_planar(cfg: GfdmConfig, data, ic_iterations: int = 2,
                     dtype_name: str = "float32", method: str = "dense"):
    """Planar end-to-end: payload -> Tx -> Rx -> (data_hat, snr, evm).

    dtype_name="bfloat16" runs the operator matmuls on the MXU in bfloat16
    with float32 accumulation (4x peak throughput, EVM impact < 1e-3 on the
    canonical config).
    """
    bursts = transmit_planar(cfg, data, dtype_name=dtype_name, method=method)[
        ..., 0, :, :
    ]
    out = receive_bursts_planar(
        cfg, bursts, ic_iterations=ic_iterations, dtype_name=dtype_name,
        method=method,
    )
    err = jnp.sum((out["data"] - data) ** 2)
    ref = jnp.maximum(jnp.sum(data**2), 1e-30)
    evm = jnp.sqrt(err / ref)
    return out["data"], out["snr_lin"], evm
