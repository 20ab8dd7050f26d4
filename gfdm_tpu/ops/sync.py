"""Batched burst synchronization (JAX/XLA path).

Self-contained replacement for the external XFDMSync OOT the reference
depends on (examples/hier_gfdm_fastsync.grc: sc_delay_corr -> sc_tagger ->
xcorr_tagger). For each fixed-length stream chunk it produces the detection
metadata the reference carried in stream tags
(/root/reference/lib/extract_burst_cc_impl.cc:149-213):
burst start index, CFO phase rotation, power-normalization scale, and a
detection strength, all with static shapes.

Algorithm: running Schmidl&Cox autocorrelation over the repeated preamble
halves + CP integration (coarse), autocorrelation-gated cross-correlation
with the known core preamble (fine) - the golden model in
gfdm_tpu.ref.synchronization, vectorized with cumulative sums and FFT
correlation.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GfdmConfig

__all__ = [
    "detect_bursts",
    "detect_bursts_topk",
    "detection_threshold",
    "detection_valid",
    "moving_sum",
]

DEFAULT_DTYPE = jnp.complex64

# Under noise the integrated autocorrelation magnitude is Rayleigh-
# distributed; detectors report its per-chunk MEDIAN as the noise floor
# (robust to a burst plateau contaminating a chunk mean). The false-alarm
# calibration of ref.synchronization.threshold_factor is stated against the
# Rayleigh MEAN, so convert: median/mean = sqrt(2 ln 2)/sqrt(pi/2).
RAYLEIGH_MEDIAN_TO_MEAN = float(np.sqrt(2.0 * np.log(2.0)) / np.sqrt(np.pi / 2.0))


def detection_threshold(false_alarm_prob: float, noise_floor):
    """Absolute detection threshold on the integrated-autocorrelation peak.

    ``noise_floor`` is the per-chunk median of the integrated
    autocorrelation trace (returned by the detectors); the factor comes from
    the reference's false-alarm derivation
    (/root/reference/python/pygfdm/synchronization.py:239-243): for a
    Rayleigh-distributed noise metric with mean m,
    P(X > lambda * m) = exp(-pi lambda^2 / 4), so
    lambda = sqrt(-(4/pi) ln Pfa).
    """
    from ..ref.synchronization import threshold_factor

    return threshold_factor(false_alarm_prob) * noise_floor / RAYLEIGH_MEDIAN_TO_MEAN


def detection_valid(detection: dict, false_alarm_prob: float):
    """Boolean mask: which detections exceed the false-alarm threshold.

    Uses the autocorrelation peak (``ac_peak``, in [0, 1]) against the
    per-chunk noise floor - the constant-false-alarm-rate rule replacing the
    old magic ``min_strength`` constants.
    """
    thr = detection_threshold(false_alarm_prob, detection["noise_floor"])
    ac_peak = detection["ac_peak"]
    if hasattr(ac_peak, "ndim") and hasattr(thr, "ndim") and thr.ndim < ac_peak.ndim:
        thr = thr[..., None]  # top-k slots share the chunk's floor
    return ac_peak > thr


def moving_sum(x, window: int):
    """Trailing-window sliding sum along the last axis (valid part)."""
    zero = jnp.zeros(x.shape[:-1] + (1,), dtype=x.dtype)
    c = jnp.cumsum(x, axis=-1)
    c = jnp.concatenate([zero, c], axis=-1)
    return c[..., window:] - c[..., : x.shape[-1] - window + 1]


@lru_cache(maxsize=16)
def _detect_fn(cfg: GfdmConfig, chunk_len: int, search_limit: int, dtype):
    K = cfg.subcarriers
    cp_len = cfg.cp_len
    x_pre = cfg.core_preamble
    x_pre = x_pre / np.sqrt(np.mean(np.abs(x_pre) ** 2))
    n_fft = int(2 ** np.ceil(np.log2(chunk_len)))
    # NumPy constant (NOT jnp): building device arrays inside a trace
    # context would leak tracers through the lru_cache
    Xp = np.conjugate(np.fft.fft(x_pre, n_fft)).astype(np.dtype(dtype))
    p_len = x_pre.size  # 2K

    real_dtype = jnp.float64 if dtype == jnp.complex128 else jnp.float32

    @jax.jit
    def fn(s):
        s = s.astype(dtype)
        T = s.shape[-1]
        # --- coarse: running autocorrelation of the two preamble halves ---
        c = jnp.conjugate(s[..., :-K]) * s[..., K:]
        p = moving_sum(c, K)[..., : T - 2 * K]
        energy = moving_sum(jnp.abs(s).astype(real_dtype) ** 2, 2 * K)[..., : T - 2 * K]
        ac = 2.0 * p / jnp.maximum(energy, 1e-30).astype(dtype)
        ac_mag = jnp.abs(ac)
        pad = jnp.zeros(ac_mag.shape[:-1] + (cp_len,), dtype=ac_mag.dtype)
        ic = moving_sum(jnp.concatenate([pad, ac_mag], axis=-1), cp_len + 1) / (cp_len + 1)

        # --- fine: FFT cross-correlation with the core preamble -----------
        S = jnp.fft.fft(s, n_fft, axis=-1)
        cc = jnp.fft.ifft(S * Xp, axis=-1)[..., : T - p_len] / p_len
        n_valid = min(T - 2 * K, search_limit)
        gated = jnp.abs(cc[..., :n_valid]) * ic[..., :n_valid]

        nc = jnp.argmax(gated, axis=-1)
        peak = jnp.take_along_axis(gated, nc[..., None], axis=-1)[..., 0]
        ac_at_peak = jnp.take_along_axis(ac, nc[..., None], axis=-1)[..., 0]
        cfo = jnp.angle(ac_at_peak) / (2.0 * jnp.pi)
        e_at_peak = jnp.take_along_axis(energy, nc[..., None], axis=-1)[..., 0]
        scale = jnp.sqrt(p_len / jnp.maximum(e_at_peak, 1e-30))
        ic_v = ic[..., :n_valid]
        return {
            "start": nc,  # core-preamble start within the chunk
            "cfo": cfo,  # relative to subcarrier spacing
            "scale": scale,  # amplitude normalization factor
            "strength": peak,  # gated correlation peak (detection metric)
            # normalized autocorrelation at the peak + per-chunk Rayleigh
            # noise floor: the inputs of the false-alarm decision rule
            # (detection_valid)
            "ac_peak": jnp.take_along_axis(ic_v, nc[..., None], axis=-1)[..., 0],
            "noise_floor": jnp.median(ic_v, axis=-1),
            "ac_metric": ic,  # full integrated autocorrelation trace
        }

    return fn


@lru_cache(maxsize=16)
def _detect_topk_fn(cfg: GfdmConfig, chunk_len: int, search_limit: int,
                    max_bursts: int, min_distance: int, dtype):
    K = cfg.subcarriers
    cp_len = cfg.cp_len
    x_pre = cfg.core_preamble
    x_pre = x_pre / np.sqrt(np.mean(np.abs(x_pre) ** 2))
    n_fft = int(2 ** np.ceil(np.log2(chunk_len)))
    Xp = np.conjugate(np.fft.fft(x_pre, n_fft)).astype(np.dtype(dtype))
    p_len = x_pre.size
    real_dtype = jnp.float64 if dtype == jnp.complex128 else jnp.float32

    @jax.jit
    def fn(s):
        s = s.astype(dtype)
        T = s.shape[-1]
        c = jnp.conjugate(s[..., :-K]) * s[..., K:]
        p = moving_sum(c, K)[..., : T - 2 * K]
        energy = moving_sum(jnp.abs(s).astype(real_dtype) ** 2, 2 * K)[..., : T - 2 * K]
        ac = 2.0 * p / jnp.maximum(energy, 1e-30).astype(dtype)
        ac_mag = jnp.abs(ac)
        pad = jnp.zeros(ac_mag.shape[:-1] + (cp_len,), dtype=ac_mag.dtype)
        ic = moving_sum(jnp.concatenate([pad, ac_mag], axis=-1), cp_len + 1) / (
            cp_len + 1
        )
        S = jnp.fft.fft(s, n_fft, axis=-1)
        cc = jnp.fft.ifft(S * jnp.asarray(Xp), axis=-1)[..., : T - p_len] / p_len
        n_valid = min(T - 2 * K, search_limit)
        gated = jnp.abs(cc[..., :n_valid]) * ic[..., :n_valid]
        pos = jnp.arange(n_valid)

        def body(carry, _):
            g = carry
            nc = jnp.argmax(g, axis=-1)
            peak = jnp.take_along_axis(g, nc[..., None], axis=-1)[..., 0]
            # suppress +- min_distance around the found peak
            mask = jnp.abs(pos - nc[..., None]) < min_distance
            g = jnp.where(mask, 0.0, g)
            return g, (nc, peak)

        _, (ncs, peaks) = jax.lax.scan(body, gated, None, length=max_bursts)
        ncs = jnp.moveaxis(ncs, 0, -1)  # (..., max_bursts)
        peaks = jnp.moveaxis(peaks, 0, -1)
        ac_at = jnp.take_along_axis(ac, ncs, axis=-1)
        e_at = jnp.take_along_axis(energy, ncs, axis=-1)
        ic_v = ic[..., :n_valid]
        return {
            "start": ncs,
            "cfo": jnp.angle(ac_at) / (2.0 * jnp.pi),
            "scale": jnp.sqrt(p_len / jnp.maximum(e_at, 1e-30)),
            "strength": peaks,
            "ac_peak": jnp.take_along_axis(ic_v, ncs, axis=-1),
            "noise_floor": jnp.median(ic_v, axis=-1),
        }

    return fn


def detect_bursts_topk(
    cfg: GfdmConfig,
    stream,
    max_bursts: int,
    search_limit: int | None = None,
    min_distance: int | None = None,
    dtype=DEFAULT_DTYPE,
):
    """Detect up to ``max_bursts`` bursts per chunk, strongest first.

    Iterative peak picking with +-min_distance suppression (defaults to one
    frame length) - the static-shape counterpart of the reference processing
    several detector tags per work() call
    (extract_burst_cc_impl.cc:131-149). Entries beyond the real burst count
    have near-zero ``strength``; filter with a threshold.
    """
    stream = jnp.asarray(stream)
    T = int(stream.shape[-1])
    limit = T if search_limit is None else int(search_limit)
    if min_distance is None:
        min_distance = cfg.frame_len
    fn = _detect_topk_fn(cfg, T, limit, int(max_bursts), int(min_distance), dtype)
    return fn(stream)


def detect_bursts(cfg: GfdmConfig, stream, search_limit: int | None = None,
                  dtype=DEFAULT_DTYPE):
    """(..., T) IQ stream chunks -> per-chunk burst detection metadata.

    ``start`` indexes the first sample of the 2K core preamble; the full
    windowed preamble begins cp_len samples earlier. When the chunk carries a
    lookahead halo (so boundary-straddling bursts are complete), pass
    ``search_limit=chunk_len`` to restrict the detection argmax to positions
    this chunk owns - the halo then only completes bursts, it cannot shadow
    the owned one with a neighbour's preamble.
    """
    stream = jnp.asarray(stream)
    T = int(stream.shape[-1])
    limit = T if search_limit is None else int(search_limit)
    return _detect_fn(cfg, T, limit, dtype)(stream)
