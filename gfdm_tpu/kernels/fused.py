"""Pallas TPU kernels: fused hot paths of the planar GFDM pipeline.

The XLA path runs the receiver core as three separate HBM-level ops
(block-FFT matmul -> ZF divide -> fold/demod matmul). These kernels fuse each
chain so the per-burst state never leaves VMEM between stages; the realified
operator matrices stay VMEM-resident across the whole burst batch (grid over
burst blocks, operators unblocked).

Layouts match gfdm_tpu.ops.planar: a complex vector of length n is the real
vector [re | im] of length 2n; complex matmuls use the realified
[[Wr, Wi], [-Wi, Wr]] operators.

All kernels are validated element-wise against the XLA planar pipeline
(tests/test_pallas.py, interpret mode on CPU; native Mosaic on TPU, where
the channel-estimate path is bit-identical).

Performance status on this image's TPU backend (batch 32768, canonical
config, dependency-forced timings - NOTE: block_until_ready does not force
execution through this tunnel and identical repeated dispatches serialize
through a result cache, so valid timings must vary the inputs AND fetch a
result; earlier measurements that showed Pallas ~4x behind XLA were timing
artifacts of exactly that):
  - link_single_fused (whole Tx + whole Rx in ONE kernel, the burst batch
    never leaves VMEM, block=128): 9.2 ms fetch-forced at batch 32768;
    53.4 ms at batch 262144 = 3.69 Gsamples/s / 4.9 Mbursts/s (the ~3.5 ms
    per-dispatch tunnel latency amortizes with batch). EVM identical to
    the split kernels. Production loopback evaluation path; bench.py.
  - rx_receiver_fused (channel est + SNR/CNR + ZF + demod + circulant IC):
    6.64 ms at ic=0, 8.46 ms at ic=2 -> 0.91 ms per IC iteration after
    stacking both planes per roll and carrying decisions as exact
    {-1,0,+1} (x level) bfloat16. Mosaic fuses the conv's elementwise
    chains - rolls themselves are nearly free (20 full-batch rolls
    measure ~1.3 ms standalone), so further IC micro-optimization has
    little headroom.
  - TIMING METHODOLOGY (round 2 correction): block_until_ready does NOT
    force execution through this backend's tunnel - a 5 ms kernel reads
    as 0.05 ms without a fetch. Valid timings vary the inputs AND fetch a
    result inside the timed region (bench.py does both).
Round-2 measured dtype rates on this virtualized chip (same (B,1152)x
(1152,1152) kernel): f32 21.2 TF/s, bf16 27.3, int8 27.7 - only ~1.3x for
reduced precision, so f32 stays the default; Gauss 3-matmul complex
products (25% fewer MACs) measure as a wash against realified 4-matmul
forms (the wider realified matmul runs at higher MXU efficiency) but halve
operator VMEM, which is what lets the one-kernel link fit at block=128.
The XLA planar pipeline remains the reference implementation and covers
the general parameter surface (MMSE, arbitrary constellations, phase
compensation).

Structure-exploiting variants, both validated element-wise and kept for
large-K configs, LOSE at the canonical K=64 size (the dense receiver runs
at ~20 TFLOP/s - this virtualized chip's measured matmul ceiling in both
f32 and bf16 - while roll-based data movement is comparatively expensive):
  - rx_receiver_factored (Cooley-Tukey FFT in VMEM: K-stage matmuls + all
    small maps as coefficient rolls, 0.9M vs 5.9M MXU FLOP/burst): 11.5 ms.
  - rx_receiver_hybrid (dense F matmul, roll-based fold + M-point IFFT):
    10.2 ms. The 11 roll passes cost more than the 2.65M-FLOP Bfd matmul.
Their crossover is where dense operators scale quadratically (K >= ~256).
"""
from __future__ import annotations

import functools
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import GfdmConfig
from ..ops.planar_pipeline import _device_mats, _small_consts

__all__ = [
    "rx_core_fused",
    "rx_ic_fused",
    "rx_receiver_fused",
    "rx_receiver_factored",
    "rx_receiver_hybrid",
    "rx_full_fused",
    "tx_frame_fused",
    "tx_cdd_fused",
    "receive_bursts_fused",
    "link_step_fused",
    "link_single_fused",
]


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def _gdot(xr, xi, g_ref, n_in):
    """Complex matmul via Gauss's 3-real-matmul identity.

    g_ref holds the (3*n_in, n_out) stack [Wr; Wi; Wr+Wi] (see
    planar.gauss_stack). 3 MXU matmuls instead of the realified form's
    equivalent 4; the extra adds are VPU-cheap. When the operator stack is
    bfloat16 the activations are cast to match (bf16 MXU issue rate is
    ~1.3x f32 on this chip); accumulation stays float32 either way.
    """
    if g_ref.dtype != xr.dtype:
        xr = xr.astype(g_ref.dtype)
        xi = xi.astype(g_ref.dtype)
    p1 = jnp.dot(xr, g_ref[0:n_in], preferred_element_type=jnp.float32)
    p2 = jnp.dot(xi, g_ref[n_in : 2 * n_in], preferred_element_type=jnp.float32)
    p3 = jnp.dot(
        xr + xi, g_ref[2 * n_in : 3 * n_in], preferred_element_type=jnp.float32
    )
    return p1 - p2, p3 - p1 - p2


# IC decision functions: integer per-axis levels (exact in bf16) + the
# amplitude unit folded into the circulant tap constants. "qam16"/"qam64"
# are per-axis quantizers equivalent to nearest-point on the Gray square
# QAM grids (ref.symbolmapping.constellation(4)/(6)); per-axis == nearest
# because Gray labeling is separable over I/Q.
_IC_AMPS = {"qpsk": 2.0**-0.5, "qam16": 10.0**-0.5, "qam64": 42.0**-0.5}


def _ic_decide(dr, di, kind: str):
    if kind == "qpsk":
        return jnp.where(dr >= 0, 1.0, -1.0), jnp.where(di >= 0, 1.0, -1.0)
    if kind in ("qam16", "qam64"):
        # odd-level quantizer: u*scale -> nearest of {-(m),-m+2,..,+m}
        scale = {"qam16": 10.0, "qam64": 42.0}[kind] ** 0.5
        lim = {"qam16": 3.0, "qam64": 7.0}[kind]

        def q(u):
            return jnp.clip(
                2.0 * jnp.round((u * scale - 1.0) / 2.0) + 1.0, -lim, lim
            )

        return q(dr), q(di)
    raise ValueError(f"unknown IC constellation {kind!r}")


# ---------------------------------------------------------------------------
# fused receiver core: block FFT -> ZF divide -> fold/demod, one VMEM pass
# ---------------------------------------------------------------------------
def _rx_core_kernel(n: int, frame_ref, chan_ref, fw_ref, bfd_ref, out_ref):
    x = frame_ref[:]  # (Bb, 2N)
    X = jnp.dot(x, fw_ref[:], preferred_element_type=jnp.float32)
    Xr, Xi = X[:, :n], X[:, n:]
    C = chan_ref[:]
    Cr, Ci = C[:, :n], C[:, n:]
    den = jnp.maximum(Cr * Cr + Ci * Ci, 1e-30)
    Yr = (Xr * Cr + Xi * Ci) / den
    Yi = (Xi * Cr - Xr * Ci) / den
    Y = jnp.concatenate([Yr, Yi], axis=-1)
    out_ref[:] = jnp.dot(Y, bfd_ref[:], preferred_element_type=jnp.float32)


@lru_cache(maxsize=16)
def _rx_core_call(cfg: GfdmConfig, batch: int, block: int, interpret: bool):
    n = cfg.block_len
    n2 = 2 * n
    kernel = functools.partial(_rx_core_kernel, n)
    grid = (batch // block,)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((batch, n2), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, n2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, n2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n2, n2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n2, n2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, n2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )


def rx_core_fused(cfg: GfdmConfig, frames, channel, block: int = 64,
                  interpret: bool | None = None):
    """Fused ZF receiver core.

    frames, channel: (B, 2, N) planar -> (B, 2, N) planar symbol estimates.
    Equivalent to pmatmul(pdiv(pmatmul(frames, F_W), channel), Bfd_W).
    """
    if interpret is None:
        interpret = not _on_tpu()
    mats = _device_mats(cfg, "float32")
    n = cfg.block_len
    B = frames.shape[0]
    block = min(block, B)
    if B % block:
        raise ValueError(f"batch {B} must be a multiple of block {block}")
    call = _rx_core_call(cfg, B, block, bool(interpret))
    out = call(
        frames.reshape(B, 2 * n),
        channel.reshape(B, 2 * n),
        jnp.asarray(mats["F_W"]),
        jnp.asarray(mats["Bfd_W"]),
    )
    return out.reshape(B, 2, n)


# ---------------------------------------------------------------------------
# fused ZF + IC receiver core, 2-D layout (Mosaic-friendly)
# ---------------------------------------------------------------------------
def _rx_ic_kernel(cfg: GfdmConfig, ic_iterations: int, qpsk_amp: float,
                  frame_ref, chan_ref, fw_ref, bfd_ref, bdr_ref, bdi_ref,
                  act_ref, out_ref):
    n = cfg.block_len
    M = cfg.timeslots
    x = frame_ref[:]  # (Bb, 2N)
    X = jnp.dot(x, fw_ref[:], preferred_element_type=jnp.float32)
    Xr, Xi = X[:, :n], X[:, n:]
    C = chan_ref[:]
    Cr, Ci = C[:, :n], C[:, n:]
    den = jnp.maximum(Cr * Cr + Ci * Ci, 1e-30)
    Y = jnp.concatenate(
        [(Xr * Cr + Xi * Ci) / den, (Xi * Cr - Xr * Ci) / den], axis=-1
    )
    S = jnp.dot(Y, bfd_ref[:], preferred_element_type=jnp.float32)  # (Bb, 2N)
    d0r, d0i = S[:, :n], S[:, n:]
    act = act_ref[:]  # (1, N) 0/1 expanded active mask
    a = qpsk_amp

    def roll_cols(v, shift):
        # circular column shift by +-M: neighbours in the k*M+m layout
        if shift > 0:
            return jnp.concatenate([v[:, n - shift :], v[:, : n - shift]], axis=1)
        return jnp.concatenate([v[:, -shift:], v[:, : -shift]], axis=1)

    dr, di = d0r, d0i
    for _ in range(ic_iterations):
        hr = jnp.where(dr >= 0, a, -a) * act
        hi = jnp.where(di >= 0, a, -a) * act
        nr = roll_cols(hr, M) + roll_cols(hr, -M)
        ni = roll_cols(hi, M) + roll_cols(hi, -M)
        # complex block-diagonal interference operator via two real mats
        ir = (
            jnp.dot(nr, bdr_ref[:], preferred_element_type=jnp.float32)
            - jnp.dot(ni, bdi_ref[:], preferred_element_type=jnp.float32)
        )
        ii = (
            jnp.dot(nr, bdi_ref[:], preferred_element_type=jnp.float32)
            + jnp.dot(ni, bdr_ref[:], preferred_element_type=jnp.float32)
        )
        dr = d0r - ir
        di = d0i - ii

    out_ref[:, :n] = dr
    out_ref[:, n:] = di


@lru_cache(maxsize=16)
def _rx_ic_call(cfg: GfdmConfig, batch: int, block: int, ic_iterations: int,
                qpsk_amp: float, interpret: bool):
    n = cfg.block_len
    n2 = 2 * n
    kernel = functools.partial(_rx_ic_kernel, cfg, ic_iterations, qpsk_amp)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((batch, n2), jnp.float32),
        grid=(batch // block,),
        in_specs=[
            pl.BlockSpec((block, n2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, n2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n2, n2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n2, n2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, n2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )


@lru_cache(maxsize=16)
def _block_diag_C(cfg: GfdmConfig):
    """Real/imag parts of blockdiag over K of the (M, M) interference op C."""
    from ..ops import operators as _ops
    from ..ref.demodulation import ic_filter_taps as _ic

    M, K = cfg.timeslots, cfg.subcarriers
    C = (
        _ops.idft_matrix(M)
        @ np.diag(_ic(cfg.rx_filter_taps, M, cfg.overlap))
        @ _ops.dft_matrix(M)
    ).T  # row-vector convention: interf_row = nbr_row @ C.T-form
    n = cfg.block_len
    BDr = np.zeros((n, n), dtype=np.float32)
    BDi = np.zeros((n, n), dtype=np.float32)
    for k in range(K):
        sl = slice(k * M, (k + 1) * M)
        BDr[sl, sl] = C.real
        BDi[sl, sl] = C.imag
    return BDr, BDi


def rx_ic_fused(cfg: GfdmConfig, frames, channel, ic_iterations: int = 2,
                block: int = 64, interpret: bool | None = None,
                qpsk_amp: float = 2.0**-0.5):
    """Fused ZF + IC receiver core (2-D layout, compiles natively).

    frames, channel: (B, 2, N) planar -> (B, 2, N) planar symbols after
    ``ic_iterations`` QPSK-decision interference-cancellation passes, all in
    one VMEM pass. Block-circular K-rolls are 2-D column slice-concats and
    the per-subcarrier interference operator is a block-diagonal real matmul
    pair, avoiding the 3-D small-minor-dim tiling Mosaic rejects.

    Status: compiles natively, bit-identical to the XLA path on TPU at
    ic=0; slower than the XLA receiver (see module docstring). The
    circulant-IC variant rx_receiver_fused supersedes this one.
    """
    if interpret is None:
        interpret = not _on_tpu()
    mats = _device_mats(cfg, "float32")
    BDr, BDi = _block_diag_C(cfg)
    active = np.zeros((1, cfg.block_len), dtype=np.float32)
    for k in cfg.subcarrier_map:
        active[0, k * cfg.timeslots : (k + 1) * cfg.timeslots] = 1.0
    B = frames.shape[0]
    block = min(block, B)
    if B % block:
        raise ValueError(f"batch {B} must be a multiple of block {block}")
    call = _rx_ic_call(cfg, B, block, int(ic_iterations), float(qpsk_amp),
                       bool(interpret))
    n = cfg.block_len
    out = call(
        frames.reshape(B, 2 * n),
        channel.reshape(B, 2 * n),
        jnp.asarray(mats["F_W"]),
        jnp.asarray(mats["Bfd_W"]),
        jnp.asarray(BDr),
        jnp.asarray(BDi),
        jnp.asarray(active),
    )
    return out.reshape(B, 2, n)


# ---------------------------------------------------------------------------
# fused ZF + IC receiver, circulant IC (fast native path)
# ---------------------------------------------------------------------------
def _rx_ic_circ_kernel(cfg: GfdmConfig, ic_iterations: int, qpsk_amp: float,
                       dec_kind: str, phase_comp: bool, equalizer: str,
                       ic_mode: str,
                       c_taps_r: tuple, c_taps_i: tuple, n_cnr: int,
                       frame_ref, e_ref, fw_ref, bfd_ref, f2_ref, sel_ref,
                       act_ref, icop_ref, cnri_ref, chan_ref, out_ref,
                       met_ref):
    """ZF + IC with the interference operator applied as a per-block
    circular convolution.

    C = idft_M . diag(ic_taps) . dft_M is CIRCULANT: applying it is a 9-tap
    circular convolution within each subcarrier's M-block. A within-block
    column rotation by j is blended from the two global rolls j and j-M
    using the precomputed (1, N) "col%M < j" masks in mlt_ref - pure 2-D
    ops, all VPU, zero extra MXU work.
    """
    n = cfg.block_len
    M = cfg.timeslots
    half = 2 * cfg.subcarriers  # complex preamble length (2K)
    L = cfg.frame_len
    cp = cfg.cp_len
    fs = cfg.preamble_len + cfg.cp_len

    burst = frame_ref[:]  # (Bb, 2*frame_len) planar-flat burst
    pre_r = burst[:, cp : cp + half]
    pre_i = burst[:, L + cp : L + cp + half]
    Chr, Chi = _gdot(pre_r, pre_i, e_ref, half)
    chan_ref[:, :n] = Chr  # expose the channel estimate as a second output
    chan_ref[:, n:] = Chi

    # SNR/CNR metrics fused in: 2K-point preamble DFT, even/odd-bin energy
    # split (preamble_channel_estimator_cc.cc:187-235) with the bin selection
    # and sums as one small matmul. met = [snr_lin | scaled cnrs | 0-pad].
    Fr, Fi = _gdot(pre_r, pre_i, f2_ref, half)
    p = Fr * Fr + Fi * Fi
    sums = jnp.dot(p, sel_ref[:], preferred_element_type=jnp.float32)
    sig = sums[:, 0:1]
    noise = sums[:, 1:2]
    snr_lin = (sig - noise) / noise
    cnr = sums[:, 2 : 2 + n_cnr] * (snr_lin / (sig / n_cnr))
    met_ref[:, 0:1] = snr_lin
    met_ref[:, 1 : 1 + n_cnr] = cnr
    if met_ref.shape[-1] > 1 + n_cnr:
        met_ref[:, 1 + n_cnr :] = jnp.zeros(
            (burst.shape[0], met_ref.shape[-1] - 1 - n_cnr), jnp.float32
        )

    Xr, Xi = _gdot(
        burst[:, fs : fs + n], burst[:, L + fs : L + fs + n], fw_ref, n
    )
    den = jnp.maximum(Chr * Chr + Chi * Chi, 1e-30)
    Yr = (Xr * Chr + Xi * Chi) / den
    Yi = (Xi * Chr - Xr * Chi) / den
    if equalizer == "mmse":
        # per-bin MMSE shrinkage of the ZF bin, w = |C|^2/(|C|^2 + 1/snr),
        # using the snr_lin estimate already produced in this kernel (same
        # formula as the XLA path, planar_pipeline equalizer="mmse")
        w = den / (den + 1.0 / jnp.maximum(snr_lin, 1e-6))
        Yr = Yr * w
        Yi = Yi * w
    elif equalizer == "mmse_cnr":
        # frequency-selective MMSE from the per-subcarrier CNR vector,
        # interpolated to all N bins with the same smoothing machinery the
        # channel estimate uses (one extra small matmul against the padded
        # (pad_n, N) interpolation operator; XLA-path formula:
        # planar_pipeline equalizer="mmse_cnr")
        pad_n = cnri_ref.shape[0]
        cnr_pad = sums[:, 2 : 2 + pad_n] * (snr_lin / (sig / n_cnr))
        cnr_b = jnp.dot(
            jnp.maximum(cnr_pad, 0.0), cnri_ref[:],
            preferred_element_type=jnp.float32,
        )
        cnr_b = jnp.maximum(cnr_b, 1e-6)
        w = cnr_b / (cnr_b + 1.0)
        Yr = Yr * w
        Yi = Yi * w
    elif equalizer != "zf":
        raise ValueError(f"unknown equalizer {equalizer!r}")
    d0r, d0i = _gdot(Yr, Yi, bfd_ref, n)
    act = act_ref[:]
    a = qpsk_amp

    dec0_r, dec0_i = d0r, d0i  # iteration-0 decisions use the UNROTATED
    # symbols (advanced_receiver_kernel_cc.cc:56-76: decide, then estimate
    # and apply the phase, then cancel with those same decisions)
    if phase_comp and ic_iterations > 0:
        # One-shot common-phase-offset correction of the demodulated state
        # (advanced_receiver_kernel_cc.cc:61-91): arithmetic mean of
        # angle(decided * conj(received)) over active entries, then rotate.
        # Mosaic has no atan2/sin/cos lowering, so use small-argument
        # polynomials: nearest-point decisions bound the per-entry angle
        # difference to ~pi/4, where the A&S 4.4.49 arctan fit is ~1e-5
        # accurate, and |phi| <= pi/4 keeps the sin/cos Taylor tails < 1e-8.
        qr, qi = _ic_decide(d0r, d0i, dec_kind)
        re_ = qr * d0r + qi * d0i
        im_ = qi * d0r - qr * d0i
        t = jnp.clip(im_ / jnp.maximum(re_, 1e-20), -1.0, 1.0)
        t2 = t * t
        delta = t * (0.9998660 + t2 * (-0.3302995 + t2 * (0.1801410
                     + t2 * (-0.0851330 + 0.0208351 * t2))))
        n_act = float(cfg.subcarrier_map.size * cfg.timeslots)
        phi = jnp.sum(delta * act, axis=-1, keepdims=True) / n_act
        p2 = phi * phi
        cph = 1.0 - p2 * (0.5 - p2 * (1.0 / 24.0 - p2 / 720.0))
        sph = phi * (1.0 - p2 * (1.0 / 6.0 - p2 * (1.0 / 120.0 - p2 / 5040.0)))
        d0r, d0i = cph * d0r - sph * d0i, sph * d0r + cph * d0i

    def groll(v, shift):
        shift = shift % n
        if shift == 0:
            return v
        return jnp.concatenate([v[:, n - shift :], v[:, : n - shift]], axis=1)

    def block_rot(v, j):
        # within-block rotation by j: w[kM+m] = v[kM + (m-j) mod M]
        if j == 0:
            return v
        return jnp.where(icop_ref[:][j - 1 : j, :] > 0, groll(v, j - M), groll(v, j))

    bb = d0r.shape[0]
    dr, di = dec0_r, dec0_i
    if ic_mode == "matmul":
        # the whole interference operator (neighbor shifts + circulant
        # taps, amplitude folded in) as ONE Gauss matmul triple per
        # iteration - icop_ref holds the bf16 (3N, N) stack; decisions are
        # exact bf16 integer levels
        for _ in range(ic_iterations):
            qr, qi = _ic_decide(dr, di, dec_kind)
            ir, ii = _gdot(qr * act, qi * act, icop_ref, n)
            dr = d0r - ir
            di = d0i - ii
    else:
        # IC loop, roll-optimized: (a) both planes stacked along sublanes
        # so every circular roll moves one (2*Bb, N) array instead of two;
        # (b) the stacked decisions are EXACT bf16 {-1, 0, +1} (the QPSK
        # amplitude is folded into the tap constants), halving roll/blend
        # byte traffic with zero numerical loss - +-1/0, their pairwise
        # sums, and all rotations are exactly representable and
        # bf16 -> f32 promotion is exact.
        for _ in range(ic_iterations):
            qr, qi = _ic_decide(dr, di, dec_kind)
            h2 = jnp.concatenate([qr, qi], axis=0)
            h2 = (h2 * act).astype(jnp.bfloat16)
            n2 = groll(h2, M) + groll(h2, -M)
            ir = jnp.zeros_like(d0r)
            ii = jnp.zeros_like(d0i)
            for j in range(M):
                s2 = block_rot(n2, j).astype(jnp.float32)
                sr, si = s2[:bb], s2[bb:]
                cr_, ci_ = a * c_taps_r[j], a * c_taps_i[j]
                ir = ir + cr_ * sr - ci_ * si
                ii = ii + cr_ * si + ci_ * sr
            dr = d0r - ir
            di = d0i - ii

    out_ref[:, :n] = dr
    out_ref[:, n:] = di


@lru_cache(maxsize=16)
def _ic_matmul_stack(cfg: GfdmConfig, amp: float) -> np.ndarray:
    """bf16 Gauss stack of the full interference operator amp*(P+M + P-M)@BD.

    Row convention: interference_row = decisions_row @ A. bf16 weights are
    fine here - the IC term is a ~-20 dB correction, so 0.4% operator
    rounding sits ~-68 dB below signal.
    """
    from ..ops import operators as _ops
    from ..ref.demodulation import ic_filter_taps as _ic

    n, M, K = cfg.block_len, cfg.timeslots, cfg.subcarriers
    C = (
        _ops.idft_matrix(M)
        @ np.diag(_ic(cfg.rx_filter_taps, M, cfg.overlap))
        @ _ops.dft_matrix(M)
    ).T
    BD = np.zeros((n, n), dtype=np.complex128)
    for k in range(K):
        sl = slice(k * M, (k + 1) * M)
        BD[sl, sl] = C
    P = np.roll(np.eye(n), M, axis=1) + np.roll(np.eye(n), -M, axis=1)
    from ..ops.planar import gauss_stack

    return gauss_stack(amp * (P @ BD), np.dtype("bfloat16"))


@lru_cache(maxsize=16)
def _rx_ic_circ_call(cfg: GfdmConfig, batch: int, block: int,
                     ic_iterations: int, qpsk_amp: float, dec_kind: str,
                     phase_comp: bool, equalizer: str, ic_mode: str,
                     interpret: bool):
    from ..ops import operators as _ops
    from ..ref.demodulation import ic_filter_taps as _ic

    n = cfg.block_len
    n2 = 2 * n
    M = cfg.timeslots
    f2 = 2 * cfg.frame_len
    half = 2 * cfg.subcarriers  # complex preamble length (2K)
    # circulant taps: column 0 of C^T-form equals ifft(ic_taps) arranged so
    # that (v @ C_Wform)[m] = sum_j c[j] * v[(m - j) mod M]
    Cmat = (
        _ops.idft_matrix(M)
        @ np.diag(_ic(cfg.rx_filter_taps, M, cfg.overlap))
        @ _ops.dft_matrix(M)
    )  # circulant: Cmat[m, m'] = c[(m - m') mod M], c = ifft(ic_taps)
    c_col = Cmat[:, 0]  # c[j] multiplies v rotated by j
    n_cnr, met_w = _met_layout(cfg)
    kernel = functools.partial(
        _rx_ic_circ_kernel, cfg, ic_iterations, qpsk_amp, dec_kind,
        phase_comp, equalizer, ic_mode,
        tuple(float(x) for x in c_col.real),
        tuple(float(x) for x in c_col.imag),
        n_cnr,
    )
    icop_rows = 3 * n if ic_mode == "matmul" else M - 1
    cnri_rows = _cnri_pad(cfg).shape[0]
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((batch, n2), jnp.float32),  # chan (2nd out!)
            jax.ShapeDtypeStruct((batch, n2), jnp.float32),  # symbols
            jax.ShapeDtypeStruct((batch, met_w), jnp.float32),  # [snr | cnrs]
        ),
        grid=(batch // block,),
        in_specs=[
            pl.BlockSpec((block, f2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * half, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * n, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * n, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * half, half), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((half, met_w), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((icop_rows, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cnri_rows, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block, n2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, n2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, met_w), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )


@lru_cache(maxsize=16)
def _cnri_pad(cfg: GfdmConfig) -> np.ndarray:
    """(pad_n, N) CNR->per-bin interpolation operator, rows zero-padded to a
    sublane multiple (the mmse_cnr equalizer's in-kernel matmul operand)."""
    from ..ops import operators as _ops

    cnri = _ops.cnr_interpolation_operator(cfg).T.astype(np.float32)
    pad_n = ((cnri.shape[0] + 7) // 8) * 8
    out = np.zeros((pad_n, cnri.shape[1]), dtype=np.float32)
    out[: cnri.shape[0]] = cnri
    return out


@lru_cache(maxsize=16)
def _met_layout(cfg: GfdmConfig):
    """(n_cnr, met_w): CNR count and lane-padded metrics-row width."""
    n_cnr = 2 * (cfg.active_subcarriers // 2)
    met_w = ((2 + n_cnr + 127) // 128) * 128  # fits the sel columns too
    return n_cnr, met_w


@lru_cache(maxsize=16)
def _met_selection(cfg: GfdmConfig) -> np.ndarray:
    """(2K, met_w) 0/1 matrix: p @ sel = [sig_sum, noise_sum, cnr_0.., 0..]."""
    c = _small_consts(cfg, "float32")
    n_cnr, met_w = _met_layout(cfg)
    sel = np.zeros((2 * cfg.subcarriers, met_w), dtype=np.float32)
    sel[c["sig_idx"], 0] = 1.0
    sel[c["noise_idx"], 1] = 1.0
    for j, b in enumerate(c["sig_idx"]):
        sel[b, 2 + j] = 1.0
    return sel


@lru_cache(maxsize=16)
def _circ_masks(cfg: GfdmConfig):
    """(M-1, N) masks: row j-1 is 1.0 where (col % M) < j."""
    n, M = cfg.block_len, cfg.timeslots
    cols = np.arange(n) % M
    return np.stack(
        [(cols < j).astype(np.float32) for j in range(1, M)]
    )


def rx_receiver_fused(cfg: GfdmConfig, bursts, ic_iterations: int = 2,
                      block: int = 128, interpret: bool | None = None,
                      qpsk_amp: float | None = None,
                      constellation: str = "qpsk",
                      phase_compensation: bool = False,
                      equalizer: str = "zf",
                      ic_mode: str = "conv"):
    """Whole receiver core (channel est + SNR/CNR + ZF + demod + circulant
    IC) in one VMEM pass.

    bursts: (B, 2, frame_len) planar -> (channel (B, 2, N), symbols
    (B, 2, N), metrics (B, met_w) = [snr_lin | scaled cnrs | 0-pad]) planar.
    The IC iterations cost only VPU work (9-tap circular convolution per
    block via mask-blended rolls) - no extra MXU matmuls and no HBM round
    trips.
    """
    if interpret is None:
        interpret = not _on_tpu()
    mats = _device_mats(cfg, "float32")
    n = cfg.block_len
    active = np.zeros((1, n), dtype=np.float32)
    for k in cfg.subcarrier_map:
        active[0, k * cfg.timeslots : (k + 1) * cfg.timeslots] = 1.0
    B = bursts.shape[0]
    if phase_compensation:
        block = min(block, 64)  # CPO temporaries push block=128 ~40K over VMEM
    block = min(block, B)
    if B % block:
        raise ValueError(f"batch {B} must be a multiple of block {block}")
    amp = _IC_AMPS[constellation] if qpsk_amp is None else float(qpsk_amp)
    call = _rx_ic_circ_call(cfg, B, block, int(ic_iterations), amp,
                            str(constellation), bool(phase_compensation),
                            str(equalizer), str(ic_mode), bool(interpret))
    icop = (_ic_matmul_stack(cfg, amp) if ic_mode == "matmul"
            else _circ_masks(cfg))
    chan, out, met = call(
        bursts.reshape(B, -1),
        jnp.asarray(mats["E_G"]),
        jnp.asarray(mats["F_G"]),
        jnp.asarray(mats["Bfd_G"]),
        jnp.asarray(mats["F2_G"]),
        jnp.asarray(_met_selection(cfg)),
        jnp.asarray(active),
        jnp.asarray(icop),
        jnp.asarray(_cnri_pad(cfg)),
    )
    return chan.reshape(B, 2, n), out.reshape(B, 2, n), met


# ---------------------------------------------------------------------------
# fully fused receiver: channel est + ZF + demod + IC loop in one VMEM pass
# ---------------------------------------------------------------------------
def _rx_full_kernel(cfg: GfdmConfig, ic_iterations: int, qpsk_amp: float,
                    burst_ref, e_ref, fw_ref, bfd_ref, cw_ref, act_ref, out_ref):
    n = cfg.block_len
    K, M = cfg.subcarriers, cfg.timeslots
    L = cfg.frame_len
    cp = cfg.cp_len
    pre_len = 2 * K
    fs = cfg.preamble_len + cfg.cp_len

    burst = burst_ref[:]  # (Bb, 2*frame_len) = [re | im]
    bb = burst.shape[0]
    pre2 = jnp.concatenate(
        [burst[:, cp : cp + pre_len], burst[:, L + cp : L + cp + pre_len]], axis=-1
    )
    chan = jnp.dot(pre2, e_ref[:], preferred_element_type=jnp.float32)  # (Bb, 2N)
    frame = jnp.concatenate(
        [burst[:, fs : fs + n], burst[:, L + fs : L + fs + n]], axis=-1
    )
    X = jnp.dot(frame, fw_ref[:], preferred_element_type=jnp.float32)
    Xr, Xi = X[:, :n], X[:, n:]
    Cr, Ci = chan[:, :n], chan[:, n:]
    den = jnp.maximum(Cr * Cr + Ci * Ci, 1e-30)
    Y = jnp.concatenate(
        [(Xr * Cr + Xi * Ci) / den, (Xi * Cr - Xr * Ci) / den], axis=-1
    )
    S = jnp.dot(Y, bfd_ref[:], preferred_element_type=jnp.float32)  # (Bb, 2N)

    d0r = S[:, :n].reshape(bb, K, M)
    d0i = S[:, n:].reshape(bb, K, M)
    act = act_ref[:].reshape(1, K, 1)  # (1, K, 1) 0/1 mask
    a = qpsk_amp

    def roll_k(x, up):
        # circular shift along the K axis via static slicing
        if up:
            return jnp.concatenate([x[:, -1:, :], x[:, :-1, :]], axis=1)
        return jnp.concatenate([x[:, 1:, :], x[:, :1, :]], axis=1)

    dr, di = d0r, d0i
    for _ in range(ic_iterations):
        hr = jnp.where(dr >= 0, a, -a) * act
        hi = jnp.where(di >= 0, a, -a) * act
        nr = roll_k(hr, True) + roll_k(hr, False)
        ni = roll_k(hi, True) + roll_k(hi, False)
        nbr = jnp.concatenate([nr, ni], axis=-1).reshape(bb * K, 2 * M)
        interf = jnp.dot(nbr, cw_ref[:], preferred_element_type=jnp.float32)
        interf = interf.reshape(bb, K, 2 * M)
        dr = d0r - interf[..., :M]
        di = d0i - interf[..., M:]

    out_ref[:, :n] = dr.reshape(bb, n)
    out_ref[:, n:] = di.reshape(bb, n)


@lru_cache(maxsize=16)
def _rx_full_call(cfg: GfdmConfig, batch: int, block: int, ic_iterations: int,
                  qpsk_amp: float, interpret: bool):
    n2 = 2 * cfg.block_len
    f2 = 2 * cfg.frame_len
    e_rows = 2 * 2 * cfg.subcarriers
    m2 = 2 * cfg.timeslots
    kernel = functools.partial(_rx_full_kernel, cfg, ic_iterations, qpsk_amp)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((batch, n2), jnp.float32),
        grid=(batch // block,),
        in_specs=[
            pl.BlockSpec((block, f2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((e_rows, n2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n2, n2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n2, n2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m2, m2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cfg.subcarriers), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, n2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )


def rx_full_fused(cfg: GfdmConfig, bursts, ic_iterations: int = 2,
                  block: int = 64, interpret: bool | None = None,
                  qpsk_amp: float = 2.0**-0.5):
    """Whole ZF+IC receiver core in one VMEM pass.

    bursts: (B, 2, frame_len) planar -> (B, 2, N) planar symbols. Channel
    estimation, block FFT, ZF divide, FD demod and the IC iterations all
    happen without the per-burst state leaving VMEM. QPSK decisions (sign
    selects) only; SNR metrics are computed outside (cheap).

    Status: validated against the XLA pipeline in interpret mode; this
    image's Mosaic compiler currently rejects the 3-D (block, K, M=9)
    slicing in the IC stage (remote compile HTTP 500) - the IC grids need
    lane-aligned re-tiling before this runs natively. rx_core_fused (the
    2-D ZF core) compiles and runs natively at XLA parity.
    """
    if interpret is None:
        interpret = not _on_tpu()
    mats = _device_mats(cfg, "float32")
    B = bursts.shape[0]
    block = min(block, B)
    if B % block:
        raise ValueError(f"batch {B} must be a multiple of block {block}")
    active = np.zeros((1, cfg.subcarriers), dtype=np.float32)
    active[0, cfg.subcarrier_map] = 1.0
    call = _rx_full_call(cfg, B, block, int(ic_iterations), float(qpsk_amp),
                         bool(interpret))
    out = call(
        bursts.reshape(B, -1),
        jnp.asarray(mats["E_W"]),
        jnp.asarray(mats["F_W"]),
        jnp.asarray(mats["Bfd_W"]),
        jnp.asarray(mats["C_W"]),
        jnp.asarray(active),
    )
    return out.reshape(B, 2, cfg.block_len)


# ---------------------------------------------------------------------------
# factorized receiver: Cooley-Tukey FFT in VMEM, rolls for everything small
# ---------------------------------------------------------------------------
@lru_cache(maxsize=16)
def _factored_consts(cfg: GfdmConfig):
    """Constants for the factorized receiver kernel (all lane-aligned 2-D).

    The N = K*M block DFT is split as K-point matmuls (contraction 2K - a
    full MXU tile for K=64) + an M-point stage expressed as M coefficient-
    weighted full-row rolls (the (M, K)-layout M-stage only mixes elements
    exactly K apart, so flat rolls by j*K realize it with zero masks).
    The sparse fold and the per-subcarrier M-point IFFT are likewise
    coefficient-weighted (masked) rolls - any blockdiag-repeated (M, M)
    linear map equals M masked rolls with per-position coefficient vectors.
    MXU work drops from 5.9M to 0.9M FLOP/burst vs the dense-operator kernel.
    """
    from ..ops import operators as _ops
    from ..ops.planar import real_operator

    K, M, L = cfg.subcarriers, cfg.timeslots, cfg.overlap
    N = cfg.block_len
    WM = _ops.dft_matrix(M)
    T = np.exp(-2j * np.pi * np.outer(np.arange(M), np.arange(K)) / N)
    mc = np.zeros((M, N), dtype=np.complex128)
    for j in range(M):
        for k1 in range(M):
            n1 = (k1 - j) % M
            mc[j, k1 * K : (k1 + 1) * K] = WM[k1, n1] * T[n1, :]
    parts = cfg.rx_filter_taps.reshape(L, M)
    ft = np.stack([np.tile(parts[(i + L // 2) % L], K) for i in range(L)])
    iFM = _ops.idft_matrix(M)
    iv = np.zeros((M, N), dtype=np.complex128)
    for j in range(M):
        for nn in range(M):
            iv[j].reshape(K, M)[:, nn] = iFM[nn, (nn - j) % M]
    # reorder indices: xt[n1*K + n2] = frame[M*n2 + n1]
    n1g, n2g = np.meshgrid(np.arange(M), np.arange(K), indexing="ij")
    reorder = (M * n2g + n1g).reshape(-1).astype(np.int32)
    f32 = np.float32
    return {
        "FK_W": real_operator(_ops.dft_matrix(K), f32),  # (2K, 2K), symmetric
        "mcr": mc.real.astype(f32), "mci": mc.imag.astype(f32),
        "ftr": ft.real.astype(f32), "fti": ft.imag.astype(f32),
        "ivr": iv.real.astype(f32), "ivi": iv.imag.astype(f32),
        "reorder": reorder,
    }


def _rx_factored_kernel(cfg: GfdmConfig, ic_iterations: int, qpsk_amp: float,
                        c_taps_r: tuple, c_taps_i: tuple,
                        xt_ref, pre_ref, e_ref, fk_ref, mcr_ref, mci_ref,
                        ftr_ref, fti_ref, ivr_ref, ivi_ref,
                        act_ref, mlt_ref, chan_ref, out_ref):
    chan = jnp.dot(pre_ref[:], e_ref[:], preferred_element_type=jnp.float32)
    chan_ref[:] = chan
    _factored_demod_body(cfg, ic_iterations, qpsk_amp, c_taps_r, c_taps_i,
                         chan, xt_ref, fk_ref, mcr_ref, mci_ref,
                         ftr_ref, fti_ref, ivr_ref, ivi_ref,
                         act_ref, mlt_ref, out_ref)


def _rx_factored_chan_kernel(cfg: GfdmConfig, ic_iterations: int,
                             qpsk_amp: float,
                             c_taps_r: tuple, c_taps_i: tuple,
                             xt_ref, chan_in_ref, fk_ref, mcr_ref, mci_ref,
                             ftr_ref, fti_ref, ivr_ref, ivi_ref,
                             act_ref, mlt_ref, out_ref):
    """Factored receiver with a precomputed planar channel input.

    Removes the dense (4K, 2N) estimation operator from VMEM entirely —
    the piece whose footprint forbids K >= 256 in the fused variant; the
    channel comes from the O(K^2) factorized XLA estimator
    (ops/planar_fast.estimate_channel_fast) instead.
    """
    _factored_demod_body(cfg, ic_iterations, qpsk_amp, c_taps_r, c_taps_i,
                         chan_in_ref[:], xt_ref, fk_ref, mcr_ref, mci_ref,
                         ftr_ref, fti_ref, ivr_ref, ivi_ref,
                         act_ref, mlt_ref, out_ref)


def _factored_demod_body(cfg: GfdmConfig, ic_iterations: int, qpsk_amp: float,
                         c_taps_r: tuple, c_taps_i: tuple,
                         chan, xt_ref, fk_ref, mcr_ref, mci_ref,
                         ftr_ref, fti_ref, ivr_ref, ivi_ref,
                         act_ref, mlt_ref, out_ref):
    K, M, L = cfg.subcarriers, cfg.timeslots, cfg.overlap
    n = cfg.block_len

    xt = xt_ref[:]  # (Bb, 2N) in (n1, n2) layout, [re | im]
    fk = fk_ref[:]
    # --- K-stage: M planar matmuls, contraction 2K (one full MXU tile) ----
    zr_parts, zi_parts = [], []
    for n1 in range(M):
        row = jnp.concatenate(
            [xt[:, n1 * K : (n1 + 1) * K], xt[:, n + n1 * K : n + (n1 + 1) * K]],
            axis=1,
        )  # (Bb, 2K) planar
        z = jnp.dot(row, fk, preferred_element_type=jnp.float32)
        zr_parts.append(z[:, :K])
        zi_parts.append(z[:, K:])
    Zr = jnp.concatenate(zr_parts, axis=1)  # (Bb, N), (n1, k2) layout
    Zi = jnp.concatenate(zi_parts, axis=1)

    def groll(v, shift):
        shift = shift % n
        if shift == 0:
            return v
        return jnp.concatenate([v[:, n - shift :], v[:, : n - shift]], axis=1)

    # --- M-stage: X[k1*K+k2] = sum_j mc_j * Z[((k1-j)%M)*K + k2] ----------
    mcr, mci = mcr_ref[:], mci_ref[:]
    Xr = jnp.zeros_like(Zr)
    Xi = jnp.zeros_like(Zi)
    for j in range(M):
        rr = groll(Zr, j * K)
        ri = groll(Zi, j * K)
        cr_, ci_ = mcr[j : j + 1, :], mci[j : j + 1, :]
        Xr = Xr + cr_ * rr - ci_ * ri
        Xi = Xi + cr_ * ri + ci_ * rr
    # X is now the natural-order block spectrum

    # --- ZF divide ---------------------------------------------------------
    Cr, Ci = chan[:, :n], chan[:, n:]
    den = jnp.maximum(Cr * Cr + Ci * Ci, 1e-30)
    Yr = (Xr * Cr + Xi * Ci) / den
    Yi = (Xi * Cr - Xr * Ci) / den

    # --- sparse fold: L tap-weighted rolls by multiples of M ---------------
    ftr, fti = ftr_ref[:], fti_ref[:]
    Sr = jnp.zeros_like(Yr)
    Si = jnp.zeros_like(Yi)
    for i in range(L):
        s = (-(i - L // 2) * M) % n
        rr = groll(Yr, s)
        ri = groll(Yi, s)
        tr_, ti_ = ftr[i : i + 1, :], fti[i : i + 1, :]
        Sr = Sr + tr_ * rr - ti_ * ri
        Si = Si + tr_ * ri + ti_ * rr

    def block_rot(v, j):
        if j == 0:
            return v
        return jnp.where(mlt_ref[:][j - 1 : j, :] > 0, groll(v, j - M), groll(v, j))

    # --- per-subcarrier M-point IFFT: M masked coefficient rolls -----------
    ivr, ivi = ivr_ref[:], ivi_ref[:]
    d0r = jnp.zeros_like(Sr)
    d0i = jnp.zeros_like(Si)
    for j in range(M):
        rr = block_rot(Sr, j)
        ri = block_rot(Si, j)
        cr_, ci_ = ivr[j : j + 1, :], ivi[j : j + 1, :]
        d0r = d0r + cr_ * rr - ci_ * ri
        d0i = d0i + cr_ * ri + ci_ * rr

    # --- decision-directed IC (circulant form, roll-optimized: stacked
    # planes + exact {-1,0,1} bf16 roll traffic, see _rx_ic_circ_kernel) ----
    act = act_ref[:]
    a = qpsk_amp
    bb = d0r.shape[0]
    dr, di = d0r, d0i
    for _ in range(ic_iterations):
        qr, qi = _ic_decide(dr, di, "qpsk")
        h2 = jnp.concatenate([qr, qi], axis=0)
        h2 = (h2 * act).astype(jnp.bfloat16)
        n2_ = groll(h2, M) + groll(h2, -M)
        ir = jnp.zeros_like(d0r)
        ii = jnp.zeros_like(d0i)
        for j in range(M):
            s2 = block_rot(n2_, j).astype(jnp.float32)
            sr, si = s2[:bb], s2[bb:]
            cr_, ci_ = a * c_taps_r[j], a * c_taps_i[j]
            ir = ir + cr_ * sr - ci_ * si
            ii = ii + cr_ * si + ci_ * sr
        dr = d0r - ir
        di = d0i - ii

    out_ref[:, :n] = dr
    out_ref[:, n:] = di


@lru_cache(maxsize=16)
def _rx_factored_call(cfg: GfdmConfig, batch: int, block: int,
                      ic_iterations: int, qpsk_amp: float, interpret: bool):
    from ..ops import operators as _ops
    from ..ref.demodulation import ic_filter_taps as _ic

    n = cfg.block_len
    n2 = 2 * n
    M = cfg.timeslots
    K = cfg.subcarriers
    e_rows = 2 * 2 * K
    Cmat = (
        _ops.idft_matrix(M)
        @ np.diag(_ic(cfg.rx_filter_taps, M, cfg.overlap))
        @ _ops.dft_matrix(M)
    )
    c_col = Cmat[:, 0]
    kernel = functools.partial(
        _rx_factored_kernel, cfg, ic_iterations, qpsk_amp,
        tuple(float(x) for x in c_col.real),
        tuple(float(x) for x in c_col.imag),
    )
    const2d = lambda r: pl.BlockSpec((r, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((batch, n2), jnp.float32),  # chan
            jax.ShapeDtypeStruct((batch, n2), jnp.float32),  # symbols
        ),
        grid=(batch // block,),
        in_specs=[
            pl.BlockSpec((block, n2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, e_rows), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((e_rows, n2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * K, 2 * K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            const2d(M), const2d(M),              # mcr, mci
            const2d(cfg.overlap), const2d(cfg.overlap),  # ftr, fti
            const2d(M), const2d(M),              # ivr, ivi
            const2d(1),                          # act
            const2d(M - 1),                      # mlt
        ],
        out_specs=(
            pl.BlockSpec((block, n2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, n2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )


@lru_cache(maxsize=16)
def _rx_factored_chan_call(cfg: GfdmConfig, batch: int, block: int,
                           ic_iterations: int, qpsk_amp: float,
                           interpret: bool):
    from ..ops import operators as _ops
    from ..ref.demodulation import ic_filter_taps as _ic

    n = cfg.block_len
    n2 = 2 * n
    M = cfg.timeslots
    K = cfg.subcarriers
    Cmat = (
        _ops.idft_matrix(M)
        @ np.diag(_ic(cfg.rx_filter_taps, M, cfg.overlap))
        @ _ops.dft_matrix(M)
    )
    c_col = Cmat[:, 0]
    kernel = functools.partial(
        _rx_factored_chan_kernel, cfg, ic_iterations, qpsk_amp,
        tuple(float(x) for x in c_col.real),
        tuple(float(x) for x in c_col.imag),
    )
    const2d = lambda r: pl.BlockSpec((r, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((batch, n2), jnp.float32),
        grid=(batch // block,),
        in_specs=[
            pl.BlockSpec((block, n2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, n2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * K, 2 * K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            const2d(M), const2d(M),              # mcr, mci
            const2d(cfg.overlap), const2d(cfg.overlap),  # ftr, fti
            const2d(M), const2d(M),              # ivr, ivi
            const2d(1),                          # act
            const2d(M - 1),                      # mlt
        ],
        out_specs=pl.BlockSpec((block, n2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )


def _rx_hybrid_kernel(cfg: GfdmConfig, ic_iterations: int, qpsk_amp: float,
                      c_taps_r: tuple, c_taps_i: tuple,
                      burst_ref, e_ref, fw_ref,
                      ftr_ref, fti_ref, ivr_ref, ivi_ref,
                      act_ref, mlt_ref, chan_ref, out_ref):
    """Dense block FFT (one big MXU matmul) + roll-based fold/M-IFFT/IC.

    Kills the dense Bfd matmul (2.65M FLOP/burst) for 11 VPU roll passes;
    keeps the well-shaped F matmul on the MXU.
    """
    K, M, L = cfg.subcarriers, cfg.timeslots, cfg.overlap
    n = cfg.block_len
    pre_len = 2 * 2 * K
    Lf = cfg.frame_len
    cp = cfg.cp_len
    fs = cfg.preamble_len + cfg.cp_len

    burst = burst_ref[:]  # (Bb, 2*frame_len)
    pre2 = jnp.concatenate(
        [burst[:, cp : cp + pre_len // 2],
         burst[:, Lf + cp : Lf + cp + pre_len // 2]], axis=-1
    )
    chan = jnp.dot(pre2, e_ref[:], preferred_element_type=jnp.float32)
    chan_ref[:] = chan
    frame = jnp.concatenate(
        [burst[:, fs : fs + n], burst[:, Lf + fs : Lf + fs + n]], axis=-1
    )
    X = jnp.dot(frame, fw_ref[:], preferred_element_type=jnp.float32)
    Xr, Xi = X[:, :n], X[:, n:]
    Cr, Ci = chan[:, :n], chan[:, n:]
    den = jnp.maximum(Cr * Cr + Ci * Ci, 1e-30)
    Yr = (Xr * Cr + Xi * Ci) / den
    Yi = (Xi * Cr - Xr * Ci) / den

    def groll(v, shift):
        shift = shift % n
        if shift == 0:
            return v
        return jnp.concatenate([v[:, n - shift :], v[:, : n - shift]], axis=1)

    def block_rot(v, j):
        if j == 0:
            return v
        return jnp.where(mlt_ref[:][j - 1 : j, :] > 0, groll(v, j - M), groll(v, j))

    ftr, fti = ftr_ref[:], fti_ref[:]
    Sr = jnp.zeros_like(Yr)
    Si = jnp.zeros_like(Yi)
    for i in range(L):
        s = (-(i - L // 2) * M) % n
        rr = groll(Yr, s)
        ri = groll(Yi, s)
        tr_, ti_ = ftr[i : i + 1, :], fti[i : i + 1, :]
        Sr = Sr + tr_ * rr - ti_ * ri
        Si = Si + tr_ * ri + ti_ * rr

    ivr, ivi = ivr_ref[:], ivi_ref[:]
    d0r = jnp.zeros_like(Sr)
    d0i = jnp.zeros_like(Si)
    for j in range(M):
        rr = block_rot(Sr, j)
        ri = block_rot(Si, j)
        cr_, ci_ = ivr[j : j + 1, :], ivi[j : j + 1, :]
        d0r = d0r + cr_ * rr - ci_ * ri
        d0i = d0i + cr_ * ri + ci_ * rr

    act = act_ref[:]
    a = qpsk_amp
    bb = d0r.shape[0]
    dr, di = d0r, d0i
    for _ in range(ic_iterations):
        qr, qi = _ic_decide(dr, di, "qpsk")
        h2 = jnp.concatenate([qr, qi], axis=0)
        h2 = (h2 * act).astype(jnp.bfloat16)
        n2_ = groll(h2, M) + groll(h2, -M)
        ir = jnp.zeros_like(d0r)
        ii = jnp.zeros_like(d0i)
        for j in range(M):
            s2 = block_rot(n2_, j).astype(jnp.float32)
            sr, si = s2[:bb], s2[bb:]
            cr_, ci_ = a * c_taps_r[j], a * c_taps_i[j]
            ir = ir + cr_ * sr - ci_ * si
            ii = ii + cr_ * si + ci_ * sr
        dr = d0r - ir
        di = d0i - ii

    out_ref[:, :n] = dr
    out_ref[:, n:] = di


@lru_cache(maxsize=16)
def _rx_hybrid_call(cfg: GfdmConfig, batch: int, block: int,
                    ic_iterations: int, qpsk_amp: float, interpret: bool):
    from ..ops import operators as _ops
    from ..ref.demodulation import ic_filter_taps as _ic

    n = cfg.block_len
    n2 = 2 * n
    M = cfg.timeslots
    f2 = 2 * cfg.frame_len
    e_rows = 2 * 2 * cfg.subcarriers
    Cmat = (
        _ops.idft_matrix(M)
        @ np.diag(_ic(cfg.rx_filter_taps, M, cfg.overlap))
        @ _ops.dft_matrix(M)
    )
    c_col = Cmat[:, 0]
    kernel = functools.partial(
        _rx_hybrid_kernel, cfg, ic_iterations, qpsk_amp,
        tuple(float(x) for x in c_col.real),
        tuple(float(x) for x in c_col.imag),
    )
    const2d = lambda r: pl.BlockSpec((r, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((batch, n2), jnp.float32),
            jax.ShapeDtypeStruct((batch, n2), jnp.float32),
        ),
        grid=(batch // block,),
        in_specs=[
            pl.BlockSpec((block, f2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((e_rows, n2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n2, n2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            const2d(cfg.overlap), const2d(cfg.overlap),
            const2d(M), const2d(M),
            const2d(1),
            const2d(M - 1),
        ],
        out_specs=(
            pl.BlockSpec((block, n2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, n2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )


def rx_receiver_hybrid(cfg: GfdmConfig, bursts, ic_iterations: int = 2,
                       block: int = 128, interpret: bool | None = None,
                       qpsk_amp: float = 2.0**-0.5):
    """One-kernel receiver: dense F matmul + roll-based demod stage.

    Same contract as rx_receiver_fused, with the Bfd dense matmul replaced
    by the sparse fold (2 tap-weighted rolls) and the per-subcarrier M-point
    IFFT (M masked coefficient rolls).
    """
    if interpret is None:
        interpret = not _on_tpu()
    mats = _device_mats(cfg, "float32")
    fc = _factored_consts(cfg)
    n = cfg.block_len
    active = np.zeros((1, n), dtype=np.float32)
    for k in cfg.subcarrier_map:
        active[0, k * cfg.timeslots : (k + 1) * cfg.timeslots] = 1.0
    B = bursts.shape[0]
    block = min(block, B)
    if B % block:
        raise ValueError(f"batch {B} must be a multiple of block {block}")
    call = _rx_hybrid_call(cfg, B, block, int(ic_iterations), float(qpsk_amp),
                           bool(interpret))
    chan, out = call(
        bursts.reshape(B, -1),
        jnp.asarray(mats["E_W"]),
        jnp.asarray(mats["F_W"]),
        jnp.asarray(fc["ftr"]), jnp.asarray(fc["fti"]),
        jnp.asarray(fc["ivr"]), jnp.asarray(fc["ivi"]),
        jnp.asarray(active),
        jnp.asarray(_circ_masks(cfg)),
    )
    return chan.reshape(B, 2, n), out.reshape(B, 2, n)


def default_factored_block(cfg: GfdmConfig) -> int:
    """Largest measured-good VMEM block for the factored kernel at this K.

    The kernel's live set scales with block*N plus the (2K, 2K) K-stage
    matrix; measured sweet spots on a v5e-class chip: 128 up to K=128,
    16 at K=512 (32/64 exceed VMEM; 8 collapses to grid-overhead-bound),
    8 at K=1024.
    """
    K = cfg.subcarriers
    if K <= 128:
        return 128
    if K <= 256:
        return 32
    if K <= 512:
        return 16
    return 8


def rx_receiver_factored(cfg: GfdmConfig, bursts, ic_iterations: int = 2,
                         block: int | None = None,
                         interpret: bool | None = None,
                         qpsk_amp: float = 2.0**-0.5,
                         estimator: str = "fused"):
    """Factorized one-kernel receiver (channel est + ZF + demod + IC).

    Same contract as rx_receiver_fused, but the block FFT and FD demod run
    as a Cooley-Tukey decomposition inside VMEM (K-stage matmuls + roll-based
    M-stage/fold/M-IFFT) - ~6.7x less MXU work than the dense-operator
    kernel. The input reorder to the (n1, n2) layout is one cheap XLA gather.

    ``block=None`` picks the measured-good VMEM block for this K
    (default_factored_block). Measured at K=512/batch 4096 with fetch-forced
    timing: 17.98 ms vs 105.6 ms for the XLA 'fast' path - 5.9x
    (benchmarks/largek_crossover.py; the reference's FFT kernels are
    size-independent O(N log N), modulator_kernel_cc.cc:98-141 - this is
    the TPU answer at large K).

    estimator:
      "fused" — channel estimated inside the kernel via the dense (4K, 2N)
                operator (one extra VMEM-resident matrix; K <= ~128).
      "fast"  — channel estimated outside by the O(K^2) factorized XLA
                estimator (ops/planar_fast) and streamed in per block; no
                dense operator of any kind, so K >= 256 configs fit VMEM.
    """
    if block is None:
        block = default_factored_block(cfg)
    if interpret is None:
        interpret = not _on_tpu()
    fc = _factored_consts(cfg)
    n = cfg.block_len
    K = cfg.subcarriers
    active = np.zeros((1, n), dtype=np.float32)
    for k in cfg.subcarrier_map:
        active[0, k * cfg.timeslots : (k + 1) * cfg.timeslots] = 1.0
    B = bursts.shape[0]
    block = min(block, B)
    if B % block:
        raise ValueError(f"batch {B} must be a multiple of block {block}")

    fs = cfg.preamble_len + cfg.cp_len
    frame = bursts[..., fs : fs + n]
    xt = jnp.take(frame, jnp.asarray(fc["reorder"]), axis=-1).reshape(B, 2 * n)

    if estimator == "fast":
        from ..ops import planar_fast as _pf

        pre = bursts[..., cfg.cp_len : cfg.cp_len + 2 * K]  # (B, 2, 2K)
        chan = _pf.estimate_channel_fast(
            cfg, pre, _pf._est_consts(cfg, "float32")
        ).reshape(B, 2 * n)
        call = _rx_factored_chan_call(cfg, B, block, int(ic_iterations),
                                      float(qpsk_amp), bool(interpret))
        out = call(
            xt, chan,
            jnp.asarray(fc["FK_W"]),
            jnp.asarray(fc["mcr"]), jnp.asarray(fc["mci"]),
            jnp.asarray(fc["ftr"]), jnp.asarray(fc["fti"]),
            jnp.asarray(fc["ivr"]), jnp.asarray(fc["ivi"]),
            jnp.asarray(active),
            jnp.asarray(_circ_masks(cfg)),
        )
        return chan.reshape(B, 2, n), out.reshape(B, 2, n)
    if estimator != "fused":
        raise ValueError(f"estimator must be 'fused' or 'fast', got {estimator!r}")

    mats = _device_mats(cfg, "float32")
    pre2 = bursts[..., cfg.cp_len : cfg.cp_len + 2 * K].reshape(B, 4 * K)

    call = _rx_factored_call(cfg, B, block, int(ic_iterations), float(qpsk_amp),
                             bool(interpret))
    chan, out = call(
        xt, pre2,
        jnp.asarray(mats["E_W"]),
        jnp.asarray(fc["FK_W"]),
        jnp.asarray(fc["mcr"]), jnp.asarray(fc["mci"]),
        jnp.asarray(fc["ftr"]), jnp.asarray(fc["fti"]),
        jnp.asarray(fc["ivr"]), jnp.asarray(fc["ivi"]),
        jnp.asarray(active),
        jnp.asarray(_circ_masks(cfg)),
    )
    return chan.reshape(B, 2, n), out.reshape(B, 2, n)


# ---------------------------------------------------------------------------
# production composites: fused receiver + thin XLA metric/demap epilogue
# ---------------------------------------------------------------------------
def receive_bursts_fused(cfg: GfdmConfig, bursts, ic_iterations: int = 2,
                         block: int = 128, interpret: bool | None = None,
                         constellation: str = "qpsk",
                         equalizer: str = "zf"):
    """Production TPU receive path: one-kernel receiver + XLA epilogue.

    bursts: (B, 2, frame_len) planar, aligned at the full-preamble start.
    Returns the same dict as planar_pipeline.receive_bursts_planar (ZF
    equalizer, QPSK decisions). The whole chain including the SNR/CNR
    estimate runs in one Pallas VMEM pass; only the demap gather stays in
    XLA.
    """
    from ..ops.tx import demap_indices

    chan, symbols, met = rx_receiver_fused(
        cfg, bursts, ic_iterations=ic_iterations, block=block,
        interpret=interpret, constellation=constellation,
        equalizer=equalizer,
    )
    n_cnr, _ = _met_layout(cfg)
    data = jnp.take(symbols, jnp.asarray(demap_indices(cfg)), axis=-1)
    return {
        "data": data,
        "symbols": symbols,
        "channel": chan,
        "snr_lin": met[:, 0],
        "cnrs": met[:, 1 : 1 + n_cnr],
    }


def link_step_fused(cfg: GfdmConfig, data, ic_iterations: int = 2,
                    tx_block: int = 128, rx_block: int = 128,
                    interpret: bool | None = None):
    """Fused end-to-end link: payload -> Tx kernel -> Rx kernel -> epilogue.

    Same contract as planar_pipeline.link_step_planar (shift 0, ZF, QPSK).
    """
    bursts = tx_frame_fused(cfg, data, block=tx_block, interpret=interpret)
    out = receive_bursts_fused(
        cfg, bursts, ic_iterations=ic_iterations, block=rx_block,
        interpret=interpret,
    )
    err = jnp.sum((out["data"] - data) ** 2)
    ref = jnp.maximum(jnp.sum(data**2), 1e-30)
    evm = jnp.sqrt(err / ref)
    return out["data"], out["snr_lin"], evm


# ---------------------------------------------------------------------------
# fully fused loopback link: Tx -> burst (VMEM) -> receiver in ONE kernel
# ---------------------------------------------------------------------------
def _link_kernel(cfg: GfdmConfig, ic_iterations: int, qpsk_amp: float,
                 dec_kind: str, ic_mode: str,
                 c_taps_r: tuple, c_taps_i: tuple, n_cnr: int,
                 data_ref, tw_ref, win_ref, pre_ref, e_ref, fw_ref, bfd_ref,
                 f2_ref, sel_ref, act_ref, icop_ref, dsel_ref,
                 out_ref, met_ref):
    """End-to-end link with the burst batch held in VMEM.

    Tx (core modulate -> CP/CS + window -> preamble) and the full receiver
    (channel est + SNR/CNR + ZF + demod + circulant IC + demap) run in one
    VMEM pass per burst block: the 2*frame_len waveform never round-trips
    through HBM between the chains. Shift 0, clean loopback - the evaluation
    path of link_step_fused; tx_frame_fused/rx_receiver_fused remain the
    split production chains for real channels.
    """
    n = cfg.block_len
    n_d = cfg.n_data_symbols
    M = cfg.timeslots
    half = 2 * cfg.subcarriers  # complex preamble length (2K)
    L = cfg.frame_len
    cp, cs = cfg.cp_len, cfg.cs_len
    p_len = cfg.preamble_len
    fs = p_len + cp

    # ---- Tx chain (mirrors _tx_kernel, shift 0)
    d = data_ref[:]  # (Bb, 2*n_data)
    bb = d.shape[0]
    core = _gdot(d[:, :n_d], d[:, n_d:], tw_ref, n_d)
    win = win_ref[:]
    pre = pre_ref[:]  # (2, p_len)
    burst = []
    for plane in range(2):
        c = core[plane]
        framed = jnp.concatenate([c[:, n - cp :], c, c[:, :cs]], axis=-1) * win
        burst.append(
            jnp.concatenate(
                [jnp.broadcast_to(pre[plane], (bb, p_len)), framed], axis=-1
            )
        )  # (Bb, frame_len), in VMEM only

    # ---- receiver chain (mirrors _rx_ic_circ_kernel on the VMEM burst)
    pre_r = burst[0][:, cp : cp + half]
    pre_i = burst[1][:, cp : cp + half]
    Chr, Chi = _gdot(pre_r, pre_i, e_ref, half)

    Fr, Fi = _gdot(pre_r, pre_i, f2_ref, half)
    p = Fr * Fr + Fi * Fi
    sums = jnp.dot(p, sel_ref[:], preferred_element_type=jnp.float32)
    sig = sums[:, 0:1]
    noise = sums[:, 1:2]
    snr_lin = (sig - noise) / noise
    cnr = sums[:, 2 : 2 + n_cnr] * (snr_lin / (sig / n_cnr))
    met_ref[:, 0:1] = snr_lin
    met_ref[:, 1 : 1 + n_cnr] = cnr
    if met_ref.shape[-1] > 1 + n_cnr:
        met_ref[:, 1 + n_cnr :] = jnp.zeros(
            (bb, met_ref.shape[-1] - 1 - n_cnr), jnp.float32
        )

    Xr, Xi = _gdot(burst[0][:, fs : fs + n], burst[1][:, fs : fs + n], fw_ref, n)
    den = jnp.maximum(Chr * Chr + Chi * Chi, 1e-30)
    Yr = (Xr * Chr + Xi * Chi) / den
    Yi = (Xi * Chr - Xr * Chi) / den
    d0r, d0i = _gdot(Yr, Yi, bfd_ref, n)
    act = act_ref[:]
    a = qpsk_amp

    def groll(v, shift):
        shift = shift % n
        if shift == 0:
            return v
        return jnp.concatenate([v[:, n - shift :], v[:, : n - shift]], axis=1)

    def block_rot(v, j):
        if j == 0:
            return v
        return jnp.where(icop_ref[:][j - 1 : j, :] > 0, groll(v, j - M), groll(v, j))

    dr, di = d0r, d0i
    if ic_mode == "matmul":
        # one bf16 Gauss matmul triple per iteration (see _rx_ic_circ_kernel)
        for _ in range(ic_iterations):
            qr, qi = _ic_decide(dr, di, dec_kind)
            ir, ii = _gdot(qr * act, qi * act, icop_ref, n)
            dr = d0r - ir
            di = d0i - ii
    else:
        # roll-optimized conv IC (see _rx_ic_circ_kernel for layout notes)
        for _ in range(ic_iterations):
            qr, qi = _ic_decide(dr, di, dec_kind)
            h2 = jnp.concatenate([qr, qi], axis=0)
            h2 = (h2 * act).astype(jnp.bfloat16)
            n2 = groll(h2, M) + groll(h2, -M)
            ir = jnp.zeros_like(d0r)
            ii = jnp.zeros_like(d0i)
            for j in range(M):
                s2 = block_rot(n2, j).astype(jnp.float32)
                sr, si = s2[:bb], s2[bb:]
                cr_, ci_ = a * c_taps_r[j], a * c_taps_i[j]
                ir = ir + cr_ * sr - ci_ * si
                ii = ii + cr_ * si + ci_ * sr
            dr = d0r - ir
            di = d0i - ii

    # demap as a 0/1 selection matmul (Mosaic-friendly gather)
    dsel = dsel_ref[:]
    out_ref[:, :n_d] = jnp.dot(dr, dsel, preferred_element_type=jnp.float32)
    out_ref[:, n_d:] = jnp.dot(di, dsel, preferred_element_type=jnp.float32)


@lru_cache(maxsize=16)
def _link_call(cfg: GfdmConfig, batch: int, block: int, ic_iterations: int,
               qpsk_amp: float, dec_kind: str, ic_mode: str, interpret: bool):
    from ..ops import operators as _ops
    from ..ref.demodulation import ic_filter_taps as _ic

    n = cfg.block_len
    n_d = cfg.n_data_symbols
    M = cfg.timeslots
    half = 2 * cfg.subcarriers
    w_len = cfg.window_len
    p_len = cfg.preamble_len
    Cmat = (
        _ops.idft_matrix(M)
        @ np.diag(_ic(cfg.rx_filter_taps, M, cfg.overlap))
        @ _ops.dft_matrix(M)
    )
    c_col = Cmat[:, 0]
    n_cnr, met_w = _met_layout(cfg)
    kernel = functools.partial(
        _link_kernel, cfg, ic_iterations, qpsk_amp, dec_kind, ic_mode,
        tuple(float(x) for x in c_col.real),
        tuple(float(x) for x in c_col.imag),
        n_cnr,
    )
    icop_rows = 3 * n if ic_mode == "matmul" else M - 1
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((batch, 2 * n_d), jnp.float32),  # data syms
            jax.ShapeDtypeStruct((batch, met_w), jnp.float32),  # [snr | cnrs]
        ),
        grid=(batch // block,),
        in_specs=[
            pl.BlockSpec((block, 2 * n_d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * n_d, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w_len), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, p_len), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * half, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * n, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * n, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * half, half), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((half, met_w), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((icop_rows, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n_d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block, 2 * n_d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, met_w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )


@lru_cache(maxsize=16)
def _demap_selection(cfg: GfdmConfig) -> np.ndarray:
    """(N, n_data) 0/1 matrix: symbols @ dsel = demapped data symbols."""
    from ..ops.tx import demap_indices

    idx = np.asarray(demap_indices(cfg))
    dsel = np.zeros((cfg.block_len, idx.size), dtype=np.float32)
    dsel[idx, np.arange(idx.size)] = 1.0
    return dsel


def default_link_block(cfg: GfdmConfig) -> int:
    """Largest measured-good VMEM block for the one-kernel link.

    The link's live set scales with block * frame_len (waveform + FD
    planes) plus the dense operator stacks. Measured on a v5e-class chip at
    the canonical N=576: block 256 is fastest (4.45 Gs/s; 128 ~5-8% slower,
    512 exceeds VMEM). Scale the budget inversely with N and round down to
    a power of two for clean grid tiling.
    """
    budget = 256 * 576  # floats of waveform per grid step, canonical point
    b = max(8, budget // max(cfg.block_len, 1))
    return 1 << (b.bit_length() - 1)


def link_single_fused(cfg: GfdmConfig, data, ic_iterations: int = 2,
                      block: int | None = 64, interpret: bool | None = None,
                      qpsk_amp: float | None = None,
                      dtype_name: str = "float32",
                      constellation: str = "qpsk",
                      ic_mode: str = "conv"):
    """One-kernel end-to-end link: payload -> Tx -> VMEM burst -> Rx -> data.

    data: (B, 2, n_data) planar payload. Returns (data_hat (B, 2, n_data),
    snr_lin (B,), evm scalar) - the link_step_fused contract, with the burst
    waveform batch (2*frame_len floats per burst) never leaving VMEM.

    dtype_name="bfloat16" runs the Gauss matmul stacks in bf16 (f32
    accumulation, all elementwise stages f32): ~0.4% operator rounding
    noise, far below the 1.9% matched-filter self-interference EVM floor.
    """
    if interpret is None:
        interpret = not _on_tpu()
    auto_block = block is None
    if block is None:
        block = default_link_block(cfg)
    mats = _device_mats(cfg, dtype_name)
    c = _small_consts(cfg, "float32")
    n = cfg.block_len
    n_d = cfg.n_data_symbols
    active = np.zeros((1, n), dtype=np.float32)
    for k in cfg.subcarrier_map:
        active[0, k * cfg.timeslots : (k + 1) * cfg.timeslots] = 1.0
    B = data.shape[0]
    block = min(block, B)
    if auto_block:
        # shrink to the largest power-of-two divisor of B so the auto path
        # never trips the multiple-of-block requirement (ADVICE r3)
        while block > 1 and B % block:
            block //= 2
    if B % block:
        raise ValueError(f"batch {B} must be a multiple of block {block}")
    amp = _IC_AMPS[constellation] if qpsk_amp is None else float(qpsk_amp)
    call = _link_call(cfg, B, block, int(ic_iterations), amp,
                      str(constellation), str(ic_mode), bool(interpret))
    icop = (_ic_matmul_stack(cfg, amp) if ic_mode == "matmul"
            else _circ_masks(cfg))
    n_cnr, _ = _met_layout(cfg)
    out, met = call(
        data.reshape(B, -1),
        jnp.asarray(mats["T_G"]),
        jnp.asarray(c["win"][None, :]),
        jnp.asarray(c["preambles"][0]),
        jnp.asarray(mats["E_G"]),
        jnp.asarray(mats["F_G"]),
        jnp.asarray(mats["Bfd_G"]),
        jnp.asarray(mats["F2_G"]),
        jnp.asarray(_met_selection(cfg)),
        jnp.asarray(active),
        jnp.asarray(icop),
        jnp.asarray(_demap_selection(cfg)),
    )
    d_hat = out.reshape(B, 2, n_d)
    err = jnp.sum((d_hat - data) ** 2)
    ref = jnp.maximum(jnp.sum(data**2), 1e-30)
    evm = jnp.sqrt(err / ref)
    return d_hat, met[:, 0], evm


# ---------------------------------------------------------------------------
# fused transmitter: map+modulate matmul -> CP gather -> window -> preamble
# ---------------------------------------------------------------------------
def _tx_kernel(cfg: GfdmConfig, shift: int,
               data_ref, tw_ref, win_ref, pre_ref, out_ref):
    n = cfg.block_len
    n_d = cfg.n_data_symbols
    w_len = cfg.window_len
    p_len = cfg.preamble_len
    cp, cs = cfg.cp_len, cfg.cs_len
    d = data_ref[:]  # (Bb, 2*n_data)
    core = _gdot(d[:, :n_d], d[:, n_d:], tw_ref, n_d)  # ((Bb, N), (Bb, N))
    bb = d.shape[0]
    pre = pre_ref[:]  # (2, p_len)
    win = win_ref[:]
    # CP/CS insertion is three contiguous slices (add_cyclic_prefix_cc.cc:78-90)
    # - no gather needed, which Mosaic would reject
    for plane in range(2):
        c = core[plane]
        framed = jnp.concatenate(
            [c[:, n - cp - shift :], c, c[:, : cs - shift]], axis=-1
        ) * win
        base = plane * (p_len + w_len)
        out_ref[:, base : base + p_len] = jnp.broadcast_to(pre[plane], (bb, p_len))
        out_ref[:, base + p_len : base + p_len + w_len] = framed


@lru_cache(maxsize=16)
def _tx_call(cfg: GfdmConfig, batch: int, block: int, shift: int, interpret: bool):
    n = cfg.block_len
    n_d = cfg.n_data_symbols
    w_len = cfg.window_len
    p_len = cfg.preamble_len
    f2 = 2 * cfg.frame_len
    kernel = functools.partial(_tx_kernel, cfg, shift)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((batch, f2), jnp.float32),
        grid=(batch // block,),
        in_specs=[
            pl.BlockSpec((block, 2 * n_d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * n_d, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w_len), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, p_len), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, f2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )


def _tx_cdd_kernel(cfg: GfdmConfig,
                   data_ref, tw_ref, win_ref, pre_ref, out_ref):
    """All cyclic-delay-diversity ports from ONE core matmul.

    The reference modulates once and emits per-port cyclically shifted framed
    copies (transmitter_cc_impl.cc:165-177); here each port is a different
    static slicing of the same VMEM-resident core frame.
    """
    n = cfg.block_len
    n_d = cfg.n_data_symbols
    w_len = cfg.window_len
    p_len = cfg.preamble_len
    cp, cs = cfg.cp_len, cfg.cs_len
    f_len = cfg.frame_len
    d = data_ref[:]
    core = _gdot(d[:, :n_d], d[:, n_d:], tw_ref, n_d)
    bb = d.shape[0]
    pre = pre_ref[:]  # (n_shifts * 2, p_len)
    win = win_ref[:]
    for si, shift in enumerate(cfg.cyclic_shifts):
        for plane in range(2):
            c = core[plane]
            framed = jnp.concatenate(
                [c[:, n - cp - shift :], c, c[:, : cs - shift]], axis=-1
            ) * win
            base = (si * 2 + plane) * f_len
            out_ref[:, base : base + p_len] = jnp.broadcast_to(
                pre[si * 2 + plane], (bb, p_len)
            )
            out_ref[:, base + p_len : base + p_len + w_len] = framed


@lru_cache(maxsize=16)
def _tx_cdd_call(cfg: GfdmConfig, batch: int, block: int, interpret: bool):
    n = cfg.block_len
    n_d = cfg.n_data_symbols
    w_len = cfg.window_len
    p_len = cfg.preamble_len
    n_s = len(cfg.cyclic_shifts)
    out_w = n_s * 2 * cfg.frame_len
    kernel = functools.partial(_tx_cdd_kernel, cfg)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((batch, out_w), jnp.float32),
        grid=(batch // block,),
        in_specs=[
            pl.BlockSpec((block, 2 * n_d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * n_d, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w_len), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_s * 2, p_len), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, out_w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )


def tx_cdd_fused(cfg: GfdmConfig, data, block: int = 128,
                 interpret: bool | None = None):
    """Fused multi-port Tx: every cyclic-delay-diversity shift in one kernel.

    data: (B, 2, n_data) planar payload -> (B, n_shifts, 2, frame_len).
    Equivalent to transmit_planar(cfg, data); the core frame is modulated
    once and re-sliced per port entirely in VMEM.
    """
    if interpret is None:
        interpret = not _on_tpu()
    mats = _device_mats(cfg, "float32")
    c = _small_consts(cfg, "float32")
    B = data.shape[0]
    block = min(block, B)
    if B % block:
        raise ValueError(f"batch {B} must be a multiple of block {block}")
    call = _tx_cdd_call(cfg, B, block, bool(interpret))
    pre = c["preambles"].reshape(-1, cfg.preamble_len)  # (n_shifts*2, p_len)
    out = call(
        data.reshape(B, -1),
        jnp.asarray(mats["T_G"]),
        jnp.asarray(c["win"][None, :]),
        jnp.asarray(pre),
    )
    return out.reshape(B, len(cfg.cyclic_shifts), 2, cfg.frame_len)



# ---------------------------------------------------------------------------
# factorized transmitter: the factored receiver's structure reversed
# ---------------------------------------------------------------------------
@lru_cache(maxsize=16)
def _tx_factored_consts(cfg: GfdmConfig):
    """Constants for the factored Tx kernel (all lane-aligned 2-D).

    The modulator (modulator_kernel_cc.cc:98-141) in tensor form is
    per-subcarrier M-FFT -> L tap-weighted overlap-add rolls -> N-point
    IFFT; each stage factorizes exactly like the receiver's adjoint
    (_factored_consts): blockdiag M-maps as M masked coefficient rolls,
    the overlap-add as L flat rolls, and the big IFFT as Cooley-Tukey with
    an M-stage of coefficient rolls plus K-point MXU matmuls. MXU work is
    8MK^2 FLOP/burst vs the dense operator's ~4.8(MK)^2 - and the dense
    (3*n_data, N) operator (hundreds of MB at K >= 512) never exists.
    """
    from ..ops import operators as _ops
    from ..ops.planar import real_operator

    K, M, L = cfg.subcarriers, cfg.timeslots, cfg.overlap
    N = cfg.block_len
    f32 = np.float32
    WM = _ops.dft_matrix(M)
    # stage A: per-subcarrier M-point FFT, blockdiag in the k*M+m layout
    txa = np.zeros((M, N), dtype=np.complex128)
    for j in range(M):
        for nn in range(M):
            txa[j].reshape(K, M)[:, nn] = WM[nn, (nn - j) % M]
    # stage B: overlap-add = L tap-weighted flat rolls by +(i-L/2)*M
    parts = cfg.tx_filter_taps.reshape(L, M)
    ftx = np.stack([np.tile(parts[(i + L // 2) % L], K) for i in range(L)])
    # stage C M-stage: x[M*n2+n1] CT split of ifft_N; rolls by j*K with
    # c_j[n1*K+k2] = (1/M) e^{2pi i ((n1-j)%M) n1/M} e^{2pi i k2 n1/N}
    n1g = np.repeat(np.arange(M), K)
    k2g = np.tile(np.arange(K), M)
    mt = np.zeros((M, N), dtype=np.complex128)
    for j in range(M):
        k1 = (n1g - j) % M
        mt[j] = np.exp(2j * np.pi * k1 * n1g / M) / M * np.exp(
            2j * np.pi * k2g * n1g / N
        )
    # natural-order un-reorder: x[t] = xt[(t%M)*K + t//M]
    t = np.arange(N)
    unreorder = ((t % M) * K + t // M).astype(np.int32)
    return {
        "iFK_W": real_operator(_ops.idft_matrix(K), f32),  # symmetric
        "txar": txa.real.astype(f32), "txai": txa.imag.astype(f32),
        "ftxr": ftx.real.astype(f32), "ftxi": ftx.imag.astype(f32),
        "mtr": mt.real.astype(f32), "mti": mt.imag.astype(f32),
        "unreorder": unreorder,
    }


def _tx_factored_kernel(cfg: GfdmConfig,
                        grid_ref, ifk_ref, txar_ref, txai_ref,
                        ftxr_ref, ftxi_ref, mtr_ref, mti_ref,
                        mlt_ref, out_ref):
    K, M, L = cfg.subcarriers, cfg.timeslots, cfg.overlap
    n = cfg.block_len
    g = grid_ref[:]  # (Bb, 2N): [re | im] of the mapped resource grid
    gr, gi = g[:, :n], g[:, n:]

    def groll(v, shift):
        shift = shift % n
        if shift == 0:
            return v
        return jnp.concatenate([v[:, n - shift :], v[:, : n - shift]], axis=1)

    def block_rot(v, j):
        if j == 0:
            return v
        return jnp.where(mlt_ref[:][j - 1 : j, :] > 0, groll(v, j - M), groll(v, j))

    # --- stage A: per-subcarrier M-point FFT (M masked coefficient rolls) --
    txar, txai = txar_ref[:], txai_ref[:]
    Wr = jnp.zeros_like(gr)
    Wi = jnp.zeros_like(gi)
    for j in range(M):
        rr = block_rot(gr, j)
        ri = block_rot(gi, j)
        cr_, ci_ = txar[j : j + 1, :], txai[j : j + 1, :]
        Wr = Wr + cr_ * rr - ci_ * ri
        Wi = Wi + cr_ * ri + ci_ * rr

    # --- stage B: sparse-FD overlap-add (L tap-weighted flat rolls) --------
    ftxr, ftxi = ftxr_ref[:], ftxi_ref[:]
    Xr = jnp.zeros_like(Wr)
    Xi = jnp.zeros_like(Wi)
    for i in range(L):
        s = ((i - L // 2) * M) % n
        rr = groll(Wr, s)
        ri = groll(Wi, s)
        tr_, ti_ = ftxr[i : i + 1, :], ftxi[i : i + 1, :]
        Xr = Xr + tr_ * rr - ti_ * ri
        Xi = Xi + tr_ * ri + ti_ * rr

    # --- stage C: ifft_N as CT M-stage rolls + K-point MXU matmuls ---------
    mtr, mti = mtr_ref[:], mti_ref[:]
    Zr = jnp.zeros_like(Xr)
    Zi = jnp.zeros_like(Xi)
    for j in range(M):
        rr = groll(Xr, j * K)
        ri = groll(Xi, j * K)
        cr_, ci_ = mtr[j : j + 1, :], mti[j : j + 1, :]
        Zr = Zr + cr_ * rr - ci_ * ri
        Zi = Zi + cr_ * ri + ci_ * rr

    ifk = ifk_ref[:]
    for n1 in range(M):
        row = jnp.concatenate(
            [Zr[:, n1 * K : (n1 + 1) * K], Zi[:, n1 * K : (n1 + 1) * K]], axis=1
        )
        y = jnp.dot(row, ifk, preferred_element_type=jnp.float32)
        out_ref[:, n1 * K : (n1 + 1) * K] = y[:, :K]
        out_ref[:, n + n1 * K : n + (n1 + 1) * K] = y[:, K:]


@lru_cache(maxsize=16)
def _tx_factored_call(cfg: GfdmConfig, batch: int, block: int, interpret: bool):
    n = cfg.block_len
    n2 = 2 * n
    M, K = cfg.timeslots, cfg.subcarriers
    kernel = functools.partial(_tx_factored_kernel, cfg)
    const2d = lambda r: pl.BlockSpec((r, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((batch, n2), jnp.float32),
        grid=(batch // block,),
        in_specs=[
            pl.BlockSpec((block, n2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * K, 2 * K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            const2d(M), const2d(M),              # txar, txai
            const2d(cfg.overlap), const2d(cfg.overlap),  # ftxr, ftxi
            const2d(M), const2d(M),              # mtr, mti
            const2d(M - 1),                      # mlt
        ],
        out_specs=pl.BlockSpec((block, n2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )


def tx_frame_factored(cfg: GfdmConfig, data, block: int | None = None,
                      interpret: bool | None = None, shift_index: int = 0):
    """Factorized one-kernel Tx core for large K (round-3 verdict item 5).

    data: (B, 2, n_data) planar payload -> (B, 2, frame_len) planar burst,
    same contract as tx_frame_fused, but the modulator runs as the in-VMEM
    Cooley-Tukey factorization: no dense Tx operator at any K (the dense
    (3*n_data, N) matrix is ~830 MB at K=1024 - it cannot exist in VMEM).
    The payload->grid map, the output reorder, and CP/window/preamble are
    cheap XLA gathers around the kernel (same split as
    rx_receiver_factored). ``block=None`` picks default_factored_block.
    """
    if block is None:
        block = default_factored_block(cfg)
    if interpret is None:
        interpret = not _on_tpu()
    from ..ops import operators as _ops

    tc = _tx_factored_consts(cfg)
    c = _small_consts(cfg, "float32")
    n = cfg.block_len
    n_d = cfg.n_data_symbols
    B = data.shape[0]
    block = min(block, B)
    if B % block:
        raise ValueError(f"batch {B} must be a multiple of block {block}")

    # payload -> subcarrier-major grid: one XLA take with a zero sentinel
    map_idx = np.full(n, n_d, dtype=np.int32)
    rows, cols = np.nonzero(_ops.mapping_matrix(cfg).real)
    map_idx[rows] = cols
    padded = jnp.concatenate(
        [data, jnp.zeros(data.shape[:-1] + (1,), data.dtype)], axis=-1
    )
    grid = jnp.take(padded, jnp.asarray(map_idx), axis=-1)  # (B, 2, N)

    call = _tx_factored_call(cfg, B, block, bool(interpret))
    xt = call(
        grid.reshape(B, 2 * n),
        jnp.asarray(tc["iFK_W"]),
        jnp.asarray(tc["txar"]), jnp.asarray(tc["txai"]),
        jnp.asarray(tc["ftxr"]), jnp.asarray(tc["ftxi"]),
        jnp.asarray(tc["mtr"]), jnp.asarray(tc["mti"]),
        jnp.asarray(_circ_masks(cfg)),
    ).reshape(B, 2, n)

    core = jnp.take(xt, jnp.asarray(tc["unreorder"]), axis=-1)
    framed = jnp.take(
        core, jnp.asarray(c["cp_idx"][shift_index]), axis=-1
    ) * jnp.asarray(c["win"])
    pre = jnp.broadcast_to(
        jnp.asarray(c["preambles"][shift_index]), (B, 2, cfg.preamble_len)
    )
    return jnp.concatenate([pre, framed], axis=-1)


def tx_frame_fused(cfg: GfdmConfig, data, block: int = 128,
                   interpret: bool | None = None, shift_index: int = 0):
    """Fused Tx chain for one cyclic shift.

    data: (B, 2, n_data) planar payload -> (B, 2, frame_len) planar burst.
    Equivalent to transmit_planar(cfg, data)[:, shift_index].
    """
    if interpret is None:
        interpret = not _on_tpu()
    mats = _device_mats(cfg, "float32")
    c = _small_consts(cfg, "float32")
    B = data.shape[0]
    block = min(block, B)
    if B % block:
        raise ValueError(f"batch {B} must be a multiple of block {block}")
    shift = int(cfg.cyclic_shifts[shift_index])
    call = _tx_call(cfg, B, block, shift, bool(interpret))
    out = call(
        data.reshape(B, -1),
        jnp.asarray(mats["T_G"]),
        jnp.asarray(c["win"][None, :]),
        jnp.asarray(c["preambles"][shift_index]),
    )
    return out.reshape(B, 2, cfg.frame_len)
