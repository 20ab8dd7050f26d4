"""Element-wise parity of the JAX ops against the NumPy golden model.

Mirrors the reference's QA strategy (SURVEY.md section 4): every optimized
kernel is compared against the golden model at matched tolerances. The ops
run in complex64 (TPU compute dtype) against float64 golden outputs; a
complex128 pass checks algorithmic exactness separately.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from gfdm_tpu import GfdmConfig
from gfdm_tpu.ops import estimation, rx, tx
from gfdm_tpu.ref import (
    channel_estimation,
    cyclic_prefix as cp_ref,
    demodulation as demod_ref,
    mapping as map_ref,
    modulation as mod_ref,
    utils,
)

CFG = GfdmConfig()
CFG_CDD = GfdmConfig(cyclic_shifts=(0, 4))
BATCH = 3


def _rand_grids(cfg, batch, seed=0):
    return np.stack(
        [utils.random_qpsk(cfg.block_len, seed=seed + i) for i in range(batch)]
    )


def _rand_data(cfg, batch, seed=0):
    return np.stack(
        [utils.random_qpsk(cfg.n_data_symbols, seed=seed + i) for i in range(batch)]
    )


# ---------------------------------------------------------------------------
# Tx
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("dtype,atol", [(jnp.complex64, 2e-5), (jnp.complex128, 1e-12)])
def test_modulate_matches_golden(dtype, atol):
    grids = _rand_grids(CFG, BATCH)
    got = np.asarray(tx.modulate(CFG, grids, dtype=dtype))
    for b in range(BATCH):
        ref = mod_ref.modulate_block(
            grids[b].reshape(CFG.subcarriers, CFG.timeslots), CFG.tx_filter_taps, CFG.overlap
        )
        np.testing.assert_allclose(got[b], ref, atol=atol)


def test_map_resources_matches_golden():
    data = _rand_data(CFG, BATCH)
    got = np.asarray(tx.map_resources(CFG, data))
    for b in range(BATCH):
        ref = map_ref.map_to_resources(
            data[b], CFG.timeslots, CFG.subcarriers, CFG.subcarrier_map, CFG.per_timeslot
        ).reshape(-1)
        np.testing.assert_allclose(got[b], ref, atol=1e-7)


@pytest.mark.parametrize("shift", [0, 3, 8])
def test_add_cyclic_prefix_matches_golden(shift):
    core = _rand_grids(CFG, BATCH, seed=40)
    got = np.asarray(tx.add_cyclic_prefix(CFG, core, cyclic_shift=shift))
    for b in range(BATCH):
        ref = cp_ref.add_cyclic_prefix(
            core[b], CFG.cp_len, CFG.cs_len, CFG.window_taps, CFG.ramp_len, shift
        )
        np.testing.assert_allclose(got[b], ref, atol=1e-6)


def test_transmit_full_chain_matches_golden():
    """Tx chain parity at reference QA tolerance (5 decimals, float32)."""
    data = _rand_data(CFG_CDD, BATCH, seed=60)
    got = np.asarray(tx.transmit(CFG_CDD, data))
    assert got.shape == (BATCH, 2, CFG_CDD.frame_len)
    for b in range(BATCH):
        core = mod_ref.modulate_block(
            map_ref.map_to_resources(
                data[b],
                CFG_CDD.timeslots,
                CFG_CDD.subcarriers,
                CFG_CDD.subcarrier_map,
                CFG_CDD.per_timeslot,
            ),
            CFG_CDD.tx_filter_taps,
            CFG_CDD.overlap,
        )
        for s_i, shift in enumerate(CFG_CDD.cyclic_shifts):
            framed = cp_ref.add_cyclic_prefix(
                core, CFG_CDD.cp_len, CFG_CDD.cs_len, CFG_CDD.window_taps,
                CFG_CDD.ramp_len, shift,
            )
            ref = np.concatenate((CFG_CDD.full_preambles[s_i], framed))
            np.testing.assert_allclose(got[b, s_i], ref, atol=2e-5)


# ---------------------------------------------------------------------------
# Rx
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("dtype,atol", [(jnp.complex64, 2e-5), (jnp.complex128, 1e-12)])
def test_demodulate_matches_golden(dtype, atol):
    frames = np.stack(
        [
            mod_ref.modulate_block(
                _rand_grids(CFG, 1, seed=80 + b)[0].reshape(CFG.subcarriers, CFG.timeslots),
                CFG.tx_filter_taps,
                CFG.overlap,
            )
            for b in range(BATCH)
        ]
    )
    got = np.asarray(rx.demodulate(CFG, frames, dtype=dtype))
    for b in range(BATCH):
        ref = demod_ref.demodulate_block(frames[b], CFG.rx_filter_taps, CFG.overlap)
        np.testing.assert_allclose(got[b], ref, atol=atol)


def test_demodulate_equalized_matches_golden():
    frames = _rand_grids(CFG, BATCH, seed=100)
    h = np.array([1.0, 0.4 - 0.2j, 0.15j])
    H = np.fft.fft(h, CFG.block_len)
    chan = np.broadcast_to(H, (BATCH, CFG.block_len))
    got = np.asarray(rx.demodulate_equalized(CFG, frames, chan))
    for b in range(BATCH):
        ref = demod_ref.demodulate_block(
            frames[b], CFG.rx_filter_taps, CFG.overlap, channel_fd=H
        )
        np.testing.assert_allclose(got[b], ref, atol=3e-5)


def test_remove_cp_and_demap():
    data = _rand_data(CFG, BATCH, seed=120)
    core = np.asarray(tx.transmit_core(CFG, data, dtype=jnp.complex128))
    framed = np.asarray(tx.add_cyclic_prefix(CFG, core, dtype=jnp.complex128))
    back = np.asarray(rx.remove_cyclic_prefix(CFG, framed))
    np.testing.assert_allclose(back, core, atol=1e-12)

    # demap(map(d)) == d
    grid = np.asarray(tx.map_resources(CFG, data, dtype=jnp.complex128))
    d_back = np.asarray(rx.demap_resources(CFG, grid))
    np.testing.assert_allclose(d_back, data, atol=1e-12)


def test_ic_receiver_recovers_qpsk():
    """End-to-end: modulate -> IC receiver recovers symbols (QA: 2 decimals)."""
    cfg = GfdmConfig(filteralpha=0.5, active_subcarriers=64, dc_free=False)
    data = _rand_data(cfg, BATCH, seed=140)
    core = np.asarray(tx.transmit_core(cfg, data))
    got = np.asarray(rx.ic_receiver(cfg, core, ic_iterations=8))
    got_data = np.asarray(rx.demap_resources(cfg, got))
    assert np.max(np.abs(got_data - data)) < 5e-3


def test_ic_receiver_zero_iterations_equals_mf():
    frames = _rand_grids(CFG, BATCH, seed=160)
    a = np.asarray(rx.ic_receiver(CFG, frames, ic_iterations=0))
    b = np.asarray(rx.demodulate(CFG, frames))
    # fused (one-matmul) vs staged (FFT + FD-demod) float32 rounding differs
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_ic_receiver_active_subcarrier_chain():
    """IC on active subcarriers only (reference QA test_003/qa_advanced 137-172)."""
    cfg = GfdmConfig(
        subcarriers=32, active_subcarriers=20, filteralpha=0.5, dc_free=False
    )
    data = _rand_data(cfg, BATCH, seed=180)
    core = np.asarray(tx.transmit_core(cfg, data))
    got = np.asarray(rx.ic_receiver(cfg, core, ic_iterations=8))
    got_data = np.asarray(rx.demap_resources(cfg, got))
    assert np.max(np.abs(got_data - data)) < 5e-3


def test_ic_receiver_phase_compensation():
    cfg = GfdmConfig(filteralpha=0.5, active_subcarriers=64, dc_free=False)
    data = _rand_data(cfg, 2, seed=200)
    core = np.asarray(tx.transmit_core(cfg, data))
    rot = np.exp(1j * 0.1)
    got = np.asarray(
        rx.ic_receiver(cfg, core * rot, ic_iterations=8, phase_compensation=True)
    )
    got_data = np.asarray(rx.demap_resources(cfg, got))
    # common phase offset largely removed; symbols recovered after decisions
    err = np.max(np.abs(got_data - data))
    assert err < 0.1


# ---------------------------------------------------------------------------
# Channel + SNR estimation
# ---------------------------------------------------------------------------
def test_estimate_frame_matches_golden():
    est = channel_estimation.PreambleChannelEstimator(
        CFG.timeslots, CFG.subcarriers, CFG.active_subcarriers, CFG.dc_free, CFG.core_preamble
    )
    h = np.array([1.0, 0.5, 0.3, 0.1j])
    rx_full = np.convolve(CFG.full_preambles[0], h)
    rx_core = rx_full[CFG.cp_len : CFG.cp_len + 2 * CFG.subcarriers]
    batch = np.stack([CFG.core_preamble, rx_core])
    got = np.asarray(estimation.estimate_frame(CFG, batch))
    for b, p in enumerate([CFG.core_preamble, rx_core]):
        ref = est.estimate_frame(p)
        np.testing.assert_allclose(got[b], ref, atol=2e-4)


def test_estimate_snr_matches_golden():
    est = channel_estimation.PreambleChannelEstimator(
        CFG.timeslots, CFG.subcarriers, CFG.active_subcarriers, CFG.dc_free, CFG.core_preamble
    )
    rng = np.random.default_rng(5)
    noise = (rng.standard_normal(2 * CFG.subcarriers) * 0.05 +
             1j * rng.standard_normal(2 * CFG.subcarriers) * 0.05)
    p = CFG.core_preamble + noise
    snr_got, cnrs_got = estimation.estimate_snr(CFG, p[None, :])
    snr_ref, cnrs_ref = est.estimate_snr(p)
    np.testing.assert_allclose(np.asarray(snr_got)[0], snr_ref, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(cnrs_got)[0], cnrs_ref, rtol=1e-2)


def test_prepare_for_zf():
    H = np.array([1 + 1j, 2.0, -0.5j])
    got = np.asarray(estimation.prepare_for_zf(jnp.asarray(H)))
    np.testing.assert_allclose(got, np.conj(1.0 / H), atol=1e-7)


def test_estimated_channel_equalizes_frame():
    """Full loop: Tx -> multipath -> estimate channel -> ZF demod -> data."""
    cfg = CFG
    data = _rand_data(cfg, 1, seed=220)[0]
    burst = np.asarray(tx.transmit(cfg, data[None, :], dtype=jnp.complex128))[0, 0]
    h = np.array([1.0, 0.3 + 0.2j, 0.1])
    rx_sig = np.convolve(burst, h)[: burst.size]
    # preamble starts at cp_len inside the full preamble
    rx_core_pre = rx_sig[cfg.cp_len : cfg.cp_len + 2 * cfg.subcarriers]
    chan = np.asarray(estimation.estimate_frame(cfg, rx_core_pre[None, :]))[0]
    frame = rx_sig[cfg.preamble_len + cfg.cp_len : cfg.preamble_len + cfg.cp_len + cfg.block_len]
    syms = np.asarray(rx.demodulate_equalized(cfg, frame[None, :], chan[None, :]))[0]
    d_hat = np.asarray(rx.demap_resources(cfg, syms[None, :]))[0]
    # hard decisions correct and EVM small despite MF self-interference
    assert utils.evm(utils.qpsk_hard_map(d_hat), data) < 1e-6
    assert utils.evm(d_hat, data) < 0.3


def test_stepwise_receiver_api_matches_golden():
    """fd_filter_downsample / subcarriers_to_time / cancel_interference
    (the pybind Demodulator step-wise surface) vs golden model."""
    frames = _rand_grids(CFG, 2, seed=300)
    S = np.asarray(rx.fd_filter_downsample(CFG, frames))
    d_td = np.asarray(rx.subcarriers_to_time(CFG, S))
    for b in range(2):
        S_ref = demod_ref.fd_filter_downsample(frames[b], CFG.rx_filter_taps, CFG.overlap)
        np.testing.assert_allclose(S[b], S_ref, atol=3e-5)
        np.testing.assert_allclose(
            d_td[b], demod_ref.subcarriers_to_time(S_ref).reshape(-1), atol=3e-5
        )
    detected = utils.qpsk_hard_map(d_td)
    cleaned = np.asarray(rx.cancel_interference(CFG, detected, S))
    ic_taps = demod_ref.ic_filter_taps(CFG.rx_filter_taps, CFG.timeslots, CFG.overlap)
    for b in range(2):
        S_ref = demod_ref.fd_filter_downsample(frames[b], CFG.rx_filter_taps, CFG.overlap)
        ref = demod_ref.cancel_sc_interference(
            detected[b].reshape(CFG.subcarriers, CFG.timeslots), S_ref, ic_taps
        )
        np.testing.assert_allclose(cleaned[b], ref, atol=3e-5)


def test_16qam_roundtrip_and_ic_receiver():
    """Generality beyond QPSK: Gray 16-QAM through bits->symbols->IC rx."""
    from gfdm_tpu.ref import symbolmapping as sm

    pts = sm.constellation(4)
    assert pts.size == 16
    np.testing.assert_allclose(np.mean(np.abs(pts) ** 2), 1.0, atol=1e-12)
    # Gray property: nearest horizontal/vertical neighbors differ in one bit
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, 4 * 64)
    syms = sm.bits_to_symbols(bits, pts)
    back = sm.symbols_to_bits(syms, pts)
    np.testing.assert_array_equal(bits, back)

    # IC receiver with the 16-QAM constellation recovers a clean frame
    # (wider rolloff + more iterations than QPSK: denser decisions)
    cfg = GfdmConfig(filteralpha=0.5, active_subcarriers=64, dc_free=False)
    d16 = np.stack([
        sm.bits_to_symbols(rng.integers(0, 2, 4 * cfg.n_data_symbols), pts)
        for _ in range(2)
    ]).astype(np.complex64)
    core = np.asarray(tx.transmit_core(cfg, d16))
    got = np.asarray(
        rx.ic_receiver(cfg, core, ic_iterations=30, constellation=pts)
    )
    got_data = np.asarray(rx.demap_resources(cfg, got))
    hard = np.asarray(
        [sm.hard_decide(g, pts) for g in got_data]
    )
    assert np.mean(np.abs(hard - d16) > 1e-6) < 0.005


def test_shape_validation_errors_are_actionable():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="active_subcarriers = 468"):
        tx.transmit(CFG, np.ones((2, 100), np.complex64))
    with _pytest.raises(ValueError, match="timeslots\\*subcarriers = 576"):
        rx.demodulate(CFG, np.ones((2, 100), np.complex64))
    with _pytest.raises(ValueError, match="core preamble"):
        estimation.estimate_frame(CFG, np.ones((2, 100), np.complex64))
    from gfdm_tpu.ops.planar_pipeline import transmit_planar

    with _pytest.raises(ValueError, match="planar layout"):
        transmit_planar(CFG, np.ones((4, 3, 468), np.float32))
