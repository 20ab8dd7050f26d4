"""Legacy modulator/taps and timed-transmission scheduling tests."""
import numpy as np

from gfdm_tpu import GfdmConfig
from gfdm_tpu.ops import legacy as legacy_ops
from gfdm_tpu.ref import filters, legacy, mapping, modulation, utils
from gfdm_tpu.runtime.timing import BurstScheduler, ticks_from_timespec


def test_legacy_taps_layout():
    M, K = 9, 16
    taps = legacy.sparse_taps_legacy("rrc", 0.5, M, K)
    assert taps.size == 2 * M
    assert taps[M] == 0  # legacy generator leaves the M-th bin empty
    # second half mirrors the first as conjugates (gfdm_utils.cc:51-55)
    H = filters.freq_taps(filters.time_taps("rrc", 0.5, M, K))
    np.testing.assert_allclose(taps[:M], H[:M], atol=1e-12)
    np.testing.assert_allclose(taps[M + 1 :], np.conj(H[M - 1 : 0 : -1]), atol=1e-12)


def _freq_shift(x, bins):
    n = np.arange(x.size)
    return x * np.exp(2j * np.pi * bins * n / x.size)


def test_legacy_modulator_is_centered_modern_modulator():
    """At fft_len == N the legacy output equals the modern modulator (with
    the legacy tap layout) frequency-shifted by N/2 + (M+1)/2 bins - the
    'centered spectrum' convention of modulator_cc."""
    for M, K in [(9, 16), (5, 8)]:
        n = M * K
        taps_l = legacy.sparse_taps_legacy("rrc", 0.5, M, K)
        d = utils.random_qpsk(n, seed=3)
        grid = mapping.data_matrix(d, K)
        x_leg = legacy.modulate_oversampled_block(grid, taps_l, n)
        H = filters.sparse_freq_taps(
            filters.freq_taps(filters.time_taps("rrc", 0.5, M, K)), M, 2
        )
        H_mod = H.copy()
        H_mod[M] = 0.0
        x_mod = modulation.modulate_block(grid, H_mod, 2)
        shift = n // 2 + (M + 1) // 2
        np.testing.assert_allclose(x_leg, _freq_shift(x_mod, shift), atol=1e-9)


def test_legacy_oversampled_occupies_center():
    cfg = GfdmConfig(timeslots=5, subcarriers=8, active_subcarriers=8,
                     dc_free=False, cp_len=4, cs_len=2)
    n = cfg.block_len
    fft_len = 2 * n
    d = utils.random_qpsk(n, seed=9)
    taps_l = legacy.sparse_taps_legacy(cfg.filtertype, cfg.filteralpha,
                                       cfg.timeslots, cfg.subcarriers)
    x = legacy.modulate_oversampled_block(
        mapping.data_matrix(d, cfg.subcarriers), taps_l, fft_len
    )
    assert x.size == fft_len
    X = np.abs(np.fft.fft(x))
    # baseband signal with the oversampling guard band around Nyquist
    # (middle bins in FFT order) nearly empty
    guard = X[fft_len // 4 : 3 * fft_len // 4].sum()
    signal = X.sum() - guard
    assert signal > 10 * guard


def test_legacy_op_matches_golden():
    cfg = GfdmConfig(timeslots=5, subcarriers=8, active_subcarriers=8,
                     dc_free=False, cp_len=4, cs_len=2)
    n = cfg.block_len
    taps_l = legacy_ops.legacy_taps(cfg)
    batch = np.stack([utils.random_qpsk(n, seed=i) for i in range(3)])
    got = np.asarray(legacy_ops.modulate_oversampled(cfg, batch, fft_len=2 * n))
    for b in range(3):
        ref = legacy.modulate_oversampled_block(
            batch[b].reshape(cfg.subcarriers, cfg.timeslots), taps_l, 2 * n
        )
        np.testing.assert_allclose(got[b], ref, atol=1e-5)


def test_burst_scheduler_quantizes_to_cycle_grid():
    s = BurstScheduler(cycle_interval_secs=0.01, timing_advance_secs=0.001)
    full, frac = s.next_tx_time(100, 0.0042)
    ticks = ticks_from_timespec(full, frac)
    # grid-aligned after removing the advance
    assert (ticks - s.timing_advance_ticks) % s.cycle_interval_ticks == 0
    assert ticks > ticks_from_timespec(100, 0.0042)

    # successive calls at the same "now" never schedule into the past
    full2, frac2 = s.next_tx_time(100, 0.0042)
    assert ticks_from_timespec(full2, frac2) > ticks


def test_burst_scheduler_rx_phase_and_gain_windows():
    s = BurstScheduler(cycle_interval_secs=0.01, timing_advance_secs=0.0)
    s.rx_time_ticks = 3_000_000  # 3 ms receiver phase
    full, frac = s.next_tx_time(7, 0.5)
    ticks = ticks_from_timespec(full, frac)
    assert ticks % s.cycle_interval_ticks == 3_000_000

    (t_off, t_on) = s.rx_gain_windows(full, frac, packet_len=2048, samp_rate=1e6)
    assert t_off[2] == 0.0 and t_on[2] == 65.0
    assert ticks_from_timespec(t_off[0], t_off[1]) < ticks
    assert ticks_from_timespec(t_on[0], t_on[1]) > ticks + int(2048 / 1e6 * 1e9) - 1
