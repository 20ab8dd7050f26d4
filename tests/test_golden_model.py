"""Self-validation of the NumPy golden model.

Mirrors the reference's internal consistency checks:
  - matrix-vs-FFT modulator agreement (gfdm_modulation.py:173-196, <=1e-3)
  - RC taps vs the analytic sinc*tapered-cosine form (filters.py:81-87)
  - mapping round trips (mapping.py:84-99)
  - preamble half-repetition (preamble.py:135-148)
  - cross-correlation identities (correlation.py:105-119)
"""
import numpy as np
import pytest

from gfdm_tpu.ref import (
    channel_estimation,
    correlation,
    cyclic_prefix,
    demodulation,
    filters,
    mapping,
    modulation,
    preamble,
    symbolmapping,
    synchronization,
    utils,
    zadoff_chu,
)


def test_rc_taps_match_analytic_form():
    ts, sc, alpha = 15, 64, 0.5
    taps = filters.time_taps("rc", alpha, ts, sc)
    t = np.arange(0, ts, 1.0 / sc) - ts / 2.0
    analytic = filters.analytic_rc_pulse(t, alpha)
    np.testing.assert_allclose(taps, analytic, atol=1e-12)


def test_rrc_squares_to_rc_in_frequency():
    ts, sc, alpha = 16, 64, 0.35
    Hrrc = filters.freq_taps(filters.time_taps("rrc", alpha, ts, sc))
    Hrc = filters.freq_taps(filters.time_taps("rc", alpha, ts, sc))
    # RRC(f)^2 == RC(f) up to sampling/aliasing error (normalized responses)
    a = Hrrc**2 / (Hrrc[0].real ** 2)
    b = Hrc / Hrc[0].real
    np.testing.assert_allclose(a, b, atol=1e-2)


def test_sparse_taps_layout_and_energy():
    ts, sc, L = 9, 64, 2
    H = filters.frequency_domain_filter("rrc", 0.2, ts, sc, L)
    assert H.size == ts * L
    energy = np.sum(np.abs(H) ** 2)
    np.testing.assert_allclose(energy, ts, rtol=1e-12)


@pytest.mark.parametrize("M,K,tol", [(9, 16, 5e-3), (16, 4, 1e-3), (33, 32, 1e-3)])
def test_modulation_matrix_vs_fft_modulator(M, K, tol):
    """The low-complexity modulator must match the O(N^2) definition.

    The reference validates M=33,K=32 at 1e-3 (gfdm_modulation.py:173-196);
    the overlap-L truncation error grows for small M, hence per-config tol.
    """
    alpha, L = 0.5, 2
    taps_t = filters.time_taps("rrc", alpha, M, K)
    H = filters.frequency_domain_filter("rrc", alpha, M, K, L)
    A = modulation.modulation_matrix(taps_t, M, K, subcarrier_major=True)

    rng = np.random.default_rng(42)
    for _ in range(10):
        d = utils.random_samples(M * K, seed=int(rng.integers(1 << 30)))
        xmat = A @ d / np.sqrt(d.size)
        grid = mapping.data_matrix(d, K)
        xfft = modulation.modulate_block(grid, H, L) / np.sqrt(d.size)
        xfft *= np.linalg.norm(xmat) / np.linalg.norm(xfft)
        assert np.max(np.abs(xmat - xfft)) < tol
        rel = np.linalg.norm(xmat - xfft) / np.linalg.norm(xmat)
        assert rel < tol


def test_modulator_matches_staged_reference_decomposition():
    """Roll-based synthesis == textbook fftshift/overlap-add decomposition."""
    M, K, L, alpha = 9, 64, 2, 0.2
    H = filters.frequency_domain_filter("rrc", alpha, M, K, L)
    d = utils.random_qpsk(M * K, seed=7)
    grid = mapping.data_matrix(d, K)

    # independent staged implementation (transliteration of the textbook
    # upsample/filter/fftshift/overlap-add/roll pipeline)
    W = np.fft.fft(grid, axis=1)  # (K, M)
    F = np.tile(W, (1, L)) * H[None, :]  # (K, L*M)
    Fs = np.fft.fftshift(F, axes=1)
    tail = (L - 1) * M
    X = np.zeros(M * K + tail, dtype=np.complex128)
    for k in range(K):
        X[k * M : k * M + L * M] += Fs[k]
    X[:tail] += X[-tail:]
    X = X[:-tail]
    X = np.roll(X, -M * L // 2)
    x_staged = np.fft.ifft(X)

    x = modulation.modulate_block(grid, H, L)
    np.testing.assert_allclose(x, x_staged, atol=1e-12)


def test_demodulator_is_adjoint_of_modulator():
    """<demod(y), d> == <y, mod(d)> for conjugate taps: gather is the exact
    adjoint of the scatter (receiver_kernel_cc.cc:165-192 mirror-image)."""
    M, K, L, alpha = 9, 32, 2, 0.3
    H = filters.frequency_domain_filter("rrc", alpha, M, K, L)
    d = utils.random_samples(M * K, seed=3)
    y = utils.random_samples(M * K, seed=4)
    x = modulation.modulate_block(mapping.data_matrix(d, K), H, L)
    # receiver with conjugate taps: mod^H == (M/N) * demod = (1/K) * demod
    # (modulator ifft_N vs receiver per-subcarrier ifft_M normalization)
    z = demodulation.demodulate_block(y, np.conj(H), L)
    lhs = np.vdot(x, y)
    rhs = np.vdot(d, z) / K
    np.testing.assert_allclose(lhs, rhs, rtol=1e-10)


def test_mf_receiver_roundtrip_qpsk():
    """MF demod of a modulated QPSK frame recovers symbols (hard decisions)."""
    M, K, L, alpha = 9, 64, 2, 0.2
    H = filters.frequency_domain_filter("rrc", alpha, M, K, L)
    d = utils.random_qpsk(M * K, seed=11)
    x = modulation.modulate_block(mapping.data_matrix(d, K), H, L)
    d_hat = demodulation.demodulate_block(x, np.conj(H), L)
    assert np.all(np.abs(utils.qpsk_hard_map(d_hat) - d) < 1e-6)
    # matched filter leaves bounded self-interference, not exact equality
    assert utils.evm(d_hat, d) < 0.25


def test_ic_iterations_reduce_self_interference():
    # alpha=0.5 like the reference's 64-iteration IC QA (its residual next-
    # neighbor-only ICI floor rises as alpha shrinks)
    M, K, L, alpha = 9, 64, 2, 0.5
    H = filters.frequency_domain_filter("rrc", alpha, M, K, L)
    rx_taps = np.conj(H)
    d = utils.random_qpsk(M * K, seed=13)
    x = modulation.modulate_block(mapping.data_matrix(d, K), H, L)

    S = demodulation.fd_filter_downsample(x, rx_taps, L)
    d_hat = demodulation.subcarriers_to_time(S).reshape(-1)
    ic_taps = demodulation.ic_filter_taps(rx_taps, M, L)
    evm0 = utils.evm(d_hat, d)
    for _ in range(8):
        decided = utils.qpsk_hard_map(d_hat).reshape(K, M)
        S_clean = demodulation.cancel_sc_interference(decided, S, ic_taps)
        d_hat = demodulation.subcarriers_to_time(S_clean).reshape(-1)
    # reference QA: symbols recovered to 2 decimals after IC iterations
    assert np.max(np.abs(d_hat - d)) < 5e-3
    assert utils.evm(d_hat, d) < evm0 / 5


@pytest.mark.parametrize("per_timeslot", [True, False])
def test_resource_mapping_roundtrip(per_timeslot):
    M, K, active = 5, 16, 12
    smap = mapping.subcarrier_map(K, active, dc_free=True)
    d = utils.random_qpsk(M * active, seed=5)
    grid = mapping.map_to_resources(d, M, K, smap, per_timeslot=per_timeslot)
    assert grid.shape == (K, M)
    # inactive subcarriers are zero
    inactive = np.setdiff1d(np.arange(K), smap)
    assert np.all(grid[inactive] == 0)
    back = mapping.demap_from_resources(grid, M, smap, per_timeslot=per_timeslot)
    np.testing.assert_array_equal(back, d)


def test_subcarrier_map_matches_reference_convention():
    np.testing.assert_array_equal(
        mapping.subcarrier_map(8, 4, dc_free=False), [0, 1, 6, 7]
    )
    np.testing.assert_array_equal(
        mapping.subcarrier_map(8, 4, dc_free=True), [1, 2, 6, 7]
    )


def test_cyclic_prefix_shift_equals_rolled_block():
    block = utils.random_qpsk(64, seed=9)
    cp, cs, shift = 8, 4, 2
    shifted = cyclic_prefix.add_cyclic_extension(block, cp, cs, shift)
    plain = cyclic_prefix.add_cyclic_extension(np.roll(block, shift), cp, cs, 0)
    np.testing.assert_allclose(shifted, plain, atol=1e-15)
    assert shifted.size == block.size + cp + cs


def test_cyclic_prefix_remove_roundtrip():
    block = utils.random_qpsk(576, seed=10)
    win = cyclic_prefix.raised_cosine_ramp(8, 576 + 16 + 8)
    framed = cyclic_prefix.add_cyclic_prefix(block, 16, 8, win, ramp_len=8)
    core = cyclic_prefix.remove_cyclic_prefix(framed, 16, 576)
    np.testing.assert_allclose(core, block, atol=1e-15)


def test_window_ramp_shapes():
    w = cyclic_prefix.raised_cosine_ramp(4, 20)
    assert w.size == 20
    np.testing.assert_allclose(w[4:16], 1.0)
    assert w[0] == pytest.approx(0.0)  # soft start: cos ramp from 0 up to 1
    wr = cyclic_prefix.root_raised_cosine_ramp(4, 20)
    np.testing.assert_allclose(wr**2, w, atol=1e-12)


def test_zadoff_chu_properties():
    zc = zadoff_chu.zadoff_chu_sequence(53, 7)
    np.testing.assert_allclose(np.abs(zc), 1.0, atol=1e-12)
    # ideal periodic autocorrelation: delta at lag 0
    ac = np.fft.ifft(np.abs(np.fft.fft(zc)) ** 2)
    assert np.abs(ac[0]) == pytest.approx(53.0, rel=1e-9)
    assert np.max(np.abs(ac[1:])) < 1e-9


def test_preamble_halves_repeat():
    K, active = 64, 52
    smap = mapping.subcarrier_map(K, active, dc_free=True)
    full, core = preamble.mapped_preamble(
        4711, "rrc", 0.2, active, K, smap, 2, 16, 8, use_zadoff_chu=True
    )
    assert core.size == 2 * K
    np.testing.assert_allclose(core[:K], core[K:], atol=1e-12)
    assert full.size == 2 * K + 16 + 8
    # autocorrelation of halves ~= half the energy
    e = utils.signal_energy(core)
    ac = correlation.auto_correlate_halves(core)
    assert abs(2.0 * abs(ac) / e - 1.0) < 1e-10


def test_cross_correlation_matches_numpy():
    s = utils.random_samples(100, seed=21)
    p = utils.random_samples(30, seed=22)
    np.testing.assert_allclose(
        correlation.cross_correlate_valid(s, p), np.correlate(s, p, "valid"), atol=1e-9
    )
    np.testing.assert_allclose(
        correlation.cross_correlate_full(s, p), np.correlate(s, p, "full"), atol=1e-9
    )


def test_moving_sum():
    x = np.arange(10.0)
    ms = correlation.moving_sum(x, 3)
    np.testing.assert_allclose(ms, [3, 6, 9, 12, 15, 18, 21, 24])


def _make_noisy_burst(seed, snr_db=20.0, cfo=0.02, head=800, tail=400):
    M, K, L, alpha = 9, 64, 2, 0.2
    cp, ramp = 16, 8
    smap = mapping.subcarrier_map(K, 52, dc_free=True)
    full_pre, x_pre = preamble.mapped_preamble(
        seed, "rrc", alpha, 52, K, smap, L, cp, ramp, use_zadoff_chu=True
    )
    d = utils.random_qpsk(M * 52, seed=seed + 1)
    frame = modulation.modulate_mapped_block(d, M, K, 52, L, alpha, dc_free=True)
    win = cyclic_prefix.raised_cosine_ramp(ramp, M * K + cp + ramp)
    framed = cyclic_prefix.add_cyclic_prefix(frame, cp, ramp, win, ramp_len=ramp)
    burst = np.concatenate((full_pre, framed))
    burst = synchronization.correct_frequency_offset(burst, cfo, K)
    nv = utils.awgn_noise_variance(burst, snr_db)
    s = utils.complex_noise(head + burst.size + tail, nv, seed=seed + 2)
    s[head : head + burst.size] += burst
    return s, x_pre, full_pre, head, cp, ramp, K


def test_synchronization_finds_frame_start():
    s, x_pre, full_pre, head, cp, ramp, K = _make_noisy_burst(seed=31)
    res = synchronization.find_frame_start(s, x_pre, K, cp)
    # core preamble starts cp samples into the full preamble
    expected = head + cp
    assert abs(res.frame_start - expected) <= 2
    assert abs(res.cfo - 0.02) < 5e-3


def test_channel_estimator_identity_channel():
    M, K, active = 9, 64, 52
    smap = mapping.subcarrier_map(K, active, dc_free=True)
    _, x_pre = preamble.mapped_preamble(
        1234, "rrc", 0.2, active, K, smap, 2, 16, 8, use_zadoff_chu=True
    )
    est = channel_estimation.PreambleChannelEstimator(M, K, active, True, x_pre)
    frame_est = est.estimate_frame(x_pre)
    assert frame_est.size == M * K
    # active-band estimate must be ~1 (QA: 6 decimals for the C++ kernel)
    center_idx = np.arange(M * K)
    act = np.abs(frame_est) > 0.5
    np.testing.assert_allclose(frame_est[act], 1.0, atol=1e-5)


def test_channel_estimator_multipath_channel():
    M, K, active = 9, 64, 52
    smap = mapping.subcarrier_map(K, active, dc_free=True)
    full_pre, x_pre = preamble.mapped_preamble(
        1234, "rrc", 0.2, active, K, smap, 2, 16, 8, use_zadoff_chu=True
    )
    h = np.array([1.0, 0.5, 0.3, 0.1j])
    rx_full = np.convolve(full_pre, h)
    rx_core = rx_full[16 : 16 + 2 * K]  # cp_len offset
    est = channel_estimation.PreambleChannelEstimator(M, K, active, True, x_pre)
    frame_est = est.estimate_frame(rx_core)
    H_true = np.fft.fft(h, K)
    # compare on active frame bins against the interpolated truth (QA: 1 dec)
    smap_frame = (smap.reshape(-1, 1) * M + np.arange(M)).reshape(-1)
    H_frame_true = np.repeat(H_true, M)
    err = np.abs(frame_est[smap_frame] - H_frame_true[smap_frame])
    assert np.max(err) < 0.15


def test_snr_estimator_within_1db():
    M, K, active = 9, 64, 52
    smap = mapping.subcarrier_map(K, active, dc_free=True)
    _, x_pre = preamble.mapped_preamble(
        1234, "rrc", 0.2, active, K, smap, 2, 16, 8, use_zadoff_chu=True
    )
    est = channel_estimation.PreambleChannelEstimator(M, K, active, True, x_pre)
    # the reference QA defines SNR over the active band: constant-modulus
    # noise scaled by sqrt(active_ratio * 2 * E_sig / N) / sqrt(snr_lin)
    # (qa_python_bindings.py:44-56,492-529)
    active_ratio = K / active
    sig_energy = utils.signal_energy(x_pre)
    rng = np.random.default_rng(77)
    for snr_db in [4.0, 15.0, 30.0]:
        snr_lin = 10.0 ** (snr_db / 10.0)
        errs = []
        for _ in range(20):
            raw = rng.standard_normal(x_pre.size) + 1j * rng.standard_normal(x_pre.size)
            noise = raw / np.abs(raw)
            nscale = np.sqrt(active_ratio * 2.0 * sig_energy / x_pre.size / snr_lin)
            rx = x_pre + noise * nscale
            snr_est, cnrs = est.estimate_snr(rx)
            errs.append(10.0 * np.log10(snr_est) - snr_db)
            assert cnrs.size == active
        assert abs(np.mean(errs)) < 1.0


def test_symbolmapping_roundtrip():
    for order in (1, 2, 4, 6):
        pts = symbolmapping.constellation(order)
        bits = np.random.default_rng(order).integers(0, 2, 64 * order)
        syms = symbolmapping.bits_to_symbols(bits, pts)
        back = symbolmapping.symbols_to_bits(syms, pts)
        np.testing.assert_array_equal(bits, back)


def test_gray_qam_properties():
    """Square Gray QAM invariants: unit energy, distinct points, adjacent
    per-axis levels differ in exactly one label bit, and the separable
    per-axis quantizer equals the nearest-point decision (the property the
    fused kernels' _ic_decide relies on)."""
    for order, lim, energy in ((4, 3, 10.0), (6, 7, 42.0)):
        pts = symbolmapping.constellation(order)
        assert pts.size == 1 << order
        assert abs(np.mean(np.abs(pts) ** 2) - 1.0) < 1e-12
        assert len(set(np.round(pts, 9))) == pts.size
        # Gray property per axis: walk levels in ascending order, labels of
        # neighbors differ by one bit
        half = order // 2
        scale = np.sqrt(energy)
        re_label = {}
        for idx, p in enumerate(pts):
            re_label.setdefault(int(round(p.real * scale)), set()).add(idx >> half)
        levels = sorted(re_label)
        assert levels == list(range(-lim, lim + 1, 2))
        labels = [re_label[l].pop() for l in levels]
        for a, b in zip(labels, labels[1:]):
            assert bin(a ^ b).count("1") == 1
        # per-axis quantizer == nearest point
        rng = np.random.default_rng(7)
        noisy = (rng.normal(size=512) + 1j * rng.normal(size=512)) * 0.8
        nearest = symbolmapping.hard_decide(noisy, pts)

        def q(u):
            return np.clip(2.0 * np.round((u * scale - 1.0) / 2.0) + 1.0,
                           -lim, lim)

        per_axis = (q(noisy.real) + 1j * q(noisy.imag)) / scale
        np.testing.assert_allclose(per_axis, nearest, atol=1e-12)
