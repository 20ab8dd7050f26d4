"""Reference-frame generator self-consistency (validation_utils parity).

Mirrors how /root/reference uses validation_utils.py:81-99 frames: a seeded
frame must be (a) reproducible, (b) synchronizable when embedded in noise,
(c) demodulatable back to its own data, (d) channel-estimatable from its
preamble.
"""
import numpy as np
import pytest

from gfdm_tpu.ref import validation
from gfdm_tpu.ref.channel_estimation import PreambleChannelEstimator
from gfdm_tpu.ref.demodulation import demodulate_block
from gfdm_tpu.ref.filters import frequency_domain_filter, normalize_taps_energy
from gfdm_tpu.ref.synchronization import find_frame_start
from gfdm_tpu.ref.utils import qpsk_hard_map

M, K, ACTIVE, CP, CS = 9, 64, 52, 16, 8


@pytest.fixture(scope="module")
def ref_frame():
    return validation.generate_reference_frame(M, K, ACTIVE, CP, CS)


def test_deterministic(ref_frame):
    again = validation.generate_reference_frame(M, K, ACTIVE, CP, CS)
    np.testing.assert_array_equal(ref_frame.frame, again.frame)
    np.testing.assert_array_equal(ref_frame.data, again.data)


def test_shapes(ref_frame):
    assert ref_frame.x_preamble.size == 2 * K
    assert ref_frame.modulated_payload.size == M * K
    # full frame: windowed preamble (2K+CP+CS) + windowed payload (MK+CP+CS)
    assert ref_frame.frame.size == (2 * K + CP + CS) + (M * K + CP + CS)
    assert ref_frame.data.size == M * ACTIVE


def test_preamble_halves_repeat(ref_frame):
    x = ref_frame.x_preamble
    np.testing.assert_allclose(x[:K], x[K:], atol=1e-12)


def test_payload_demodulates_to_data(ref_frame):
    taps = normalize_taps_energy(frequency_domain_filter("rrc", 0.2, M, K, 2), M)
    d_hat = demodulate_block(ref_frame.modulated_payload, taps, 2)
    grid = d_hat.reshape(K, M)
    # subcarrier-major demod output -> per-timeslot active symbols
    from gfdm_tpu.ref.mapping import demap_from_resources, subcarrier_map

    smap = subcarrier_map(K, ACTIVE, dc_free=True)
    est = demap_from_resources(grid, M, smap, per_timeslot=True)
    decided = qpsk_hard_map(est)
    errors = np.sum(decided != qpsk_hard_map(ref_frame.data))
    assert errors == 0


def test_estimator_identity_channel(ref_frame):
    est = PreambleChannelEstimator(M, K, ACTIVE, True, ref_frame.x_preamble)
    H = est.estimate_frame(ref_frame.x_preamble)
    # active-band frame estimate must be ~1 (identity channel)
    half = ACTIVE // 2
    active = np.concatenate((H[: M * half], H[-M * half :]))
    np.testing.assert_allclose(active, np.ones_like(active), atol=1e-5)
    # no NaN/inf anywhere, incl. inactive band (the zero-bin guard)
    assert np.all(np.isfinite(H))


def test_sync_finds_embedded_frame(ref_frame):
    capture = validation.embed_frame_in_noise(ref_frame.frame, 777, 333, seed=7)
    res = find_frame_start(capture, ref_frame.x_preamble, K, CP)
    # the fine stage locates the core preamble, i.e. CP samples into the frame
    assert abs(int(res.frame_start) - (777 + CP)) <= 2
