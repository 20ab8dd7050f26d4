"""OOB-emission and PAPR evaluation tests (verdict round-4 item 6).

Pins the waveform-quality claims GFDM exists for: the subcarrier pulse
shaping and the ramped CP window contain out-of-band emissions relative to
rectangular-pulse OFDM on the same resource grid, at a small PAPR cost.
Counterpart of the reference's unquantified PAPR experiment
(/root/reference/python/pygfdm/zadoff_chu.py __main__) and
gfdm_plot_utils.py spectrum plots.
"""
import numpy as np

from gfdm_tpu import GfdmConfig
from gfdm_tpu.eval.spectrum import (
    oob_attenuation,
    papr,
    papr_ccdf,
    spectrum_study,
    welch_psd,
)

CFG = GfdmConfig()


def test_welch_psd_tone():
    """A pure tone concentrates its PSD at its frequency bin."""
    n = 8192
    f0 = 0.1875  # exactly on a 1024-point grid bin
    x = np.exp(2j * np.pi * f0 * np.arange(n))
    f, p = welch_psd(x, nfft=1024)
    assert abs(f[np.argmax(p)] - f0) < 1.0 / 1024
    assert p.max() > 1e3 * np.median(p)


def test_oob_containment_ordering():
    """GFDM windowed frame > GFDM bare core > plain OFDM in out-of-band
    attenuation on identical payload grids (measured ~34 / ~26 / ~16 dB at
    the canonical config) - the spectral-containment property that
    motivates GFDM."""
    res = spectrum_study(CFG, n_bursts=64)
    frame = res["gfdm_frame"]["oob_attenuation_db"]
    core = res["gfdm_core"]["oob_attenuation_db"]
    ofdm = res["ofdm"]["oob_attenuation_db"]
    assert frame > core + 3.0
    assert core > ofdm + 3.0
    assert frame > 30.0 and ofdm < 20.0


def test_papr_ccdf_shape_and_range():
    """PAPR CCDF is monotone non-increasing; the multicarrier PAPR sits in
    the standard 7-12 dB regime, with GFDM within ~1 dB of OFDM (pulse
    shaping does not blow up the envelope)."""
    res = spectrum_study(CFG, n_bursts=64)
    for name in ("gfdm_frame", "ofdm"):
        ccdf = res[name]["papr_ccdf"]
        assert np.all(np.diff(ccdf) <= 1e-12)
        assert 6.0 < res[name]["papr_median_db"] < 12.0
    assert abs(res["gfdm_frame"]["papr_median_db"]
               - res["ofdm"]["papr_median_db"]) < 1.5


def test_papr_constant_envelope_is_zero():
    x = np.exp(2j * np.pi * 0.1 * np.arange(512))[None, :]
    assert abs(papr(x)[0]) < 1e-9
    t, c = papr_ccdf(np.repeat(x, 4, axis=0), thresholds_db=[1.0, 2.0])
    np.testing.assert_array_equal(c, [0.0, 0.0])


def test_oob_attenuation_detects_white_noise():
    """White noise has ~0 dB in/out-of-band ratio - the metric's null."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal(1 << 15) + 1j * rng.standard_normal(1 << 15)
    assert abs(oob_attenuation(x, occupied=0.25)) < 1.0
