"""Factorized (Cooley-Tukey) planar path vs the dense-operator path."""
import jax.numpy as jnp
import numpy as np

from gfdm_tpu import GfdmConfig
from gfdm_tpu.ops import planar as pl
from gfdm_tpu.ops import planar_fast as pf
from gfdm_tpu.ops.planar import pdiv, pmatmul
from gfdm_tpu.ops.planar_pipeline import _device_mats
from gfdm_tpu.ref import utils

CFG = GfdmConfig()


def _planar(n, batch, seed):
    d = np.stack(
        [utils.random_samples(n, seed=seed + i) for i in range(batch)]
    ).astype(np.complex64)
    return jnp.asarray(pl.to_planar(d))


def test_fast_fft_matches_dense():
    consts = pf._fft_consts(CFG, "float32")
    mats = _device_mats(CFG, "float32")
    x = _planar(CFG.block_len, 3, seed=1)
    dense = pmatmul(x, mats["F_W"])
    fast = pf.fast_fft_n(CFG, x, consts)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(dense), atol=2e-3)
    # and against numpy
    xc = pl.from_planar(np.asarray(x))
    np.testing.assert_allclose(
        pl.from_planar(np.asarray(fast)), np.fft.fft(xc, axis=-1), atol=2e-3
    )


def test_fast_ifft_roundtrip():
    consts = pf._fft_consts(CFG, "float32")
    x = _planar(CFG.block_len, 2, seed=5)
    X = pf.fast_fft_n(CFG, x, consts)
    back = pf.fast_ifft_n(CFG, X, consts)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)


def test_fast_demod_matches_dense():
    consts = pf._fft_consts(CFG, "float32")
    mats = _device_mats(CFG, "float32")
    frames = _planar(CFG.block_len, 3, seed=9)
    chan = _planar(CFG.block_len, 3, seed=11) + 2.0
    dense = pmatmul(pdiv(pmatmul(frames, mats["F_W"]), chan), mats["Bfd_W"])
    fast = pf.demod_fast(CFG, frames, chan, consts, equalize=True)
    fast_flat = jnp.moveaxis(fast, -2, -3).reshape(dense.shape)
    np.testing.assert_allclose(np.asarray(fast_flat), np.asarray(dense), atol=2e-4)


def test_fast_modulator_matches_dense():
    from gfdm_tpu.ops import operators
    consts = pf._fft_consts(CFG, "float32")
    A_W = pl.real_operator(operators.modulation_operator(CFG).T)
    grid = _planar(CFG.block_len, 3, seed=21)
    dense = pmatmul(grid, jnp.asarray(A_W))
    fast = pf.modulate_core_fast(CFG, grid, consts)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(dense), atol=2e-5)


def test_fast_link_step_matches_dense():
    from gfdm_tpu.ops.planar_pipeline import link_step_planar

    rng = np.random.default_rng(0)
    d = jnp.asarray(
        ((rng.integers(0, 2, (8, 2, CFG.n_data_symbols)) * 2 - 1) / np.sqrt(2)).astype(
            np.float32
        )
    )
    d_dense, snr_dense, evm_dense = link_step_planar(CFG, d, ic_iterations=2)
    d_fast, snr_fast, evm_fast = link_step_planar(CFG, d, ic_iterations=2, method="fast")
    np.testing.assert_allclose(
        np.asarray(d_fast), np.asarray(d_dense), atol=2e-3
    )
    assert abs(float(evm_fast) - float(evm_dense)) < 1e-3


def test_fast_path_scales_to_large_config():
    """K=256 config: the dense demod operator would be (2N,2N)=(4608,4608);
    the factorized path runs it with only K/M-point stage matrices."""
    cfg = GfdmConfig(subcarriers=256, active_subcarriers=200, timeslots=9)
    consts = pf._fft_consts(cfg, "float32")
    x = _planar(cfg.block_len, 2, seed=31)
    X = pf.fast_fft_n(cfg, x, consts)
    xc = pl.from_planar(np.asarray(x))
    np.testing.assert_allclose(
        pl.from_planar(np.asarray(X)), np.fft.fft(xc, axis=-1), atol=2e-2
    )
    back = pf.fast_ifft_n(cfg, X, consts)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-4)


def test_fast_channel_estimation_matches_dense():
    from gfdm_tpu.ops.planar_pipeline import _np_mats

    for cfg in (CFG, GfdmConfig(dc_free=False)):
        consts = pf._est_consts(cfg, "float32")
        mats = _np_mats(cfg, "float32")
        rx_pre = _planar(2 * cfg.subcarriers, 3, seed=41)
        dense = pl.pmatmul(rx_pre, jnp.asarray(mats["E_W"]))
        fast = pf.estimate_channel_fast(cfg, rx_pre, consts)
        np.testing.assert_allclose(
            np.asarray(fast), np.asarray(dense), atol=1e-4
        )
        # SNR power spectrum parity (radix-2 split vs dense 2K DFT)
        p_dense = pl.pabs2(pl.pmatmul(rx_pre, jnp.asarray(mats["F2_W"])))
        p_fast = pf.snr_power_fast(cfg, rx_pre, consts)
        np.testing.assert_allclose(
            np.asarray(p_fast), np.asarray(p_dense), atol=1e-3,
            rtol=1e-4,
        )


def test_fast_receiver_no_dense_operators_large_config():
    """K=512 end-to-end in fast mode: never builds an O(N^2) operator."""
    from gfdm_tpu.ops.planar_pipeline import link_step_planar

    cfg = GfdmConfig(subcarriers=512, active_subcarriers=400, timeslots=9,
                     cp_len=64, cs_len=32)
    rng = np.random.default_rng(0)
    d = jnp.asarray(
        ((rng.integers(0, 2, (4, 2, cfg.n_data_symbols)) * 2 - 1) / np.sqrt(2)
         ).astype(np.float32)
    )
    d_hat, snr, evm = link_step_planar(cfg, d, ic_iterations=1, method="fast")
    # loopback decisions must be clean (MF self-interference floor only)
    hard = np.where(np.asarray(d_hat) >= 0, 1.0, -1.0) / np.sqrt(2)
    np.testing.assert_allclose(hard, np.asarray(d), atol=1e-6)
    assert float(evm) < 0.2
