"""GR-style block API parity tests."""
import numpy as np

from gfdm_tpu import GfdmConfig, blocks
from gfdm_tpu.ref import utils

CFG = GfdmConfig()


def _data(batch, seed=0):
    return np.stack(
        [utils.random_qpsk(CFG.n_data_symbols, seed=seed + i) for i in range(batch)]
    ).astype(np.complex64)


def test_block_flowgraph_tx_rx_roundtrip():
    """Compose the hier receiver flowgraph from blocks, like a GRC user."""
    tx = blocks.transmitter_cc(CFG)
    est = blocks.channel_estimator_cc(CFG)
    rxb = blocks.advanced_receiver_sb_cc(CFG, ic_iterations=3)
    demap = blocks.resource_demapper_cc(CFG)

    data = _data(4, seed=1)
    bursts = np.asarray(tx(data))[:, 0, :]

    rx_pre = bursts[:, CFG.cp_len : CFG.cp_len + 2 * CFG.subcarriers]
    chan, tags = est(rx_pre)
    assert np.asarray(tags["snr_lin"]).shape == (4,)
    frames = bursts[:, CFG.preamble_len + CFG.cp_len :][:, : CFG.block_len]
    syms = rxb(frames, channel=chan)
    d_hat = np.asarray(demap(syms))
    assert utils.evm(utils.qpsk_hard_map(d_hat), data) < 1e-5


def test_block_mod_demod_and_prefix_chain():
    mod = blocks.simple_modulator_cc(CFG)
    rx = blocks.simple_receiver_cc(CFG)
    pref = blocks.cyclic_prefixer_cc(CFG)
    depref = blocks.remove_prefix_cc(CFG)
    mapper = blocks.resource_mapper_cc(CFG)

    data = _data(2, seed=5)
    grid = mapper(data)
    frames = mod(grid)
    framed = pref(frames)
    back = np.asarray(depref(framed))
    np.testing.assert_allclose(back, np.asarray(frames), atol=1e-6)
    syms = np.asarray(rx(back))
    assert syms.shape == (2, CFG.block_len)


def test_block_extract_burst_with_builtin_sync():
    tx = blocks.transmitter_cc(CFG)
    ext = blocks.extract_burst_cc(CFG)
    data = _data(2, seed=9)
    bursts = np.asarray(tx(data))[:, 0, :]
    stream = np.zeros((2, 2048), np.complex64)
    stream[:, 300 : 300 + CFG.frame_len] = bursts
    det = ext.sync(stream)
    out = np.asarray(ext(stream, det))
    # extraction applies the detector's power normalization (scale factor)
    scale = np.asarray(det["scale"])[:, None]
    np.testing.assert_allclose(out, bursts * scale, atol=1e-3)


def test_block_shaper_and_legacy_modulator():
    shaper = blocks.short_burst_shaper(CFG, scale=0.5)
    data = _data(1, seed=11)
    bursts = np.asarray(blocks.transmitter_cc(CFG)(data))[:, 0, :]
    shaped = np.asarray(shaper(bursts))
    assert shaped.shape == (1, CFG.padded_frame_len)

    legacy = blocks.modulator_cc(CFG, fft_len=2 * CFG.block_len)
    grid = np.asarray(blocks.resource_mapper_cc(CFG)(data))
    out = np.asarray(legacy(grid))
    assert out.shape == (1, 2 * CFG.block_len)


def test_preamble_generator_variable_block():
    """GRC variable block analogue: repeated-half sync preamble
    (grc/gfdm_preamble_generator.block.yml)."""
    full, core = blocks.preamble_generator(16, 0.35, 32)
    assert core.shape == (32,)
    halves = core.reshape(2, -1)
    np.testing.assert_allclose(halves[0], halves[1], atol=1e-12)
    # windowed variant with CP: length = cp + core + ramp(cs)
    full, core = blocks.preamble_generator(12, 0.2, 32, cp_len=8, ramp_len=4)
    assert full.shape == (8 + 32 + 4,)
    with np.testing.assert_raises(ValueError):
        blocks.preamble_generator(40, 0.2, 32)
