"""End-to-end burst link tests: Tx chain -> channel -> sync -> Rx chain.

The integration analogue of the reference's chain QA
(qa_transmitter_chain_cc.py, hier receiver flowgraphs) with the sync stage
included (which the reference delegates to XFDMSync).
"""
import jax
import jax.numpy as jnp
import numpy as np

from gfdm_tpu import GfdmConfig
from gfdm_tpu.ops import burst as burst_ops
from gfdm_tpu.ops import sync as sync_ops
from gfdm_tpu.ref import utils
from gfdm_tpu.runtime import channel as chan
from gfdm_tpu.runtime.receiver import receive_bursts, receive_stream
from gfdm_tpu.runtime.transmitter import shape_bursts, transmit_bursts

CFG = GfdmConfig()
BATCH = 4


def _payloads(cfg, batch, seed=0):
    return np.stack(
        [utils.random_qpsk(cfg.n_data_symbols, seed=seed + i) for i in range(batch)]
    )


def test_transmit_shape_and_padding():
    data = _payloads(CFG, BATCH)
    bursts = transmit_bursts(CFG, data)
    assert bursts.shape == (BATCH, 1, CFG.frame_len)
    padded = shape_bursts(CFG, bursts[:, 0, :], scale=0.5)
    assert padded.shape == (BATCH, CFG.padded_frame_len)
    np.testing.assert_allclose(
        np.asarray(padded[:, : CFG.pre_padding_len]), 0.0
    )


def test_receive_bursts_clean_channel():
    data = _payloads(CFG, BATCH, seed=10)
    bursts = np.asarray(transmit_bursts(CFG, data))[:, 0, :]
    out = receive_bursts(CFG, bursts, ic_iterations=4)
    d_hat = np.asarray(out["data"])
    # identity channel: estimator returns ~1, ZF+IC recovers QPSK symbols
    assert utils.evm(utils.qpsk_hard_map(d_hat), data) < 1e-5
    assert np.max(np.abs(d_hat - data)) < 0.15
    # channel estimate ~1 on active bins
    ch = np.asarray(out["channel"])[0]
    act = np.abs(ch) > 0.5
    np.testing.assert_allclose(ch[act], 1.0, atol=1e-3)


def test_sync_detects_embedded_burst():
    data = _payloads(CFG, BATCH, seed=20)
    bursts = np.asarray(transmit_bursts(CFG, data, dtype=jnp.complex128))[:, 0, :]
    chunk_len = 2048
    offset = 700
    stream = np.zeros((BATCH, chunk_len), dtype=np.complex128)
    stream[:, offset : offset + CFG.frame_len] = bursts
    key = jax.random.PRNGKey(0)
    stream = np.asarray(chan.awgn(key, jnp.asarray(stream), 15.0))

    det = sync_ops.detect_bursts(CFG, stream)
    starts = np.asarray(det["start"])
    # core preamble begins cp_len samples into the burst
    np.testing.assert_allclose(starts, offset + CFG.cp_len, atol=2)
    assert np.all(np.asarray(det["strength"]) > 0.1)


def test_receive_stream_full_chain_awgn_cfo():
    data = _payloads(CFG, BATCH, seed=30)
    bursts = np.asarray(transmit_bursts(CFG, data, dtype=jnp.complex128))[:, 0, :]
    chunk_len = 2048
    offset = 512
    stream = np.zeros((BATCH, chunk_len), dtype=np.complex128)
    stream[:, offset : offset + CFG.frame_len] = bursts
    cfo = 0.05
    s = chan.apply_cfo(jnp.asarray(stream), cfo, CFG.subcarriers)
    s = chan.awgn(jax.random.PRNGKey(1), s, 25.0)

    out = receive_stream(CFG, s, ic_iterations=4)
    d_hat = np.asarray(out["data"])
    # full chain: sync (incl CFO estimate+derotation), channel est (residual
    # CFO/phase is absorbed as a linear phase channel), ZF+IC, demap
    hard = utils.qpsk_hard_map(d_hat)
    ber_proxy = np.mean(np.abs(hard - data) > 0.1)
    assert ber_proxy < 0.01
    # detection quality
    np.testing.assert_allclose(
        np.asarray(out["detection"]["start"]), offset + CFG.cp_len, atol=2
    )
    np.testing.assert_allclose(np.asarray(out["detection"]["cfo"]), cfo, atol=5e-3)


def test_receive_stream_multipath():
    data = _payloads(CFG, BATCH, seed=40)
    bursts = np.asarray(transmit_bursts(CFG, data, dtype=jnp.complex128))[:, 0, :]
    chunk_len = 2048
    offset = 300
    stream = np.zeros((BATCH, chunk_len), dtype=np.complex128)
    stream[:, offset : offset + CFG.frame_len] = bursts
    h = np.array([1.0, 0.4 + 0.2j, 0.15, 0.05j])
    s = chan.multipath(jnp.asarray(stream), jnp.asarray(h))
    s = chan.awgn(jax.random.PRNGKey(2), s, 30.0)

    out = receive_stream(CFG, s, ic_iterations=4, correct_cfo=False)
    d_hat = np.asarray(out["data"])
    hard = utils.qpsk_hard_map(d_hat)
    ber_proxy = np.mean(np.abs(hard - data) > 0.1)
    assert ber_proxy < 0.02
    # estimated SNR should be finite and positive in a 30 dB channel
    snr_db = 10 * np.log10(np.asarray(out["snr_lin"]))
    assert np.all(snr_db > 10)


def test_extract_bursts_zero_fill_at_chunk_start():
    cfg = CFG
    chunk_len = 1024
    stream = np.ones((1, chunk_len), dtype=np.complex64)
    det = {
        "start": jnp.asarray([5]),  # backoff 16 reaches before chunk start
        "scale": jnp.asarray([1.0]),
        "cfo": jnp.asarray([0.0]),
    }
    out = np.asarray(burst_ops.extract_bursts(cfg, jnp.asarray(stream), det))
    # first (backoff - start) = 11 samples zero-filled
    np.testing.assert_allclose(out[0, :11], 0.0)
    np.testing.assert_allclose(out[0, 11:], 1.0, atol=1e-6)


def test_cdd_two_antenna_combining():
    """Cyclic-delay-diversity: summing both Tx ports acts as a 2-tap channel
    the estimator absorbs (reference QA: qa_python_bindings.py:532-638)."""
    cfg = GfdmConfig(cyclic_shifts=(0, 4))
    data = _payloads(cfg, 2, seed=50)
    bursts = np.asarray(transmit_bursts(cfg, data, dtype=jnp.complex128))
    combined = bursts[:, 0, :] + bursts[:, 1, :]
    out = receive_bursts(cfg, combined, ic_iterations=4)
    d_hat = np.asarray(out["data"])
    hard = utils.qpsk_hard_map(d_hat)
    ber_proxy = np.mean(np.abs(hard - data) > 0.1)
    assert ber_proxy < 0.05


def test_detect_topk_multiple_bursts_in_chunk():
    """Three bursts in one long chunk found by iterative peak suppression."""
    from gfdm_tpu.ops.sync import detect_bursts_topk

    data = _payloads(CFG, 3, seed=77)
    bursts = np.asarray(transmit_bursts(CFG, data, dtype=jnp.complex128))[:, 0, :]
    T = 8192
    stream = np.zeros((1, T), dtype=np.complex128)
    offsets = [500, 3000, 6200]
    for b, off in zip(bursts, offsets):
        stream[0, off : off + CFG.frame_len] = b
    stream = np.asarray(chan.awgn(jax.random.PRNGKey(3), jnp.asarray(stream), 20.0))

    det = detect_bursts_topk(CFG, stream, max_bursts=4)
    starts = np.sort(np.asarray(det["start"])[0][:3])
    expected = np.asarray(offsets) + CFG.cp_len
    np.testing.assert_allclose(np.sort(starts), expected, atol=2)
    s = np.asarray(det["strength"])[0]
    assert np.min(s[:3]) > 3 * s[3]  # 4th "burst" is noise floor
