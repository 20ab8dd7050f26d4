"""StreamingTransmitter tests incl. the full-duplex native-ring loopback
(round-3 verdict item 9): payload source -> batched planar Tx -> timed burst
train -> native StreamBuffer -> StreamingReceiver -> recovered payloads.
Mirrors the reference's full-duplex OTA flowgraph
(/root/reference/examples/gfdm_ota_demo.grc) without radio hardware."""
import numpy as np
import pytest

from gfdm_tpu import GfdmConfig
from gfdm_tpu.ops import planar as pl
from gfdm_tpu.ref import utils
from gfdm_tpu.runtime.service import StreamingReceiver
from gfdm_tpu.runtime.transmit_service import StreamingTransmitter

CFG = GfdmConfig()


def _payloads(batch, seed=0):
    data = np.stack(
        [utils.random_qpsk(CFG.n_data_symbols, seed=seed + i) for i in range(batch)]
    )
    return pl.to_planar(data).astype(np.float32), data


def test_step_matches_planar_tx():
    from gfdm_tpu.ops.planar_pipeline import transmit_planar

    pls, _ = _payloads(4, seed=1)
    tx = StreamingTransmitter(CFG, scale=0.5)
    out = tx.step(pls)
    ref = 0.5 * np.asarray(transmit_planar(CFG, pls))[:, 0]
    np.testing.assert_allclose(out, ref, atol=1e-6)
    assert out.shape == (4, 2, CFG.frame_len)


def test_ctor_validation():
    with pytest.raises(ValueError):
        StreamingTransmitter(CFG, cycle_samples=CFG.frame_len - 1)
    with pytest.raises(ValueError):
        StreamingTransmitter(CFG, cyclic_shift_index=3)


def test_serve_assembles_timed_grid():
    pls, _ = _payloads(6, seed=2)
    tx = StreamingTransmitter(CFG, batch_bursts=3, sample_rate=1e6)
    batches = iter([pls[:3], pls[3:]])
    outs = []
    tx.serve(lambda: next(batches, None), outs.append)
    assert tx.stats.bursts == 6 and tx.stats.batches == 2
    cyc = tx.cycle_samples
    # continuous timeline across batches: burst i starts at i*cyc
    all_stamps = [s for o in outs for s in o["tx_times"]]
    assert [s[1] for s in all_stamps] == [i * cyc for i in range(6)]
    np.testing.assert_allclose(
        [s[0] for s in all_stamps], [i * cyc / 1e6 for i in range(6)]
    )
    # the stream really carries the bursts at those offsets
    stream = np.concatenate([o["samples"] for o in outs], axis=-1)
    for i in range(6):
        seg = stream[:, i * cyc : i * cyc + CFG.frame_len]
        np.testing.assert_allclose(seg, tx.step(pls[i : i + 1])[0], atol=1e-6)
        assert not stream[:, i * cyc + CFG.frame_len : (i + 1) * cyc].any()


def test_full_duplex_ring_loopback():
    """StreamingTransmitter -> native StreamBuffer -> StreamingReceiver:
    every transmitted payload is detected on the cycle grid and demodulated
    back, with both persistent services running over the native ring."""
    native = pytest.importorskip("gfdm_tpu.native")
    if not native.available():
        pytest.skip("native library not built")

    n_bursts = 8
    pls, data = _payloads(n_bursts, seed=7)
    chunk_len = 2048
    halo = CFG.frame_len + CFG.cp_len
    # capacity is in SAMPLES: hold the whole 8-burst train + flush halo
    ring = native.StreamBuffer(capacity=32 * chunk_len, chunk_len=chunk_len,
                               halo=halo)

    tx = StreamingTransmitter(CFG, batch_bursts=4)
    assert tx.cycle_samples == chunk_len  # canonical padding == chunk grid
    batches = iter([pls[:4], pls[4:]])
    tx.serve(lambda: next(batches, None), ring)
    ring.push(np.zeros((2, halo), np.float32))  # flush the tail chunk

    rx = StreamingReceiver(CFG, chunk_len=chunk_len, batch_chunks=4)
    outs = []
    rx.serve(ring, outs.append)
    found = np.concatenate([o["found"] for o in outs])
    starts = np.concatenate([o["start_abs"] for o in outs])
    assert found.sum() == n_bursts
    # detections sit at the core preamble: cycle start + cp_len
    np.testing.assert_array_equal(
        np.sort(starts[found]),
        np.arange(n_bursts) * tx.cycle_samples + CFG.cp_len,
    )
    d_hat = np.concatenate([o["data"] for o in outs])[found]
    order = np.argsort(starts[found])
    d_c = pl.from_planar(d_hat[order])
    assert utils.evm(utils.qpsk_hard_map(d_c), data) < 1e-5


def test_full_duplex_udp_socket_loopback():
    """The OTA-style software loop over a REAL socket: StreamingTransmitter
    -> UdpSink (sc16 datagrams) -> native UdpIngest -> StreamBuffer ->
    StreamingReceiver. Every payload recovered - the executable analogue of
    the reference's USRP OTA demo with UDP in place of the radio."""
    native = pytest.importorskip("gfdm_tpu.native")
    if not native.available():
        pytest.skip("native library not built")
    from gfdm_tpu.runtime.transmit_service import UdpSink

    n_bursts = 8
    pls, data = _payloads(n_bursts, seed=29)
    chunk_len = 2048
    halo = CFG.frame_len + CFG.cp_len
    ring = native.StreamBuffer(capacity=32 * chunk_len, chunk_len=chunk_len,
                               halo=halo)
    port = 47631
    ing = native.UdpIngest(port, ring)

    tx = StreamingTransmitter(CFG, batch_bursts=4, scale=0.5)
    sink = UdpSink(port)
    batches = iter([pls[:4], pls[4:]])
    tx.serve(lambda: next(batches, None), sink)
    sink.push(np.zeros((2, halo), np.float32))  # flush the tail chunk
    sink.close()  # end-of-stream datagram
    ingested = ing.finish()
    assert ingested == tx.stats.samples + halo

    rx = StreamingReceiver(CFG, chunk_len=chunk_len, batch_chunks=4)
    outs = []
    rx.serve(ring, outs.append)
    found = np.concatenate([o["found"] for o in outs])
    starts = np.concatenate([o["start_abs"] for o in outs])
    assert found.sum() == n_bursts
    np.testing.assert_array_equal(
        np.sort(starts[found]),
        np.arange(n_bursts) * tx.cycle_samples + CFG.cp_len,
    )
    d_hat = np.concatenate([o["data"] for o in outs])[found]
    order = np.argsort(starts[found])
    d_c = pl.from_planar(d_hat[order])
    # sc16 quantization at scale 0.5 leaves ~1e-3 EVM; decisions are clean
    assert utils.evm(utils.qpsk_hard_map(d_c), data) < 1e-5
