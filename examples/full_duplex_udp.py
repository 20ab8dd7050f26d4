#!/usr/bin/env python3
"""Full-duplex modem over a real UDP socket: the OTA demo, software edition.

StreamingTransmitter modulates payload batches onto a timed cycle grid and
sends them as sc16 datagrams (UdpSink = the uhd_usrp_sink analogue); the
native UdpIngest thread receives them into the chunk-framing ring, and
StreamingReceiver detects, extracts and demodulates every burst. This is the
executable counterpart of the reference's USRP OTA flowgraph
(/root/reference/examples/gfdm_ota_demo.grc) with UDP in place of the radio
driver - swap UdpSink/UdpIngest for a real SDR transport and nothing else
changes.

Requires the native library: `make -C native` once.
"""
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax as _jax

try:
    _jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

import numpy as np  # noqa: E402

from gfdm_tpu import GfdmConfig, native  # noqa: E402
from gfdm_tpu.ops import planar as pl  # noqa: E402
from gfdm_tpu.ref import utils  # noqa: E402
from gfdm_tpu.runtime.service import StreamingReceiver  # noqa: E402
from gfdm_tpu.runtime.transmit_service import (  # noqa: E402
    StreamingTransmitter,
    UdpSink,
)


def main():
    if not native.available():
        print("native library not built; run `make -C native` first")
        return
    cfg = GfdmConfig()
    n_bursts, port, chunk_len = 12, 47633, 2048
    halo = cfg.frame_len + cfg.cp_len

    data = np.stack([
        utils.random_qpsk(cfg.n_data_symbols, seed=i) for i in range(n_bursts)
    ])
    payloads = pl.to_planar(data).astype(np.float32)

    ring = native.StreamBuffer(capacity=64 * chunk_len, chunk_len=chunk_len,
                               halo=halo)
    ingest = native.UdpIngest(port, ring)

    tx = StreamingTransmitter(cfg, batch_bursts=4, scale=0.5)
    sink = UdpSink(port)
    batches = iter([payloads[i : i + 4] for i in range(0, n_bursts, 4)])
    tx.serve(lambda: next(batches, None), sink)
    sink.push(np.zeros((2, halo), np.float32))  # flush the tail chunk
    sink.close()
    n_in = ingest.finish()
    print(f"tx: {tx.stats.bursts} bursts / {tx.stats.samples} samples in "
          f"{sink.datagrams_sent} datagrams; rx ingested {n_in} samples")

    rx = StreamingReceiver(cfg, chunk_len=chunk_len, batch_chunks=4)
    outs = []
    rx.serve(ring, outs.append)
    found = np.concatenate([o["found"] for o in outs])
    starts = np.concatenate([o["start_abs"] for o in outs])
    d_hat = pl.from_planar(np.concatenate([o["data"] for o in outs])[found])
    order = np.argsort(starts[found])
    evm = utils.evm(utils.qpsk_hard_map(d_hat[order]), data)
    print(f"rx: {int(found.sum())}/{n_bursts} bursts recovered, "
          f"decision EVM {evm:.2e}")


if __name__ == "__main__":
    main()
