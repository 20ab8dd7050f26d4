"""Streaming service demo: native file ingest -> sharded receive loop.

Writes a synthetic sc16 capture with several GFDM bursts, ingests it with
the native background reader thread, and serves it through the persistent
StreamingReceiver on all local devices (forced to an 8-device CPU mesh here;
on TPU hardware the same code runs over the chip mesh).

The production counterpart of the reference's running receive flowgraph
(examples/hier_gfdm_receiver_tagged.grc + file/UHD source).
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from gfdm_tpu import GfdmConfig, native
from gfdm_tpu.ops import planar as pl
from gfdm_tpu.ops import tx as tx_ops
from gfdm_tpu.ref import utils
from gfdm_tpu.runtime.service import StreamingReceiver


def main():
    cfg = GfdmConfig()
    chunk_len = 2048
    halo = cfg.frame_len + cfg.cp_len
    n_chunks = 16
    n_bursts = 6

    # --- synthesize a capture: bursts at staggered offsets + noise ---------
    rng = np.random.default_rng(0)
    payloads = np.stack(
        [utils.random_qpsk(cfg.n_data_symbols, seed=i) for i in range(n_bursts)]
    ).astype(np.complex64)
    bursts = np.asarray(tx_ops.transmit(cfg, payloads))[:, 0, :]
    stream = 0.004 * (
        rng.standard_normal(n_chunks * chunk_len)
        + 1j * rng.standard_normal(n_chunks * chunk_len)
    ).astype(np.complex64)
    offsets = [(2 * i + 1) * chunk_len + 37 * i for i in range(n_bursts)]
    for b, off in zip(bursts, offsets):
        stream[off : off + cfg.frame_len] += 0.5 * b

    with tempfile.NamedTemporaryFile(suffix=".sc16", delete=False) as f:
        path = f.name
    native.planar_to_sc16(pl.to_planar(stream), scale=8000.0).tofile(path)

    # --- native ingest thread feeds the ring; the service drains it --------
    sb = native.StreamBuffer(capacity=4 * n_chunks * chunk_len,
                             chunk_len=chunk_len, halo=halo)
    ingest = native.FileIngest(path, sb, scale=8000.0)

    rx = StreamingReceiver(cfg, chunk_len=chunk_len, batch_chunks=8)
    print(f"mesh: dp={rx.mesh.shape['dp']} devices, chunk={chunk_len}, "
          f"halo={halo}")

    recovered = []

    def sink(out):
        found = out["found"]
        for row, start in zip(pl.from_planar(out["data"][found]),
                              out["start_abs"][found]):
            recovered.append((int(start), row))

    while ingest.running:
        time.sleep(0.005)
    samples = ingest.finish()
    stats = rx.serve(sb, sink=sink)
    os.unlink(path)

    print(f"ingested {samples} samples; served {stats.batches} batches / "
          f"{stats.chunks} chunks; bursts found: {stats.bursts_found}")
    recovered.sort()
    errs = 0
    for (start, row), off, ref in zip(recovered, offsets, payloads):
        hard = utils.qpsk_hard_map(row)
        errs += int(np.sum(np.abs(hard - ref) > 0.1))
        assert start == off + cfg.cp_len, (start, off)
    print(f"symbol errors across {n_bursts} bursts: {errs}  "
          f"(mean est. SNR {stats.mean_snr_db:.1f} dB)")


if __name__ == "__main__":
    main()
