#!/usr/bin/env python3
"""OTA-style protected link (analogue of examples/gfdm_ota_demo.grc).

Byte payloads -> CRC32 -> bits -> QPSK -> Tx chain -> timed burst shaping
-> channel -> sync -> Rx chain -> bits -> CRC check, with tx_time stamps
from the cycle-grid scheduler (no radio hardware required).
"""
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import os as _os

import jax as _jax

if _os.environ.get("GFDM_EXAMPLE_DEVICE", "cpu") == "cpu":
    try:
        _jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

import numpy as np  # noqa: E402

from gfdm_tpu import GfdmConfig  # noqa: E402
from gfdm_tpu.ops import tx as tx_ops  # noqa: E402
from gfdm_tpu.runtime.receiver import receive_stream  # noqa: E402
from gfdm_tpu.runtime import channel as chan  # noqa: E402
from gfdm_tpu.runtime.timing import BurstScheduler  # noqa: E402
from gfdm_tpu.runtime.transmitter import shape_bursts  # noqa: E402
from gfdm_tpu.utils.framing import (  # noqa: E402
    attach_crc32,
    check_crc32,
    pack_bits,
    payload_capacity_bytes,
    unpack_bits,
)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main(n_bursts=8, snr_db=18.0):
    cfg = GfdmConfig()
    cap = payload_capacity_bytes(cfg.n_data_symbols)
    print(f"payload capacity: {cap} bytes/burst (+4 CRC)")

    rng = np.random.default_rng(0)
    messages = [bytes(rng.integers(0, 256, cap, dtype=np.uint8)) for _ in range(n_bursts)]

    # frame: CRC -> bits -> QPSK symbols (I-bit, Q-bit per symbol)
    sym_batch = np.empty((n_bursts, cfg.n_data_symbols), dtype=np.complex64)
    for i, msg in enumerate(messages):
        bits = unpack_bits(attach_crc32(msg)).reshape(-1, 2)
        sym_batch[i] = ((1 - 2.0 * bits[:, 0]) + 1j * (1 - 2.0 * bits[:, 1])) / np.sqrt(2)

    bursts = np.asarray(tx_ops.transmit(cfg, sym_batch))[:, 0, :]
    shaped = np.asarray(shape_bursts(cfg, bursts, scale=0.7))

    # timed transmission stamps on a 10 ms cycle grid
    sched = BurstScheduler(cycle_interval_secs=0.01, timing_advance_secs=0.0005)
    stamps = [sched.next_tx_time(100, 0.003) for _ in range(n_bursts)]
    print(f"tx_time stamps (first 3): {stamps[:3]}")

    # channel + reception (burst placed at its padded offset per chunk)
    stream = shaped.reshape(n_bursts, -1)
    s = chan.multipath(jnp.asarray(stream), jnp.asarray([1.0, 0.2 + 0.1j]))
    s = chan.awgn(jax.random.PRNGKey(5), s, snr_db)
    out = receive_stream(cfg, s, ic_iterations=3)

    d_hat = np.asarray(out["data"])
    ok = 0
    for i in range(n_bursts):
        bits = np.stack([d_hat[i].real < 0, d_hat[i].imag < 0], axis=-1).astype(np.uint8)
        crc_ok, payload = check_crc32(pack_bits(bits))
        ok += int(crc_ok and payload == messages[i])
    print(f"CRC-verified bursts: {ok}/{n_bursts} at {snr_db:.0f} dB SNR")


if __name__ == "__main__":
    main()
