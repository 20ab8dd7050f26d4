#!/usr/bin/env python3
"""End-to-end GFDM link simulation (analogue of gfdm_simulation_demo.grc).

Payload bits -> Tx chain -> multipath + CFO + AWGN channel -> sync ->
burst extraction -> channel estimation -> ZF + IC receiver -> bits,
with per-burst SNR/EVM reporting.

Runs on whatever backend JAX selects (CPU works; on TPU the complex ops are
replaced by the planar pipeline automatically if transfers fail).
"""
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

# The complex-dtype convenience path needs host<->device complex transfers,
# which this image's TPU tunnel lacks - examples default to CPU. Set
# GFDM_EXAMPLE_DEVICE=tpu to try the accelerator anyway.
import os as _os

import jax as _jax

if _os.environ.get("GFDM_EXAMPLE_DEVICE", "cpu") == "cpu":
    try:
        _jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gfdm_tpu import GfdmConfig  # noqa: E402
from gfdm_tpu.ops import tx as tx_ops  # noqa: E402
from gfdm_tpu.ref import utils  # noqa: E402
from gfdm_tpu.runtime import channel as chan  # noqa: E402
from gfdm_tpu.runtime.receiver import receive_stream  # noqa: E402


def main(batch=32, snr_db=20.0, cfo=0.03):
    cfg = GfdmConfig()
    print(f"config: M={cfg.timeslots} K={cfg.subcarriers} "
          f"active={cfg.active_subcarriers} cp={cfg.cp_len} "
          f"frame_len={cfg.frame_len}")

    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, (batch, cfg.n_data_symbols, 2))
    data = ((1 - 2 * bits[..., 0]) + 1j * (1 - 2 * bits[..., 1])) / np.sqrt(2)
    data = data.astype(np.complex64)

    bursts = np.asarray(tx_ops.transmit(cfg, data))[:, 0, :]

    chunk_len = 2048
    offset = 400
    stream = np.zeros((batch, chunk_len), dtype=np.complex64)
    stream[:, offset : offset + cfg.frame_len] = bursts
    s = chan.multipath(jnp.asarray(stream), jnp.asarray([1.0, 0.25 + 0.15j, 0.1]))
    s = chan.apply_cfo(s, cfo, cfg.subcarriers)
    s = chan.awgn(jax.random.PRNGKey(1), s, snr_db)

    out = receive_stream(cfg, s, ic_iterations=4)
    d_hat = np.asarray(out["data"])
    rx_bits = np.stack([d_hat.real < 0, d_hat.imag < 0], axis=-1).astype(int)

    ber = np.mean(rx_bits != bits)
    evm = utils.evm(d_hat, data)
    snr_est = 10 * np.log10(np.mean(np.asarray(out["snr_lin"])))
    det = out["detection"]
    print(f"detected starts: {np.asarray(det['start'])[:4]}... "
          f"(expected {offset + cfg.cp_len})")
    print(f"CFO estimates: {np.asarray(det['cfo'])[:4]} (true {cfo})")
    print(f"BER={ber:.5f}  EVM={evm:.4f}  est. SNR={snr_est:.1f} dB")


if __name__ == "__main__":
    main()
