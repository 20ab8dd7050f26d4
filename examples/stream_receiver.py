#!/usr/bin/env python3
"""Continuous-stream reception with the native ring buffer front end.

A producer (stand-in for a radio driver) pushes interleaved sc16 IQ into the
native SPSC ring buffer; the consumer pulls extended chunk batches and runs
the batched planar receiver - the TPU-era analogue of the reference's
hier_gfdm_fastsync + extract_burst + receiver flowgraph.
"""
import sys

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

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gfdm_tpu import GfdmConfig, native  # noqa: E402
from gfdm_tpu.ops import planar as pl  # noqa: E402
from gfdm_tpu.ops import planar_pipeline as pp  # noqa: E402
from gfdm_tpu.ops import tx as tx_ops  # noqa: E402
from gfdm_tpu.ref import utils  # noqa: E402


def main(n_bursts=4, chunk_len=2048):
    cfg = GfdmConfig()
    if not native.available():
        print("native library missing - run `make -C native` first")
        return

    # --- 'radio' side: synthesize a recording and push it as sc16 ---------
    rng = np.random.default_rng(0)
    data = np.stack(
        [utils.random_qpsk(cfg.n_data_symbols, seed=i) for i in range(n_bursts)]
    ).astype(np.complex64)
    bursts = np.asarray(tx_ops.transmit(cfg, data))[:, 0, :]
    stream = 0.01 * (
        rng.standard_normal(n_bursts * chunk_len)
        + 1j * rng.standard_normal(n_bursts * chunk_len)
    ).astype(np.complex64)
    for i, b in enumerate(bursts):
        off = i * chunk_len + 200 + 37 * i
        stream[off : off + cfg.frame_len] += 0.5 * b
    raw_sc16 = native.planar_to_sc16(pl.to_planar(stream), scale=2**14)

    halo = cfg.frame_len + cfg.cp_len
    sb = native.StreamBuffer(capacity=16 * chunk_len, chunk_len=chunk_len, halo=halo)
    # push in radio-sized packets
    planar = native.sc16_to_planar(raw_sc16, scale=2**14)
    for i in range(0, planar.shape[-1], 4096):
        sb.push(planar[:, i : i + 4096])

    # --- TPU side: pull chunk batches, detect + receive -------------------
    chunks, base = sb.pull(16)
    print(f"pulled {chunks.shape[0]} chunks starting at sample {base}")
    det = pp.detect_bursts_planar(cfg, jnp.asarray(chunks), search_limit=chunk_len)
    found = np.asarray(det["start"]) < chunk_len
    bursts_pl = pp.extract_bursts_planar(cfg, jnp.asarray(chunks), det)
    out = pp.receive_bursts_planar(cfg, bursts_pl, ic_iterations=3)
    d_hat = pl.from_planar(np.asarray(out["data"]))[found]
    evm = utils.evm(utils.qpsk_hard_map(d_hat), data[: d_hat.shape[0]])
    print(f"bursts found: {int(found.sum())}/{chunks.shape[0]} pulled chunks "
          f"(last burst stays buffered until its halo is complete)")
    print(f"decision EVM vs tx payload: {evm:.2e}")


if __name__ == "__main__":
    main()
