#!/usr/bin/env python3
"""Large-K GFDM link on the factored Cooley-Tukey kernels.

At K >= 256 no dense operator fits VMEM (the Tx operator alone would be
~50 MB at K=256, ~830 MB at K=1024), so the production path is the factored
kernel pair: `tx_frame_factored` (per-subcarrier M-FFT as masked rolls,
overlap-add as tap rolls, CT IFFT with K-point MXU matmuls) into
`rx_receiver_factored(estimator="fast")` (the adjoint structure). Measured
on one TPU v5e chip the factored payload->payload link beats the XLA fast
chain 6.5x at K=256, 3.8x at K=512, 3.0x at K=1024
(benchmarks/largek_crossover.py ... link).

This example runs the K=256 link end to end on a noisy channel and checks
payload recovery. The reference's kernels are size-independent O(N log N)
C++ loops (modulator_kernel_cc.cc:98-141); this is the TPU answer.
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

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from gfdm_tpu import GfdmConfig  # noqa: E402
from gfdm_tpu.kernels.fused import (  # noqa: E402
    rx_receiver_factored,
    tx_frame_factored,
)
from gfdm_tpu.ops import planar as pl  # noqa: E402
from gfdm_tpu.ops.tx import demap_indices  # noqa: E402
from gfdm_tpu.ref import utils  # noqa: E402


def main():
    cfg = GfdmConfig(subcarriers=256, active_subcarriers=200, timeslots=9,
                     cp_len=64, cs_len=32)
    print(f"K={cfg.subcarriers} M={cfg.timeslots} frame_len={cfg.frame_len} "
          f"n_data={cfg.n_data_symbols}")
    batch = 4
    d = np.stack(
        [utils.random_qpsk(cfg.n_data_symbols, seed=60 + i) for i in range(batch)]
    ).astype(np.complex64)
    data = jnp.asarray(pl.to_planar(d).astype(np.float32))

    bursts = tx_frame_factored(cfg, data, block=batch)
    # light AWGN channel
    rng = np.random.default_rng(0)
    noisy = np.asarray(bursts) + 0.001 * rng.standard_normal(bursts.shape).astype(
        np.float32
    )
    chan, sym = rx_receiver_factored(cfg, jnp.asarray(noisy), ic_iterations=2,
                                     block=batch, estimator="fast")
    got = np.asarray(jnp.take(sym, jnp.asarray(demap_indices(cfg)), axis=-1))
    got_c = got[:, 0] + 1j * got[:, 1]
    evm = utils.evm(utils.qpsk_hard_map(got_c), d)
    sym_err = np.mean(np.sign(got_c.real) != np.sign(d.real)) + np.mean(
        np.sign(got_c.imag) != np.sign(d.imag)
    )
    print(f"decision EVM vs payload: {evm:.2e}   symbol errors: {sym_err:.0%}")
    assert evm < 1e-5


if __name__ == "__main__":
    main()
