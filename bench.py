"""Benchmark: end-to-end GFDM burst link throughput on one TPU chip.

Measures the flagship pipeline (full Tx chain -> full Rx chain with channel
estimation, ZF equalization and 2 IC iterations) on the canonical K=64, M=9
configuration, batched over bursts, using the planar (complex-free) TPU path.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is the ratio against a single-core CPU golden-model (NumPy/FFT)
implementation of the same end-to-end chain measured in this run - the stand-
in for the reference's FFTW/VOLK CPU kernels, which publish no numbers
(BASELINE.md).
"""
import json
import sys
import time

import numpy as np


def _bench_tpu(cfg, batch=8192, iters=10, ic_iterations=2):
    import jax

    from gfdm_tpu.ops.planar_pipeline import link_step_planar, prepare

    prepare(cfg)  # upload operator matrices outside the jit trace
    rng = np.random.default_rng(0)
    qpsk = (rng.integers(0, 2, (batch, 2, cfg.n_data_symbols)) * 2 - 1) / np.sqrt(2.0)
    data = jax.device_put(qpsk.astype(np.float32))

    step = jax.jit(lambda d: link_step_planar(cfg, d, ic_iterations=ic_iterations))
    out = step(data)
    jax.block_until_ready(out)  # compile + warmup

    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(data)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    evm = float(np.asarray(out[2]))
    return dt, evm


def _bench_cpu_golden(cfg, frames=32):
    """Single-core NumPy golden model: the same Tx+Rx chain per frame."""
    from gfdm_tpu.ref import demodulation as demod_ref
    from gfdm_tpu.ref import mapping as map_ref
    from gfdm_tpu.ref import modulation as mod_ref
    from gfdm_tpu.ref import utils
    from gfdm_tpu.ref.channel_estimation import PreambleChannelEstimator
    from gfdm_tpu.ref.cyclic_prefix import add_cyclic_prefix

    est = PreambleChannelEstimator(
        cfg.timeslots, cfg.subcarriers, cfg.active_subcarriers, cfg.dc_free,
        cfg.core_preamble,
    )
    data = [utils.random_qpsk(cfg.n_data_symbols, seed=i) for i in range(frames)]
    smap = cfg.subcarrier_map

    t0 = time.perf_counter()
    for d in data:
        grid = map_ref.map_to_resources(d, cfg.timeslots, cfg.subcarriers, smap)
        x = mod_ref.modulate_block(grid, cfg.tx_filter_taps, cfg.overlap)
        framed = add_cyclic_prefix(
            x, cfg.cp_len, cfg.cs_len, cfg.window_taps, cfg.ramp_len
        )
        burst = np.concatenate((cfg.full_preambles[0], framed))
        # receive
        rx_pre = burst[cfg.cp_len : cfg.cp_len + 2 * cfg.subcarriers]
        chan = est.estimate_frame(rx_pre)
        frame = burst[cfg.preamble_len + cfg.cp_len :][: cfg.block_len]
        syms = demod_ref.demodulate_block(
            frame, cfg.rx_filter_taps, cfg.overlap, channel_fd=chan
        )
        _ = map_ref.demap_from_resources(
            syms.reshape(cfg.subcarriers, cfg.timeslots), cfg.timeslots, smap
        )
    dt = (time.perf_counter() - t0) / frames
    return dt


def main():
    from gfdm_tpu import GfdmConfig

    cfg = GfdmConfig()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    cpu_dt_per_frame = _bench_cpu_golden(cfg)
    tpu_dt, evm = _bench_tpu(cfg, batch=batch, iters=iters)

    samples_per_burst = cfg.frame_len  # over-the-air samples per burst
    tpu_sps = batch * samples_per_burst / tpu_dt
    cpu_sps = samples_per_burst / cpu_dt_per_frame
    bursts_per_s = batch / tpu_dt

    print(
        f"# bursts/s={bursts_per_s:,.0f}  samples/s={tpu_sps:,.0f}  "
        f"EVM={evm:.4f}  cpu_golden_samples/s={cpu_sps:,.0f}  "
        f"step={tpu_dt*1e3:.2f}ms batch={batch}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "gfdm_e2e_link_complex_samples_per_s_per_chip",
                "value": round(tpu_sps),
                "unit": "samples/s",
                "vs_baseline": round(tpu_sps / cpu_sps, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
